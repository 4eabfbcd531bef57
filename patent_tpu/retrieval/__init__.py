"""Sharded exact retrieval index + evaluation engine."""

from .index import EmbeddingIndex, sharded_topk_search, topk_search  # noqa: F401
from .engine import RetrievalEngine  # noqa: F401
from .hyperbolic_engine import HyperbolicRetrievalEngine  # noqa: F401
from .server import RetrievalService, serve  # noqa: F401
