"""Sharded exact retrieval index + evaluation engine."""

from .index import (EmbeddingIndex, quantize_gallery,  # noqa: F401
                    sharded_topk_search, topk_search, topk_search_quantized)
from .engine import (RetrievalEngine,  # noqa: F401
                     make_device_normalizing_encoder, make_scan_encoder)
from .hyperbolic_engine import HyperbolicRetrievalEngine  # noqa: F401
from .server import RetrievalService, serve  # noqa: F401
