"""Retrieval metric battery matching the reference evaluation exactly."""

from .retrieval_metrics import (  # noqa: F401
    RetrievalMetrics,
    average_precision_reference,
    evaluate_rankings,
    mrr_at_k,
    ndcg_reference,
    precision_at_k,
    recall_at_k,
)
from .classification import (  # noqa: F401
    mean_average_precision,
    confusion_counts,
    per_class_prf,
)
