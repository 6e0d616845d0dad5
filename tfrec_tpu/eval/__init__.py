"""Evaluation: ranking metrics, top-k retrieval, native parity evaluator."""

from tfrec_tpu.eval.metrics import (
    auc,
    ranking_metrics_from_topk,
)
from tfrec_tpu.eval.retrieval import topk_scores, evaluate_retrieval

__all__ = [
    "auc",
    "ranking_metrics_from_topk",
    "topk_scores",
    "evaluate_retrieval",
]
