"""Evaluation layer: on-device top-N retrieval accuracy.

The reference's sse_evaluator.py (SURVEY.md §3.4) scored eval sources
against the target matrix with CPU numpy dot + argsort. Here the scoring is
the same math — exact brute force, no ANN — but runs as one jitted
encode + matmul + top_k program on device; only the final (N × k) id
comparison against multi-label sets happens on host.
"""

from sse_tpu.evals.recall import Evaluator, recall_at_k
from sse_tpu.evals.at_scale import evaluate_against_index

__all__ = ["Evaluator", "recall_at_k", "evaluate_against_index"]
