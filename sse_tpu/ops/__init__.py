"""Native tier: Pallas TPU kernels for the hot paths (SURVEY.md §2.4).

The reference has zero native code (SURVEY.md §2 — pure-Python TF1), so
this layer is defined by the north star, not by porting:

  (a) pallas_rnn  — fused-gate time-major RNN scan (replaces the
      reference's tf.nn.dynamic_rnn on the encode path);
  (b) fused_topk  — streaming score+top-k: index blocks stream
      HBM→VMEM once and the [B, T] score matrix NEVER touches HBM —
      the serving path's speed-of-light kernel;
  (c) the distributed top-k merge lives in sse_tpu.parallel.topk
      (XLA collectives; no hand-rolled RDMA needed at these sizes).

Every kernel has an XLA reference implementation and is numerics-tested
against it (tests run interpret=True on CPU; real-TPU parity is checked in
benchmarks).
"""

from sse_tpu.ops.fused_topk import fused_score_topk

__all__ = ["fused_score_topk"]
