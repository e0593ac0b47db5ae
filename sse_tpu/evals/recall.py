"""recall@k — the parity metric (BASELINE.json: "recall@1/@10 parity per
task"; reference stack in SURVEY.md §3.4)."""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sse_tpu.data.corpus import EncodedPairs, TargetSpace
from sse_tpu.models import sse
from sse_tpu.models.sse import NetworkMode, SSEConfig


def recall_at_k(
    top_rows: np.ndarray,  # [N, max_k] predicted target rows, best first
    label_sets: Sequence[Tuple[int, ...]],
    ks: Sequence[int] = (1, 10),
) -> Dict[str, float]:
    """Multi-label recall: hit if ANY correct row appears in the top k.
    Also reports MRR@max(ks) (reciprocal rank of the FIRST correct row,
    0 when none appears) — a rank-sensitive companion the recall rows
    can't express (reference reported accuracy@k only; SURVEY.md §3.4)."""
    out = {}
    n = len(label_sets)
    for k in ks:
        hits = sum(
            1
            for i, labels in enumerate(label_sets)
            if set(top_rows[i, :k]) & set(labels)
        )
        out[f"recall@{k}"] = hits / max(n, 1)
    kmax = min(max(ks), top_rows.shape[1]) if ks else top_rows.shape[1]
    rr = 0.0
    for i, labels in enumerate(label_sets):
        lset = set(labels)
        for rank, row in enumerate(top_rows[i, :kmax]):
            if row in lset:
                rr += 1.0 / (rank + 1)
                break
    out[f"mrr@{kmax}"] = rr / max(n, 1)
    return out


@functools.partial(jax.jit, static_argnames=("model_cfg", "k"))
def _encode_and_topk(
    params,
    model_cfg: SSEConfig,
    src: jax.Array,
    src_len: jax.Array,
    tgt_emb: jax.Array,
    k: int,
):
    """One fused program: source encode → scores vs all targets → top-k."""
    src_emb = sse.encode_source(params, model_cfg, src, src_len)
    scores = jnp.dot(src_emb, tgt_emb.T, preferred_element_type=jnp.float32)
    return jax.lax.top_k(scores, k)


# Above this many targets, a per-checkpoint eval re-encodes a target
# space whose cost rivals an index build; warn loudly unless the caller
# opted into sampled eval (r2 verdict item: large-eval guard).
LARGE_EVAL_WARN_TARGETS = 1_000_000


class Evaluator:
    """Reference's sse_evaluator.Evaluator analog, fully on-device.

    Encodes the full target space once per call (params change between
    calls during training), then scores eval sources in fixed-size batches.

    ``sample_targets=N``: score against a SAMPLED target subset — the
    union of every eval row's labels plus uniform-random distractors up
    to N rows. Recall against a subset is an OPTIMISTIC bound (fewer
    distractors), which is the standard trade for training-time
    monitoring at web scale; final/reported numbers should use the full
    space (or `eval --use_index` through the serving path).
    """

    def __init__(
        self,
        model_cfg: SSEConfig,
        eval_pairs: EncodedPairs,
        target_space: TargetSpace,
        batch_size: int = 256,
        ks: Sequence[int] = (1, 10),
        sample_targets: Optional[int] = None,
    ):
        self.model_cfg = model_cfg
        self.pairs = eval_pairs
        self.tspace = target_space
        self.batch_size = batch_size
        self.ks = tuple(ks)
        t = target_space.num_targets
        self._subset: Optional[np.ndarray] = None
        if sample_targets and sample_targets < t:
            label_rows = np.asarray(
                sorted({r for s in eval_pairs.label_sets for r in s}),
                np.int64,
            )
            need = max(sample_targets - len(label_rows), 0)
            if need:
                mask = np.ones(t, bool)
                mask[label_rows] = False
                pool = np.nonzero(mask)[0]
                fill = np.random.default_rng(0).choice(
                    pool, size=min(need, len(pool)), replace=False
                )
                subset = np.sort(np.concatenate([label_rows, fill]))
            else:
                subset = label_rows
            self._subset = subset.astype(np.int32)
        elif t >= LARGE_EVAL_WARN_TARGETS:
            import sys

            print(
                f"[sse] WARNING: evaluating against {t:,} targets "
                "re-encodes the FULL target space every eval call (an "
                "index build per checkpoint). Pass "
                "--eval_sample_targets N for sampled training-time "
                "monitoring, or use `eval --use_index` through the "
                "serving path for the final number.",
                file=sys.stderr,
            )
        eff_t = t if self._subset is None else len(self._subset)
        self.max_k = min(max(ks), eff_t)

    def encode_targets(self, params) -> jax.Array:
        cfg = self.model_cfg
        if cfg.mode == NetworkMode.SOURCE_ENCODER_ONLY:
            emb = sse.target_embeddings(params, cfg)
            return emb if self._subset is None else emb[self._subset]
        # batch the target tower over the full (or sampled) space
        embs = []
        toks = self.tspace.tokens
        lens = self.tspace.lengths
        if self._subset is not None:
            toks = toks[self._subset]
            lens = lens[self._subset]
        bs = self.batch_size
        for lo in range(0, toks.shape[0], bs):
            t = toks[lo : lo + bs]
            l = lens[lo : lo + bs]
            if t.shape[0] < bs:  # pad to static shape
                pad = bs - t.shape[0]
                t = np.concatenate([t, np.zeros((pad, t.shape[1]), t.dtype)])
                l = np.concatenate([l, np.ones((pad,), l.dtype)])
            embs.append(self._encode_tgt_batch(params, jnp.asarray(t), jnp.asarray(l)))
        return jnp.concatenate(embs)[: toks.shape[0]]

    @functools.cached_property
    def _encode_tgt_batch(self):
        cfg = self.model_cfg

        @jax.jit
        def fn(params, tokens, lengths):
            return sse.target_embeddings(
                params, cfg, tokens=tokens, lengths=lengths
            )

        return fn

    def top_rows(self, params, tgt_emb: Optional[jax.Array] = None) -> np.ndarray:
        """Top max_k predicted target rows for every eval source."""
        if tgt_emb is None:
            tgt_emb = self.encode_targets(params)
        bs = self.batch_size
        outs: List[jax.Array] = []
        n = self.pairs.num_examples
        for lo in range(0, n, bs):
            s = self.pairs.src[lo : lo + bs]
            sl = self.pairs.src_len[lo : lo + bs]
            if s.shape[0] < bs:
                pad = bs - s.shape[0]
                s = np.concatenate([s, np.zeros((pad, s.shape[1]), s.dtype)])
                sl = np.concatenate([sl, np.ones((pad,), sl.dtype)])
            _, idx = _encode_and_topk(
                params,
                self.model_cfg,
                jnp.asarray(s),
                jnp.asarray(sl),
                tgt_emb,
                self.max_k,
            )
            # keep results on device: per-batch np.asarray would block a
            # round trip per batch (the r2 index-builder lesson); ONE
            # concatenate + fetch at the end keeps the loop async
            outs.append(idx)
        rows = np.asarray(jnp.concatenate(outs))[:n]
        # sampled eval scores against a subset; map positions back to
        # GLOBAL target rows so label_sets (global) compare directly
        return rows if self._subset is None else self._subset[rows]

    def evaluate(self, params) -> Dict[str, float]:
        top = self.top_rows(params)
        ks = [k for k in self.ks if k <= self.tspace.num_targets]
        return recall_at_k(top, self.pairs.label_sets, ks)
