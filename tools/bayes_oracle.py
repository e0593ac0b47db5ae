"""Bayes-optimal recall@1 on the hard profile's eval set, using FULL
knowledge of the generator (sse_tpu/data/synthetic.py::make_hard_corpus).

Each source word is, independently: with prob 6/8 a 'content' draw
(which is distinctive w.p. p_distinct=0.3 uniform over the target's 3
distinctive words, else Zipf over the cluster's 6 core words), with prob
2/8 a noise draw (Zipf over the 400-word noise bank). Words are shuffled,
so the per-word likelihood is that mixture; multi-label ambiguous rows
are generated core-only (a separate mixture), and the generator picks
which regime each row is in — the Bayes scorer must marginalize over
regimes with the known priors (eval multi_label_frac=0.15).

Measured (r3, seed 0): recall@1 = 0.7795 on BOTH ranking and
classification eval sets — identical to the greedy word-overlap oracle
and to the best trained configs (BASELINE.md r3 section): word identity
carries ALL the label signal this generator emits, and the models are at
the instrument's information-theoretic ceiling.

Usage: python tools/bayes_oracle.py [ranking|classification|crosslingual|qna]
"""
import os
import sys
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
import random
import numpy as np
from sse_tpu.data import synthetic

task = sys.argv[1] if len(sys.argv) > 1 else "ranking"
num_targets, cluster_size, core_words, distinct_words = 2048, 16, 6, 3
src_words, p_distinct, noise_words = 6, 0.3, 2
seed = 0
rng = random.Random(seed)
n_clusters = num_targets // cluster_size
core_bank = synthetic._word_bank(rng, n_clusters * core_words, syllables=2)
dist_bank = synthetic._word_bank(rng, num_targets * distinct_words, syllables=3)
noise_bank = synthetic._word_bank(rng, 400, syllables=4)
noise_w = np.array([1.0 / (i + 1) for i in range(len(noise_bank))]); noise_w /= noise_w.sum()
core_w = np.array([1.0 / (i + 1) for i in range(core_words)]); core_w /= core_w.sum()

if task == "crosslingual":
    src_side = synthetic._word_bank(rng, len(core_bank) + len(dist_bank), syllables=5)
    translate = dict(zip(core_bank + dist_bank, src_side))
else:
    translate = {w: w for w in core_bank + dist_bank}
inv = {v: k for k, v in translate.items()}

cores = [core_bank[c * core_words:(c + 1) * core_words] for c in range(n_clusters)]
dists = [dist_bank[i * distinct_words:(i + 1) * distinct_words] for i in range(num_targets)]
core_pos = {}
for c, cw in enumerate(cores):
    for j, w in enumerate(cw):
        core_pos[w] = (c, j)
dist_pos = {}
for t, dw in enumerate(dists):
    for w in dw:
        dist_pos[w] = t
noise_pos = {w: i for i, w in enumerate(noise_bank)}

# regenerate eval pairs exactly
_, ev, _ = synthetic.make_hard_corpus(task=task, num_targets=num_targets, seed=seed)

P_NOISE = noise_words / (src_words + noise_words)  # a word slot is noise
P_CONTENT = 1.0 - P_NOISE
ML_FRAC = 0.15

def word_ll(w, t, core_only):
    """log P(observed word | target t, regime)."""
    w = inv.get(w, w)
    p = 0.0
    if w in noise_pos:
        p += P_NOISE * noise_w[noise_pos[w]]
    if w in core_pos:
        c, j = core_pos[w]
        if c == t // cluster_size:
            pd = 0.0 if core_only else p_distinct
            p += P_CONTENT * (1.0 - pd) * core_w[j]
    if not core_only and w in dist_pos and dist_pos[w] == t:
        p += P_CONTENT * p_distinct / distinct_words
    return np.log(max(p, 1e-300))

hits = n = 0
for srctext, labels in ev:
    ws = srctext.split()
    lab = {int(x[1:]) for x in labels}
    # score every target: marginalize over regime (normal vs core-only row)
    best_t, best_s = -1, -np.inf
    # precompute per-cluster core/noise lls once
    for t in range(num_targets):
        ll_norm = sum(word_ll(w, t, False) for w in ws)
        ll_core = sum(word_ll(w, t, True) for w in ws)
        s = np.logaddexp(np.log(1 - ML_FRAC) + ll_norm, np.log(ML_FRAC) + ll_core)
        if s > best_s:
            best_s, best_t = s, t
    hits += best_t in lab
    n += 1
    if n % 256 == 0:
        print(f"{n}: bayes recall@1 so far {hits/n:.4f}", flush=True)
print(f"FINAL {task}: bayes recall@1 = {hits/n:.4f} (n={n})")
