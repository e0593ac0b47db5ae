"""Oracles for the compositional profile's eval set
(sse_tpu/data/synthetic.py::make_compositional_corpus).

Three scorers, measured on the exact generated eval rows:

  * word-overlap oracle — |bag(source) ∩ bag(target)| with uniform
    random tie-break. The ORDER-BLIND ceiling: siblings share identical
    word bags, so within the correct cluster this scorer is at chance
    1/cluster_size. Any bag-of-words model is bounded by it.
  * bigram-overlap oracle — overlap counted over adjacent ordered word
    pairs (source noise stripped by bank membership first). The signal
    an order-aware encoder can realistically extract.
  * Bayes-optimal scorer — full generator knowledge: strip noise, the
    posterior is uniform over targets whose permutation contains the
    stripped window as a CONTIGUOUS subsequence (the generator draws
    contiguous windows, noise only at the ends). Expected recall@1 =
    E[1/#consistent] — the instrument's true ceiling.

Usage: python tools/comp_oracle.py [ranking|classification|crosslingual|qna] [seed]

The optional generator seed (default 0, the shipped demo-data seed)
exists to measure the INSTRUMENT's own variance: the Bayes ceiling is an
expectation over one generated corpus, so BASELINE.md's residual-gap
claims need its seed-to-seed band (VERDICT r3 item 9).
"""
import os
import random
import sys
from collections import Counter

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
from sse_tpu.data import synthetic  # noqa: E402

task = sys.argv[1] if len(sys.argv) > 1 else "ranking"
num_targets, cluster_size = 2048, 8
seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0

# regenerate the corpus exactly as `demo-data --profile compositional`
train, ev, target_rows = synthetic.make_compositional_corpus(
    task=task, num_targets=num_targets, cluster_size=cluster_size, seed=seed
)

# reconstruct the generator's banks for noise stripping / translation
rng = random.Random(seed)
n_clusters = num_targets // cluster_size
pool_bank = synthetic._word_bank(rng, n_clusters * cluster_size, syllables=2)
noise_bank = set(synthetic._word_bank(rng, 400, syllables=4))
if task == "crosslingual":
    src_side = synthetic._word_bank(rng, len(pool_bank), syllables=5)
    inv = dict(zip(src_side, pool_bank))
else:
    inv = {w: w for w in pool_bank}

# target permutations (strip qna's appended noise by bank membership)
perms = []
for tid, text in target_rows:
    perms.append([w for w in text.split() if w not in noise_bank])

bags = [Counter(p) for p in perms]
bigrams = [set(zip(p, p[1:])) for p in perms]

# cluster pools are disjoint, so one window word pins the cluster;
# every out-of-cluster target scores 0 on all three oracles — restrict
# the argmax to the cluster's members (exactly equivalent, 256x faster)
word_cluster = {w: i // cluster_size for i, w in enumerate(pool_bank)}

hits_word = hits_bigram = 0.0
bayes_exp = 0.0
n = 0
for srctext, labels in ev:
    lab = {int(x[1:]) for x in labels}
    raw = srctext.split()
    window = [inv[w] for w in raw if w not in noise_bank]
    src_bag = Counter(window)
    src_bg = set(zip(window, window[1:]))
    c = word_cluster[window[0]]
    members = range(c * cluster_size, (c + 1) * cluster_size)

    # word-overlap oracle (uniform tie-break among argmax)
    scores = {t: sum((src_bag & bags[t]).values()) for t in members}
    m = max(scores.values())
    cand = [t for t, s in scores.items() if s == m]
    hits_word += len(lab & set(cand)) / len(cand)

    # bigram-overlap oracle (word overlap breaks bigram ties)
    bscores = {t: (len(src_bg & bigrams[t]), scores[t]) for t in members}
    bm = max(bscores.values())
    bcand = [t for t, s in bscores.items() if s == bm]
    hits_bigram += len(lab & set(bcand)) / len(bcand)

    # Bayes: uniform over targets containing the window contiguously
    w = tuple(window)
    cons = []
    for t in members:
        p = perms[t]
        for lo in range(len(p) - len(w) + 1):
            if tuple(p[lo : lo + len(w)]) == w:
                cons.append(t)
                break
    if cons:
        bayes_exp += len(lab & set(cons)) / len(cons)
    n += 1
    if n % 512 == 0:
        print(
            f"{n}: word {hits_word/n:.4f}  bigram {hits_bigram/n:.4f}  "
            f"bayes {bayes_exp/n:.4f}",
            flush=True,
        )

print(
    f"FINAL {task} seed={seed} (n={n}): word-overlap oracle recall@1 = "
    f"{hits_word/n:.4f}; bigram oracle = {hits_bigram/n:.4f}; "
    f"Bayes ceiling = {bayes_exp/n:.4f}"
)
