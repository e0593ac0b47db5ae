"""L1 data layer tests: schema IO, encoding shapes/caching, batching
determinism + per-host sharding, synthetic corpus structure."""

import numpy as np
import pytest

from sse_tpu.data import (
    BatchIterator,
    build_vocab,
    encode_pairs,
    encode_target_space,
    read_pairs_tsv,
    read_targets_tsv,
    synthetic,
)
from sse_tpu.text.subword import EOS_ID

L = 16


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    train, ev, targets = synthetic.make_corpus(
        num_targets=8, train_per_target=6, eval_per_target=2, seed=3
    )
    synthetic.write_corpus(str(d), train, ev, targets)
    return str(d)


@pytest.fixture(scope="module")
def encoded(corpus, tmp_path_factory):
    work = tmp_path_factory.mktemp("work")
    train_rows = read_pairs_tsv(f"{corpus}/TrainPairs")
    target_rows = read_targets_tsv(f"{corpus}/targetIDs")
    vocab = build_vocab(300, train_rows, target_rows, str(work / "vocab.txt"))
    tspace = encode_target_space(
        vocab, target_rows, L, str(work / "targets.npz")
    )
    pairs = encode_pairs(vocab, train_rows, tspace, L)
    return vocab, tspace, pairs, work, target_rows, train_rows


def test_tsv_round_trip(corpus):
    train = read_pairs_tsv(f"{corpus}/TrainPairs")
    targets = read_targets_tsv(f"{corpus}/targetIDs")
    assert len(train) == 8 * 6
    assert len(targets) == 8
    assert all(len(tids) >= 1 for _, tids in train)


def test_encoding_shapes(encoded):
    from sse_tpu.data.corpus import trimmed_width

    vocab, tspace, pairs, *_ = encoded
    # arrays come back PAD-TRIMMED: the smallest multiple-of-8 width
    # covering every row (never wider than max_seq_length) — the scan
    # over padded columns is the train step's binding resource
    assert tspace.tokens.shape == (
        8, trimmed_width(tspace.lengths, L)
    )
    assert tspace.tokens.shape[1] % 8 == 0
    assert tspace.tokens.shape[1] >= tspace.lengths.max()
    assert tspace.tokens.dtype == np.int32
    # every row EOS-terminated at position length-1
    for i in range(tspace.num_targets):
        assert tspace.tokens[i, tspace.lengths[i] - 1] == EOS_ID
        assert (tspace.tokens[i, tspace.lengths[i] :] == 0).all()
    assert pairs.src.shape[1] == trimmed_width(pairs.src_len, L)
    assert pairs.labels.max() < tspace.num_targets


def test_trimmed_width_policy():
    from sse_tpu.data.corpus import trimmed_width

    assert trimmed_width(np.array([3, 5]), 50) == 8
    assert trimmed_width(np.array([8]), 50) == 8
    assert trimmed_width(np.array([9]), 50) == 16
    assert trimmed_width(np.array([49]), 50) == 50  # capped at full width
    assert trimmed_width(np.array([], dtype=np.int32), 50) == 50
    assert trimmed_width(np.array([1]), 4) == 4


def test_target_cache_hit(encoded):
    vocab, tspace, _, work, target_rows, _ = encoded
    t2 = encode_target_space(vocab, target_rows, L, str(work / "targets.npz"))
    np.testing.assert_array_equal(t2.tokens, tspace.tokens)


def test_target_cache_invalidated_by_vocab_content(encoded):
    """Same vocab SIZE, different subtokens → the npz token cache must
    miss (the key hashes vocab content, not just size — ADVICE.md r1)."""
    from sse_tpu.text.subword import SubwordVocab

    vocab, tspace, _, work, target_rows, _ = encoded
    subs = [
        vocab.id_to_subtoken(i) for i in range(2, vocab.vocab_size)
    ]
    # reverse the non-reserved subtokens: same set (greedy matching picks
    # the same segments) but every id remaps → encodings must change
    shuffled = SubwordVocab(subs[::-1])
    assert shuffled.vocab_size == vocab.vocab_size
    assert shuffled.content_digest() != vocab.content_digest()
    t2 = encode_target_space(
        shuffled, target_rows, L, str(work / "targets.npz")
    )
    assert not np.array_equal(t2.tokens, tspace.tokens)


def test_vocab_cache_hit(encoded, corpus):
    vocab, _, _, work, target_rows, train_rows = encoded
    v2 = build_vocab(300, train_rows, target_rows, str(work / "vocab.txt"))
    assert v2.vocab_size == vocab.vocab_size


def test_batch_iterator_static_shapes(encoded):
    _, _, pairs, *_ = encoded
    it = BatchIterator(pairs, global_batch_size=16, seed=1)
    batches = list(it.epoch_batches(0))
    assert len(batches) == it.steps_per_epoch
    W = pairs.src.shape[1]
    for b in batches:
        assert b.src.shape == (16, W)
        assert b.weight.shape == (16,)
    # padding rows only in the last batch; weights mark them
    total_weight = sum(b.weight.sum() for b in batches)
    assert total_weight == pairs.num_examples


def test_batch_iterator_deterministic(encoded):
    _, _, pairs, *_ = encoded
    a = list(BatchIterator(pairs, 16, seed=7).epoch_batches(2))
    b = list(BatchIterator(pairs, 16, seed=7).epoch_batches(2))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.src, y.src)


def test_per_host_sharding_partitions(encoded):
    """Two fake hosts together must cover exactly the single-host batch."""
    _, _, pairs, *_ = encoded
    full = list(BatchIterator(pairs, 16, seed=5).epoch_batches(0))
    h0 = list(
        BatchIterator(pairs, 16, seed=5, process_index=0, process_count=2)
        .epoch_batches(0)
    )
    h1 = list(
        BatchIterator(pairs, 16, seed=5, process_index=1, process_count=2)
        .epoch_batches(0)
    )
    assert len(h0) == len(h1) == len(full)
    for f, a, b in zip(full, h0, h1):
        assert a.src.shape == (8, f.src.shape[1])
        assert b.src.shape == (8, f.src.shape[1])
        # real (weight>0) rows of the two host shards == real rows of global
        real = lambda batch: {
            tuple(batch.src[i])
            for i in range(len(batch.weight))
            if batch.weight[i] > 0
        }
        assert real(a) | real(b) == real(f)


@pytest.mark.parametrize("task", ["classification", "ranking", "crosslingual", "qna"])
def test_synthetic_tasks(task):
    train, ev, targets = synthetic.make_corpus(
        task=task, num_targets=4, train_per_target=3, eval_per_target=1
    )
    assert len(targets) == 4
    assert len(train) == 12
    if task == "crosslingual":
        # source vocabulary must be disjoint from target text vocabulary
        tgt_words = {w for _, t in targets for w in t.split()}
        src_words = {
            w for s, _ in train for w in s.split() if len(w) == 8
        }  # 4-syllable source-language words
        assert src_words and not (src_words & tgt_words)


def test_streaming_pairs_match_in_memory(encoded, corpus, tmp_path):
    """encode_pairs_streaming (chunked → memmap) produces exactly the
    in-memory encode_pairs arrays, drops unknown targets the same way,
    and reopens from cache."""
    from sse_tpu.data.corpus import encode_pairs_streaming

    vocab, tspace, pairs, *_ = encoded
    # tiny chunk size forces multiple flushes
    sp = encode_pairs_streaming(
        vocab, f"{corpus}/TrainPairs", tspace, L,
        cache_dir=str(tmp_path), chunk_rows=7,
    )
    assert isinstance(sp.src, np.memmap) or sp.src.base is not None
    np.testing.assert_array_equal(np.asarray(sp.src), pairs.src)
    np.testing.assert_array_equal(np.asarray(sp.src_len), pairs.src_len)
    np.testing.assert_array_equal(np.asarray(sp.labels), pairs.labels)
    assert sp.label_sets[0] == (int(pairs.labels[0]),)
    # cache hit: second call must reopen without re-encoding
    sp2 = encode_pairs_streaming(
        vocab, f"{corpus}/TrainPairs", tspace, L, cache_dir=str(tmp_path)
    )
    np.testing.assert_array_equal(np.asarray(sp2.src), pairs.src)
    # REORDERED target space (same count): labels are row indices, so the
    # cache must invalidate — reusing memmapped labels built against the
    # old order would silently supervise against the wrong targets
    import dataclasses as _dc

    perm = list(range(len(tspace.ids)))[::-1]
    rspace = _dc.replace(
        tspace,
        ids=[tspace.ids[i] for i in perm],
        texts=[tspace.texts[i] for i in perm],
        tokens=tspace.tokens[perm],
        lengths=tspace.lengths[perm],
        id_to_row={tspace.ids[i]: r for r, i in enumerate(perm)},
    )
    sp3 = encode_pairs_streaming(
        vocab, f"{corpus}/TrainPairs", rspace, L, cache_dir=str(tmp_path)
    )
    remapped = np.array(
        [rspace.id_to_row[tspace.ids[l]] for l in pairs.labels], np.int32
    )
    np.testing.assert_array_equal(np.asarray(sp3.labels), remapped)


def test_windowed_shuffle_exactly_once(encoded):
    """shuffle_window: every example exactly once per epoch, deterministic
    in (seed, epoch), batches keep static shapes."""
    _, _, pairs, *_ = encoded
    it = BatchIterator(pairs, global_batch_size=8, seed=3, shuffle_window=10)
    seen = []
    for b in it.epoch_batches(0):
        assert b.src.shape == (8, pairs.src.shape[1])
        seen.extend(
            int(l) for l, w in zip(b.labels, b.weight) if w > 0
        )
    assert len(seen) == pairs.num_examples
    # same epoch → same order; next epoch → different
    it2 = BatchIterator(pairs, global_batch_size=8, seed=3, shuffle_window=10)
    again = [
        int(l)
        for b in it2.epoch_batches(0)
        for l, w in zip(b.labels, b.weight)
        if w > 0
    ]
    assert seen == again


def test_streaming_workspace_e2e(tmp_path):
    """Workspace with streaming=True trains end-to-end through the memmap
    path (vocab stream-counted, pairs memmapped, windowed shuffle)."""
    from sse_tpu.configs import preset
    from sse_tpu.workspace import Workspace

    data = str(tmp_path / "data")
    tr, ev, tg = synthetic.make_corpus(
        task="classification", num_targets=8, train_per_target=6, seed=2
    )
    synthetic.write_corpus(data, tr, ev, tg)
    cfg = preset(
        "classification",
        streaming=True,
        shuffle_window=16,
        vocab_size=300,
        max_seq_length=L,
        embed_dim=16,
        hidden=16,
        encoding_dim=16,
        batch_size=16,
        max_epochs=8,
        steps_per_checkpoint=1000,
    )
    ws = Workspace.create(str(tmp_path / "model"), cfg)
    final = ws.train(data)
    assert final["recall@1"] > 0.5  # learned something through the memmaps
    assert (tmp_path / "model" / "pairs_src.npy").exists()


def test_word_vocab_mode(tmp_path):
    """vocab_mode='word' (the reference's TokenTextEncoder path, newly
    reachable — VERDICT r1 item 5): builds, caches with marker dispatch,
    encodes with OOV, trains end-to-end."""
    from sse_tpu.configs import preset
    from sse_tpu.data.corpus import build_vocab
    from sse_tpu.text.subword import TokenVocab, load_vocab
    from sse_tpu.workspace import Workspace

    tr, ev, tg = synthetic.make_corpus(
        task="classification", num_targets=8, train_per_target=6, seed=4
    )
    cache = str(tmp_path / "vocab.txt")
    v = build_vocab(60, tr, tg, cache, vocab_mode="word")
    assert isinstance(v, TokenVocab)
    assert isinstance(load_vocab(cache), TokenVocab)  # marker round trip
    ids = v.encode("zzzunknownzzz " + tg[0][1].split()[0])
    assert ids[0] == 2  # OOV id
    data = str(tmp_path / "data")
    synthetic.write_corpus(data, tr, ev, tg)
    cfg = preset(
        "classification", vocab_mode="word", vocab_size=200,
        max_seq_length=L, embed_dim=16, hidden=16, encoding_dim=16,
        batch_size=16, max_epochs=8, steps_per_checkpoint=1000,
    )
    ws = Workspace.create(str(tmp_path / "model"), cfg)
    final = ws.train(data)
    assert final["recall@1"] > 0.5
    # the serving engine loads word vocabs too (marker dispatch)
    phases: dict = {}
    ws.build_index(data, phase_times=phases)
    # the CLI's docs/sec breakdown (r3): every phase reported, positive
    assert set(phases) == {"prepare_data", "restore", "encode", "save"}
    assert all(v >= 0 for v in phases.values())
    eng = ws.engine(k=3)
    assert isinstance(eng.vocab, TokenVocab)
    hits = eng.query([tg[0][1]])[0]
    assert len(hits) == 3


def test_hard_corpus_structure():
    """The discriminative profile (VERDICT r1 item 1): confusable
    clusters, multi-label eval rows, and an oracle recall@1 ceiling
    STRICTLY below 1.0 (so a saturated metric means a bug, not success)."""
    tr, ev, tg = synthetic.make_hard_corpus(
        task="ranking",
        num_targets=128,
        cluster_size=8,
        train_per_target=4,
        eval_per_target=4,
        seed=5,
    )
    assert len(tg) == 128 and len(tr) == 512 and len(ev) == 512
    # multi-label rows exist and label pairs are same-cluster siblings
    multi = [(s, ls) for s, ls in ev if len(ls) > 1]
    assert 0.05 * len(ev) < len(multi) < 0.3 * len(ev)
    for _, ls in multi:
        rows = [int(l[1:]) for l in ls]
        assert rows[0] // 8 == rows[1] // 8 and rows[0] != rows[1]
    # cluster siblings share core words (confusability is real)
    texts = {tid: set(txt.split()) for tid, txt in tg}
    a, b = texts["t00000"], texts["t00001"]
    assert len(a & b) >= 4
    # lexical-overlap oracle cannot saturate recall@1 (irreducible rows)
    hits = 0
    ids = [tid for tid, _ in tg]
    for src, labels in ev:
        sw = src.split()
        best = max(ids, key=lambda t: (sum(w in texts[t] for w in sw),
                                       -int(t[1:])))
        hits += best in labels
    assert 0.45 < hits / len(ev) < 0.97


def test_compositional_corpus_structure():
    """The ORDER-SENSITIVE profile (r3 instrument): cluster siblings have
    byte-identical word BAGS (so any order-blind scorer is at chance
    1/cluster_size within the cluster) while word ORDER pins the target —
    sources are contiguous windows of their target's permutation with
    noise only at the ends."""
    tr, ev, tg = synthetic.make_compositional_corpus(
        task="ranking",
        num_targets=64,
        cluster_size=8,
        train_per_target=4,
        eval_per_target=4,
        seed=3,
    )
    assert len(tg) == 64 and len(tr) == 256 and len(ev) == 256
    texts = {tid: txt.split() for tid, txt in tg}
    # identical bags, distinct orders, within every cluster
    for c in range(8):
        perms = [texts[f"t{c * 8 + i:05d}"] for i in range(8)]
        assert len({frozenset(p) for p in perms}) == 1
        assert len({tuple(p) for p in perms}) == 8
    # disjoint pools across clusters
    assert not (set(texts["t00000"]) & set(texts["t00008"]))
    # sources: noise-stripped window is a contiguous subsequence of the
    # labeled target's permutation (2-syllable pool vs 4-syllable noise)
    for src, labels in ev:
        win = [w for w in src.split() if len(w) == 4]
        perm = texts[labels[0]]
        assert 2 <= len(win) <= 5
        assert any(
            perm[lo : lo + len(win)] == win
            for lo in range(len(perm) - len(win) + 1)
        )
    # the word-overlap oracle is pinned at ~1/cluster_size: every sibling
    # ties, so expected hits = 1/8 exactly (uniform tie-break)
    # the bigram oracle separates: for most rows the window's adjacencies
    # occur in few sibling permutations
    amb = 0
    for src, labels in ev:
        win = [w for w in src.split() if len(w) == 4]
        bg = set(zip(win, win[1:]))
        c = int(labels[0][1:]) // 8
        best = max(
            range(c * 8, (c + 1) * 8),
            key=lambda t: (
                len(bg & set(zip(texts[f"t{t:05d}"], texts[f"t{t:05d}"][1:]))),
                -t,
            ),
        )
        amb += f"t{best:05d}" in labels
    assert amb / len(ev) > 0.6  # far above the 0.125 bag-of-words bound


def test_compositional_determinism():
    a = synthetic.make_compositional_corpus(num_targets=16, cluster_size=4, window_max=4, seed=9)
    b = synthetic.make_compositional_corpus(num_targets=16, cluster_size=4, window_max=4, seed=9)
    assert a == b
    c = synthetic.make_compositional_corpus(num_targets=16, cluster_size=4, window_max=4, seed=10)
    assert a != c


def test_compositional_crosslingual_disjoint_vocab():
    """Crosslingual sources use a disjoint vocabulary (bijection applied
    word-by-word, order preserved)."""
    _, ev, tg = synthetic.make_compositional_corpus(
        task="crosslingual", num_targets=16, cluster_size=4,
        window_max=4, eval_per_target=2, seed=1,
    )
    tgt_words = {w for _, txt in tg for w in txt.split()}
    for src, _ in ev:
        win = [w for w in src.split() if len(w) != 8]  # strip 4-syll noise
        assert win and not (set(win) & tgt_words)


def test_multi_label_pairs_and_recall(tmp_path):
    """Reference semantics: a pair row may list several correct target ids
    ("t1,t2" or "t1|t2"); recall@k counts a hit if ANY appears."""
    import numpy as np

    from sse_tpu.evals import recall_at_k

    p = tmp_path / "EvalPairs"
    p.write_text("query one\tt00000,t00002\nquery two\tt00001|t00003\n")
    rows = read_pairs_tsv(str(p))
    assert rows == [
        ("query one", ["t00000", "t00002"]),
        ("query two", ["t00001", "t00003"]),
    ]
    # top rows: example 0 found its SECOND label at rank 2
    top = np.array([[5, 2, 7], [1, 0, 4]])
    r = recall_at_k(top, [(0, 2), (1, 3)], ks=(1, 2))
    assert r["recall@1"] == 0.5  # only example 1 hits at rank 1
    assert r["recall@2"] == 1.0
    # MRR@2: example 0 first hit at rank 2 (1/2), example 1 at rank 1
    assert r["mrr@2"] == (0.5 + 1.0) / 2
    # no hit anywhere → contributes 0
    r0 = recall_at_k(np.array([[5, 7, 9]]), [(0,)], ks=(1, 3))
    assert r0["mrr@3"] == 0.0


def test_scale_corpus_writer(tmp_path):
    """The scale profile streams a reference-schema corpus to disk:
    unique ids, pair labels that exist, and sources whose non-noise words
    come from their target's text (so index retrieval can succeed)."""
    synthetic.write_scale_corpus(
        str(tmp_path), num_targets=500, train_rows=50, eval_rows=20,
        vocab_words=300,
    )
    tg = read_targets_tsv(str(tmp_path / "targetIDs"))
    assert len(tg) == 500
    ids = [t for t, _ in tg]
    assert len(set(ids)) == 500
    texts = dict(tg)
    ev = read_pairs_tsv(str(tmp_path / "EvalPairs"))
    assert len(ev) == 20
    for src, labels in ev:
        assert labels[0] in texts
        tw = set(texts[labels[0]].split())
        sw = src.split()
        # 4 of the 5 source words come from the target text
        assert sum(w in tw for w in sw) >= 4
