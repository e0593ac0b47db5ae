"""Index subsystem + fused query path tests (SURVEY.md §4): build, orbax
persistence, reference-TSV round trip, sharded-vs-single-device query
equality, HTTP API."""

import json
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sse_tpu.data import synthetic
from sse_tpu.data.corpus import encode_pairs, encode_target_space
from sse_tpu.index import ShardedIndex, build_index
from sse_tpu.index.sharded_index import from_embeddings
from sse_tpu.models import NetworkMode, SSEConfig, TowerConfig, init_params
from sse_tpu.parallel import make_mesh
from sse_tpu.serve import QueryEngine, serve_http
from sse_tpu.text.subword import SubwordVocab, token_counts_from_lines

L = 12


@pytest.fixture(scope="module")
def setup():
    tr, ev, tg = synthetic.make_corpus(
        task="ranking", num_targets=24, train_per_target=4, seed=9
    )
    vocab = SubwordVocab.build_to_target_size(
        300, token_counts_from_lines([s for s, _ in tr] + [t for _, t in tg])
    )
    tspace = encode_target_space(vocab, tg, L)
    model_cfg = SSEConfig(
        mode=NetworkMode.SHARED_ENCODER,
        src_tower=TowerConfig(
            vocab_size=vocab.vocab_size, embed_dim=24, hidden=24, encoding_dim=16
        ),
    )
    params = init_params(jax.random.PRNGKey(0), model_cfg)
    return vocab, tspace, model_cfg, params, tg


def test_build_index_shapes(setup):
    vocab, tspace, model_cfg, params, tg = setup
    idx = build_index(params, model_cfg, tspace, mesh=None, batch_size=16)
    assert idx.num_real == 24
    assert idx.padded_size % 8 == 0
    assert idx.ids[0] == "t00000"
    # rows normalized
    norms = np.linalg.norm(np.asarray(idx.emb)[:24], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_build_index_capacity_reserve_rows_are_zero(setup):
    """Tower-mode build_index with capacity headroom: rows in
    [num_real, t_pad) must be ZERO vectors, matching from_embeddings —
    the tail chunk's encoded zero-token padding docs are identical
    non-zero unit vectors that would defeat the kernel's block gate on
    every reserve block (r2.5 review)."""
    vocab, tspace, model_cfg, params, tg = setup
    idx = build_index(
        params, model_cfg, tspace, batch_size=16, capacity=96
    )
    assert idx.num_real == 24 and idx.padded_size >= 96
    tail = np.asarray(idx.emb)[idx.num_real :]
    np.testing.assert_array_equal(tail, 0)


def test_index_save_load_and_tsv(setup, tmp_path):
    vocab, tspace, model_cfg, params, tg = setup
    idx = build_index(params, model_cfg, tspace, batch_size=16)
    d = str(tmp_path / "index")
    idx.save(d)
    loaded = ShardedIndex.load(d)
    np.testing.assert_allclose(
        np.asarray(loaded.emb), np.asarray(idx.emb), atol=1e-7
    )
    assert loaded.ids == idx.ids and loaded.num_real == idx.num_real
    # reference-format TSV round trip
    tsv = str(tmp_path / "targetEncodingIndex.tsv")
    idx.export_tsv(tsv)
    re_imported = ShardedIndex.import_tsv(tsv)
    assert re_imported.num_real == idx.num_real
    np.testing.assert_allclose(
        np.asarray(re_imported.emb)[:24],
        np.asarray(idx.emb)[:24],
        atol=1e-5,
    )


def test_index_load_legacy_orbax_format(setup, tmp_path):
    """Indexes saved by the pre-r3 Orbax layout (and by multi-process
    saves, which still use it) must keep loading."""
    vocab, tspace, model_cfg, params, tg = setup
    idx = build_index(params, model_cfg, tspace, batch_size=16)
    d = str(tmp_path / "legacy")
    idx._save_orbax(d)
    loaded = ShardedIndex.load(d)
    np.testing.assert_allclose(
        np.asarray(loaded.emb), np.asarray(idx.emb), atol=1e-7
    )
    assert loaded.ids == idx.ids and loaded.texts == idx.texts


def test_docs_tsv_escaping_round_trip(tmp_path):
    """Live-added docs can contain tabs/newlines/backslashes; docs.tsv
    must round-trip them exactly."""
    from sse_tpu.index.sharded_index import from_embeddings

    emb = np.eye(4, 8, dtype=np.float32)
    ids = ["a", "b\tc", "d\ne", "f\\g"]
    texts = ["plain", "car\rriage", "new\r\nline", "back\\slash\t\n\r"]
    idx = from_embeddings(emb, ids, texts)
    d = str(tmp_path / "esc")
    idx.save(d)
    loaded = ShardedIndex.load(d)
    assert loaded.ids == ids
    assert loaded.texts == texts


def test_chunked_save_round_trip(tmp_path, monkeypatch):
    """save() reads the device array back in row chunks (the tunneled
    runtime degrades on single bulk transfers — docstring). A 1 MB chunk
    size forces many chunks incl. a ragged tail; bf16 exercises the
    bits-view path per chunk."""
    import jax.numpy as jnp

    from sse_tpu.index.sharded_index import from_embeddings

    monkeypatch.setenv("SSE_SAVE_CHUNK_MB", "1")
    rng = np.random.default_rng(7)
    emb = rng.standard_normal((5000, 64), dtype=np.float32)
    ids = [f"i{k}" for k in range(5000)]
    idx = from_embeddings(emb, ids, ids, dtype=jnp.bfloat16)
    d = str(tmp_path / "chunked")
    idx.save(d)
    loaded = ShardedIndex.load(d)
    assert loaded.emb.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(loaded.emb), np.asarray(idx.emb)
    )
    assert loaded.ids == ids


def test_save_load_replicated_data_axis(tmp_path):
    """On a {data, model} mesh the index rows replicate across 'data';
    save() must write each row range ONCE (replica_id gate) and reload
    exactly."""
    import os

    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    emb = np.random.default_rng(0).standard_normal((100, 32)).astype(
        np.float32
    )
    ids = [str(i) for i in range(100)]
    idx = from_embeddings(emb, ids, ids, mesh=mesh, dtype=jnp.bfloat16)
    d = str(tmp_path / "dm")
    idx.save(d)
    with open(os.path.join(d, "sidecar.json")) as f:
        side = json.load(f)
    assert len(side["shards"]) == 2  # one per 'model' slice, not per device
    loaded = ShardedIndex.load(d, mesh=mesh)
    np.testing.assert_array_equal(
        np.asarray(loaded.emb), np.asarray(idx.emb)
    )


def test_sharded_query_equals_single_device(setup):
    vocab, tspace, model_cfg, params, tg = setup
    queries = ["gudi foso qefo", "zana bole", "xyzzy unknown words"]

    idx1 = build_index(params, model_cfg, tspace, mesh=None, batch_size=16)
    eng1 = QueryEngine(params, model_cfg, vocab, idx1, max_seq_length=L, k=5)
    res1 = eng1.query(queries)

    mesh = make_mesh(data=1, model=8)
    idx8 = build_index(params, model_cfg, tspace, mesh=mesh, batch_size=16)
    assert idx8.emb.sharding.spec[0] == "model"
    eng8 = QueryEngine(params, model_cfg, vocab, idx8, max_seq_length=L, k=5)
    res8 = eng8.query(queries)

    for a, b in zip(res1, res8):
        assert [h["targetId"] for h in a] == [h["targetId"] for h in b]
        np.testing.assert_allclose(
            [h["score"] for h in a], [h["score"] for h in b], rtol=1e-3
        )


def test_padding_rows_never_returned(setup):
    vocab, tspace, model_cfg, params, tg = setup
    # index with heavy padding: 3 real rows in 8-shard mesh → T_pad = 64
    emb = np.asarray(build_index(params, model_cfg, tspace).emb)[:3]
    mesh = make_mesh(data=1, model=8)
    tiny = from_embeddings(emb, tspace.ids[:3], tspace.texts[:3], mesh)
    eng = QueryEngine(params, model_cfg, vocab, tiny, max_seq_length=L, k=3)
    for hits in eng.query(["anything at all", ""]):
        assert all(h["row"] < 3 for h in hits)


def test_query_batch_larger_than_max_batch(setup):
    vocab, tspace, model_cfg, params, tg = setup
    idx = build_index(params, model_cfg, tspace, batch_size=16)
    eng = QueryEngine(
        params, model_cfg, vocab, idx, max_seq_length=L, max_batch=4, k=3
    )
    res = eng.query([f"query number {i}" for i in range(10)])
    assert len(res) == 10
    assert all(len(r) == 3 for r in res)


def test_http_api(setup):
    vocab, tspace, model_cfg, params, tg = setup
    idx = build_index(params, model_cfg, tspace, batch_size=16)
    eng = QueryEngine(params, model_cfg, vocab, idx, max_seq_length=L, k=5)
    server = serve_http(eng, port=0, block=False)
    port = server.server_address[1]
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/query?keywords=gudi+foso&n=3"
        ) as r:
            body = json.loads(r.read())
        assert body["query"] == "gudi foso"
        assert len(body["results"]) == 3
        assert {"targetId", "targetText", "score"} <= set(body["results"][0])
        # demo page
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            assert b"demo" in r.read().lower()
        # error paths
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/api/query")
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()
        server.server_close()


def test_bfloat16_index(setup, tmp_path):
    """bf16 index storage: same top-1 results, half the bytes, survives
    save/load and the TSV export."""
    import jax.numpy as jnp

    vocab, tspace, model_cfg, params, tg = setup
    idx32 = build_index(params, model_cfg, tspace, batch_size=16)
    idx16 = build_index(
        params, model_cfg, tspace, batch_size=16, dtype=jnp.bfloat16
    )
    assert idx16.emb.dtype == jnp.bfloat16
    e1 = QueryEngine(params, model_cfg, vocab, idx32, max_seq_length=L, k=3)
    e2 = QueryEngine(params, model_cfg, vocab, idx16, max_seq_length=L, k=3)
    q = ["gudi foso qefo", "zana bole"]
    for a, b in zip(e1.query(q), e2.query(q)):
        assert a[0]["targetId"] == b[0]["targetId"]
    d = str(tmp_path / "bf16idx")
    idx16.save(d)
    loaded = ShardedIndex.load(d)
    assert loaded.emb.dtype == jnp.bfloat16
    tsv = str(tmp_path / "bf16.tsv")
    idx16.export_tsv(tsv)
    assert ShardedIndex.import_tsv(tsv).num_real == idx16.num_real


def test_evaluate_against_index_matches_evaluator(setup):
    """Index-scale eval (fused/sharded path) == classic Evaluator."""
    from sse_tpu.data.corpus import encode_pairs
    from sse_tpu.data import synthetic
    from sse_tpu.evals import Evaluator, evaluate_against_index

    vocab, tspace, model_cfg, params, tg = setup
    _, ev_raw, _ = synthetic.make_corpus(
        task="ranking", num_targets=24, train_per_target=4, seed=9
    )
    ev = encode_pairs(vocab, ev_raw, tspace, L)

    classic = Evaluator(model_cfg, ev, tspace, batch_size=32, ks=(1, 10)).evaluate(params)

    mesh = make_mesh(data=1, model=8)
    idx = build_index(params, model_cfg, tspace, mesh=mesh, batch_size=16)
    at_scale = evaluate_against_index(
        params, model_cfg, ev, idx, ks=(1, 10), batch_size=32
    )
    assert at_scale == classic


def test_length_bucketing_same_results(setup):
    """Bucketed (short) query encode returns identical hits to full-width."""
    vocab, tspace, model_cfg, params, tg = setup
    idx = build_index(params, model_cfg, tspace, batch_size=16)
    eng = QueryEngine(params, model_cfg, vocab, idx, max_seq_length=48, k=3)
    short = ["gudi foso", "zana"]
    toks, lens = eng.encode_queries(short)
    assert toks.shape[1] <= 16  # bucketed well below max_seq_length=48
    res = eng.query(short)
    # same hits when bucketing is bypassed (full-width tokens)
    from sse_tpu.data.corpus import batch_encode

    full_t, full_l = batch_encode(vocab, short + [""] * 6, 48)
    v2, r2 = eng._fused(
        eng.params, eng.index.emb, jnp.asarray(full_t), jnp.asarray(full_l)
    )
    for i in range(2):
        assert res[i][0]["row"] == int(np.asarray(r2)[i, 0])


def test_micro_batcher_concurrent(setup):
    """Concurrent queries through the batcher: correct per-query results,
    and coalescing actually happens under load."""
    import threading

    from sse_tpu.serve import MicroBatcher

    vocab, tspace, model_cfg, params, tg = setup
    idx = build_index(params, model_cfg, tspace, batch_size=16)
    eng = QueryEngine(params, model_cfg, vocab, idx, max_seq_length=L,
                      max_batch=8, k=3)
    expected = {t: eng.query([t])[0][0]["targetId"]
                for t in ["gudi foso qefo", "zana bole", "deze kewo"]}
    batcher = MicroBatcher(eng)
    results = {}
    errors = []

    def worker(text):
        try:
            for _ in range(5):
                results[text] = batcher.query_one(text, timeout=60)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(t,)) for t in expected]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    for text, want in expected.items():
        assert results[text][0]["targetId"] == want
    stats = batcher.stats
    assert stats["queries"] == 15
    batcher.close()


def test_bulk_batch_tier(setup):
    """With bulk_batch configured, a bulk call returns the same hits as
    the small-tier engine, and the batcher drains a flooded queue into
    ONE device dispatch on the bulk tier."""
    from sse_tpu.serve import MicroBatcher

    vocab, tspace, model_cfg, params, tg = setup
    idx = build_index(params, model_cfg, tspace, batch_size=16)
    small = QueryEngine(params, model_cfg, vocab, idx, max_seq_length=L,
                        max_batch=4, k=3)
    bulk = QueryEngine(params, model_cfg, vocab, idx, max_seq_length=L,
                       max_batch=4, bulk_batch=16, k=3)
    assert bulk.max_dispatch == 16
    queries = [f"gudi foso {i}" for i in range(10)] + ["zana bole"] * 3
    want = small.query(queries)
    got = bulk.query(queries)  # pads to the 16-row tier in one call
    assert [[h["targetId"] for h in r] for r in got] == [
        [h["targetId"] for h in r] for r in want
    ]
    # a flooded queue drains past max_batch into the bulk tier
    batcher = MicroBatcher(bulk)
    res = batcher.query_many(queries, timeout=60)
    assert [r[0]["targetId"] for r in res] == [r[0]["targetId"] for r in want]
    assert batcher.stats["max_batch_seen"] > 4
    batcher.close()


def test_live_index_add(setup):
    """Grow a serving index in place: added docs become retrievable with
    NO recompilation (num_real is a runtime operand), padding exactness
    holds, capacity overflow raises."""
    vocab, tspace, model_cfg, params, tg = setup
    emb = np.asarray(build_index(params, model_cfg, tspace).emb)[:24]
    idx = from_embeddings(
        emb, tspace.ids, tspace.texts, capacity=32
    )
    eng = QueryEngine(params, model_cfg, vocab, idx, max_seq_length=L, k=3)
    new_text = "xylo qwerty uniquewords"
    before = eng.query([new_text])[0]
    assert all(h["targetText"] != new_text for h in before)
    n = eng.add_documents(["tNEW"], [new_text])
    assert n == 25
    after = eng.query([new_text])[0]
    assert after[0]["targetId"] == "tNEW"
    # rows beyond num_real still never returned
    assert all(h["row"] < 25 for h in after)
    # capacity guard
    cap = idx.capacity - idx.num_real
    with pytest.raises(ValueError):
        idx.add(np.zeros((cap + 1, 16), np.float32),
                [f"x{i}" for i in range(cap + 1)],
                ["t"] * (cap + 1))


def test_concurrent_add_and_query_http(setup):
    """Serving stress (VERDICT r1 item 8 + the ADVICE r1 race): concurrent
    POST /api/add and GET /api/query through the MicroBatcher must never
    error, never return padding rows, and never pair a grown num_real
    with a stale emb (zero-score phantom hits)."""
    import threading
    import urllib.error

    vocab, tspace, model_cfg, params, tg = setup
    emb = np.asarray(build_index(params, model_cfg, tspace).emb)[:24]
    idx = from_embeddings(emb, tspace.ids, tspace.texts, capacity=128)
    eng = QueryEngine(params, model_cfg, vocab, idx, max_seq_length=L, k=5)
    server = serve_http(eng, port=0, block=False)
    port = server.server_address[1]
    errors = []
    stop = threading.Event()

    def querier():
        while not stop.is_set():
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/api/query?keywords=gudi+foso",
                    timeout=30,
                ) as r:
                    body = json.loads(r.read())
                for h in body["results"]:
                    if h["row"] >= eng.index.capacity:
                        errors.append(f"padding row {h['row']}")
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e))

    threads = [threading.Thread(target=querier) for _ in range(3)]
    for t in threads:
        t.start()
    try:
        for i in range(20):
            payload = json.dumps(
                [{"targetId": f"add{i}", "targetText": f"fresh doc {i}"}]
            ).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/add",
                data=payload,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                assert json.loads(r.read())["added"] == 1
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=60)
        server.shutdown()
        server.server_close()
    assert not errors, errors[:5]
    assert eng.index.num_real == 44


def test_concurrent_bulk_and_single_http(setup):
    """Two-tier stress: concurrent bulk POSTs (ride the bulk tier) and
    single GETs (small tier) against live adds — no errors, consistent
    results, and bulk responses always carry one row list per query."""
    import threading

    vocab, tspace, model_cfg, params, tg = setup
    emb = np.asarray(build_index(params, model_cfg, tspace).emb)[:24]
    idx = from_embeddings(emb, tspace.ids, tspace.texts, capacity=128)
    eng = QueryEngine(params, model_cfg, vocab, idx, max_seq_length=L,
                      max_batch=4, bulk_batch=16, k=3)
    server = serve_http(eng, port=0, block=False)
    port = server.server_address[1]
    errors = []
    stop = threading.Event()

    def bulk_poster():
        while not stop.is_set():
            try:
                body = json.dumps(
                    {"queries": [f"gudi foso {i}" for i in range(12)]}
                ).encode()
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/api/query", data=body,
                    headers={"Content-Type": "application/json"},
                )
                with urllib.request.urlopen(req, timeout=60) as r:
                    out = json.loads(r.read())
                rows = out.get("results", [])
                if len(rows) != 12:
                    errors.append(f"bulk returned {len(rows)} rows")
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e))

    def single_getter():
        while not stop.is_set():
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/api/query?keywords=zana+bole",
                    timeout=60,
                ) as r:
                    json.loads(r.read())
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e))

    threads = [threading.Thread(target=bulk_poster) for _ in range(2)] + [
        threading.Thread(target=single_getter)
    ]
    for t in threads:
        t.start()
    try:
        for i in range(8):
            payload = json.dumps(
                [{"targetId": f"badd{i}", "targetText": f"bulk doc {i}"}]
            ).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/add", data=payload,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                assert json.loads(r.read())["added"] == 1
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=60)
        server.shutdown()
        server.server_close()
    assert not errors, errors[:5]


def test_engine_k_regrows_after_add(setup):
    """An engine started on a tiny index clamps k, but must raise it back
    toward the originally requested k as add_documents grows the index
    (ADVICE.md r1: the clamp used to be permanent)."""
    vocab, tspace, model_cfg, params, tg = setup
    emb = np.asarray(build_index(params, model_cfg, tspace).emb)[:2]
    idx = from_embeddings(emb, tspace.ids[:2], tspace.texts[:2], capacity=16)
    eng = QueryEngine(params, model_cfg, vocab, idx, max_seq_length=L, k=5)
    assert eng.k == 2
    assert len(eng.query(["whatever"])[0]) == 2
    eng.add_documents(
        [f"n{i}" for i in range(6)], [f"brand new doc {i}" for i in range(6)]
    )
    assert eng.k == 5  # back to the requested k
    hits = eng.query(["brand new doc 3"])[0]
    assert len(hits) == 5
    # the added docs (near-identical texts, untrained params → near-ties
    # among themselves) outrank the two unrelated originals
    assert hits[0]["targetId"].startswith("n")


def test_live_index_add_sharded_mesh(setup):
    """Live add under a {model: 8} mesh: rows crossing shard boundaries
    become retrievable, the P('model', None) sharding survives add(), and
    sharded results equal an unsharded engine over the same rows
    (VERDICT.md r1 item 7)."""
    vocab, tspace, model_cfg, params, tg = setup
    full = np.asarray(build_index(params, model_cfg, tspace).emb)[:24]
    mesh = make_mesh(data=1, model=8)
    # capacity 64 → 8 rows/shard; start with 14 real rows, then add 10 →
    # rows 14..23 span shards 1 and 2 (the update crosses a shard boundary)
    idx = from_embeddings(
        full[:14], tspace.ids[:14], tspace.texts[:14], mesh, capacity=64
    )
    eng = QueryEngine(params, model_cfg, vocab, idx, max_seq_length=L, k=5)
    eng.add_documents(tspace.ids[14:24], tspace.texts[14:24])
    assert idx.num_real == 24
    assert idx.emb.sharding.spec[0] == "model"  # sharding survived add()
    ref_idx = from_embeddings(full, tspace.ids[:24], tspace.texts[:24])
    ref_eng = QueryEngine(
        params, model_cfg, vocab, ref_idx, max_seq_length=L, k=5
    )
    queries = [tspace.texts[21], tspace.texts[23], "gudi foso"]
    for a, b in zip(eng.query(queries), ref_eng.query(queries)):
        assert [h["targetId"] for h in a] == [h["targetId"] for h in b]


def test_http_stats_and_metrics(setup):
    """GET /api/stats (JSON) and /metrics (Prometheus text) reflect served
    traffic: counters move, latency percentiles populate, index size is
    exported (sse_tpu.serve.stats)."""
    vocab, tspace, model_cfg, params, tg = setup
    idx = build_index(params, model_cfg, tspace, batch_size=16)
    eng = QueryEngine(params, model_cfg, vocab, idx, max_seq_length=L, k=3)
    server = serve_http(eng, port=0, block=False)
    port = server.server_address[1]
    try:
        for i in range(3):
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/query?keywords=q{i}"
            ).read()
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/stats"
        ) as r:
            snap = json.loads(r.read())
        assert snap["requests"] == 3
        assert snap["queries"] == 3
        assert snap["errors"] == 0
        assert snap["latency_p50_ms"] > 0
        assert snap["latency_window"] == 3
        assert snap["index_num_targets"] == idx.num_real
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        assert "# TYPE sse_requests counter" in text
        assert "sse_requests 3" in text
        assert "# TYPE sse_latency_p50_ms gauge" in text
        assert f"sse_index_num_targets {idx.num_real}" in text
    finally:
        server.shutdown()
        server.server_close()


def _delete_reference(n, doomed_rows):
    """Model of swap-with-last semantics: returns surviving ORIGINAL row
    ids in final position order."""
    rows = list(range(n))
    end = n
    for r in sorted(doomed_rows, reverse=True):
        end -= 1
        if end > r:
            rows[r] = rows[end]
        del rows[end]
    return rows


def test_index_delete_swap_semantics():
    """delete() removes rows by swap-with-last: exercise single, adjacent,
    at-end, and bulk patterns against the positional model, checking emb
    rows and sidecars move together."""
    from sse_tpu.index.sharded_index import from_embeddings

    rng = np.random.default_rng(0)
    for doomed in ([3], [7], [2, 3], [1, 3], [6, 7], [0, 4, 5, 6], list(range(8))):
        emb = rng.normal(size=(8, 4)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        idx = from_embeddings(
            emb, [f"id{i}" for i in range(8)], [f"t{i}" for i in range(8)]
        )
        got_n = idx.delete([f"id{r}" for r in doomed])
        want = _delete_reference(8, doomed)
        assert got_n == idx.num_real == len(want)
        assert idx.ids[: idx.num_real] == [f"id{r}" for r in want]
        assert idx.texts[: idx.num_real] == [f"t{r}" for r in want]
        np.testing.assert_allclose(
            np.asarray(idx.emb)[: idx.num_real], emb[want], rtol=1e-6
        )
        # sidecar lists shrank (stale tails can't resurface via add())
        assert len(idx.ids) == len(idx.texts) == idx.num_real


def test_index_delete_errors_and_add_after_delete():
    from sse_tpu.index.sharded_index import from_embeddings

    rng = np.random.default_rng(1)
    emb = rng.normal(size=(6, 4)).astype(np.float32)
    idx = from_embeddings(
        emb, [f"id{i}" for i in range(6)], [f"t{i}" for i in range(6)],
        capacity=8,
    )
    with pytest.raises(KeyError):
        idx.delete(["nope"])
    with pytest.raises(ValueError):
        idx.delete(["id1", "id1"])
    idx.delete(["id2"])
    # freed capacity is reusable; the new doc lands after the survivors
    idx.add(emb[:1], ["fresh"], ["fresh text"])
    assert idx.num_real == 6
    assert idx.ids[5] == "fresh"


def test_index_delete_on_mesh():
    from sse_tpu.index.sharded_index import from_embeddings

    rng = np.random.default_rng(2)
    emb = rng.normal(size=(16, 4)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    mesh = make_mesh(data=1, model=8)
    idx = from_embeddings(
        emb, [f"id{i}" for i in range(16)], [f"t{i}" for i in range(16)], mesh
    )
    from jax.sharding import PartitionSpec as P

    idx.delete(["id3", "id12"])  # cross-shard swap
    assert idx.num_real == 14
    assert idx.emb.sharding.spec == P("model", None)
    want = _delete_reference(16, [3, 12])
    np.testing.assert_allclose(
        np.asarray(idx.emb)[:14], emb[want], rtol=1e-6
    )


def test_engine_delete_documents(setup):
    """Deleted documents never come back from query(); the swapped
    survivor still does."""
    vocab, tspace, model_cfg, params, tg = setup
    idx = build_index(params, model_cfg, tspace, batch_size=16)
    eng = QueryEngine(params, model_cfg, vocab, idx, max_seq_length=L, k=5)
    victim_text = tspace.texts[0]
    victim_id = tspace.ids[0]
    hits = eng.query([victim_text])[0]
    assert hits[0]["targetId"] == victim_id  # sanity: self-retrieval
    eng.delete_documents([victim_id])
    hits = eng.query([victim_text])[0]
    assert all(h["targetId"] != victim_id for h in hits)
    # every other doc remains retrievable
    other = eng.query([tspace.texts[5]])[0]
    assert other[0]["targetId"] == tspace.ids[5]


def test_http_delete_endpoint(setup):
    vocab, tspace, model_cfg, params, tg = setup
    idx = build_index(params, model_cfg, tspace, batch_size=16)
    eng = QueryEngine(params, model_cfg, vocab, idx, max_seq_length=L, k=3)
    server = serve_http(eng, port=0, block=False)
    port = server.server_address[1]
    try:
        n0 = idx.num_real
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/delete",
            data=json.dumps([tspace.ids[1]]).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            body = json.loads(r.read())
        assert body == {"deleted": 1, "num_targets": n0 - 1}
        # unknown id → 400
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/delete",
            data=json.dumps(["missing-id"]).encode(),
            method="POST",
        )
        try:
            urllib.request.urlopen(req)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        server.server_close()


def test_http_save_endpoint(setup, tmp_path):
    """POST /api/save persists live adds/deletes; a reload sees them."""
    vocab, tspace, model_cfg, params, tg = setup
    idx = build_index(params, model_cfg, tspace, batch_size=16, capacity=80)
    eng = QueryEngine(params, model_cfg, vocab, idx, max_seq_length=L, k=3)
    d = str(tmp_path / "live-index")
    server = serve_http(eng, port=0, block=False, index_dir=d)
    port = server.server_address[1]
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/add",
            data=json.dumps(
                [{"targetId": "fresh1", "targetText": "totally new doc"}]
            ).encode(),
            method="POST",
        )
        urllib.request.urlopen(req).read()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/delete",
            data=json.dumps([tspace.ids[0]]).encode(),
            method="POST",
        )
        urllib.request.urlopen(req).read()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/save", data=b"", method="POST"
        )
        with urllib.request.urlopen(req) as r:
            body = json.loads(r.read())
        assert body["num_targets"] == idx.num_real
        back = ShardedIndex.load(d)
        assert back.num_real == idx.num_real
        assert "fresh1" in back.ids
        assert tspace.ids[0] not in back.ids[: back.num_real]
    finally:
        server.shutdown()
        server.server_close()


def test_http_save_without_index_dir(setup):
    vocab, tspace, model_cfg, params, tg = setup
    idx = build_index(params, model_cfg, tspace, batch_size=16)
    eng = QueryEngine(params, model_cfg, vocab, idx, max_seq_length=L, k=3)
    server = serve_http(eng, port=0, block=False)  # no index_dir
    port = server.server_address[1]
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/save", data=b"", method="POST"
        )
        try:
            urllib.request.urlopen(req)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        server.server_close()


def test_concurrent_add_delete_query_http(setup):
    """Mixed live mutations under load: interleaved POST /api/add and
    /api/delete against concurrent queries must never crash a row lookup
    or surface a torn snapshot (delete shrinks the sidecar lists — with
    field-by-field reads a racing query could index past them; the index
    publishes (emb, num_real, ids, texts) atomically instead)."""
    import threading
    import urllib.error

    vocab, tspace, model_cfg, params, tg = setup
    emb = np.asarray(build_index(params, model_cfg, tspace).emb)[:24]
    idx = from_embeddings(emb, tspace.ids, tspace.texts, capacity=128)
    eng = QueryEngine(params, model_cfg, vocab, idx, max_seq_length=L, k=5)
    server = serve_http(eng, port=0, block=False)
    port = server.server_address[1]
    errors = []
    stop = threading.Event()

    def querier():
        while not stop.is_set():
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/api/query?keywords=gudi+foso",
                    timeout=30,
                ) as r:
                    body = json.loads(r.read())
                for h in body["results"]:
                    if h["row"] >= eng.index.capacity:
                        errors.append(f"padding row {h['row']}")
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e))

    threads = [threading.Thread(target=querier) for _ in range(3)]
    for t in threads:
        t.start()
    try:
        for i in range(12):
            payload = json.dumps(
                [{"targetId": f"churn{i}", "targetText": f"churn doc {i}"}]
            ).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/add", data=payload
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                assert json.loads(r.read())["added"] == 1
            if i % 2:  # delete the previous churn doc AND an original row
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/api/delete",
                    data=json.dumps(
                        [f"churn{i - 1}", tspace.ids[i]]
                    ).encode(),
                )
                with urllib.request.urlopen(req, timeout=30) as r:
                    assert json.loads(r.read())["deleted"] == 2
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=60)
        server.shutdown()
        server.server_close()
    assert not errors, errors[:5]
    # 24 originals + 12 adds - 12 deletes
    assert eng.index.num_real == 24
    # deleted ids are gone; survivors remain queryable
    live = set(eng.index.ids[: eng.index.num_real])
    assert "churn0" not in live and tspace.ids[1] not in live
    assert "churn11" in live  # odd-numbered churn docs survive


def test_http_hot_reload(tmp_path):
    """POST /api/reload: the server swaps in whatever is ON DISK in
    model_dir (latest checkpoint + saved index) without restarting —
    live adds persisted via /api/save survive a reload; unsaved live
    mutations are discarded (disk is the source of truth)."""
    from sse_tpu.configs import preset
    from sse_tpu.workspace import Workspace

    data = str(tmp_path / "data")
    tr, ev, tg = synthetic.make_corpus(
        task="ranking", num_targets=8, train_per_target=6, seed=5
    )
    synthetic.write_corpus(data, tr, ev, tg)
    cfg = preset(
        "ranking", vocab_size=300, max_seq_length=L, embed_dim=16,
        hidden=16, encoding_dim=16, batch_size=16, max_epochs=2,
        steps_per_checkpoint=1000, num_negatives=8, num_hard_negatives=0,
    )
    ws = Workspace.create(str(tmp_path / "model"), cfg)
    ws.train(data)
    ws.build_index(data, capacity=32)
    eng = ws.engine(k=3)
    server = serve_http(
        eng, port=0, block=False,
        index_dir=ws.index_dir, model_dir=ws.model_dir,
    )
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        def post(path, payload=None):
            req = urllib.request.Request(
                base + path, data=json.dumps(payload).encode()
                if payload is not None else b"",
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                return json.loads(r.read())

        # add + SAVE → reload keeps the doc (it's on disk)
        assert post(
            "/api/add",
            [{"targetId": "hot1", "targetText": "persisted live doc"}],
        )["added"] == 1
        post("/api/save")
        # add WITHOUT save → reload discards it
        assert post(
            "/api/add",
            [{"targetId": "volatile", "targetText": "unsaved live doc"}],
        )["num_targets"] == 10
        out = post("/api/reload")
        assert out["num_targets"] == 9  # 8 originals + hot1, no volatile
        with urllib.request.urlopen(
            base + "/api/query?keywords=persisted+live+doc", timeout=60
        ) as r:
            hits = json.loads(r.read())["results"]
        ids = {h["targetId"] for h in hits}
        assert "volatile" not in ids
        with urllib.request.urlopen(base + "/api/stats", timeout=60) as r:
            assert json.loads(r.read())["reloads"] == 1
    finally:
        server.shutdown()
        server.server_close()


def test_http_batch_query(setup):
    """POST /api/query with a list body returns per-query result lists
    in order (bulk-client path: one device batch, not N round trips)."""
    vocab, tspace, model_cfg, params, tg = setup
    idx = build_index(params, model_cfg, tspace, batch_size=16)
    eng = QueryEngine(params, model_cfg, vocab, idx, max_seq_length=L, k=3)
    server = serve_http(eng, port=0, block=False)
    port = server.server_address[1]
    try:
        texts = [tspace.texts[i] for i in (0, 3, 7, 11, 19)]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/query",
            data=json.dumps(texts).encode(),
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())["results"]
        assert len(out) == len(texts)
        for hits in out:
            assert len(hits) == 3 and {"targetId", "score"} <= hits[0].keys()
        # querying a target's own text should rank that target first
        assert out[0][0]["targetId"] == tspace.ids[0]
        # dict form + error form
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/query",
            data=json.dumps({"queries": texts[:2]}).encode(),
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            assert len(json.loads(r.read())["results"]) == 2
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/query", data=b"[]"
        )
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, "empty list must 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        server.server_close()


def test_index_delete_zeros_vacated_rows():
    """Vacated rows [new_num_real, old_num_real) must be ZERO vectors
    after delete(): stale vectors would persist into save() output and
    break the kernel's zero-reserve-row block-gate premise (r2 advisor)."""
    from sse_tpu.index.sharded_index import from_embeddings

    rng = np.random.default_rng(3)
    for doomed in (["id3"], ["id7"], ["id2", "id5"], [f"id{i}" for i in range(8)]):
        emb = rng.normal(size=(8, 4)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        idx = from_embeddings(
            emb, [f"id{i}" for i in range(8)], [f"t{i}" for i in range(8)],
            capacity=16,
        )
        idx.delete(doomed)
        tail = np.asarray(idx.emb)[idx.num_real :]
        np.testing.assert_array_equal(tail, 0)


def test_http_body_hardening(setup):
    """Oversized bodies 413 (rejected BEFORE the body is read), wrong
    content type 415, mutation batches bounded, and the server keeps
    serving afterwards (r2 verdict item 7)."""
    import http.client

    from sse_tpu.serve.http import MAX_BODY_BYTES, MAX_DOCS_PER_REQUEST

    vocab, tspace, model_cfg, params, tg = setup
    idx = build_index(params, model_cfg, tspace, batch_size=16)
    eng = QueryEngine(params, model_cfg, vocab, idx, max_seq_length=L, k=3)
    server = serve_http(eng, port=0, block=False)
    port = server.server_address[1]
    try:
        # 413 from the Content-Length header alone — no body is sent, so
        # a timely response proves the server never tried to read it
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.putrequest("POST", "/api/add")
        conn.putheader("Content-Type", "application/json")
        conn.putheader("Content-Length", str(MAX_BODY_BYTES + 1))
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 413
        conn.close()

        # wrong content type → 415 (x-www-form-urlencoded is tolerated as
        # the urllib/curl default; text/plain is not)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/query",
            data=b"keywords=abc",
            headers={"Content-Type": "text/plain"},
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected 415"
        except urllib.error.HTTPError as e:
            assert e.code == 415

        # mutation batch bound → 413
        too_many = json.dumps(
            [f"id{i}" for i in range(MAX_DOCS_PER_REQUEST + 1)]
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/delete", data=too_many
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected 413"
        except urllib.error.HTTPError as e:
            assert e.code == 413

        # the server still serves after every rejection
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/query?keywords=gudi+foso&n=1",
            timeout=60,
        ) as r:
            assert len(json.loads(r.read())["results"]) == 1
    finally:
        server.shutdown()
        server.server_close()


def test_batcher_query_many_single_deadline():
    """query_many's timeout bounds the WHOLE call, not each item
    (r2 advisor: per-item waits let bulk calls block len*timeout)."""
    import time as _time

    from sse_tpu.serve.batcher import MicroBatcher

    class SlowEngine:
        max_batch = 1
        max_dispatch = 1  # the dispatch loop reads THIS attr (r3 judge:
        # a double missing it killed the worker thread and this test then
        # passed for the wrong reason — dead worker, not deadline logic)

        def query(self, texts):
            _time.sleep(0.25)
            return [[{"targetId": "x", "score": 1.0}] for _ in texts]

    mb = MicroBatcher(SlowEngine())
    try:
        t0 = _time.monotonic()
        with pytest.raises(TimeoutError):
            # 8 items through a max_dispatch=1 engine at 0.25 s each would
            # take 2 s; a 0.6 s whole-call deadline must fire LONG before
            # the per-item interpretation's 8 * 0.6 = 4.8 s
            mb.query_many([f"q{i}" for i in range(8)], timeout=0.6)
        assert _time.monotonic() - t0 < 1.5
        # the worker must be ALIVE — a deadline that fires because the
        # dispatch thread died is a false pass (double-drift guard)
        assert mb._thread.is_alive()
        # and after the deadline the batcher still serves new queries
        assert mb.query_one("late", timeout=5.0)[0]["targetId"] == "x"
    finally:
        mb.close()


def test_batcher_survives_engine_crash():
    """An engine that raises — even from the attribute access the dispatch
    loop does BEFORE engine.query — must fail that batch's waiters with
    the exception and leave the worker thread alive for later queries
    (r3 judge: the max_dispatch read sat outside the try block, so any
    exception there permanently bricked serving)."""
    from sse_tpu.serve.batcher import MicroBatcher

    class BipolarEngine:
        max_batch = 4

        def __init__(self):
            self.calls = 0

        @property
        def max_dispatch(self):
            self.calls += 1
            if self.calls == 1:  # crash in the PRE-query drain phase
                raise RuntimeError("boom in attribute access")
            return 4

        def query(self, texts):
            if self.calls == 2:  # crash in the query phase
                raise RuntimeError("boom in query")
            return [[{"targetId": "ok", "score": 1.0}] for _ in texts]

    mb = MicroBatcher(BipolarEngine())
    try:
        for expected in ("boom in attribute access", "boom in query"):
            with pytest.raises(RuntimeError, match=expected):
                mb.query_one("q", timeout=5.0)
            assert mb._thread.is_alive()
        # third call: engine healthy again, same worker thread serves it
        assert mb.query_one("q", timeout=5.0)[0]["targetId"] == "ok"
        assert mb._thread.is_alive()
    finally:
        mb.close()


def test_evaluator_sampled_targets(setup):
    """sample_targets: (a) covering the whole space == full eval,
    (b) a strict subset always contains every label row so recall is a
    well-defined optimistic bound, (c) returned rows are GLOBAL."""
    from sse_tpu.data import synthetic
    from sse_tpu.evals import Evaluator

    vocab, tspace, model_cfg, params, tg = setup
    _, ev_raw, _ = synthetic.make_corpus(
        task="ranking", num_targets=24, train_per_target=4, seed=9
    )
    # restrict eval rows to a handful of targets so a strict subset of
    # the 24-target space exists (labels are ALWAYS kept in the sample)
    few = {"t00000", "t00001", "t00002", "t00003"}
    ev_raw = [(s, tids) for s, tids in ev_raw if set(tids) & few][:12]
    ev = encode_pairs(vocab, ev_raw, tspace, L)
    full = Evaluator(model_cfg, ev, tspace, batch_size=32, ks=(1, 5))
    covering = Evaluator(
        model_cfg, ev, tspace, batch_size=32, ks=(1, 5), sample_targets=24
    )
    assert covering._subset is None  # sample >= space → no-op
    sub = Evaluator(
        model_cfg, ev, tspace, batch_size=32, ks=(1, 5), sample_targets=20
    )
    assert sub._subset is not None and len(sub._subset) == 20
    label_rows = {r for s in ev.label_sets for r in s}
    assert label_rows <= set(sub._subset.tolist())
    r_full = full.evaluate(params)
    r_sub = sub.evaluate(params)
    assert r_sub["recall@1"] >= r_full["recall@1"] - 1e-9  # optimistic bound
    rows = sub.top_rows(params)
    assert set(np.unique(rows)) <= set(sub._subset.tolist())


def test_chunked_kernel_dispatch_matches_unchunked(setup):
    """Batches above MAX_KERNEL_BATCH are scored in chunks inside the
    jitted program (the measured B=1024 fix); results must equal the
    single-dispatch program."""
    import sse_tpu.serve.engine as engine_mod
    from sse_tpu.serve.engine import build_fused_query_fn

    vocab, tspace, model_cfg, params, tg = setup
    idx = build_index(params, model_cfg, tspace, batch_size=16)
    rng = np.random.default_rng(4)
    tokens = jnp.asarray(rng.integers(2, 60, size=(12, 10)), jnp.int32)
    lengths = jnp.full((12,), 10, jnp.int32)
    ref_fn = build_fused_query_fn(model_cfg, k=3, num_real=idx.num_real)
    rv, ri = ref_fn(params, idx.emb, tokens, lengths)
    old = engine_mod.MAX_KERNEL_BATCH
    engine_mod.MAX_KERNEL_BATCH = 5  # force 3 chunks (12 = 5+5+2)
    try:
        ch_fn = build_fused_query_fn(model_cfg, k=3, num_real=idx.num_real)
        cv, ci = ch_fn(params, idx.emb, tokens, lengths)
    finally:
        engine_mod.MAX_KERNEL_BATCH = old
    np.testing.assert_array_equal(np.asarray(ci), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(cv), np.asarray(rv), rtol=1e-6)


def test_twophase_engine_dispatch_matches_chunked(setup, monkeypatch):
    """Large batches route to the two-phase block-max kernel in one
    dispatch (r5); results must be bit-identical to the chunked
    streaming path, unsharded AND on a {model: 2} mesh (which pins the
    global-row lifting and per-shard num_real clipping)."""
    import sse_tpu.ops.fused_topk as ft
    from sse_tpu.serve.engine import build_fused_query_fn

    vocab, tspace, model_cfg, params, tg = setup
    d = model_cfg.encoding_dim
    t = 8192
    rng = np.random.default_rng(7)
    emb = rng.normal(size=(t, d)).astype(np.float32)
    emb = jnp.asarray(emb / np.linalg.norm(emb, axis=1, keepdims=True))
    num_real = t - 100
    b, k = 16, 5
    tokens = jnp.asarray(rng.integers(2, 60, size=(b, 10)), jnp.int32)
    lengths = jnp.full((b,), 10, jnp.int32)

    common = dict(use_pallas=True, interpret=True)
    # reference: two-phase disabled (min-batch gate above b)
    ref_fn = build_fused_query_fn(
        model_cfg, k=k, num_real=num_real, **common
    )
    rv, ri = ref_fn(params, emb, tokens, lengths)

    # two-phase engaged: gate below b → pick returns the largest
    # feasible block with nb ≥ k (1024 here: nb=8 ≥ 5)
    monkeypatch.setattr(ft, "_TWOPHASE_MIN_BATCH", 8)
    assert ft.pick_twophase_block_t(t, b, k, d, 4) == 1024
    tp_fn = build_fused_query_fn(
        model_cfg, k=k, num_real=num_real, **common
    )
    tv, ti = tp_fn(params, emb, tokens, lengths)
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(tv), np.asarray(rv))

    # sharded: index rows over 'model' (per-shard t=4096, bt=512, nb=8)
    mesh = make_mesh(data=1, model=2)
    sh_fn = build_fused_query_fn(
        model_cfg, k=k, num_real=num_real, mesh=mesh, **common
    )
    sv, si = sh_fn(params, emb, tokens, lengths)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(rv))
