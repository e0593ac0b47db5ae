"""Sharded device-resident target-embedding index.

Design (SURVEY.md §2.2 index-parallelism row; §3.2 build mapping):

  * embeddings: [T_pad, D] float32, L2-normalized rows, sharded
    ``P('model', None)`` — T_pad rounds T up to the shard count (and a lane
    multiple) so every shard holds an equal static block;
  * padding rows carry a validity mask; scoring masks them to -inf before
    top-k, so exactness is unaffected;
  * id/text sidecar stays on host (strings are not device data);
  * build = the target tower pjit-batched over the corpus, written shard-
    by-shard — "index docs/sec" (BASELINE.json metric) measures this path;
  * persistence: Orbax checkpoint (sharded arrays native) + sidecar JSON;
    `export_tsv`/`import_tsv` speak the reference's
    ``targetEncodingIndex.tsv`` (id \\t text \\t space-joined floats).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sse_tpu.data.corpus import TargetSpace
from sse_tpu.models import sse
from sse_tpu.models.sse import NetworkMode, SSEConfig


def _esc(s: str) -> str:
    """docs.tsv field escape: source TSVs cannot contain tabs/newlines in
    fields, but live add() accepts arbitrary strings over HTTP. '\\r' is
    escaped too (and reads use newline='\\n'): a raw carriage return
    would otherwise split one row into two under universal newlines,
    misaligning every later row against its embedding."""
    return (
        s.replace("\\", "\\\\")
        .replace("\t", "\\t")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


def _unesc(s: str) -> str:
    out, i, n = [], 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            out.append(
                {"t": "\t", "n": "\n", "r": "\r", "\\": "\\"}.get(nxt, nxt)
            )
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


INT8_SCALE = 127  # L2-normalized rows live in [-1, 1]; symmetric int8


def quantize_rows(x, dtype):
    """Cast L2-normalized embedding rows to the index storage dtype.

    float dtypes: plain cast. int8: symmetric quantization at scale 127
    (a plain astype would truncate [-1, 1] values to 0). Scores computed
    against an int8 index accumulate exactly in int32 on the MXU and are
    rescaled by 1/127^2, so returned values stay cosine-comparable."""
    x = jnp.asarray(x)
    if jnp.dtype(dtype) == jnp.int8:
        return jnp.clip(jnp.round(x * INT8_SCALE), -127, 127).astype(jnp.int8)
    return x.astype(dtype)


def _swap_row_impl(e, frm, to):
    return jax.lax.dynamic_update_slice(
        e, jax.lax.dynamic_slice(e, (frm, 0), (1, e.shape[1])), (to, 0)
    )


# delete()'s row swap, jitted ONCE at module scope (a per-call jit would
# retrace/recompile on every HTTP delete). The donating variant lets XLA
# alias the update in place for intermediate buffers no reader can hold.
_swap_row = jax.jit(_swap_row_impl)
_swap_row_donating = jax.jit(_swap_row_impl, donate_argnums=(0,))


def _zero_rows_impl(e, lo, hi):
    row = jnp.arange(e.shape[0])[:, None]
    return jnp.where(
        (row >= lo) & (row < hi), jnp.zeros((), e.dtype), e
    )


# delete()'s vacated-row zeroing (one batched pass over [end, old_num_real)):
# without it, deleted vectors and survivor duplicates persist in padding
# rows — written to disk by save(), and breaking the zero-row premise the
# Pallas kernel's reserve-block gate relies on (r2 advisor finding).
_zero_rows = jax.jit(_zero_rows_impl)
_zero_rows_donating = jax.jit(_zero_rows_impl, donate_argnums=(0,))


@dataclasses.dataclass
class ShardedIndex:
    emb: jax.Array  # [T_pad, D] float32, P('model', None) when mesh given
    num_real: int  # first num_real rows are valid
    ids: List[str]
    texts: List[str]
    mesh: Optional[Mesh] = None
    # atomically-published (emb, num_real, ids, texts) for lock-free
    # readers (the serving engine): mutators build the new state and
    # assign this ONE attribute last, so a concurrent query can never
    # pair a new embedding buffer with an old row count or vice versa
    # (r1 advisor finding; delete() makes torn reads actively dangerous —
    # a shrunken ids list with the old num_real would crash lookups)
    pub: tuple = dataclasses.field(init=False, repr=False, default=None)

    def __post_init__(self):
        self._publish()

    def _publish(self) -> None:
        self.pub = (self.emb, self.num_real, self.ids, self.texts)

    @property
    def dim(self) -> int:
        return int(self.emb.shape[1])

    @property
    def padded_size(self) -> int:
        return int(self.emb.shape[0])

    def valid_mask(self) -> jax.Array:
        """[T_pad] bool — False on padding rows."""
        return jnp.arange(self.padded_size) < self.num_real

    def lookup(self, rows: Sequence[int]) -> List[Tuple[str, str]]:
        """Global row indices → (target_id, target_text)."""
        return [(self.ids[r], self.texts[r]) for r in rows]

    @property
    def capacity(self) -> int:
        return self.padded_size

    def add(
        self,
        emb_rows: np.ndarray,  # [n, D] (will be L2-normalized)
        ids: Sequence[str],
        texts: Sequence[str],
    ) -> None:
        """Append documents into padding capacity — live index growth with
        NO recompile of the serving program (num_real is a runtime operand
        of the fused query fn). Raises when capacity is exhausted; build
        with from_embeddings(..., capacity=...) to reserve headroom.
        For removal see delete() (swap-with-last; tombstoning rows is not
        supported — a zeroed row would still score 0 and could outrank
        true negatives)."""
        n = emb_rows.shape[0]
        if self.num_real + n > self.capacity:
            raise ValueError(
                f"index full: {self.num_real}+{n} > capacity {self.capacity}"
            )
        rows = np.asarray(emb_rows, np.float32)
        rows = rows / np.maximum(
            np.linalg.norm(rows, axis=1, keepdims=True), 1e-6
        )
        update = quantize_rows(rows, self.emb.dtype)
        # NOT donated: a concurrent in-flight query may still hold the old
        # buffer (the serving engine reads index.emb without a lock); the
        # copy costs one index-sized HBM pass per add() call.
        new_emb = jax.jit(
            lambda e, u, at: jax.lax.dynamic_update_slice(e, u, (at, 0))
        )(self.emb, update, jnp.int32(self.num_real))
        if self.mesh is not None:  # keep the row sharding stable
            new_emb = jax.device_put(
                new_emb, NamedSharding(self.mesh, P("model", None))
            )
        self.emb = new_emb
        # in-place extends are safe for holders of the PREVIOUS snapshot
        # (they only index rows < their num_real); the new state becomes
        # visible to readers only at the publish below
        self.ids.extend(ids)
        self.texts.extend(texts)
        self.num_real += n
        self._publish()

    def delete(self, target_ids: Sequence[str]) -> int:
        """Live document removal by SWAP-WITH-LAST: each deleted row is
        overwritten by the current last real row and num_real shrinks —
        O(1) device work per delete, exactness and the serving program
        both untouched (num_real is a runtime operand, so no recompile).
        Row order is NOT stable across deletes (the sidecar id/text lists
        move with the rows, so results stay correct). Returns the new
        num_real; raises KeyError on an unknown id.

        Concurrency: the sidecar lists are REPLACED (not mutated), and
        the whole new state is published atomically via `pub` — a racing
        query sees either the fully-old or the fully-new index, never a
        torn mix (a shrunken ids list against the old num_real would
        crash row lookups)."""
        id_pos = {tid: r for r, tid in enumerate(self.ids[: self.num_real])}
        rows = []
        for tid in target_ids:
            if tid not in id_pos:
                raise KeyError(f"unknown target id: {tid}")
            rows.append(id_pos[tid])
        if len(set(rows)) != len(rows):
            raise ValueError("duplicate target ids in delete()")

        new_ids = list(self.ids)
        new_texts = list(self.texts)
        emb = self.emb
        # Descending-order processing keeps the invariant that after j
        # deletions, position num_real-1-j is always a SURVIVOR: every
        # doomed row above it was either physically deleted already or is
        # exactly the row being processed (end == r, no swap needed).
        # The FIRST swap copies the buffer (readers holding the published
        # snapshot keep a valid emb); later swaps hit the donating variant,
        # which XLA aliases in place — one full copy per delete() call,
        # then O(rows) device work, and the module-level jits mean no
        # per-call retrace (both r2.5 review findings).
        end = self.num_real
        for r in sorted(rows, reverse=True):
            end -= 1
            if end > r:
                fn = _swap_row if emb is self.emb else _swap_row_donating
                emb = fn(emb, jnp.int32(end), jnp.int32(r))
                new_ids[r] = new_ids[end]
                new_texts[r] = new_texts[end]
            # shrink the sidecar so stale entries can't resurface via add()
            del new_ids[end]
            del new_texts[end]
        if end < self.num_real:
            # zero the vacated rows [end, old_num_real): masking keeps
            # queries exact either way, but stale vectors would persist
            # into save() output and defeat the kernel's zero-reserve-row
            # block gate that build_index/from_embeddings guarantee
            fn = _zero_rows if emb is self.emb else _zero_rows_donating
            emb = fn(emb, jnp.int32(end), jnp.int32(self.num_real))
        if self.mesh is not None:  # keep the row sharding stable
            emb = jax.device_put(
                emb, NamedSharding(self.mesh, P("model", None))
            )
        self.emb = emb
        self.num_real = end
        self.ids = new_ids
        self.texts = new_texts
        self._publish()
        return self.num_real

    # ------------------------------------------------------------ persist
    def save(self, directory: str) -> None:
        """Persist the index: per-shard ``emb_*.npy`` + ``docs.tsv`` +
        a small ``sidecar.json``.

        The first format used Orbax for the embedding matrix and put
        ids/texts into the sidecar JSON. At 10M rows that is the
        dominant cost of the whole `index` CLI (measured 137–217 s of a
        ~180 s build — and a 10M-string JSON serializes for tens of
        seconds). The device→host readback is CHUNKED (row slices of
        ``SSE_SAVE_CHUNK_MB``, default 16): on the tunneled runtime a
        single bulk transfer DEGRADES with message size (128 MB moves at
        ~2.5 MB/s, 1.28 GB at ~1.1 MB/s — a 20-minute save at 10M rows,
        measured r3), while chunked reads sustain ~9 MB/s; on
        directly-attached hosts chunking costs nothing. Each chunk lands
        straight in an open_memmap'd .npy, so peak host memory is one
        chunk.

        Multi-process: every process writes only ITS device shards
        (``replica_id == 0`` dedups replicated layouts), file names are
        keyed by GLOBAL row offset so the layout is mesh-independent,
        and process 0 writes docs.tsv + sidecar after a cross-process
        barrier. Assumes a shared filesystem across processes (the same
        assumption the Orbax path made). ``load`` also reads the legacy
        Orbax format."""
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        chunk_mb = int(os.environ.get("SSE_SAVE_CHUNK_MB", "16"))
        for s in self.emb.addressable_shards:
            if s.replica_id != 0:  # replicated copy of rows someone owns
                continue
            row0 = int(s.index[0].start or 0)
            data = s.data
            rows, dim = data.shape
            # numpy can't serialize ml_dtypes (bfloat16) — store the
            # raw bits; load() views them back via sidecar dtype
            as_bits = data.dtype.name == "bfloat16"
            out_dtype = np.uint16 if as_bits else np.dtype(data.dtype.name)
            out = np.lib.format.open_memmap(
                os.path.join(directory, f"emb_r{row0:012d}.npy"),
                mode="w+",
                dtype=out_dtype,
                shape=(rows, dim),
            )
            row_bytes = dim * out.dtype.itemsize
            step = max(1, (chunk_mb << 20) // row_bytes)
            for lo in range(0, rows, step):
                hi = min(rows, lo + step)
                part = np.asarray(data[lo:hi])
                out[lo:hi] = part.view(np.uint16) if as_bits else part
            out.flush()
            del out
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            # every shard file must exist before process 0 publishes the
            # sidecar that references it
            multihost_utils.sync_global_devices("sse_index_save_shards")
        if jax.process_index() == 0:
            # the sidecar lists EVERY shard — derived from the GLOBAL
            # sharding, not just this process's addressable slice
            all_row0 = sorted(
                {
                    int(idx[0].start or 0)
                    for idx in self.emb.sharding.devices_indices_map(
                        self.emb.shape
                    ).values()
                }
            )
            shards = [
                {"file": f"emb_r{r:012d}.npy", "row0": r} for r in all_row0
            ]
            with open(
                os.path.join(directory, "docs.tsv"),
                "w", encoding="utf-8", newline="\n",
            ) as f:
                for tid, txt in zip(self.ids, self.texts):
                    f.write(f"{_esc(tid)}\t{_esc(txt)}\n")
            with open(
                os.path.join(directory, "sidecar.json"),
                "w", encoding="utf-8",
            ) as f:
                json.dump(
                    {
                        "format": "npy-v1",
                        "num_real": self.num_real,
                        "shape": list(self.emb.shape),
                        "dtype": str(self.emb.dtype),
                        "shards": shards,
                    },
                    f,
                )
            # drop files the new sidecar no longer references: a legacy
            # Orbax 'emb/' checkpoint (a format upgrade would otherwise
            # strand ~GBs forever) and emb_*.npy from an older layout
            import glob as _glob
            import shutil as _shutil

            orbax_dir = os.path.join(directory, "emb")
            if os.path.isdir(orbax_dir):
                _shutil.rmtree(orbax_dir, ignore_errors=True)
            live = {s["file"] for s in shards}
            for f in _glob.glob(os.path.join(directory, "emb_*.npy")):
                if os.path.basename(f) not in live:
                    os.unlink(f)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            # no process returns from save() before the index is complete
            multihost_utils.sync_global_devices("sse_index_save_done")

    def _save_orbax(self, directory: str) -> None:
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(
                os.path.join(directory, "emb"), {"emb": self.emb}, force=True
            )
        with open(
            os.path.join(directory, "sidecar.json"), "w", encoding="utf-8"
        ) as f:
            json.dump(
                {
                    "num_real": self.num_real,
                    "ids": self.ids,
                    "texts": self.texts,
                    "shape": list(self.emb.shape),
                    "dtype": str(self.emb.dtype),
                },
                f,
                ensure_ascii=False,
            )
        # mirror of save()'s cleanup: drop npy-v1 files a format
        # downgrade (e.g. a multi-process re-save) no longer references
        import glob as _glob

        for fn in _glob.glob(os.path.join(directory, "emb_*.npy")) + [
            os.path.join(directory, "docs.tsv")
        ]:
            if os.path.exists(fn):
                os.unlink(fn)

    @classmethod
    def load(cls, directory: str, mesh: Optional[Mesh] = None) -> "ShardedIndex":
        directory = os.path.abspath(directory)
        with open(
            os.path.join(directory, "sidecar.json"), "r", encoding="utf-8"
        ) as f:
            side = json.load(f)
        sharding = (
            NamedSharding(mesh, P("model", None))
            if mesh is not None
            else NamedSharding(
                Mesh(np.array(jax.devices()[:1]), ("model",)), P()
            )
        )
        if side.get("format") == "npy-v1":
            parts = [
                np.load(os.path.join(directory, s["file"]), mmap_mode="r")
                for s in sorted(side["shards"], key=lambda s: s["row0"])
            ]
            if side["dtype"] == "bfloat16":
                import ml_dtypes

                parts = [p.view(ml_dtypes.bfloat16) for p in parts]
            bounds = np.cumsum([0] + [p.shape[0] for p in parts])

            def from_parts(idx):
                # assemble one device shard's rows from the memmapped
                # parts WITHOUT materializing the whole matrix in RAM
                # (shard boundaries usually equal part boundaries, so
                # this is one zero-copy memmap slice per device)
                lo, hi = idx[0].indices(int(bounds[-1]))[:2]
                segs = []
                for p, p0, p1 in zip(parts, bounds[:-1], bounds[1:]):
                    if p1 <= lo or p0 >= hi:
                        continue
                    segs.append(p[max(lo - p0, 0) : hi - p0])
                return segs[0] if len(segs) == 1 else np.concatenate(segs)

            emb = jax.make_array_from_callback(
                tuple(side["shape"]), sharding, from_parts
            )
            ids: List[str] = []
            texts: List[str] = []
            # newline='\n': a raw '\r' in a legacy (pre-escape) file must
            # stay inside its field, not split the row (universal
            # newlines would); current saves escape it anyway
            with open(
                os.path.join(directory, "docs.tsv"),
                "r", encoding="utf-8", newline="\n",
            ) as f:
                for line in f:
                    tid, _, txt = line.rstrip("\n").partition("\t")
                    ids.append(_unesc(tid))
                    texts.append(_unesc(txt))
            if len(ids) != side["num_real"]:
                raise ValueError(
                    f"corrupt index at {directory}: docs.tsv has "
                    f"{len(ids)} rows but sidecar num_real="
                    f"{side['num_real']} — fail fast instead of serving "
                    "misaligned ids"
                )
        else:  # legacy Orbax layout (and multi-process saves)
            with ocp.StandardCheckpointer() as ckptr:
                abstract = jax.ShapeDtypeStruct(
                    tuple(side["shape"]), side["dtype"], sharding=sharding
                )
                emb = ckptr.restore(
                    os.path.join(directory, "emb"), {"emb": abstract}
                )["emb"]
            ids, texts = side["ids"], side["texts"]
        return cls(
            emb=emb,
            num_real=side["num_real"],
            ids=ids,
            texts=texts,
            mesh=mesh,
        )

    # -------------------------------------------------- reference TSV compat
    def export_tsv(self, path: str) -> None:
        """Write the reference's targetEncodingIndex.tsv format."""
        emb = np.asarray(self.emb)[: self.num_real].astype(np.float32)
        if jnp.dtype(self.emb.dtype) == jnp.int8:
            emb = emb / INT8_SCALE  # export dequantized floats (TSV compat)
        with open(path, "w", encoding="utf-8") as f:
            for i in range(self.num_real):
                vec = " ".join(f"{v:.6f}" for v in emb[i])
                f.write(f"{self.ids[i]}\t{self.texts[i]}\t{vec}\n")

    @classmethod
    def import_tsv(
        cls, path: str, mesh: Optional[Mesh] = None
    ) -> "ShardedIndex":
        ids, texts, rows = [], [], []
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                tid, text, vec = line.split("\t")
                ids.append(tid)
                texts.append(text)
                rows.append(np.asarray(vec.split(" "), dtype=np.float32))
        emb = np.stack(rows)
        return from_embeddings(emb, ids, texts, mesh)


def _shard_count(mesh: Optional[Mesh]) -> int:
    return 1 if mesh is None else mesh.shape["model"]


def _padded_rows(t: int, capacity: Optional[int], shards: int) -> int:
    """Index row-padding geometry, shared by from_embeddings and
    build_index so tower-built and embedding-built indexes always agree
    on padded shape (shape = serving-program compatibility). Large
    indexes pad to 4096-aligned shards so the Pallas streaming top-k
    kernel's block grid divides evenly (sse_tpu.ops.fused_topk); small
    (demo-scale) indexes keep minimal padding — they take the XLA path
    where alignment doesn't matter."""
    t_eff = max(t, capacity or 0)
    align = 4096 if t_eff >= 65536 else 8
    return _round_up(max(t_eff, 1), shards * align)


def from_embeddings(
    emb: np.ndarray,
    ids: Sequence[str],
    texts: Sequence[str],
    mesh: Optional[Mesh] = None,
    dtype=jnp.float32,
    capacity: Optional[int] = None,  # reserve rows for live add()
) -> ShardedIndex:
    """Wrap host embeddings [T, D] into a (padded, sharded) index.

    dtype=jnp.bfloat16 halves HBM (2x index rows per chip, ~2x less
    scoring traffic); scores still accumulate in float32 on the MXU and
    top-k selection is exact w.r.t. the stored precision.
    dtype=jnp.int8 halves it AGAIN (4x rows per chip vs float32):
    symmetric 127-scale quantization, EXACT int32 MXU accumulation,
    scores rescaled to cosine range (sse_tpu.ops.fused_topk)."""
    t, d = emb.shape
    shards = _shard_count(mesh)
    t_pad = _padded_rows(t, capacity, shards)
    padded = np.zeros((t_pad, d), np.float32)
    padded[:t] = emb
    arr = quantize_rows(padded, dtype)
    if mesh is not None:
        arr = jax.device_put(arr, NamedSharding(mesh, P("model", None)))
    return ShardedIndex(
        emb=arr, num_real=t, ids=list(ids), texts=list(texts), mesh=mesh
    )


def build_index(
    params,
    model_cfg: SSEConfig,
    target_space: TargetSpace,
    mesh: Optional[Mesh] = None,
    batch_size: int = 256,
    progress: Optional[Callable[[int, int], None]] = None,
    dtype=jnp.float32,
    capacity: Optional[int] = None,  # reserve rows for live add()
    chunk_batches: int = 64,
    cp_shards: int = 0,
) -> ShardedIndex:
    """Encode the full target space into a sharded index (the reference's
    sse_index.py stack, SURVEY.md §3.2).

    SOURCE_ENCODER_ONLY: the learned table IS the index. Tower modes: the
    index stays DEVICE-RESIDENT end to end — tokens upload in chunks of
    ``chunk_batches`` sub-batches, ONE dispatch encodes the whole chunk
    (lax.map over sub-batches), and the embeddings write straight into
    the preallocated index array on device. The r1 builder round-tripped
    every 512-doc batch through the host, which over a high-latency link
    ran at ~1.8k docs/sec against a ~350k docs/sec device encode — a
    190× host-loop tax this removes (BASELINE.md has both numbers).

    ``cp_shards`` > 1 encodes each target document with CONTEXT
    PARALLELISM (sse_tpu.parallel.context — transformer towers, mean
    readout): the sequence dim is sharded over a dedicated {'seq':
    cp_shards} mesh, so documents longer than one chip's attention
    budget still encode; the encoded rows are then written onto the
    'model'-sharded index buffer by a SEPARATE program (the axis
    contract in context.py — CP never claims the index's 'model' axis).
    Long-document index builds are where CP pays; 50-token queries at
    serve time never need it.

    Rows in [num_targets, t_pad) are ZERO vectors (matching
    from_embeddings): scoring masks by the runtime ``num_real`` operand
    for exactness, and the zero rows additionally let the Pallas kernel's
    block gate skip untouched reserve blocks instead of routing them to
    the masked fallback. Live add() overwrites them.
    """
    if model_cfg.mode == NetworkMode.SOURCE_ENCODER_ONLY:
        emb = np.asarray(sse.target_embeddings(params, model_cfg))
        return from_embeddings(
            emb[: target_space.num_targets],
            target_space.ids,
            target_space.texts,
            mesh,
            dtype=dtype,
            capacity=capacity,
        )

    toks, lens = target_space.tokens, target_space.lengths
    t, l = toks.shape
    d = model_cfg.encoding_dim
    shards = _shard_count(mesh)
    t_pad = _padded_rows(t, capacity, shards)

    cp_enc = None
    if cp_shards > 1:
        # CP branch: the target tower encodes on a DEDICATED {'seq'}
        # mesh (context.py axis contract — never the index's 'model'
        # axis). Tower params ride host copies taken BEFORE the
        # index-mesh device_put below, so the two programs never mix
        # committed device sets; the encoded [chunk, D] rows (tiny next
        # to the long-doc encode) hop through the host into write_chunk.
        from sse_tpu.parallel.context import cp_mesh, make_cp_encoder

        if model_cfg.mode == NetworkMode.DUAL_ENCODER:
            cp_cfg, cp_params = model_cfg.tgt_tower, params["tgt_tower"]
        else:  # SHARED_ENCODER (SOURCE_ENCODER_ONLY returned above)
            cp_cfg, cp_params = model_cfg.src_tower, params["src_tower"]
        cp_enc = make_cp_encoder(cp_cfg, cp_mesh(cp_shards))
        cp_params = jax.device_get(cp_params)
        l_cp = -(-l // cp_shards) * cp_shards  # token width per program

        def encode_chunk_cp(toks3, lens2):  # np [S,B,L], [S,B] → [S*B, D]
            if l_cp > l:
                toks3 = np.pad(toks3, ((0, 0), (0, 0), (0, l_cp - l)))
            outs = [
                np.asarray(
                    cp_enc(
                        cp_params,
                        jnp.asarray(toks3[i]),
                        jnp.asarray(lens2[i]),
                    )
                )
                for i in range(toks3.shape[0])
            ]
            return quantize_rows(jnp.asarray(np.concatenate(outs)), dtype)

    sharding = (
        NamedSharding(mesh, P("model", None)) if mesh is not None else None
    )
    emb_buf = jnp.zeros((t_pad, d), dtype)
    if sharding is not None:
        emb_buf = jax.device_put(emb_buf, sharding)

    # params and chunks must land replicated across the WHOLE mesh:
    # without this they commit to the default device only, and
    # write_chunk then mixes device sets with the mesh-sharded buffer
    # (crashes on any multi-device mesh; single-chip runs masked this)
    rep = (
        NamedSharding(mesh, P()) if mesh is not None else None
    )
    if rep is not None:
        params = jax.device_put(params, rep)

    @functools.partial(jax.jit, out_shardings=rep)
    def encode_chunk(p, toks3, lens2):  # [S, B, L], [S, B] → [S*B, D]
        out = jax.lax.map(
            lambda tl: sse.target_embeddings(
                p, model_cfg, tokens=tl[0], lengths=tl[1]
            ),
            (toks3, lens2),
        )
        return quantize_rows(out.reshape(-1, d), dtype)

    @functools.partial(jax.jit, donate_argnums=(0,), out_shardings=sharding)
    def write_chunk(buf, chunk, at):
        return jax.lax.dynamic_update_slice(buf, chunk, (at, 0))

    # size the chunk to the corpus: tiny (demo/CPU) indexes must not pay
    # for a full 64x256 chunk of padding rows
    eff_bs = min(batch_size, _round_up(t, 8))
    s = max(1, min(chunk_batches, -(-t // eff_bs)))
    chunk_docs = s * eff_bs
    for lo in range(0, t, chunk_docs):
        hi = min(lo + chunk_docs, t)
        tb = toks[lo:hi]
        lb = lens[lo:hi]
        if tb.shape[0] < chunk_docs:  # pad the tail chunk
            pad = chunk_docs - tb.shape[0]
            tb = np.concatenate([tb, np.zeros((pad, l), tb.dtype)])
            lb = np.concatenate([lb, np.ones((pad,), lb.dtype)])
        if cp_enc is not None:
            chunk = encode_chunk_cp(
                tb.reshape(s, eff_bs, l), lb.reshape(s, eff_bs)
            )
        else:
            chunk = encode_chunk(
                params,
                jnp.asarray(tb.reshape(s, eff_bs, l)),
                jnp.asarray(lb.reshape(s, eff_bs)),
            )
        take = min(chunk_docs, t_pad - lo)
        if take < chunk_docs:  # never write past the padded buffer
            chunk = chunk[:take]
        if hi - lo < take:
            # zero the tail chunk's padding-doc rows: every row in
            # [num_real, t_pad) must be a ZERO vector (the kernel's
            # block-gate premise, and what from_embeddings guarantees) —
            # the encoded zero-token rows here are identical non-zero
            # unit vectors that would force the fallback path on every
            # reserve block
            rowid = jnp.arange(take)[:, None]
            chunk = jnp.where(rowid < hi - lo, chunk, 0).astype(chunk.dtype)
        emb_buf = write_chunk(emb_buf, chunk, jnp.int32(lo))
        if progress:
            progress(hi, t)
    return ShardedIndex(
        emb=emb_buf,
        num_real=t,
        ids=list(target_space.ids),
        texts=list(target_space.texts),
        mesh=mesh,
    )
