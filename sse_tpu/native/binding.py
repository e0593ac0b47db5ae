"""ctypes bindings + on-demand build for the C++ subword encoder."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading
import unicodedata
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "encoder.cpp")
_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False


def _lib_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(_DIR, f"_libsse_native_{digest}.so")


def build_library(quiet: bool = True) -> Optional[str]:
    """Compile encoder.cpp → .so (content-hashed, so rebuilds only on
    source change). Returns the path, or None if no toolchain."""
    path = _lib_path()
    if os.path.exists(path):
        return path
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
        _SRC, "-o", path,
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return None
    if r.returncode != 0:
        if not quiet:
            print(r.stderr, file=sys.stderr)
        return None
    return path


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _BUILD_FAILED
    with _LIB_LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        path = build_library()
        if path is None:
            _BUILD_FAILED = True
            return None
        lib = ctypes.CDLL(path)
        lib.sse_encoder_create.restype = ctypes.c_void_p
        lib.sse_encoder_create.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int32,
        ]
        lib.sse_encoder_destroy.argtypes = [ctypes.c_void_p]
        lib.sse_encode.restype = ctypes.c_int32
        lib.sse_encode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.sse_encode_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sse_counter_create.restype = ctypes.c_void_p
        lib.sse_counter_create.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int32,
        ]
        lib.sse_counter_destroy.argtypes = [ctypes.c_void_p]
        lib.sse_counter_add.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
        ]
        lib.sse_counter_sizes.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.sse_counter_dump.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.sse_vocab_build.restype = ctypes.c_void_p
        lib.sse_vocab_build.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.sse_vocab_destroy.argtypes = [ctypes.c_void_p]
        lib.sse_vocab_sizes.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.sse_vocab_dump.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _load() is not None


def _alnum_ranges() -> np.ndarray:
    """Codepoint ranges of unicode L*/N* categories — computed from
    Python's unicodedata so both encoders agree on character classes."""
    ranges: List[Tuple[int, int]] = []
    start = None
    for cp in range(sys.maxunicode + 1):
        is_alnum = unicodedata.category(chr(cp)).startswith(("L", "N"))
        if is_alnum and start is None:
            start = cp
        elif not is_alnum and start is not None:
            ranges.append((start, cp - 1))
            start = None
    if start is not None:
        ranges.append((start, sys.maxunicode))
    return np.asarray(ranges, dtype=np.uint32)


_RANGES_CACHE: Optional[np.ndarray] = None


def native_token_counts(lines) -> Optional[dict]:
    """C++ tokenize-and-count over corpus lines — the vocab-prep hot loop
    (SURVEY.md §3.5). Returns None when no toolchain (callers fall back to
    sse_tpu.text.subword.token_counts_from_lines, identical counts)."""
    global _RANGES_CACHE
    lib = _load()
    if lib is None:
        return None
    if _RANGES_CACHE is None:
        _RANGES_CACHE = _alnum_ranges()
    ranges = _RANGES_CACHE
    handle = lib.sse_counter_create(
        ranges.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ranges.shape[0],
    )
    try:
        import itertools

        CHUNK = 65536
        it = iter(lines)  # lazy: `lines` may be a corpus-file generator
        while True:
            chunk = list(itertools.islice(it, CHUNK))
            if not chunk:
                break
            raws = [l.encode("utf-8") for l in chunk]
            blob = b"".join(raws)
            offsets = np.zeros((len(raws) + 1,), dtype=np.int64)
            np.cumsum([len(r) for r in raws], out=offsets[1:])
            lib.sse_counter_add(
                handle,
                blob,
                offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(raws),
            )
        n = ctypes.c_int64()
        total = ctypes.c_int64()
        lib.sse_counter_sizes(handle, ctypes.byref(n), ctypes.byref(total))
        blob_out = ctypes.create_string_buffer(max(total.value, 1))
        lens = np.zeros((max(n.value, 1),), dtype=np.int32)
        counts = np.zeros((max(n.value, 1),), dtype=np.int64)
        lib.sse_counter_dump(
            handle,
            blob_out,
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        out = {}
        pos = 0
        raw = blob_out.raw
        for i in range(n.value):
            ln = int(lens[i])
            out[raw[pos : pos + ln].decode("utf-8")] = int(counts[i])
            pos += ln
        return out
    finally:
        lib.sse_counter_destroy(handle)


def native_build_subtokens(
    token_counts: dict,
    min_count: int,
    num_iterations: int = 4,
    max_subtoken_length: Optional[int] = None,
) -> Optional[List[str]]:
    """C++ build_from_token_counts — the vocab builder's O(len²) candidate
    loop (SURVEY.md §3.5's one-time CPU hot loop; the r1 known gap).
    Returns the ordered subtoken list (reserved ids excluded), bit-identical
    to the Python builder, or None when no toolchain is available."""
    lib = _load()
    if lib is None:
        return None
    toks = list(token_counts.keys())
    raws = [t.encode("utf-8") for t in toks]
    blob = b"".join(raws)
    offsets = np.zeros((len(raws) + 1,), dtype=np.int64)
    np.cumsum([len(r) for r in raws], out=offsets[1:])
    counts = np.asarray([token_counts[t] for t in toks], dtype=np.int64)
    handle = lib.sse_vocab_build(
        blob,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(raws),
        int(min_count),
        int(num_iterations),
        int(max_subtoken_length or 0),
    )
    if not handle:
        return None
    try:
        n = ctypes.c_int64()
        total = ctypes.c_int64()
        lib.sse_vocab_sizes(handle, ctypes.byref(n), ctypes.byref(total))
        blob_out = ctypes.create_string_buffer(max(total.value, 1))
        lens = np.zeros((max(n.value, 1),), dtype=np.int32)
        lib.sse_vocab_dump(
            handle, blob_out,
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        out: List[str] = []
        pos = 0
        raw = blob_out.raw
        for i in range(n.value):
            ln = int(lens[i])
            out.append(raw[pos : pos + ln].decode("utf-8"))
            pos += ln
        return out
    finally:
        lib.sse_vocab_destroy(handle)


class NativeSubwordEncoder:
    """C++-backed drop-in for SubwordVocab.encode / the data layer's
    batch encoding. Construct from a SubwordVocab."""

    def __init__(self, vocab):
        global _RANGES_CACHE
        lib = _load()
        if lib is None:
            raise RuntimeError("native encoder library unavailable")
        self._lib = lib
        from sse_tpu.text.subword import RESERVED_TOKENS

        offset = len(RESERVED_TOKENS)
        subs = [
            vocab.id_to_subtoken(i).encode("utf-8")
            for i in range(offset, vocab.vocab_size)
        ]
        blob = b"".join(subs)
        lens = np.asarray([len(s) for s in subs], dtype=np.int32)
        if _RANGES_CACHE is None:
            _RANGES_CACHE = _alnum_ranges()
        ranges = _RANGES_CACHE
        self._handle = lib.sse_encoder_create(
            blob,
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(subs),
            offset,
            ranges.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            ranges.shape[0],
        )
        if not self._handle:
            raise RuntimeError("sse_encoder_create failed")

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.sse_encoder_destroy(handle)
            self._handle = None

    def encode(self, text: str) -> List[int]:
        raw = text.encode("utf-8")
        # Escaping can emit up to 6 ids per input BYTE (a 1-char token of a
        # codepoint 100-127 outside the alphabet escapes to "\NNN;" plus
        # the trailing "_" = 6 single-char subtokens), so size for the
        # worst case and retry bigger if the C side filled the buffer —
        # sse_encode truncates at capacity, and a full buffer is the only
        # signal that truncation may have happened.
        cap = len(raw) * 6 + 8
        while True:
            out = np.empty((cap,), dtype=np.int32)
            n = self._lib.sse_encode(
                self._handle,
                raw,
                len(raw),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                out.shape[0],
            )
            if n < out.shape[0]:
                return out[:n].tolist()
            cap *= 4

    def encode_batch(
        self, texts: Sequence[str], max_len: int, eos_id: int = 1
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Padded-EOS batch encode (corpus.py::_encode_line convention):
        returns ([N, max_len] int32 tokens, [N] int32 lengths)."""
        raws = [t.encode("utf-8") for t in texts]
        blob = b"".join(raws)
        offsets = np.zeros((len(raws) + 1,), dtype=np.int64)
        np.cumsum([len(r) for r in raws], out=offsets[1:])
        tokens = np.zeros((len(raws), max_len), dtype=np.int32)
        lengths = np.zeros((len(raws),), dtype=np.int32)
        self._lib.sse_encode_batch(
            self._handle,
            blob,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(raws),
            max_len,
            eos_id,
            tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return tokens, lengths
