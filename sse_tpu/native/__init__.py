"""Native tier (C++) bindings: fast subword encoding for the data pipeline.

Reference context: the reference ships zero native code (SURVEY.md §2 —
pure-Python TF1) and its corpus encoding is the documented CPU hot loop
(SURVEY.md §3.5). This package compiles sse_tpu/native/encoder.cpp into a
shared library (g++, cached next to the source) and exposes it via ctypes
(pybind11 is not available in this environment). Falls back cleanly to the
pure-Python encoder when no compiler is present — behavior is asserted
bit-identical in tests/test_native.py.
"""

from sse_tpu.native.binding import (
    NativeSubwordEncoder,
    native_available,
    native_build_subtokens,
    native_token_counts,
    build_library,
)

__all__ = [
    "NativeSubwordEncoder",
    "native_available",
    "native_build_subtokens",
    "native_token_counts",
    "build_library",
]
