"""Aux subsystems (SURVEY.md §5): profiling/tracing and debug toggles.

The reference had none of these (print-only logging, no profiler usage);
these are the TPU-native equivalents named in the survey's aux table.
"""

from sse_tpu.utils.profiling import trace, start_profiler_server, StepTimer
from sse_tpu.utils.debug import enable_debug_checks

__all__ = [
    "trace",
    "start_profiler_server",
    "StepTimer",
    "enable_debug_checks",
]
