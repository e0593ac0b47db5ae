"""Debug toggles (SURVEY.md §5 race-detection row: JAX SPMD is data-race
free by construction; the debug config adds nan-checking and tracer-leak
detection instead)."""

from __future__ import annotations

import jax


def enable_debug_checks(nans: bool = True, tracer_leaks: bool = True) -> None:
    """Turn on expensive runtime checks for debugging training blowups.

    * ``jax_debug_nans`` — re-runs the op that produced a NaN eagerly and
      raises with a stack trace (catches loss explosions at the op).
    * ``jax_check_tracer_leaks`` — catches accidentally captured tracers
      (the class of bug behind silent recompilation storms).
    """
    if nans:
        jax.config.update("jax_debug_nans", True)
    if tracer_leaks:
        jax.config.update("jax_check_tracer_leaks", True)
