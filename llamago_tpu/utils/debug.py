"""Runtime guards — the sanitizer story (SURVEY.md §5 A2).

The reference's race/assert machinery is vestigial: `go test -race` with
no tests to run it on, and ggml's asserts commented out wholesale
(reference: Makefile:101-104, ml.go `////ASSERT`). The TPU-native
equivalent has three layers:

  1. jit-time shape/dtype checks — every traced program validates its
     operand shapes at trace time for free (XLA's type system);
  2. `LLAMAGO_DEBUG=1` (or `--debug`) — turns on jax NaN checking
     (every jitted program re-checked for NaN outputs) plus the cheap
     host-side engine invariants below;
  3. tests/test_engine_stress.py — a real concurrency stress test that
     hammers submit/step/metrics from multiple threads, the moral
     equivalent of the race detector run the reference never had.

`check()` costs one `if DEBUG` when disabled — sprinkle it on host-side
scheduler invariants, never inside traced code (use jax.debug there).
"""

from __future__ import annotations

import os

DEBUG = os.environ.get("LLAMAGO_DEBUG", "0") == "1"


def enable_debug_checks() -> None:
    """Turn on expensive runtime validation (CLI --debug)."""
    global DEBUG
    DEBUG = True
    import jax

    # every jit result is swept for NaNs (re-runs un-jitted on hit so the
    # failing primitive is named); catches quantization/overflow bugs the
    # moment they poison activations rather than tokens later
    jax.config.update("jax_debug_nans", True)


class InvariantError(AssertionError):
    pass


def check(cond: bool, msg: str, **ctx) -> None:
    """Host-side invariant, active only under LLAMAGO_DEBUG/--debug."""
    if DEBUG and not cond:
        detail = " ".join(f"{k}={v!r}" for k, v in ctx.items())
        raise InvariantError(f"{msg} {detail}".strip())
