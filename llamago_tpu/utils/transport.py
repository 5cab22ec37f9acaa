"""Transport quirks: detection of the tunneled remote-TPU plugin.

The experimental 'axon' plugin routes device traffic through a tunnel to
a remote helper machine. Two behaviors differ from a directly-attached
TPU host and are gated on this check:
  * persistent XLA compile cache is unsafe (entries compiled by the
    remote helper reload with mismatched host features and can SIGILL) —
    cli.py / bench.py skip it;
  * np.asarray of a jit output has been observed to stall; a staged
    on-device copy first is reliable (runtime/engine._host) — real TPU
    hosts skip that extra device work.
"""

from __future__ import annotations

import functools
import os


@functools.lru_cache(maxsize=1)
def is_tunneled_tpu() -> bool:
    """True when device traffic rides the tunneled remote-TPU plugin.
    Cached after first call (backend set membership never changes within
    a process)."""
    from jax._src import xla_bridge

    return "axon" in xla_bridge.backends()


def staged_host_copy() -> bool:
    """Should device->host copies stage through a fresh device buffer?
    Defaults to the transport detection; LLAMAGO_FORCE_STAGED_HOST_COPY
    =1/0 overrides for A/B measurement."""
    force = os.environ.get("LLAMAGO_FORCE_STAGED_HOST_COPY")
    if force is not None:
        return force == "1"
    return is_tunneled_tpu()
