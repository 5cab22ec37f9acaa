"""Device mesh construction.

The reference is a single-process CPU program whose only parallelism is a
goroutine pool fanning out matmul rows (reference: pkg/ml/ml.go:59-74,
1602-1652) and N independent "pods" (server.go:84-106). The TPU-native
equivalent of that *entire* machinery is GSPMD: annotate parameter and
cache shardings over a Mesh and let XLA insert the ICI collectives
(all-reduce of TP matmul partials, all-gather of logits) — no explicit
communication code in the model.

Axes:
  dp — data parallel over decode slots (throughput scaling)
  sp — sequence parallel over KV-cache positions (long-context scaling:
       each shard holds S/sp cache rows; attention combines partial
       softmax statistics with psum/pmax over the axis — see
       parallel/tp_kernels.py:maybe_tp_attention)
  tp — tensor parallel over heads / FFN / vocab (latency + model scaling)

Multi-host: the same mesh spans hosts via jax.distributed; ICI carries
the tp axis inside a pod slice, DCN carries dp across slices.
"""

from __future__ import annotations

import numpy as np
from jax.sharding import Mesh


def make_mesh(tp: int = 1, dp: int = 1, sp: int = 1, devices=None) -> Mesh:
    """Build a (dp, sp, tp) mesh. tp should map to the fastest
    interconnect — JAX device order already enumerates ICI neighbors
    contiguously, so the trailing axis rides ICI; sp's combine traffic is
    tiny (per-head partial softmax stats) so it sits outside tp."""
    import jax

    if devices is None:
        devices = jax.devices()
    n = tp * dp * sp
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(dp, sp, tp)
    return Mesh(grid, axis_names=("dp", "sp", "tp"))


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host initialization (jax.distributed). On TPU pods the
    defaults auto-discover topology; args are for manual CPU fleets."""
    import jax

    kwargs = {}
    if coordinator is not None:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
