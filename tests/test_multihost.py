"""Real 2-process jax.distributed test on the CPU backend.

Validates the multi-host serving primitives (parallel/multihost.py):
process agreement on job submissions and a cross-process collective —
the input-agreement contract lockstep SPMD serving relies on
(SURVEY.md §2.3 TPU-native plan).
"""

import socket
import subprocess
import sys
import os

import pytest

WORKER = r"""
import sys, os, json
coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=nproc, process_id=pid)
from llamago_tpu.parallel.multihost import agree, broadcast_pytree, is_primary

assert (pid == 0) == is_primary()

# submission agreement: primary queues one job; everyone must see it,
# with seed resolved to a concrete value
subs = [{"id": "j1", "prompt": "hello", "gen": {"seed": -1}}] if pid == 0 else None
got = agree(subs if pid == 0 else [])
assert len(got) == 1 and got[0]["id"] == "j1", got
assert got[0]["gen"]["seed"] >= 0, got

# a cross-process collective over the global mesh
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
devs = np.asarray(jax.devices())
mesh = Mesh(devs.reshape(-1), ("x",))
local_n = jax.local_device_count()
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("x")), np.full((local_n,), pid + 1, np.float32))
total = jax.jit(lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P()))(arr)
expect = sum((i + 1) * local_n for i in range(nproc))
assert float(total) == expect, (float(total), expect)
print(f"proc{pid} OK")
"""


def test_two_process_agreement_and_collective(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [
        subprocess.Popen([sys.executable, str(script), coord, "2", str(i)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-3000:]}"
        assert f"proc{i} OK" in out


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port
