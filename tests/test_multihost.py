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


SERVE_WORKER = r"""
import json, sys, threading, time, urllib.request, uuid
coordinator, nproc, pid, http_port = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=nproc, process_id=pid)
import numpy as np
from llamago_tpu.checkpoint.params import random_parameters
from llamago_tpu.config import GenerateConfig, ModelConfig, ServerConfig
from llamago_tpu.parallel.multihost import broadcast_pytree, serve_lockstep
from llamago_tpu.runtime.engine import Engine
from llamago_tpu.tokenizer import Vocab

# identical tiny model on every process (same PRNG seed)
config = ModelConfig(vocab_size=259, dim=64, n_layers=2, n_heads=4,
                     multiple_of=32, max_seq_len=64, dtype="float32",
                     weight_dtype="float32")
vocab = Vocab([(" ⁇ ".encode(), 0.0), (b"", 0.0), (b"", 0.0)]
              + [(bytes([b]), -1000.0) for b in range(256)])
params = random_parameters(config, seed=0)
gen = GenerateConfig(max_tokens=8, ctx_size=64, temp=0.8, seed=-1)
engine = Engine(config, params, vocab, slots=2, decode_chunk_size=1)

records = {}
orig_submit = engine.submit
def submit(prompt, g, job_id=None):
    job = orig_submit(prompt, g, job_id=job_id)
    records[job.id] = job
    return job
engine.submit = submit

if pid == 0:
    from llamago_tpu.server.api import JobServer
    server = JobServer(engine, ServerConfig(host="127.0.0.1", port=http_port),
                       gen, model_name="tiny")
    done = threading.Event()
    result = {}

    def client():
        base = f"http://127.0.0.1:{http_port}"
        jid = str(uuid.uuid4())
        body = json.dumps({"id": jid, "prompt": "Hi"}).encode()
        for _ in range(100):  # wait for the HTTP thread to come up
            try:
                urllib.request.urlopen(
                    urllib.request.Request(base + "/jobs/", data=body), timeout=5)
                break
            except OSError:
                time.sleep(0.1)
        for _ in range(600):
            st = json.loads(urllib.request.urlopen(
                base + f"/jobs/status/{jid}", timeout=5).read())
            if st["status"] in ("finished", "failed"):
                break
            time.sleep(0.1)
        result.update(json.loads(urllib.request.urlopen(
            base + f"/jobs/{jid}", timeout=5).read()))
        done.set()

    threading.Thread(target=client, daemon=True).start()
    serve_lockstep(engine, server, stop_when=done.is_set)
    assert result.get("status") == "finished", result
    final = broadcast_pytree({"id": result["id"], "output": result["output"]})
else:
    serve_lockstep(engine, None)
    final = broadcast_pytree(None)
    # the replica admitted and decoded the SAME job to the SAME output
    job = records.get(final["id"])
    assert job is not None, (final, list(records))
    assert job.output == final["output"], (job.output, final["output"])
print(f"proc{pid} SERVE-OK")
"""


SHARDED_SERVE_WORKER = r"""
import json, sys, threading, time, urllib.request, uuid
coordinator, nproc, pid, http_port = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=nproc, process_id=pid)
assert len(jax.devices()) == nproc  # one CPU device per process
from llamago_tpu.checkpoint.params import random_parameters
from llamago_tpu.config import GenerateConfig, ModelConfig, ServerConfig
from llamago_tpu.parallel import make_mesh, param_shardings
from llamago_tpu.parallel.multihost import broadcast_pytree, serve_lockstep
from llamago_tpu.parallel.tp_kernels import activate_mesh
from llamago_tpu.runtime.engine import Engine
from llamago_tpu.tokenizer import Vocab

# the CLI's exact multi-host path (_load_engine): global tp mesh spanning
# both processes, params placed with param_shardings, activate_mesh
config = ModelConfig(vocab_size=259, dim=64, n_layers=2, n_heads=4,
                     multiple_of=32, max_seq_len=64, dtype="float32",
                     weight_dtype="float32")
mesh = make_mesh(tp=nproc)
shardings = param_shardings(config, mesh)
params = random_parameters(config, seed=0, shardings=shardings)
activate_mesh(mesh)

# the point of the test: engine weights genuinely span BOTH processes
leaf = params["layers"]["wq"]
span = {d.process_index for d in leaf.sharding.device_set}
assert span == set(range(nproc)), span
assert not leaf.is_fully_replicated

vocab = Vocab([(" ⁇ ".encode(), 0.0), (b"", 0.0), (b"", 0.0)]
              + [(bytes([b]), -1000.0) for b in range(256)])
gen = GenerateConfig(max_tokens=8, ctx_size=64, temp=0.8, seed=-1)
engine = Engine(config, params, vocab, slots=2, decode_chunk_size=1)

records = {}
orig_submit = engine.submit
def submit(prompt, g, job_id=None):
    job = orig_submit(prompt, g, job_id=job_id)
    records[job.id] = job
    return job
engine.submit = submit

if pid == 0:
    from llamago_tpu.server.api import JobServer
    server = JobServer(engine, ServerConfig(host="127.0.0.1", port=http_port),
                       gen, model_name="tiny")
    done = threading.Event()
    result = {}

    def client():
        base = f"http://127.0.0.1:{http_port}"
        jid = str(uuid.uuid4())
        body = json.dumps({"id": jid, "prompt": "Hi"}).encode()
        for _ in range(100):
            try:
                urllib.request.urlopen(
                    urllib.request.Request(base + "/jobs/", data=body), timeout=5)
                break
            except OSError:
                time.sleep(0.1)
        for _ in range(600):
            st = json.loads(urllib.request.urlopen(
                base + f"/jobs/status/{jid}", timeout=5).read())
            if st["status"] in ("finished", "failed"):
                break
            time.sleep(0.1)
        result.update(json.loads(urllib.request.urlopen(
            base + f"/jobs/{jid}", timeout=5).read()))
        # /v1/embeddings under lockstep: the handler thread must NOT run
        # the tp-sharded (collective-bearing) forward on process 0 only —
        # that deadlocked the fleet (r4 VERDICT #4b). embed_routed rides
        # the agreement broadcast; both processes compute it this tick.
        ebody = json.dumps({"input": "embed me"}).encode()
        er = json.loads(urllib.request.urlopen(
            urllib.request.Request(base + "/v1/embeddings", data=ebody),
            timeout=60).read())
        result["emb_len"] = len(er["data"][0]["embedding"])
        done.set()

    threading.Thread(target=client, daemon=True).start()
    serve_lockstep(engine, server, stop_when=done.is_set)
    assert result.get("status") == "finished", result
    assert result.get("emb_len") == config.dim, result
    final = broadcast_pytree({"id": result["id"], "output": result["output"]})
else:
    serve_lockstep(engine, None)
    final = broadcast_pytree(None)
    job = records.get(final["id"])
    assert job is not None, (final, list(records))
    assert job.output == final["output"], (job.output, final["output"])
print(f"proc{pid} SHARDED-SERVE-OK")
"""


def test_two_process_sharded_engine_rest_serving(tmp_path):
    """VERDICT r2 #5: multi-process x sharded engine x REST in ONE test.
    The engine's weights are tp-sharded across a 2-process global mesh
    (one CPU device per process — the closest this environment gets to
    2-host TPU serving), and a real HTTP request is served through the
    lockstep loop. Catches sharded-cache/lockstep interactions neither
    test above sees. Reference contrast: single-process by design
    (server.go:84-106)."""
    port = _free_port()
    http_port = _free_port()
    coord = f"localhost:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "sharded_serve_worker.py"
    script.write_text(SHARDED_SERVE_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, "2", str(i), str(http_port)],
            env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-3000:]}"
        assert f"proc{i} SHARDED-SERVE-OK" in out


def test_two_process_lockstep_rest_serving(tmp_path):
    """End-to-end: a real HTTP request served through the 2-process SPMD
    lockstep loop — process 0 owns the REST frontend, both processes admit
    the same job on the same tick and produce identical outputs."""
    port = _free_port()
    http_port = _free_port()
    coord = f"localhost:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "serve_worker.py"
    script.write_text(SERVE_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, "2", str(i), str(http_port)],
            env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-3000:]}"
        assert f"proc{i} SERVE-OK" in out
