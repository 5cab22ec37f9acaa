"""Concurrency stress — the race-detector run the reference never had
(SURVEY.md §5 A2: `go test -race` exists in its Makefile with zero tests
to run it on). Multiple submitter threads + the engine thread + metric
readers hammer the shared queue/slot/job state with debug invariants
armed; every job must complete exactly once with a consistent record."""

import threading
import time

import jax.numpy as jnp
import numpy as np
import pytest

from llamago_tpu.checkpoint.params import host_parameters
from llamago_tpu.config import GenerateConfig
from llamago_tpu.runtime.engine import Engine, JobStatus
from llamago_tpu.utils import debug as dbg

from conftest import random_ggjt_tensors


@pytest.fixture
def engine(tiny_config, test_vocab):
    config = tiny_config.replace(
        dtype="float32", weight_dtype="float32", max_seq_len=64
    )
    tensors = random_ggjt_tensors(config, seed=11)
    params = {
        k: jnp.asarray(np.asarray(v, np.float32))
        for k, v in host_parameters(config, tensors).items()
        if k != "layers"
    }
    params["layers"] = {
        k: jnp.asarray(np.asarray(v, np.float32))
        for k, v in host_parameters(config, tensors)["layers"].items()
    }
    return Engine(config, params, test_vocab, slots=3, decode_chunk_size=1)


def test_concurrent_submitters_with_invariants(engine):
    old_debug = dbg.DEBUG
    dbg.DEBUG = True  # arm engine invariant checks for the whole run
    errors: list[BaseException] = []
    jobs = []
    jobs_lock = threading.Lock()
    gen = GenerateConfig(max_tokens=4, ctx_size=64, temp=0.0)

    def submitter(tid: int):
        try:
            for i in range(6):
                job = engine.submit(f"hello {tid} {i}", gen)
                with jobs_lock:
                    jobs.append(job)
                time.sleep(0.001 * (tid + 1))
        except BaseException as e:  # noqa: BLE001 — collected for assert
            errors.append(e)

    def reader():
        try:
            for _ in range(200):
                with jobs_lock:
                    snapshot = list(jobs)
                for j in snapshot:
                    _ = (j.status, j.output, len(j.output_tokens))
                time.sleep(0.002)
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    engine.start()
    try:
        threads = [threading.Thread(target=submitter, args=(t,)) for t in range(4)]
        threads.append(threading.Thread(target=reader))
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        deadline = time.time() + 120
        while time.time() < deadline:
            with jobs_lock:
                if len(jobs) == 24 and all(
                    j.status in (JobStatus.FINISHED, JobStatus.FAILED)
                    for j in jobs
                ):
                    break
            time.sleep(0.05)
    finally:
        engine.stop()
        dbg.DEBUG = old_debug

    assert not errors, errors
    assert len(jobs) == 24
    statuses = [j.status for j in jobs]
    assert all(s == JobStatus.FINISHED for s in statuses), statuses
    # exactly-once completion with consistent records
    assert len({j.id for j in jobs}) == 24
    for j in jobs:
        assert j.finished >= j.started >= j.created > 0
        assert len(j.output_tokens) <= gen.max_tokens


def test_debug_check_raises():
    old = dbg.DEBUG
    dbg.DEBUG = True
    try:
        with pytest.raises(dbg.InvariantError, match="boom x=3"):
            dbg.check(False, "boom", x=3)
        dbg.check(True, "fine")
    finally:
        dbg.DEBUG = old
    dbg.DEBUG = False
    dbg.check(False, "inactive when off")  # no raise
    dbg.DEBUG = old


def test_randomized_soak_mixed_configs(tiny_config, test_vocab):
    """Randomized mix of temps, top-k extremes (0 / 100000), repeat
    windows, seeds, deadlines, EOS stopping, and max_tokens past the
    context (forcing swaps), with speculative + chunked decode on and
    debug invariants armed: every job must FINISH within budget."""
    import random

    from llamago_tpu.checkpoint.params import load_parameters
    from llamago_tpu.config import GenerateConfig

    from conftest import random_ggjt_tensors

    config = tiny_config.replace(dtype="float32", weight_dtype="int8",
                                 max_seq_len=96)
    tensors = random_ggjt_tensors(config, seed=20)
    params = load_parameters(config, tensors)
    eng = Engine(config, params, test_vocab, slots=3, decode_chunk_size=4,
                 speculative=True, prefill_chunk=32)
    old_debug = dbg.DEBUG
    dbg.DEBUG = True
    rng = random.Random(0)
    jobs = []
    try:
        for _ in range(25):
            gen = GenerateConfig(
                max_tokens=rng.choice([3, 8, 20, 120]),
                ctx_size=96,
                temp=rng.choice([0.0, 0.0, 0.7, 1.2]),
                top_k=rng.choice([0, 1, 40, 500, 100000]),
                top_p=rng.choice([0.1, 0.9, 1.0]),
                repeat_last_n=rng.choice([0, 4, 64]),
                seed=rng.randint(-1, 5),
                deadline_s=rng.choice([0, 0, 120]),
                stop_at_eos=rng.random() < 0.3,
            )
            prompt = " ".join(
                rng.choice(["hello", "the", "fox", "wo", "zig"])
                for _ in range(rng.randint(1, 30)))
            jobs.append(eng.submit(prompt, gen))
            for _ in range(rng.randint(0, 6)):
                eng.step()
        for _ in range(3000):
            if all(j.status not in (JobStatus.QUEUED, JobStatus.PROCESSING)
                   for j in jobs):
                break
            eng.step()
    finally:
        dbg.DEBUG = old_debug
    assert all(j.status == JobStatus.FINISHED for j in jobs), [
        (j.status, j.error) for j in jobs if j.status != JobStatus.FINISHED]
    assert all(len(j.output_tokens) <= j.gen.max_tokens for j in jobs)
