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
