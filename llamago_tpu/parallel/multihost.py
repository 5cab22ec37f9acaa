"""Multi-host serving primitives (jax.distributed / GSPMD lockstep).

The reference is strictly single-process (SURVEY.md §2.3: no NCCL/MPI,
transports are Go channels + HTTP). The TPU-native scale-out model is
SPMD lockstep: every host runs the SAME program over globally-sharded
arrays; XLA routes collectives over ICI/DCN. What that demands from the
serving layer is *input agreement* — every process must feed the jitted
step identical host inputs in identical order.

These helpers provide that agreement:

  * is_primary()        — process 0 owns the HTTP frontend
  * broadcast_pytree(x) — primary -> all processes, via the tree's
    serialized bytes riding an all-reduce (multihost_utils)
  * agree(submissions)  — the per-engine-tick admission broadcast: the
    primary's queued (job_id, prompt, gen-overrides) list becomes every
    process's queue, so all engines admit the same jobs into the same
    slots on the same tick.

serve loop sketch (single-controller alternative: pathways/proxy):

    primary:   jobs arrive over HTTP -> queue
    all procs: subs = agree(queue_drain())   # identical everywhere
               engine.submit(*s) for s in subs
               engine.step()                 # same jitted call, same order

Token sampling stays deterministic across processes because every
engine seeds slot RNGs from the job's seed (engine._admit), and jobs
with seed=-1 get a seed assigned by the PRIMARY before broadcast
(GenerateConfig.seed is resolved in agree()) — never from local time.
"""

from __future__ import annotations

import json
import time

import numpy as np


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0


def process_count() -> int:
    import jax

    return jax.process_count()


def broadcast_pytree(obj, is_source: bool | None = None):
    """Broadcast a JSON-serializable object from process 0 to all.

    Uses multihost_utils.broadcast_one_to_all over a fixed-size uint8
    buffer (two rounds: length, then payload). Single-process: identity.
    """
    import jax

    if jax.process_count() == 1:
        return obj
    from jax.experimental import multihost_utils

    if is_source is None:
        is_source = is_primary()
    payload = np.frombuffer(
        json.dumps(obj).encode() if is_source else b"", dtype=np.uint8
    )
    n = multihost_utils.broadcast_one_to_all(
        np.asarray([payload.size], np.int64), is_source=is_source
    )
    buf = np.zeros(int(n[0]), np.uint8)
    if is_source:
        buf[:] = payload
    buf = multihost_utils.broadcast_one_to_all(buf, is_source=is_source)
    return json.loads(bytes(buf).decode())


def gen_to_dict(gen) -> dict:
    import dataclasses

    return dataclasses.asdict(gen)


def gen_from_dict(d: dict):
    from llamago_tpu.config import GenerateConfig

    return GenerateConfig(**d)


def serve_lockstep(engine, job_server=None, poll_interval: float = 0.05,
                   stop_when=None) -> None:
    """The multi-host serving loop: every process runs this; the PRIMARY
    additionally owns the HTTP frontend (`job_server`, required on
    process 0, forbidden elsewhere — CLI gates construction on
    is_primary()).

    Each tick:
      1. primary drains its submission queue (fed by HTTP), resolves
         seed=-1 to concrete values, and decides deadline expirations;
      2. one broadcast carries {submissions, expirations, stop} to all;
      3. every process admits the SAME jobs in the SAME order (primary
         requeues its original Job objects so HTTP references stay live;
         replicas construct equivalent jobs) and applies the same
         expirations;
      4. every process calls engine.step() — identical state in,
         identical jitted calls out, which is exactly the SPMD lockstep
         contract. Idle ticks sleep symmetrically (state is identical,
         so the idle decision is too); the broadcast itself is the
         barrier that keeps ticks aligned.

    `stop_when` (primary only) ends the loop on all processes via the
    broadcast's stop flag.
    """
    primary = is_primary()
    engine.enable_lockstep_admission()  # step() admits agreed jobs only
    if primary:
        if job_server is None:
            raise ValueError("primary process needs the JobServer")
        job_server.start_background(start_engine=False)
    elif job_server is not None:
        raise ValueError("only process 0 may own the HTTP frontend")

    pending: list = []
    try:
        while True:
            if primary:
                pending = engine.drain_pending()
                for j in pending:
                    if j.gen.seed < 0:  # never from local time on replicas
                        j.gen = j.gen.replace(seed=time.time_ns() % (2**31))
                msg = {
                    "subs": [
                        {"id": j.id, "prompt": j.prompt,
                         "gen": gen_to_dict(j.gen)}
                        for j in pending
                    ],
                    # embed requests ride the same agreement broadcast:
                    # every process runs the identical collective-bearing
                    # forward, the primary delivers the result to the
                    # blocked HTTP handler (engine.embed_routed)
                    "embeds": engine.drain_embeds(),
                    "expired": engine.expired_job_ids(),
                    "stop": bool(stop_when()) if stop_when is not None else False,
                }
            else:
                msg = None
            msg = broadcast_pytree(msg)
            if primary:
                engine.requeue(pending)
            else:
                for s in msg["subs"]:
                    engine.submit(s["prompt"], gen_from_dict(s["gen"]),
                                  job_id=s["id"])
                engine.approve(len(msg["subs"]))
            engine.apply_expiry(msg["expired"])
            embeds = msg.get("embeds", [])
            engine.run_embeds(embeds)
            try:
                busy = engine.step()
            except Exception as exc:  # noqa: BLE001 — engine must survive
                engine._fail_active(exc)
                engine._rebuild_device_state()
                busy = True
            if msg["stop"]:
                return
            if not busy and not msg["subs"] and not embeds:
                time.sleep(poll_interval)
    finally:
        if primary and job_server is not None:
            job_server.shutdown()


def agree(submissions: list[dict]) -> list[dict]:
    """Broadcast the primary's pending submissions to every process.

    Each submission is {"id", "prompt", "gen": {overrides}}. The primary
    resolves seed=-1 to a concrete value here so all processes admit
    byte-identical jobs (engine seeds slot RNGs from gen.seed).
    """
    if is_primary():
        for s in submissions:
            gen = s.setdefault("gen", {})
            if gen.get("seed", -1) < 0:
                gen["seed"] = time.time_ns() % (2**31)
    return broadcast_pytree(submissions if is_primary() else None)
