"""Generation engine: continuously-batched prefill/decode with context swap.

This is the TPU-native re-design of the reference's serving core — the
pods scheduler (reference: Engine, pkg/server/server.go:84-106) plus the
per-job generation loop (reference: Do, server.go:110-278). The reference
runs up to MaxPods independent goroutines, each owning a private model
context; here ONE resident model decodes a slot-batched step, and "pods"
become decode slots:

  * admission: a queued job is tokenized (leading-space + BOS parity with
    server.go:120-124), its prompt prefilled into a free slot's cache rows
    (bucketed lengths, so only a handful of XLA programs exist);
  * decode: every iteration samples one token for ALL active slots from
    the previous logits, then runs one batched forward step;
  * context swap (parity with server.go:165-172): when a slot hits the
    context limit, keep the first keep_count positions, re-feed half of
    the remaining most-recent tokens, and continue — "infinite text
    generation via context swapping";
  * per-job phase timers and tok/s accounting (parity with the report at
    server.go:244-274).

The loop is host-driven with exactly one device sync per generated token
(the sampled ids, needed for streaming/stop decisions); all math stays
on device. See bench.py for the fully-on-device multi-token fast path.
"""

from __future__ import annotations

import threading
import time
import uuid
from dataclasses import dataclass, field
from enum import Enum

import jax
import jax.numpy as jnp
import numpy as np

from llamago_tpu.config import GenerateConfig, ModelConfig
from llamago_tpu.models.llama import forward, prefill_into_slot
from llamago_tpu.ops.sampling import SamplerState, push_tokens, reset_slots, sample
from llamago_tpu.runtime.kv_cache import KVCache
from llamago_tpu.tokenizer import EOS_TOKEN, Vocab, detokenize, tokenize

# Debug trace for the speculative gate (perf bisection aid): prints the
# per-engine-step spec/chunked decision with acceptance EMAs.
import os as _os

_SPEC_DEBUG = _os.environ.get("LLAMAGO_SPEC_DEBUG", "0") == "1"
from llamago_tpu.utils import debug as _dbg


@jax.jit
def _set_row(arr, idx, row):
    """arr[idx] = row with a TRACED index: one compiled program for all
    slots (a python-int .at[i].set compiles one XLA program PER slot
    index — each a multi-second round trip on remote-compile transports)."""
    return jax.lax.dynamic_update_slice(
        arr, row[None].astype(arr.dtype), (idx,) + (0,) * (arr.ndim - 1)
    )


def _host(arr) -> np.ndarray:
    """Device -> host copy. Over the tunneled remote-TPU transport,
    direct np.asarray of a jit output has been observed to stall; a
    staged copy through a fresh on-device buffer matches bench.py's
    reliable sync pattern (docs/SERVING.md environment notes). The
    staging is an extra on-device concatenate per host sync, so real
    (non-tunneled) TPU hosts skip it (utils/transport.py; override with
    LLAMAGO_FORCE_STAGED_HOST_COPY for A/B)."""
    from llamago_tpu.utils.transport import staged_host_copy

    if not staged_host_copy():
        return np.asarray(arr)
    flat = jnp.ravel(arr)
    staged = jnp.concatenate([flat, flat[:1]])[:-1]  # forced fresh buffer
    return np.asarray(staged).reshape(arr.shape)

DEFAULT_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096)


class JobStatus(str, Enum):
    QUEUED = "queued"        # reference: server.go:30-38 job lifecycle
    PROCESSING = "processing"
    FINISHED = "finished"
    FAILED = "failed"        # the reference leaves failed jobs stuck
    #                          ("TODO: Finish job properly", server.go:176)


@dataclass
class Job:
    id: str
    prompt: str
    gen: GenerateConfig
    status: JobStatus = JobStatus.QUEUED
    created: float = field(default_factory=time.time)
    started: float = 0.0
    finished: float = 0.0
    prompt_tokens: int = 0
    reused_tokens: int = 0  # prompt prefix served from cached KV
    output_tokens: list[int] = field(default_factory=list)
    output: str = ""
    error: str = ""
    # timing (parity with the reference's per-job report, server.go:244-274)
    ttft_ms: float = 0.0
    eval_ms: list[float] = field(default_factory=list)
    sample_ms: list[float] = field(default_factory=list)

    @property
    def tokens_per_second(self) -> float:
        dur = (self.finished or time.time()) - self.started
        return len(self.output_tokens) / dur if dur > 0 else 0.0


@dataclass
class _Slot:
    job: Job | None = None
    pos: int = 0                      # next cache position to write
    history: list[int] = field(default_factory=list)  # prompt + generated
    remaining: int = 0
    # prompt tokens admitted but not yet prefilled: admission prefill runs
    # in bucket-sized chunks interleaved with decode steps so one long
    # prompt cannot freeze other slots' decode (the reference's pods are
    # isolated goroutines, server.go:84-106; this restores that property
    # in continuous-batching form)
    pending: list[int] = field(default_factory=list)
    # first cache position that stopped mirroring `history` (set by a
    # context swap); None = cache[p] == history[p] for all p < pos,
    # which is what per-slot prefix caching relies on
    swap_point: int | None = None

    @property
    def free(self) -> bool:
        return self.job is None

    @property
    def decodable(self) -> bool:
        """Holds a job whose prompt is fully prefilled (logits pending)."""
        return self.job is not None and not self.pending

    @property
    def mapped(self) -> int:
        """Leading cache positions that mirror history (reusable KV)."""
        n = min(self.pos, len(self.history))
        return n if self.swap_point is None else min(n, self.swap_point)


class Engine:
    """One resident model serving up to `slots` concurrent jobs."""

    def __init__(
        self,
        config: ModelConfig,
        params,
        vocab: Vocab,
        slots: int = 1,
        buckets: tuple[int, ...] = DEFAULT_BUCKETS,
        stream: bool = True,
        decode_chunk_size: int = 1,
        speculative: bool = False,
        draft_len: int = 7,
        prefill_chunk: int = 256,
    ):
        self.config = config
        self.params = params
        self.vocab = vocab
        self.n_slots = slots
        self.buckets = tuple(b for b in buckets if b <= config.max_seq_len) or (
            config.max_seq_len,
        )
        # cache layout follows the weights: layered (tuple-of-layers)
        # weights take the unrolled forward path — per-layer leaves feed
        # the fused Pallas kernels directly and compile far faster than
        # the 7B scan graph — and need a layered cache so XLA aliases
        # each layer's update in place
        layered = isinstance(params.get("layers"), (list, tuple))
        from llamago_tpu.ops import kernels as _kernels

        cache_shard = None
        if _kernels.ACTIVE_MESH is not None and not layered:
            # stored layout matches the attention shard_map specs (kv
            # heads on tp, positions on sp, slots on dp) so decode steps
            # don't reshard the cache on every call
            from llamago_tpu.parallel.sharding import cache_sharding

            cache_shard = cache_sharding(config, _kernels.ACTIVE_MESH,
                                         batch=slots)
        # remembered so warmup's wipe and _rebuild_device_state recreate
        # the cache with the SAME layout/sharding the programs compiled
        # against (an unsharded replacement would recompile everything on
        # the first real request and reshard the cache every step)
        self._cache_layered = layered
        self._cache_shard = cache_shard
        self.cache = self._make_cache()
        self.sampler_state = SamplerState.create(
            slots, config.max_seq_len, config.vocab_size
        )
        self.logits = jnp.zeros((slots, config.vocab_size), jnp.float32)
        self.rngs = jax.vmap(jax.random.PRNGKey)(jnp.arange(slots))  # [S] keys
        self.slots = [_Slot() for _ in range(slots)]
        self.stream = stream
        # >1 enables the on-device multi-token fast path (one host sync per
        # chunk instead of per token — see runtime/decode_loop.py); output
        # streams at chunk granularity.
        self.decode_chunk_size = decode_chunk_size
        # prompt-lookup speculative decoding for all-greedy batches
        # (lossless; see runtime/speculative.py)
        self.speculative = speculative
        self.draft_len = draft_len
        # Adaptive gate: prompt-lookup only pays when drafts actually get
        # accepted — on non-repetitive output every verify step still
        # streams all the weights to emit ~1 token, losing to chunked
        # decode (measured 84 vs 164 tok/s served, bench_artifacts/
        # serve_7b_int8_spec.json r2). Track an accepted-drafts-per-step
        # EMA per slot; when every active slot's EMA is below the
        # threshold, _spec_steps yields to chunked decode and only
        # re-probes with a single warmed 1-step program occasionally.
        self.spec_accept_ema = np.full(slots, float(draft_len), np.float32)
        self.spec_gate_threshold = 1.5   # accepted drafts/step (VERDICT r2 #6)
        self.spec_probe_interval = 8     # gated decisions between re-probes
        self._spec_probe_countdown = 0
        # admission prefill runs in chunks of at most this many tokens per
        # engine step, so active slots keep decoding while a long prompt
        # is absorbed (the reference's pod-isolation property)
        self.prefill_chunk = max(16, min(prefill_chunk, self.buckets[-1]))
        self._queue: list[Job] = []
        # None = every queued job is admissible (single-process). Multi-
        # host lockstep sets 0 via enable_lockstep_admission(): step()
        # then admits only the first _agreed_n jobs — the prefix every
        # process agreed on via broadcast (parallel/multihost.py).
        self._agreed_n: int | None = None
        # lockstep embedding requests: handler threads must NOT run a
        # collective-bearing forward on process 0 only (fleet deadlock) —
        # under lockstep, embed requests queue here, ride the tick
        # broadcast, and every process computes them (embed_routed below)
        self._embed_pending: list[tuple[str, str, threading.Event, dict]] = []
        self._embed_inflight: dict[str, tuple[threading.Event, dict]] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._wake = threading.Event()
        # Generation-ending ids: the vocab's full stop set when it carries
        # one (BPE vocabs include instruct end-of-turn controls like
        # LLaMA-3's <|eot_id|>, which decode() strips from text so stop
        # STRINGS can never match them); sentencepiece-family defaults to
        # the reference's EOS=2 (ml.go:27)
        self._eos_ids = frozenset(
            getattr(vocab, "stop_ids", None)
            or {getattr(vocab, "eos_id", EOS_TOKEN)})

    def _first_eos(self, emitted: list[int]) -> int:
        """Index of the first generation-ending token in `emitted`, or -1."""
        for i, t in enumerate(emitted):
            if t in self._eos_ids:
                return i
        return -1

    def _halving_rungs(self) -> list[int]:
        """Every n_steps value the speculative path can select (the
        halving ladder in _spec_steps). Warmup compiles them ALL — a
        rung drifting out of sync with the selection logic is exactly
        how mid-traffic compiles sneak back in, so both sides share
        this one definition."""
        rungs = []
        n = max(1, self.decode_chunk_size)
        while n >= 1:
            rungs.append(n)
            if n == 1:
                break
            n //= 2
        return rungs

    def _make_cache(self) -> KVCache:
        return KVCache.create(self.config, batch=self.n_slots,
                              layered=self._cache_layered,
                              sharding=self._cache_shard)

    # ------------------------------------------------------------- queue

    def submit(self, prompt: str, gen: GenerateConfig, job_id: str | None = None) -> Job:
        """Queue a job (reference: PlaceJob, server.go:282-305)."""
        job = Job(id=job_id or str(uuid.uuid4()), prompt=prompt, gen=gen)
        with self._lock:
            self._queue.append(job)
        self._wake.set()
        return job

    def embed(self, text: str) -> tuple[np.ndarray, int]:
        """Embedding of `text`: the final-RMSNorm'd hidden state at the
        last prompt position (reference: llama.go:412-419 copies
        `embeddings.Data[embd*(N-1):]` into lctx.Embedding; there it is
        dead code behind the never-set EmbeddingMode flag — here it is
        served, /v1/embeddings). Pads to the engine's prefill buckets so
        only a handful of programs compile; runs on a scratch 1-slot
        cache, leaving decode slots untouched.

        Returns (embedding f32 [dim], prompt_token_count).
        """
        prefix = " " if getattr(self.vocab, "space_prefix", True) else ""
        ids = tokenize(self.vocab, prefix + text, bos=True)
        if len(ids) > self.buckets[-1]:
            raise ValueError(
                f"input of {len(ids)} tokens exceeds the largest prefill "
                f"bucket {self.buckets[-1]}")
        return self._embed_ids(ids)

    def _embed_ids(self, ids: list[int]) -> tuple[np.ndarray, int]:
        """embed()'s device path, on token ids (warmup enters here per
        bucket so the first /v1/embeddings request never pays a
        mid-traffic compile — engine.py's warmup contract)."""
        bucket = self._bucket(len(ids))
        padded = ids + [0] * (bucket - len(ids))
        cache = KVCache.create(self.config, batch=1, max_seq=bucket,
                               layered=self._cache_layered)
        _, _, emb = forward(
            self.params,
            jnp.asarray([padded], jnp.int32),
            cache,
            jnp.zeros(1, jnp.int32),
            self.config,
            logit_index=jnp.asarray([len(ids) - 1], jnp.int32),
            return_embedding=True,
        )
        return np.asarray(emb[0], np.float32), len(ids)

    def embed_routed(self, text: str, timeout_s: float = 120.0
                     ) -> tuple[np.ndarray, int]:
        """embed() that is safe to call from an HTTP handler thread.

        Single-process: computes directly. Under lockstep admission
        (multi-host SPMD), a handler-thread embed would run a
        collective-bearing forward on process 0 ONLY — hanging every
        other process at the collective (r4 VERDICT #4b). Instead the
        request queues here, rides the next tick's agreement broadcast,
        and EVERY process computes it (parallel/multihost.py
        serve_lockstep -> run_embeds); the handler blocks on the result.
        """
        if self._agreed_n is None:
            return self.embed(text)
        done = threading.Event()
        box: dict = {}
        with self._lock:
            self._embed_pending.append((str(uuid.uuid4()), text, done, box))
        self._wake.set()
        if not done.wait(timeout_s):
            raise TimeoutError("embedding request timed out awaiting the "
                               "lockstep tick")
        if "error" in box:
            raise box["error"]
        return box["result"]

    def drain_embeds(self) -> list[dict]:
        """Primary, per tick: take queued embed requests for broadcast.
        The waiter stays registered in _embed_inflight until run_embeds
        (executed on every process) fulfills it."""
        with self._lock:
            pending, self._embed_pending = self._embed_pending, []
            for rid, _text, done, box in pending:
                self._embed_inflight[rid] = (done, box)
        return [{"id": rid, "text": text} for rid, text, _, _ in pending]

    def run_embeds(self, reqs: list[dict]) -> None:
        """Every process, per tick: compute the broadcast embed requests
        in broadcast order — identical jitted calls on every process, the
        SPMD lockstep contract. Input errors (too-long text) are raised
        by tokenize/bucket checks identically everywhere, so catching
        them locally cannot diverge the fleet."""
        for r in reqs:
            try:
                result, err = self.embed(r["text"]), None
            except ValueError as e:
                result, err = None, e
            waiter = self._embed_inflight.pop(r["id"], None)
            if waiter is None:  # replica: nobody is waiting
                continue
            done, box = waiter
            if err is not None:
                box["error"] = err
            else:
                box["result"] = result
            done.set()

    # --------------------------------------------------------- admission

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _fits(self, reuse: int, n_ids: int) -> bool:
        """Would chunked prefill of ids[reuse:] at write_pos=reuse keep every
        padded bucket inside the cache? Guards the prefix-reuse overrun:
        `lax.dynamic_update_slice` CLAMPS an out-of-range start and would
        silently overwrite valid reused rows (models/llama.py:_update_cache)."""
        p, rem = reuse, n_ids - reuse
        s = self.config.max_seq_len
        while rem > 0:
            c = min(self.prefill_chunk, rem)
            if p + self._bucket(c) > s:
                return False
            p += c
            rem -= c
        return True

    def _admit(self, slot_idx: int, job: Job) -> None:
        slot = self.slots[slot_idx]
        gen = job.gen
        job.started = time.time()

        # Leading-space prompt normalization + BOS (reference:
        # server.go:120-124) — a sentencepiece convention; byte-level BPE
        # vocabs (LLaMA-3) opt out via space_prefix = False.
        prefix = " " if getattr(self.vocab, "space_prefix", True) else ""
        ids = tokenize(self.vocab, prefix + job.prompt, bos=True)
        ctx = min(gen.ctx_size, self.config.max_seq_len)
        if len(ids) >= ctx:
            job.status = JobStatus.FAILED
            job.error = f"prompt is too long: {len(ids)} tokens >= context {ctx}"
            job.finished = time.time()
            return

        job.status = JobStatus.PROCESSING
        job.prompt_tokens = len(ids)

        # per-slot prefix caching: if the new prompt shares a prefix with
        # the slot's previous contents (e.g. a chat continuation re-sending
        # prompt+reply), its KV is already in this slot's cache rows —
        # prefill only the unseen suffix. (Extension beyond the reference,
        # flagged as such in SURVEY.md §5 checkpoint/resume row.)
        reuse = 0
        old = slot.history[: slot.mapped]
        while reuse < len(old) and reuse < len(ids) - 1 and old[reuse] == ids[reuse]:
            reuse += 1
        # shrink reuse until the padded suffix fits the cache (a suffix
        # bucket starting near max_seq_len would clamp and corrupt the
        # reused rows). reuse=0 does NOT always fit: a non-bucket-aligned
        # max_seq_len can make even a from-scratch chunked prefill
        # overrun, hence the rejection below
        while reuse > 0 and not self._fits(reuse, len(ids)):
            reuse = max(0, reuse - 16)
        if not self._fits(reuse, len(ids)):
            # even a from-scratch chunked prefill would overrun the cache
            # (possible when max_seq_len isn't bucket-aligned, e.g.
            # --context 1000 with a 990-token prompt whose last chunk pads
            # to a 1024 bucket). Reject THIS job instead of letting
            # _prefill raise inside the engine loop and fail every
            # co-tenant slot.
            job.status = JobStatus.FAILED
            job.error = (f"prompt of {len(ids)} tokens does not fit the "
                         f"context layout (context {ctx}, prefill buckets "
                         f"{self.buckets})")
            job.finished = time.time()
            return
        job.reused_tokens = reuse
        _dbg.check(0 <= reuse <= slot.mapped,
                   "reuse exceeds the slot's mapped prefix",
                   reuse=reuse, mapped=slot.mapped)

        slot.job = job
        slot.history = list(ids)
        slot.remaining = gen.max_tokens
        # New tenants INHERIT the slot's acceptance EMA rather than
        # resetting to the optimistic prior: with jobs churning over busy
        # slots, a per-admission reset forced a speculative burst at the
        # start of every job, and those bursts (2 host syncs each on a
        # tunneled transport) held served throughput at ~87 vs 174 tok/s
        # chunked (measured). The periodic 1-step probes in _spec_steps
        # re-open the gate within one probe interval when the traffic
        # actually is repetitive.
        slot.swap_point = None
        slot.pos = reuse                 # prefill cursor
        slot.pending = list(ids[reuse:])  # absorbed chunk-by-chunk in step()
        seed = gen.seed if gen.seed >= 0 else time.time_ns() % (2**31)
        self.rngs = _set_row(
            self.rngs, jnp.asarray(slot_idx, jnp.int32), jax.random.PRNGKey(seed)
        )

        # reset the repeat-penalty window (per-request size, reference:
        # PenaltyLastN ring, main.go:89 + server.go:127-138), then feed the
        # prompt into it (the ring sees prompt tokens too, server.go:187-198)
        mask = np.zeros(self.n_slots, bool)
        mask[slot_idx] = True
        window = np.full(
            self.n_slots,
            max(1, min(gen.repeat_last_n or ctx, self.config.max_seq_len)),
            np.int32,
        )
        self.sampler_state = reset_slots(
            self.sampler_state, jnp.asarray(mask), jnp.asarray(window)
        )
        self._push_slot_tokens(slot_idx, ids)

    def _advance_prefills(self) -> bool:
        """Absorb ONE pending prefill chunk (at most) into its slot — one
        chunk per engine step bounds how long a long admission can stall
        the decode cadence of active slots."""
        for i, slot in enumerate(self.slots):
            if slot.job is None or not slot.pending:
                continue
            chunk = slot.pending[: self.prefill_chunk]
            _dbg.check(
                slot.pos + self._bucket(len(chunk)) <= self.config.max_seq_len,
                "prefill chunk bucket would clamp past the cache end",
                pos=slot.pos, chunk=len(chunk))
            t0 = time.time()
            self._prefill(i, chunk, write_pos=slot.pos)
            slot.job.eval_ms.append((time.time() - t0) * 1000.0)
            slot.pos += len(chunk)
            slot.pending = slot.pending[len(chunk):]
            return True
        return False

    def _push_slot_tokens(self, slot_idx: int, ids: list[int]) -> None:
        # pad to the bucket ladder: each distinct T is a separate XLA
        # program for the jitted scan in push_tokens; beyond the largest
        # bucket, round up to a multiple of it
        big = self.buckets[-1]
        n = self._bucket(len(ids)) if len(ids) <= big else (
            (len(ids) + big - 1) // big * big
        )
        toks = np.full((self.n_slots, n), -1, np.int32)
        toks[slot_idx, : len(ids)] = ids
        active = np.zeros(self.n_slots, bool)
        active[slot_idx] = True
        self.sampler_state = push_tokens(
            self.sampler_state, jnp.asarray(toks), jnp.asarray(active)
        )

    def _prefill(self, slot_idx: int, ids: list[int], write_pos: int) -> None:
        bucket = self._bucket(len(ids))
        if write_pos + bucket > self.config.max_seq_len:
            raise ValueError(
                f"prefill bucket overruns cache: write_pos={write_pos} "
                f"bucket={bucket} max_seq_len={self.config.max_seq_len}"
            )
        padded = np.zeros((1, bucket), np.int32)
        padded[0, : len(ids)] = ids
        logits, self.cache = prefill_into_slot(
            self.params,
            jnp.asarray(padded),
            self.cache,
            jnp.asarray(slot_idx, jnp.int32),
            jnp.asarray([write_pos], jnp.int32),
            jnp.asarray([len(ids) - 1], jnp.int32),
            self.config,
        )
        self.logits = _set_row(self.logits, jnp.asarray(slot_idx, jnp.int32), logits)

    # ------------------------------------------------------ context swap

    def _maybe_context_swap(self, slot_idx: int) -> None:
        """Context-swap eviction (parity with server.go:160-172): on
        overflow keep the first `keep_count` positions, re-feed half of the
        last (ctx - keep) tokens as a batch, continue decoding.

        Divergence note: the reference re-feeds a tail that INCLUDES the
        pending not-yet-evaluated token and then evaluates it again —
        a port bug (llama.cpp excludes `embd` from the re-fed tail). We
        re-feed history EXCLUDING the pending token; the pending token
        then goes through the normal decode step exactly once.
        """
        slot = self.slots[slot_idx]
        gen = slot.job.gen
        ctx = min(gen.ctx_size, self.config.max_seq_len)
        if slot.pos + 1 <= ctx:
            return
        keep = min(gen.keep_count, ctx // 2)
        left = slot.pos - keep
        evaluated = slot.history[:-1]  # pending token is history[-1]
        refeed = evaluated[len(evaluated) - left // 2 :] if left // 2 else []
        if refeed:
            self._prefill(slot_idx, refeed, write_pos=keep)
        slot.pos = keep + len(refeed)
        # cache rows >= keep no longer mirror history positions
        slot.swap_point = keep if slot.swap_point is None else min(
            slot.swap_point, keep)

    # ------------------------------------------------------------- step

    def _gather_gen_arrays(self):
        temp = np.ones(self.n_slots, np.float32)
        top_k = np.ones(self.n_slots, np.int32)
        top_p = np.ones(self.n_slots, np.float32)
        rp = np.ones(self.n_slots, np.float32)
        active = np.zeros(self.n_slots, bool)
        for i, s in enumerate(self.slots):
            if s.decodable:
                g = s.job.gen
                temp[i], top_p[i], rp[i] = g.temp, g.top_p, g.repeat_penalty
                # top_k <= 0 means "disabled: use the full vocab"
                # (llama.cpp convention); 0 would select the smallest
                # ladder rung and then mask out EVERY candidate (NaN draw)
                top_k[i] = g.top_k if g.top_k > 0 else self.config.vocab_size
                active[i] = True
        return temp, top_k, top_p, rp, active

    # static top-K ladder: the sampler's top_k cut uses a STATIC candidate
    # count (jax.lax.top_k); per-request K is applied by masking inside it.
    # The ladder keeps the compile set small while supporting ANY requested
    # K up to the full vocab (the reference sorts the whole vocab,
    # llama.go:548-565 — no K cap there, none here).
    _TOPK_LADDER = (128, 512, 2048)

    def _static_top_k(self, top_k: np.ndarray, active: np.ndarray) -> int:
        need = int(top_k[active].max()) if active.any() else 1
        for k in self._TOPK_LADDER:
            if need <= k:
                return min(k, self.config.vocab_size)
        return self.config.vocab_size

    def _decode_positions(self, active: np.ndarray, writes: int) -> np.ndarray:
        """Per-slot cache positions for a decode forward that performs
        `writes` sequential cache writes per batch row.

        Inactive rows still flow through the batched forward (XLA static
        shapes), and _update_cache writes K/V for EVERY row — so inactive
        rows must be parked where garbage writes cannot clobber live data:

          * a slot mid-prefill parks AT its prefill cursor: rows >= cursor
            are rewritten by upcoming prefill chunks / decode steps before
            any query attends them (decode paths are capped to writes=1
            while any prefill is pending — see _chunkable/_spec_steps);
          * a free slot parks at its mapped-prefix end so the cached prompt
            stays reusable; if that would overrun the cache, it parks
            lower and the mapping shrinks (swap_point) — without this,
            freed slots' prefix caches are silently corrupted by
            co-tenants' decode writes and readmission attends garbage KV.
        """
        s_max = self.cache.max_seq
        pos = np.zeros(self.n_slots, np.int32)
        for i, slot in enumerate(self.slots):
            if active[i]:
                pos[i] = slot.pos
            elif slot.job is not None:
                pos[i] = min(slot.pos, s_max - 1)
            else:
                park = min(slot.mapped, max(s_max - writes, 0))
                pos[i] = park
                if park < slot.mapped:
                    slot.swap_point = park if slot.swap_point is None else min(
                        slot.swap_point, park)
        return pos

    def step(self) -> bool:
        """One engine iteration. Returns True if any work was done."""
        # --- admissions (reference Engine drains Queue while pods free,
        # server.go:92-103)
        with self._lock:
            for i, slot in enumerate(self.slots):
                if not self._queue or self._agreed_n == 0:
                    # lockstep mode admits only the agreement-approved
                    # queue prefix — a job submitted between the drain and
                    # this step must wait for the next tick's broadcast
                    break
                if slot.free:
                    job = self._queue.pop(0)
                    if self._agreed_n is not None:
                        self._agreed_n -= 1
                    self._admit(i, job)

        # --- absorb one pending prefill chunk (long admissions interleave
        # with decode instead of blocking it)
        did_prefill = self._advance_prefills()

        temp, top_k, top_p, rp, active = self._gather_gen_arrays()
        if not active.any():
            return did_prefill

        # --- sample one token per active slot from the pending logits
        t0 = time.time()
        split = jax.vmap(lambda k: jax.random.split(k, 2))(self.rngs)  # [S, 2]
        self.rngs = split[:, 0]
        tokens_dev = sample(
            split[:, 1], self.logits, self.sampler_state,
            jnp.asarray(temp), jnp.asarray(top_k), jnp.asarray(top_p), jnp.asarray(rp),
            max_top_k=self._static_top_k(top_k, active),
        )
        tokens = _host(tokens_dev)  # host sync
        sample_dt = (time.time() - t0) * 1000.0

        self.sampler_state = push_tokens(
            self.sampler_state, tokens_dev[:, None], jnp.asarray(active)
        )

        # --- host bookkeeping: emit tokens, finish jobs
        now = time.time()
        for i, slot in enumerate(self.slots):
            if slot.job is None or not active[i]:
                continue
            tok = int(tokens[i])
            job = slot.job
            job.sample_ms.append(sample_dt)
            job.output_tokens.append(tok)
            if len(job.output_tokens) == 1:
                # time to FIRST token, including queue wait + chunked prefill
                job.ttft_ms = (now - job.started) * 1000.0
            slot.history.append(tok)
            slot.remaining -= 1
            stopped = self._publish_output(job)
            done = (stopped or slot.remaining <= 0
                    or (job.gen.stop_at_eos and tok in self._eos_ids))
            if done:
                job.status = JobStatus.FINISHED
                job.finished = time.time()
                slot.job = None
                active[i] = False

        if not active.any():
            return True

        # --- context swap where needed, then decode
        for i in range(self.n_slots):
            if active[i]:
                self._maybe_context_swap(i)

        n_spec = self._spec_steps(active, temp)
        if _SPEC_DEBUG and self.speculative:
            emas = [round(float(self.spec_accept_ema[i]), 2)
                    for i in range(self.n_slots)]
            print(f"[spec] t={time.time():.3f} n_spec={n_spec}"
                  f" active={active.astype(int).tolist()}"
                  f" ema={emas} probe_cd={self._spec_probe_countdown}",
                  flush=True)
        if n_spec > 0:
            self._decode_speculative(active, n_spec)
            if _SPEC_DEBUG:
                print(f"[spec] t={time.time():.3f} spec dispatch done",
                      flush=True)
            return True

        n_chunk = self._chunkable(active)
        if _SPEC_DEBUG and self.speculative:
            print(f"[spec] t={time.time():.3f} -> chunked n={n_chunk}",
                  flush=True)
        if n_chunk > 1:
            self._decode_chunked(active, n_chunk, temp, top_k, top_p, rp)
            return True

        feed = np.zeros((self.n_slots, 1), np.int32)
        pos = self._decode_positions(active, writes=1)
        for i, slot in enumerate(self.slots):
            if active[i]:
                feed[i, 0] = slot.history[-1]
        t0 = time.time()
        self.logits, self.cache = forward(
            self.params, jnp.asarray(feed), self.cache, jnp.asarray(pos), self.config
        )
        eval_dt = (time.time() - t0) * 1000.0
        for i, slot in enumerate(self.slots):
            if active[i] and slot.job is not None:
                slot.job.eval_ms.append(eval_dt)
                slot.pos += 1
        return True

    # ------------------------------------------------- speculative decode

    def _spec_steps(self, active: np.ndarray, temp: np.ndarray) -> int:
        """Speculative steps to run now: engages only for all-greedy
        batches (temp<=0 means pure argmax in ops/sampling.py, so
        prompt-lookup greedy is exactly lossless), with full context
        headroom for the worst case and no queued admissions waiting."""
        if not self.speculative:
            return 0
        if any(active[i] and temp[i] > 0 for i in range(self.n_slots)):
            return 0
        if any(s.pending for s in self.slots):
            return 0  # keep single-step cadence while a prefill is in flight
        with self._lock:
            if self._queue and self._agreed_n != 0 and any(s.free for s in self.slots):
                return 0  # yield only to ACTIONABLE admissions
        # adaptive gate (VERDICT r2 #6): when no active slot's acceptance
        # EMA clears the threshold, chunked decode wins — yield to it, but
        # re-probe with the (always-warmed) 1-step program every
        # spec_probe_interval gated decisions in case the text turned
        # repetitive. A probe step costs one draft_len+1 verify forward —
        # the same weight traffic as a single decode step.
        probing = False
        emas = [self.spec_accept_ema[i] for i in range(self.n_slots)
                if active[i]]
        # Occupancy-aware threshold: chunked decode emits n_active tokens
        # per weight stream with ONE host sync per 32 steps, while every
        # speculative dispatch pays ~2 device->host syncs (~40-80 ms each
        # on tunneled transports) plus the restore forward. Measured on
        # this workload (4 slots, acceptance EMA ~2.4): spec steady-state
        # 211 tok/s vs chunked 233 — so at high occupancy speculation
        # must clear a proportionally higher bar, while a lone greedy
        # tenant keeps the 1.5 floor (spec wins 208 vs 72 tok/s at b=1).
        # The occupancy term (not the configured floor) is capped at
        # draft_len - 1: the EMA can never exceed draft_len, so an
        # uncapped 0.875*n_active bar would be unreachable at >= 8
        # active slots — permanently closing the gate while the periodic
        # probes keep paying their dispatch cost for nothing. Capping
        # the WHOLE expression would zero the floor at draft_len=1 and
        # leave the gate unable to close at all.
        thresh = max(self.spec_gate_threshold,
                     min(0.875 * float(len(emas)),
                         float(self.draft_len) - 1.0))
        if emas and max(emas) < thresh:
            if self._spec_probe_countdown > 0:
                self._spec_probe_countdown -= 1
                return 0
            self._spec_probe_countdown = self.spec_probe_interval
            probing = True
        allowed = max(1, self.decode_chunk_size)
        per_step = self.draft_len + 1
        rem_max = 0
        for i, slot in enumerate(self.slots):
            if not active[i] or slot.job is None:
                continue
            ctx = min(slot.job.gen.ctx_size, self.config.max_seq_len)
            headroom = ctx - slot.pos - 2
            allowed = min(allowed, max(headroom // per_step, 0))
            rem_max = max(rem_max, slot.remaining)
        if probing:
            allowed = min(allowed, 1)
        # bound by the token budget using the EXPECTED per-step emission
        # (1 + acceptance EMA), not full acceptance: clamping by
        # ceil(rem/per_step) assumed every draft lands, which shrank the
        # rungs to 1-2 steps for most of a job's life at the measured
        # ~2.4-token acceptance — each tiny dispatch pays a host sync
        # (~40-80 ms on tunneled transports), collapsing served spec
        # throughput (traced: 8/4/4/2/1 rungs for a 64-token budget).
        # Overshoot is bounded and trimmed on the host exactly like
        # chunked decode's (_decode_chunked).
        expected = 1.0 + max(float(np.mean(emas)) if emas else 0.0, 0.0)
        allowed = min(allowed, max(1, -(-rem_max // max(int(expected), 1))))
        if allowed < 1:
            return 0
        # largest warmed ladder rung that fits (each distinct n_steps is
        # an XLA program; warmup compiles every rung — _halving_rungs)
        for n in self._halving_rungs():
            if n <= allowed:
                return n
        return 1

    def _decode_speculative(self, active: np.ndarray, n_steps: int) -> None:
        from llamago_tpu.runtime.speculative import speculative_decode_chunk

        h = self.config.max_seq_len
        # reserve history-buffer headroom for every token this chunk can
        # emit, so the scan's history writes never hit the clamp
        # (runtime/speculative.py) and proposals stay aligned
        writes = n_steps * (self.draft_len + 1) + 1
        tail = max(1, h - writes)
        hist = np.zeros((self.n_slots, h), np.int32)
        hlen = np.ones(self.n_slots, np.int32)
        feed = np.zeros(self.n_slots, np.int32)
        pos = self._decode_positions(active, writes=writes)
        for i, slot in enumerate(self.slots):
            if active[i]:
                hs = slot.history[-tail:]
                hist[i, : len(hs)] = hs
                hlen[i] = len(hs)
                feed[i] = slot.history[-1]
        t0 = time.time()
        toks, counts, self.cache, pos_out, _, _ = speculative_decode_chunk(
            self.params, jnp.asarray(feed), self.cache, jnp.asarray(pos),
            jnp.asarray(hist), jnp.asarray(hlen), self.config,
            n_steps=n_steps, draft_len=self.draft_len,
        )
        # restore the pending-logits invariant: one forward of each slot's
        # last emitted token (mirrors _decode_chunked's final forward)
        toks_h = _host(toks)
        counts_h = _host(counts)
        # one staged copy for the positions too: per-element device
        # indexing (int(pos_out[i])) lowers through tiny per-shape XLA
        # helper programs that stall on first use over remote transports
        pos_h = _host(pos_out)
        last = np.zeros((self.n_slots, 1), np.int32)
        for i in range(self.n_slots):
            if active[i]:
                last[i, 0] = toks_h[i, -1, counts_h[i, -1] - 1]
        self.logits, self.cache = forward(
            self.params, jnp.asarray(last), self.cache, pos_out, self.config
        )
        dt_ms = (time.time() - t0) * 1000.0

        for i, slot in enumerate(self.slots):
            if not active[i] or slot.job is None:
                continue
            # acceptance EMA feed for the adaptive gate (_spec_steps):
            # counts[i,s] = accepted drafts + 1 bonus token
            accepted = float(counts_h[i].mean()) - 1.0
            self.spec_accept_ema[i] = (
                0.7 * self.spec_accept_ema[i] + 0.3 * accepted
            )
            job = slot.job
            emitted: list[int] = []
            for s in range(n_steps):
                emitted.extend(int(t) for t in toks_h[i, s, : counts_h[i, s]])
            kept = emitted
            if job.gen.stop_at_eos:
                e = self._first_eos(emitted)
                if e >= 0:
                    kept = emitted[: e + 1]
            kept = kept[: slot.remaining]
            job.output_tokens.extend(kept)
            slot.history.extend(kept)
            slot.remaining -= len(kept)
            # history[-1] is in cache (the final bonus via the extra
            # forward; earlier tokens via the verify writes) and
            # self.logits[i] is its successor distribution — the engine's
            # steady-state invariant. Truncation (EOS / budget) always
            # finishes the job below, so the stale logits never get used.
            slot.pos = int(pos_h[i]) + 1
            if kept:
                job.eval_ms.extend([dt_ms / len(kept)] * len(kept))
            done = self._publish_output(job) or slot.remaining <= 0 or (
                job.gen.stop_at_eos and kept and kept[-1] in self._eos_ids
            )
            if done:
                job.status = JobStatus.FINISHED
                job.finished = time.time()
                slot.job = None

    # ----------------------------------------------------- chunked decode

    def _chunkable(self, active: np.ndarray) -> int:
        """Largest on-device chunk every active slot can absorb: bounded by
        context headroom (a swap may not occur mid-chunk) and by
        ACTIONABLE admissions (a queued job that could actually enter a
        free slot shouldn't wait out a chunk — but a queue behind fully
        occupied slots must NOT degrade decode to per-token stepping:
        that collapse cost 10x served throughput when oversubscribed).

        The per-job token budget deliberately does NOT bound the chunk:
        a finishing job overshoots and the host trims (_decode_chunked) —
        wasting <chunk tokens of compute for one slot beats compiling a
        halved-n_steps ladder of XLA programs at 7B scale (3.5-200s per
        compile over remote transports, docs/SERVING.md)."""
        if self.decode_chunk_size <= 1:
            return 1
        if any(s.pending for s in self.slots):
            return 1  # keep single-step cadence while a prefill is in flight
        with self._lock:
            if self._queue and self._agreed_n != 0 and any(s.free for s in self.slots):
                return 1
        allowed = self.decode_chunk_size
        for i, slot in enumerate(self.slots):
            if not active[i] or slot.job is None:
                continue
            ctx = min(slot.job.gen.ctx_size, self.config.max_seq_len)
            # chunk emits n tokens and feeds n+1 positions (incl. final
            # forward restoring the pending-logits invariant)
            allowed = min(allowed, ctx - slot.pos - 2)
        # all-or-nothing: a partial chunk would need one XLA program per
        # (n_steps rung x top-k rung) combination — a compile-set
        # explosion warmup cannot realistically cover (3.5-200s/compile
        # over remote transports). The short tail before a context swap
        # decodes per-token instead; those single-step programs are
        # always warmed.
        return self.decode_chunk_size if allowed >= self.decode_chunk_size else 1

    def _decode_chunked(self, active, n_chunk, temp, top_k, top_p, rp) -> None:
        feed = np.zeros(self.n_slots, np.int32)
        # chunk writes n_chunk rows + 1 (the final pending-logits forward)
        pos = self._decode_positions(active, writes=n_chunk + 1)
        for i, slot in enumerate(self.slots):
            if active[i]:
                feed[i] = slot.history[-1]
        from llamago_tpu.runtime.decode_loop import decode_chunk

        t0 = time.time()
        toks_dev, self.cache, _, self.sampler_state, self.rngs, self.logits = (
            decode_chunk(
                self.params,
                jnp.asarray(feed),
                self.cache,
                jnp.asarray(pos),
                self.config,
                n_chunk,
                rngs=self.rngs,
                state=self.sampler_state,
                temp=jnp.asarray(temp),
                top_k=jnp.asarray(top_k),
                top_p=jnp.asarray(top_p),
                repeat_penalty=jnp.asarray(rp),
                greedy=False,
                return_final_logits=True,
                max_top_k=self._static_top_k(top_k, active),
            )
        )
        toks = _host(toks_dev)  # host sync, one per chunk
        dt_per_tok = (time.time() - t0) * 1000.0 / n_chunk
        for i, slot in enumerate(self.slots):
            if not active[i] or slot.job is None:
                continue
            job = slot.job
            emitted = [int(t) for t in toks[i]]
            if job.gen.stop_at_eos:
                e = self._first_eos(emitted)
                if e >= 0:
                    emitted = emitted[: e + 1]
            # budget overshoot trim (see _chunkable): tokens past
            # max_tokens were computed but are discarded; the job finishes
            emitted = emitted[: max(slot.remaining, 0)]
            job.output_tokens.extend(emitted)
            slot.history.extend(emitted)
            slot.remaining -= len(emitted)
            slot.pos += n_chunk + 1
            job.eval_ms.extend([dt_per_tok] * len(emitted))
            done = self._publish_output(job) or slot.remaining <= 0 or (
                job.gen.stop_at_eos and emitted and emitted[-1] in self._eos_ids
            )
            if done:
                job.status = JobStatus.FINISHED
                job.finished = time.time()
                slot.job = None

    # ----------------------------------------------------------- warmup

    def warmup(self, max_bucket: int | None = None,
               include_embed: bool = True) -> float:
        """Pre-compile the serving-critical XLA programs — the ADMISSION
        path (reset_slots with a window array, bucketed push_tokens,
        prefill buckets) and the STEADY-STATE path (sampler, single-step
        forward, chunked decode) — so no request pays compilation.
        Returns seconds spent. The reference has no analogue — its graph
        is rebuilt and 'compiled' per step by construction (llama.go:232).

        Every program warmed here must be invoked with EXACTLY the jit
        signature the serving loop uses (arg structure, dtypes, statics) —
        a near-miss silently recompiles mid-traffic, which over a remote-
        compile transport costs seconds to minutes (docs/SERVING.md)."""
        t0 = time.time()
        limit = max_bucket or self.buckets[-1]
        mask = np.zeros(self.n_slots, bool)
        mask[0] = True
        window = np.full(self.n_slots, self.config.max_seq_len, np.int32)
        # admission path: reset (with window, as _admit passes it) + one
        # prompt push + one prefill per bucket
        self.sampler_state = reset_slots(
            self.sampler_state, jnp.asarray(mask), jnp.asarray(window)
        )
        self.rngs = _set_row(
            self.rngs, jnp.zeros((), jnp.int32), jax.random.PRNGKey(0)
        )
        for b in self.buckets:
            if b > limit:
                break
            ids = [1] * min(b, self.config.max_seq_len - 2)
            self._push_slot_tokens(0, ids)
            self._prefill(0, ids, write_pos=0)
            if include_embed:
                # /v1/embeddings runs a DIFFERENT program per bucket
                # (batch-1 forward, return_embedding) — unwarmed, the
                # first embeddings request paid a 3.5-200 s mid-traffic
                # compile on remote-compile transports (r4 VERDICT #5).
                # Benches that never serve embeddings skip via
                # include_embed=False.
                self._embed_ids(ids)
        # steady state: sampler + single-step forward + chunked decode,
        # with the exact steady-state pytree structures
        temp = np.full(self.n_slots, 1.0, np.float32)
        ones_i = np.ones(self.n_slots, np.int32)
        onesf = np.ones(self.n_slots, np.float32)
        # max_top_k MUST be passed explicitly exactly as step() passes it:
        # jax.jit keys an omitted default and an equal explicit value as
        # DIFFERENT cache entries (verified), so an omitted kwarg here
        # would leave step() to recompile under traffic. EVERY ladder rung
        # is warmed — max_top_k is a static arg of sample AND decode_chunk,
        # so a first request with top_k above the smallest rung would
        # otherwise recompile the full chunk program mid-traffic.
        rungs = sorted({min(k, self.config.vocab_size)
                        for k in self._TOPK_LADDER}
                       | {self.config.vocab_size})
        split = jax.vmap(lambda k: jax.random.split(k, 2))(self.rngs)
        for mk in rungs:
            tokens_dev = sample(split[:, 1], self.logits, self.sampler_state,
                                jnp.asarray(temp), jnp.asarray(ones_i),
                                jnp.asarray(onesf), jnp.asarray(onesf),
                                max_top_k=mk)
            _host(tokens_dev)
        self.sampler_state = push_tokens(
            self.sampler_state, tokens_dev[:, None], jnp.asarray(mask)
        )
        feed = np.zeros((self.n_slots, 1), np.int32)
        self.logits, self.cache = forward(
            self.params, jnp.asarray(feed), self.cache,
            jnp.zeros(self.n_slots, jnp.int32), self.config,
        )
        if self.decode_chunk_size > 1:
            from llamago_tpu.runtime.decode_loop import decode_chunk

            for mk in rungs:
                toks, self.cache, _, self.sampler_state, _, self.logits = decode_chunk(
                    self.params, jnp.zeros(self.n_slots, jnp.int32), self.cache,
                    jnp.zeros(self.n_slots, jnp.int32), self.config,
                    self.decode_chunk_size, rngs=self.rngs,
                    state=self.sampler_state,
                    temp=jnp.asarray(temp), top_k=jnp.asarray(ones_i),
                    top_p=jnp.asarray(onesf), repeat_penalty=jnp.asarray(onesf),
                    greedy=False, return_final_logits=True,
                    max_top_k=mk,  # explicit: see note above
                )
                _host(toks)  # warms _host's helpers for the [slots, chunk] shape
        if self.speculative:
            # every power-of-2 n_steps rung _spec_steps can pick is its
            # own XLA program; an unwarmed rung would compile the full
            # speculative scan mid-traffic
            from llamago_tpu.runtime.speculative import speculative_decode_chunk

            spec_rungs = self._halving_rungs()
            hist = jnp.zeros((self.n_slots, self.config.max_seq_len), jnp.int32)
            hlen = jnp.ones(self.n_slots, jnp.int32)
            for n_steps in spec_rungs:
                toks, counts, self.cache, pos_out, hist, hlen = (
                    speculative_decode_chunk(
                        self.params, jnp.zeros(self.n_slots, jnp.int32),
                        self.cache, jnp.zeros(self.n_slots, jnp.int32),
                        hist, hlen, self.config,
                        n_steps=n_steps, draft_len=self.draft_len,
                    ))
                # mirror _decode_speculative's EXACT host-side access
                # pattern: every device->host helper (ravel per counts
                # shape, the pos copy) is its own tiny XLA program, and an
                # unwarmed one costs 0.4-1.0 s to compile on remote-compile
                # transports — measured as a per-rung first-use stall that
                # held served speculative throughput at ~87 tok/s.
                _host(toks)
                _host(counts)
                _host(pos_out)
        # honest sync: block_until_ready does not reliably wait under
        # tunneled TPU transports — a >=1-element device-to-host copy does
        # (same pattern as _host; without this, warmup "finishes" while
        # its compiles are still in flight and the first requests pay them)
        _host(self.logits)
        # wipe warmup state (incl. any slot prefix mappings — the cache
        # rows they pointed at were just overwritten)
        self.cache = self._make_cache()
        self.sampler_state = reset_slots(
            self.sampler_state, jnp.ones(self.n_slots, bool)
        )
        self.logits = jnp.zeros_like(self.logits)
        for slot in self.slots:
            if slot.free:
                slot.history = []
                slot.pos = 0
                slot.swap_point = None
        return time.time() - t0

    # --------------------------------------------------------- lifecycle

    def _rebuild_device_state(self) -> None:
        """Recreate donated device buffers after a failed step.

        forward/decode_chunk/speculative_decode_chunk donate the cache (and
        sampler state), so a device-side exception mid-step can leave
        self.cache pointing at a deleted buffer — every later step would
        then fail and the engine would spin failing all future jobs.
        Rebuild from scratch (the slots' cached prefixes are forfeited)."""
        self.cache = self._make_cache()
        self.sampler_state = SamplerState.create(
            self.n_slots, self.config.max_seq_len, self.config.vocab_size
        )
        self.logits = jnp.zeros((self.n_slots, self.config.vocab_size), jnp.float32)
        self.rngs = jax.vmap(jax.random.PRNGKey)(jnp.arange(self.n_slots))
        for slot in self.slots:
            slot.history = []
            slot.pending = []
            slot.pos = 0
            slot.swap_point = None

    def _fail_active(self, exc: Exception) -> None:
        """Mark every in-flight job failed. The reference leaves jobs of a
        failed eval stuck in 'processing' forever ("TODO: Finish job
        properly with [failed] status", server.go:176-177); here the
        engine loop survives and the jobs carry the error."""
        msg = f"{type(exc).__name__}: {exc}"
        for slot in self.slots:
            if slot.job is not None:
                slot.job.status = JobStatus.FAILED
                slot.job.error = msg
                slot.job.finished = time.time()
                slot.job = None

    def _publish_output(self, job) -> bool:
        """Render, stop-truncate, and publish job.output in ONE assignment;
        True if a stop sequence matched. Searching the whole rendered
        output each time handles sequences spanning token (and
        detokenization) boundaries for free. Truncation happens on a local
        BEFORE publishing: a concurrent SSE reader (/jobs/stream,
        /v1/completions) snapshots job.output between engine steps, so an
        intermediate un-truncated publish would leak text past the stop
        sequence into streamed deltas."""
        text = _render_output(self.vocab, job)
        stopped = False
        for seq in job.gen.stop or ():
            idx = text.find(seq)
            if idx >= 0:
                text = text[:idx]
                stopped = True
                break
        job.output = text
        return stopped

    def expired_job_ids(self, now: float | None = None) -> list[str]:
        """Active jobs past their wall-clock deadline. Split from the
        expiry itself so multi-host serving can have the PRIMARY decide
        expirations and broadcast them — local clocks may disagree, and a
        divergent expiry would break SPMD lockstep (parallel/multihost.py)."""
        now = time.time() if now is None else now
        return [
            slot.job.id
            for slot in self.slots
            if slot.job is not None and slot.job.gen.deadline_s > 0
            and now - slot.job.started > slot.job.gen.deadline_s
        ]

    def apply_expiry(self, job_ids: list[str]) -> None:
        if not job_ids:
            return
        idset = set(job_ids)
        for slot in self.slots:
            job = slot.job
            if job is not None and job.id in idset:
                job.status = JobStatus.FAILED
                job.error = f"deadline exceeded ({job.gen.deadline_s:.0f}s)"
                job.output = _render_output(self.vocab, job)
                job.finished = time.time()
                slot.job = None

    def _expire_deadlines(self) -> None:
        """Fail jobs that exceeded their wall-clock deadline (the
        reference's unimplemented background watcher, server.go:55)."""
        self.apply_expiry(self.expired_job_ids())

    def enable_lockstep_admission(self) -> None:
        """Gate admissions on tick agreement (see _agreed_n above)."""
        with self._lock:
            self._agreed_n = 0

    def approve(self, n: int) -> None:
        """Mark the next n queued jobs agreement-approved (replicas call
        this after submitting the broadcast's jobs)."""
        with self._lock:
            if self._agreed_n is not None:
                self._agreed_n += n

    def drain_pending(self) -> list:
        """Atomically take the not-yet-agreed queue tail (multi-host
        agreement: the primary drains, broadcasts, then requeues the same
        Job objects so HTTP references stay live)."""
        with self._lock:
            agreed = self._agreed_n or 0
            jobs, self._queue = self._queue[agreed:], self._queue[:agreed]
        return jobs

    def requeue(self, jobs: list) -> None:
        """Splice agreement-approved jobs in right behind the already-
        approved prefix (submissions that raced in since the drain stay
        behind them, awaiting the next tick's broadcast)."""
        if not jobs:
            return
        with self._lock:
            a = self._agreed_n or 0
            self._queue = self._queue[:a] + list(jobs) + self._queue[a:]
            if self._agreed_n is not None:
                self._agreed_n += len(jobs)
        self._wake.set()

    def run_forever(self, poll_interval: float = 0.05) -> None:
        """Engine loop (reference poll loop: server.go:84-106, 1s tick —
        here an event wakes the loop immediately on submit)."""
        while not self._stop.is_set():
            try:
                self._expire_deadlines()
                busy = self.step()
            except Exception as exc:  # noqa: BLE001 — engine must survive
                self._fail_active(exc)
                self._rebuild_device_state()
                busy = True
            if not busy:
                self._wake.wait(timeout=poll_interval)
                self._wake.clear()

    def start(self) -> None:
        self._thread = threading.Thread(target=self.run_forever, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        self._wake.set()
        if self._thread:
            self._thread.join(timeout=10)

    # ------------------------------------------------------- convenience

    def generate(self, prompt: str, gen: GenerateConfig) -> Job:
        """Synchronous single-prompt generation (the CLI path — the
        reference CLI also goes through the job machinery, main.go:112-147)."""
        job = self.submit(prompt, gen)
        while job.status in (JobStatus.QUEUED, JobStatus.PROCESSING):
            self.step()
        return job


def _render_output(vocab: Vocab, job: Job) -> str:
    """Output excludes the prompt and is trimmed (reference:
    server.go:222-244 assembles output only from post-prompt tokens and
    trims whitespace/newlines)."""
    return detokenize(vocab, job.output_tokens).strip()
