"""On-device batched sampling: temperature, repeat penalty, top-k, top-p.

Pipeline parity with the reference sampler (reference: SampleTopPTopK,
pkg/llama/llama.go:455-707), in its exact order:

  1. scale logits by 1/temp, with the CTRL sign-aware repeat penalty for
     tokens present in the last-N window: negative logits are *multiplied*
     by the penalty, positive ones *divided* (llama.go:516-526);
  2. take the top-K by value (llama.go:548-565);
  3. softmax with max-subtraction over the survivors (llama.go:579-604);
  4. nucleus cut: keep tokens while the cumulative probability has not yet
     reached top-p, INCLUSIVE of the crossing token, then renormalize
     (llama.go:618-634);
  5. draw.

Documented divergences from the reference:
  * The reference's final draw is a nonstandard randomized argmax over
    p_i^2 * f_i^2 with uniform f (llama.go:658-673) — a bug (its own
    comments llama.go:683-704 show the intended categorical draw). We
    implement correct categorical sampling, and greedy argmax at temp<=0.
  * The reference initializes its last-N ring with zeros so token id 0 is
    penalized from the start (server.go:127-138); our window starts empty.
  * The reference scans the 32k vocab against the ring per token —
    O(V*N) ~ 100ms (llama.go:508-513). Here presence lives in a [B, V]
    count array updated by O(T) scatters, and the whole sampler is one
    fused on-device program over the batch.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


@jax.tree_util.register_dataclass
@dataclass
class SamplerState:
    """Per-slot last-N token window (replaces the reference's ring.Ring,
    server.go:127-138) plus presence counts for O(1) penalty lookup.

    `window` is the per-slot EFFECTIVE ring length (the reference sizes
    its ring per request: PenaltyLastN, main.go:89, server.go:127-138):
    the ring buffer is allocated at the max length and each slot wraps at
    its own window[b], so rows past it stay empty (-1) and never count."""

    ring: jax.Array  # [B, N] int32, -1 = empty
    counts: jax.Array  # [B, V] int32, occurrences of each token in the window
    ptr: jax.Array  # [B] int32, next ring slot to overwrite
    window: jax.Array  # [B] int32 in [1, N] — per-slot repeat_last_n

    @staticmethod
    def create(batch: int, window: int, vocab_size: int) -> "SamplerState":
        return SamplerState(
            ring=jnp.full((batch, window), -1, jnp.int32),
            counts=jnp.zeros((batch, vocab_size), jnp.int32),
            ptr=jnp.zeros(batch, jnp.int32),
            window=jnp.full(batch, window, jnp.int32),
        )


@jax.jit
def reset_slots(
    state: SamplerState, reset_mask: jax.Array, window: jax.Array | None = None
) -> SamplerState:
    """Clear the window for slots where reset_mask[b] is True (job admission).
    `window` optionally sets those slots' penalty window (repeat_last_n)."""
    m = reset_mask
    new_window = state.window if window is None else jnp.where(
        m, jnp.clip(window, 1, state.ring.shape[1]), state.window
    )
    return SamplerState(
        ring=jnp.where(m[:, None], -1, state.ring),
        counts=jnp.where(m[:, None], 0, state.counts),
        ptr=jnp.where(m, 0, state.ptr),
        window=new_window,
    )


def _push_one(state: SamplerState, tokens: jax.Array, active: jax.Array) -> SamplerState:
    """Push one token per slot into the ring (active slots only)."""
    b = state.ring.shape[0]
    rows = jnp.arange(b)
    evicted = state.ring[rows, state.ptr]  # [B]
    # decrement evicted counts (skip empty slots / inactive rows)
    dec_ok = (evicted >= 0) & active
    counts = state.counts.at[rows, jnp.where(dec_ok, evicted, 0)].add(
        jnp.where(dec_ok, -1, 0)
    )
    inc_ok = active & (tokens >= 0)
    counts = counts.at[rows, jnp.where(inc_ok, tokens, 0)].add(jnp.where(inc_ok, 1, 0))
    ring = state.ring.at[rows, state.ptr].set(jnp.where(active, tokens, evicted))
    ptr = jnp.where(active, (state.ptr + 1) % state.window, state.ptr)
    return SamplerState(ring=ring, counts=counts, ptr=ptr, window=state.window)


@jax.jit
def push_tokens(
    state: SamplerState, tokens: jax.Array, active: jax.Array
) -> SamplerState:
    """Push tokens [B, T] (T static) into the window; -1 entries are skipped.

    Prompt tokens go through here too — the reference's penalty window
    includes the prompt (ring updated during the prompt phase,
    server.go:187-198).
    """

    def step(st, tok_col):
        return _push_one(st, tok_col, active & (tok_col >= 0)), None

    state, _ = jax.lax.scan(step, state, tokens.T)
    return state


def sample_impl(
    rng_key: jax.Array,  # single key, or stacked per-slot keys [B, ...]
    logits: jax.Array,  # [B, V] float32
    state: SamplerState,
    temp: jax.Array,  # [B]
    top_k: jax.Array,  # [B] int32 (1 <= top_k <= max_top_k)
    top_p: jax.Array,  # [B]
    repeat_penalty: jax.Array,  # [B]
    max_top_k: int = 128,
    return_probs: bool = False,
):
    """Sample next token per slot. Returns tokens [B] int32 (and optionally
    the post-top-p probs over the top-max_top_k candidates, for tests).

    With stacked per-slot keys each slot's draw stream is independent of
    which other slots are occupied — a job's sampled output does not
    depend on its co-tenants (matching the reference's isolated pods)."""
    v = logits.shape[-1]
    max_top_k = min(max_top_k, v)

    # 1. temperature scale + sign-aware repeat penalty (llama.go:516-526)
    safe_temp = jnp.where(temp > 0, temp, 1.0)
    scale = (1.0 / safe_temp)[:, None]
    scaled = logits * scale
    rp = repeat_penalty[:, None]
    penalized = jnp.where(logits < 0.0, scaled * rp, scaled / rp)
    present = state.counts > 0
    x = jnp.where(present, penalized, scaled)

    # 2. top-K (llama.go:548-565); per-slot K by masking a static-K cut
    vals, idx = jax.lax.top_k(x, max_top_k)  # [B, K]
    rank = jnp.arange(max_top_k)[None, :]
    vals = jnp.where(rank < top_k[:, None], vals, NEG_INF)

    # 3. softmax over survivors (llama.go:579-604)
    probs = jax.nn.softmax(vals, axis=-1)

    # 4. nucleus cut, inclusive of the crossing token, then renorm
    #    (llama.go:618-634): keep i iff cumsum before i < top_p.
    #    The top candidate is ALWAYS kept — the reference's loop can never
    #    emit an empty set (llama.go:618-634 keeps >=1), but the pure mask
    #    form can at top_p<=0, where probs/0 -> NaN and the categorical
    #    draw emits garbage; rank 0 forces the same >=1-candidate invariant
    #    (top_p=0 therefore degrades to greedy-over-top-k, not NaN).
    csum = jnp.cumsum(probs, axis=-1)
    keep = ((csum - probs) < top_p[:, None]) | (rank == 0)
    probs = jnp.where(keep, probs, 0.0)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)

    # 5. correct categorical draw (NOT the reference's p²f² argmax quirk)
    logprobs = jnp.log(probs)
    is_typed = jnp.issubdtype(rng_key.dtype, jax.dtypes.prng_key)
    if rng_key.ndim == (1 if is_typed else 2):  # stacked per-slot keys
        draw = jax.vmap(jax.random.categorical)(rng_key, logprobs)
    else:
        draw = jax.random.categorical(rng_key, logprobs, axis=-1)  # [B]
    greedy = jnp.argmax(logits, axis=-1)
    rows = jnp.arange(logits.shape[0])
    tokens = jnp.where(temp <= 0, greedy, idx[rows, draw]).astype(jnp.int32)

    if return_probs:
        return tokens, (probs, idx)
    return tokens


sample = partial(jax.jit, static_argnames=("max_top_k", "return_probs"))(sample_impl)
