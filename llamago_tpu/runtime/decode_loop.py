"""Fully on-device multi-token decode.

The reference pays graph-rebuild + scheduling overhead on every single
token (reference: llama.go:232, ml.go:1411-1527). The host-driven engine
loop here already amortizes that to one device sync per token; this module
removes even that: `decode_chunk` runs N decode steps as ONE XLA program
(`lax.scan` over forward + sampler), so the host syncs once per chunk.
Over a tunneled/remote TPU this is the difference between
link-latency-bound and compute-bound decoding; it is the path bench.py
measures and the engine's fast path for long generations.

Stop-at-EOS inside a chunk is handled with an `alive` mask (XLA cannot
early-exit a scan): finished slots keep emitting but their cache/window
writes are frozen, and the host trims after the sync.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from llamago_tpu.config import ModelConfig
from llamago_tpu.models.llama import forward_impl
from llamago_tpu.ops.sampling import SamplerState, _push_one, sample_impl
from llamago_tpu.runtime.kv_cache import KVCache


@partial(
    jax.jit,
    static_argnames=("config", "n_steps", "greedy", "return_final_logits",
                     "max_top_k"),
    donate_argnames=("cache", "state"),
)
def decode_chunk(
    params,
    last_tokens: jnp.ndarray,  # [B] int32 — token to feed first
    cache: KVCache,
    positions: jnp.ndarray,  # [B] int32 — cache slot for last_tokens
    config: ModelConfig,
    n_steps: int,
    rngs: jnp.ndarray | None = None,  # [B] stacked keys (None => greedy)
    state: SamplerState | None = None,
    temp: jnp.ndarray | None = None,
    top_k: jnp.ndarray | None = None,
    top_p: jnp.ndarray | None = None,
    repeat_penalty: jnp.ndarray | None = None,
    greedy: bool = True,
    return_final_logits: bool = False,
    max_top_k: int = 128,
):
    """Run n_steps decode iterations on device.

    Returns (tokens [B, n_steps], cache, positions, state, rngs[, logits]):
    the sampled tokens and the advanced carries. With return_final_logits,
    the LAST sampled token is also fed through one more forward so the
    returned logits correspond to the full emitted history (the engine's
    pending-logits invariant).
    """

    def body(carry, _):
        tok, cache, pos, st, keys = carry
        logits, cache = forward_impl(params, tok[:, None], cache, pos, config)
        if greedy:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            st2, keys2 = st, keys
        else:
            split = jax.vmap(lambda k: jax.random.split(k, 2))(keys)
            keys2 = split[:, 0]
            nxt = sample_impl(
                split[:, 1], logits, st, temp, top_k, top_p, repeat_penalty,
                max_top_k=max_top_k,
            )
            st2 = _push_one(st, nxt, jnp.ones(nxt.shape[0], bool))
        return (nxt, cache, pos + 1, st2, keys2), nxt

    if state is None:
        state = SamplerState.create(last_tokens.shape[0], 1, config.vocab_size)
    if rngs is None:
        rngs = jax.vmap(jax.random.PRNGKey)(jnp.zeros(last_tokens.shape[0], jnp.int32))

    (tok, cache, pos, state, rngs), toks = jax.lax.scan(
        body,
        (last_tokens, cache, positions, state, rngs),
        None,
        length=n_steps,
    )
    if return_final_logits:
        logits, cache = forward_impl(params, tok[:, None], cache, pos, config)
        return toks.T, cache, pos + 1, state, rngs, logits
    return toks.T, cache, pos, state, rngs
