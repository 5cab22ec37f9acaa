"""Prompt-lookup speculative decoding (greedy, lossless, on-device).

Beyond-parity performance feature: single-stream decode is weight-read
bound — a forward over T=1 and T=K+1 tokens costs the same HBM traffic —
so verifying K drafted tokens per step multiplies tokens/step at
near-zero marginal cost. Drafts come from the sequence's own history
(prompt-lookup / n-gram matching): no draft model, no quality change —
greedy acceptance emits exactly the tokens plain greedy decode would.

How a step works (all inside one `lax.scan` body, one XLA program):
  1. propose: find the most recent history position whose n-gram matches
     the current tail; the following DRAFT_LEN tokens are the draft.
  2. verify: one forward over [t_last, d_1..d_K] at positions p..p+K
     with per-position logits; greedy preds g_0..g_K.
  3. accept: the longest prefix with d_j == g_{j-1}; emitted tokens are
     exactly preds[0..m] (m accepted drafts + 1 bonus token).
  4. cache invariant: slots p..p+K were written by the verify forward;
     accepted slots hold the right tokens, rejected slots are stale but
     every future query position overwrites them before attending
     (same invariant the engine's context swap relies on,
     models/llama.py:_attention).

The reference has no analogue (single-token Eval loop, server.go:153);
this is the kind of optimization its roadmap's "Performance" heading
gestures at (README.md:46).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from llamago_tpu.config import ModelConfig
from llamago_tpu.models.llama import forward_impl
from llamago_tpu.runtime.kv_cache import KVCache


def _propose(hist, hlen, t_last, t_prev, draft_len: int, ngram: int):
    """Most recent n-gram match in hist[0:hlen] -> following draft_len
    tokens. hist [H] int32; returns [draft_len] (garbage when no match —
    verification rejects it at no correctness cost)."""
    h = hist.shape[0]
    idx = jnp.arange(h)
    m = (hist == t_last) & (idx < hlen - 1)
    if ngram >= 2:
        prev = jnp.roll(hist, 1).at[0].set(-1)
        m &= (prev == t_prev) & (idx >= 1)
    # most recent match: last True index
    i = h - 1 - jnp.argmax(m[::-1])
    start = jnp.where(m.any(), i + 1, jnp.zeros((), i.dtype))
    start = jnp.minimum(start, h - draft_len)
    return jax.lax.dynamic_slice(hist, (start,), (draft_len,))


@partial(
    jax.jit,
    static_argnames=("config", "n_steps", "draft_len", "ngram"),
    donate_argnames=("cache",),
)
def speculative_decode_chunk(
    params,
    last_tokens: jnp.ndarray,  # [B] int32 — pending token (not yet in cache)
    cache: KVCache,
    positions: jnp.ndarray,  # [B] int32 — cache slot for last_tokens
    history: jnp.ndarray,  # [B, H] int32 — prompt + emitted (incl. last_tokens)
    hist_len: jnp.ndarray,  # [B] int32 — valid prefix length of history
    config: ModelConfig,
    n_steps: int,
    draft_len: int = 7,
    ngram: int = 2,
):
    """n_steps speculative greedy steps as one XLA program.

    Returns (tokens [B, n_steps, draft_len+1], counts [B, n_steps],
    cache, positions, history, hist_len): per step, the first counts[b,i]
    tokens of tokens[b,i] are the emitted ones. Token stream is identical
    to plain greedy decode; positions advance by counts per step.

    Caller must ensure positions + n_steps*(draft_len+1) <= max_seq.
    """

    def body(carry, _):
        t_last, cache, pos, hist, hlen = carry
        t_prev = jax.vmap(lambda h, l: h[jnp.maximum(l - 2, 0)])(hist, hlen)
        draft = jax.vmap(
            partial(_propose, draft_len=draft_len, ngram=ngram)
        )(hist, hlen, t_last, t_prev)  # [B, K]
        seq = jnp.concatenate([t_last[:, None], draft], axis=1)  # [B, K+1]
        logits, cache = forward_impl(
            params, seq, cache, pos, config, return_all_logits=True
        )
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, K+1]
        good = draft == preds[:, :-1]  # [B, K]
        # first rejection index == number of accepted drafts
        n_acc = jnp.argmin(
            jnp.concatenate([good, jnp.zeros_like(good[:, :1])], axis=1).astype(
                jnp.int32
            ) == 1,
            axis=1,
        ).astype(jnp.int32)
        n_emit = n_acc + 1  # accepted drafts + bonus token
        # emitted tokens are exactly preds[:, :n_emit].
        # History writes stay in-bounds: once hlen nears the buffer end the
        # write start clamps (dynamic_update_slice semantics) — an explicit
        # clamp here keeps hist[0:hlen] self-consistent so proposals stay
        # aligned instead of silently degrading to garbage n-grams. The
        # engine reserves headroom so the clamp never fires in serving
        # (engine._decode_speculative); this is the in-kernel guarantee.
        h_cap = hist.shape[1]
        start = jnp.minimum(hlen, h_cap - preds.shape[1])
        hist = jax.vmap(
            lambda h, l, p: jax.lax.dynamic_update_slice(h, p, (l,))
        )(hist, start, preds)
        hlen = jnp.minimum(hlen + n_emit, start + n_emit)
        pos = pos + n_emit
        t_last = jnp.take_along_axis(preds, n_acc[:, None], axis=1)[:, 0]
        return (t_last, cache, pos, hist, hlen), (preds, n_emit)

    (t_last, cache, positions, history, hist_len), (toks, counts) = jax.lax.scan(
        body,
        (last_tokens, cache, positions, history, hist_len),
        None,
        length=n_steps,
    )
    return (
        toks.transpose(1, 0, 2),
        counts.T,
        cache,
        positions,
        history,
        hist_len,
    )


def assemble_tokens(toks: jnp.ndarray, counts: jnp.ndarray, limit: int | None = None):
    """Host helper: flatten (tokens, counts) from one batch row into the
    emitted token list (optionally truncated to `limit` tokens)."""
    import numpy as np

    toks = np.asarray(toks)
    counts = np.asarray(counts)
    out: list[int] = []
    for step in range(toks.shape[0]):
        out.extend(int(t) for t in toks[step, : int(counts[step])])
        if limit is not None and len(out) >= limit:
            return out[:limit]
    return out
