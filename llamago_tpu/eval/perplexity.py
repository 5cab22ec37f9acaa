"""Perplexity harness — the quantization-quality oracle.

The reference has no evaluation harness at all; its only correctness
oracle was manual output comparison against llama.cpp (reference:
README.md:26, SURVEY.md §4). BASELINE.md makes WikiText-2 perplexity the
quality gate for quantization (<=0.1 ppl delta vs FP16 at INT4), so this
module computes it properly:

  * the text is tokenized once, split into non-overlapping windows of
    `ctx` tokens (llama.cpp's ppl methodology);
  * each window runs one full-attention forward (return_all_logits);
  * NLL is averaged over every predicted position except the first
    `min_context` of each window (those lack context and would bias ppl
    upward);
  * ppl = exp(mean NLL).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from llamago_tpu.config import ModelConfig
from llamago_tpu.models.llama import forward_impl
from llamago_tpu.runtime.kv_cache import KVCache
from llamago_tpu.tokenizer import Vocab, tokenize


@partial(jax.jit, static_argnames=("config",))
def _window_nll(params, tokens: jnp.ndarray, config: ModelConfig) -> jnp.ndarray:
    """Sum of next-token NLL and count over one [1, T] window.

    Returns (nll_sum [T-1], valid positions are all of them — masking by
    min_context happens host-side)."""
    b, t = tokens.shape
    cache = KVCache.create(config, batch=b, max_seq=t)
    logits, _ = forward_impl(
        params, tokens, cache, jnp.zeros(b, jnp.int32), config,
        return_all_logits=True,
    )
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    targets = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return nll[0]  # [T-1]


def perplexity(
    params,
    config: ModelConfig,
    token_ids: list[int] | np.ndarray,
    ctx: int = 512,
    min_context: int = 32,
    max_windows: int | None = None,
) -> dict:
    """Perplexity over a token stream. Returns {ppl, nll, n_tokens, n_windows}."""
    ids = np.asarray(token_ids, np.int32)
    n_windows = len(ids) // ctx
    if max_windows is not None:
        n_windows = min(n_windows, max_windows)
    if n_windows == 0:
        raise ValueError(f"need at least {ctx} tokens, got {len(ids)}")

    total_nll = 0.0
    total_count = 0
    for w in range(n_windows):
        window = ids[w * ctx : (w + 1) * ctx]
        nll = np.asarray(_window_nll(params, jnp.asarray(window[None, :]), config))
        # every window (including the first) skips its first min_context
        # positions: they predict with little context and bias ppl upward
        # (llama.cpp methodology)
        start = min(min_context, len(nll) - 1)
        total_nll += float(nll[start:].sum())
        total_count += len(nll) - start
    mean_nll = total_nll / total_count
    return {
        "ppl": math.exp(mean_nll),
        "nll": mean_nll,
        "n_tokens": total_count,
        "n_windows": n_windows,
    }


def perplexity_of_text(
    params, config: ModelConfig, vocab: Vocab, text: str, **kw
) -> dict:
    ids = tokenize(vocab, " " + text, bos=True)
    return perplexity(params, config, ids, **kw)
