"""Training step: next-token cross-entropy + AdamW.

The reference carries a vestigial, never-executed backward pass
(reference: ComputeBackward/BuildBackward, pkg/ml/ml.go:1118-1340, with
training as an unchecked V3 roadmap item, README.md:61). On JAX the
backward pass is jax.grad — so instead of porting half-finished gradient
rules, this module provides a REAL train step over the same forward
(models/llama.py), sharded by the same (dp, tp) mesh as inference:
batch along dp, weights along tp, gradients all-reduced by GSPMD.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from llamago_tpu.config import ModelConfig
from llamago_tpu.models.llama import forward_impl
from llamago_tpu.runtime.kv_cache import KVCache


def loss_fn(params, tokens: jnp.ndarray, config: ModelConfig) -> jnp.ndarray:
    """Mean next-token cross-entropy over [B, T] token batches."""
    b, t = tokens.shape
    # training always uses a dense cache: quantize_kv_rows rounds, which
    # would zero the K/V gradients (kv_dtype="int8" is inference-only)
    cache = KVCache.create(config, batch=b, max_seq=t,
                           dtype=jnp.dtype(config.dtype), quantized=False)
    logits, _ = forward_impl(
        params,
        tokens,
        cache,
        jnp.zeros(b, jnp.int32),
        config,
        return_all_logits=True,
        remat=True,  # activation rematerialization: 7B QLoRA fits 16 GB
    )
    targets = tokens[:, 1:]
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits[:, :-1].astype(jnp.float32), targets
    )
    return ce.mean()


def make_optimizer(lr: float = 1e-4) -> optax.GradientTransformation:
    return optax.adamw(lr)


@partial(jax.jit, static_argnames=("config",), donate_argnames=("params", "opt_state"))
def train_step(params, opt_state, tokens: jnp.ndarray, config: ModelConfig):
    """One SPMD training step: loss, grads, AdamW update."""
    loss, grads = jax.value_and_grad(loss_fn)(params, tokens, config)
    updates, opt_state = make_optimizer().update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def save_train_state(path: str, params, opt_state, step: int) -> None:
    """Checkpoint params + optimizer state + step via orbax (async-safe,
    sharding-aware — sharded trees restore onto the same mesh). The
    inference-side export is checkpoint/params.py:export_ggjt_tensors;
    this is the training-resume side (SURVEY.md §5 checkpoint/resume)."""
    import os

    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.abspath(path),
            {"params": params, "opt_state": opt_state, "step": step},
            force=True,
        )


def load_train_state(path: str, params_like, opt_state_like):
    """Restore a train state. `*_like` provide the tree structure (and
    shardings, when their leaves are sharded arrays)."""
    import os

    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            os.path.abspath(path),
            {"params": params_like, "opt_state": opt_state_like, "step": 0},
        )
    return restored["params"], restored["opt_state"], int(restored["step"])
