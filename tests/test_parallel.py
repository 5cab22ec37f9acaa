"""GSPMD tensor-parallel tests on the simulated 8-device CPU mesh:
sharded forward must equal single-device forward bit-for-bit semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llamago_tpu.checkpoint.params import host_parameters
from llamago_tpu.models.llama import forward
from llamago_tpu.parallel import cache_sharding, make_mesh, param_shardings
from llamago_tpu.runtime.kv_cache import KVCache

from conftest import random_ggjt_tensors


def test_mesh_shape():
    mesh = make_mesh(tp=4, dp=2)
    assert dict(mesh.shape) == {"dp": 2, "sp": 1, "tp": 4}
    mesh = make_mesh(tp=2, dp=2, sp=2)
    assert dict(mesh.shape) == {"dp": 2, "sp": 2, "tp": 2}
    with pytest.raises(ValueError, match="devices"):
        make_mesh(tp=16, dp=2)


def _sharded_setup(base_config, tp, dp=1, seed=5):
    config = base_config.replace(dtype="float32", weight_dtype="float32")
    tensors = random_ggjt_tensors(config, seed=seed)
    host = host_parameters(config, tensors)
    params_local = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32)), host
    )
    mesh = make_mesh(tp=tp, dp=dp)
    shardings = param_shardings(config, mesh)
    params_sharded = jax.tree.map(
        lambda a, s: jax.device_put(jnp.asarray(np.asarray(a, np.float32)), s),
        host, shardings,
    )
    return config, mesh, params_local, params_sharded


def test_tp_forward_matches_local(tiny_config):
    config, mesh, local, sharded = _sharded_setup(tiny_config, tp=8)
    tokens = jnp.array([[1, 5, 42, 300]], jnp.int32)
    pos = jnp.zeros(1, jnp.int32)

    cache = KVCache.create(config, batch=1, dtype=jnp.float32)
    ref, _ = forward(local, tokens, cache, pos, config, return_all_logits=True)

    cs = cache_sharding(config, mesh)
    cache_s = KVCache.create(config, batch=1, dtype=jnp.float32, sharding=cs)
    got, new_cache = forward(sharded, tokens, cache_s, pos, config,
                             return_all_logits=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_tp_sharding_specs_applied(tiny_config):
    # tp=4 divides n_heads=4: attention + FFN + vocab all shard
    config, mesh, _, sharded = _sharded_setup(tiny_config, tp=4)
    wq_shard = sharded["layers"]["wq"].sharding
    assert wq_shard.spec == jax.sharding.PartitionSpec(None, None, "tp")
    # vocab-sharded lm head
    assert sharded["output"].sharding.spec == jax.sharding.PartitionSpec(None, "tp")
    # norms replicated
    assert sharded["norm"].sharding.spec == jax.sharding.PartitionSpec()


def test_indivisible_dims_fall_back_to_replication(tiny_gqa_config):
    # kv_heads=2 with tp=4 does not divide: wk/wv replicate (sharding
    # inside head_dim would force resharding around attention), wq shards
    config = tiny_gqa_config.replace(dtype="float32", weight_dtype="float32")
    mesh = make_mesh(tp=4)
    sh = param_shardings(config, mesh)
    assert sh["layers"]["wk"].spec == jax.sharding.PartitionSpec()
    assert sh["layers"]["wv"].spec == jax.sharding.PartitionSpec()
    assert sh["layers"]["wq"].spec == jax.sharding.PartitionSpec(None, None, "tp")
    assert cache_sharding(config, mesh).spec == jax.sharding.PartitionSpec(
        None, "dp", None, None, None
    )


def test_tp_gqa_forward_matches_local(tiny_gqa_config):
    # tp=2 divides kv_heads=2: KV cache genuinely head-sharded
    config, mesh, local, sharded = _sharded_setup(tiny_gqa_config, tp=2, seed=6)
    assert cache_sharding(config, mesh).spec[2] == "tp"  # [L, B, KV, S, hd]
    tokens = jnp.array([[1, 9, 77]], jnp.int32)
    pos = jnp.zeros(1, jnp.int32)
    cache = KVCache.create(config, batch=1, dtype=jnp.float32)
    ref, _ = forward(local, tokens, cache, pos, config)
    cache_s = KVCache.create(
        config, batch=1, dtype=jnp.float32, sharding=cache_sharding(config, mesh)
    )
    got, _ = forward(sharded, tokens, cache_s, pos, config)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_tp_decode_through_cache(tiny_config):
    """Prefill + decode with sharded params/cache stays consistent with local."""
    config, mesh, local, sharded = _sharded_setup(tiny_config, tp=8, seed=7)
    ids = np.array([1, 5, 42, 300, 7], np.int32)

    def run(params, sharding=None):
        cache = KVCache.create(config, batch=1, dtype=jnp.float32, sharding=sharding)
        _, cache = forward(params, jnp.asarray(ids[None, :3]), cache,
                           jnp.zeros(1, jnp.int32), config)
        outs = []
        for i in range(3, len(ids)):
            logits, cache = forward(params, jnp.asarray(ids[None, i:i+1]), cache,
                                    jnp.array([i], jnp.int32), config)
            outs.append(np.asarray(logits[0]))
        return outs

    ref = run(local)
    got = run(sharded, sharding=cache_sharding(config, mesh))
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g, r, rtol=1e-4, atol=1e-4)
