"""Training checkpoint/resume (orbax): save params+optimizer+step, restore
(including onto a sharded mesh), and continue stepping bit-identically."""

import jax
import jax.numpy as jnp
import numpy as np

from llamago_tpu.checkpoint.params import random_parameters
from llamago_tpu.config import ModelConfig
from llamago_tpu.models.training import (
    load_train_state,
    make_optimizer,
    save_train_state,
    train_step,
)


def _cfg():
    return ModelConfig(vocab_size=64, dim=32, n_layers=1, n_heads=2,
                       multiple_of=32, max_seq_len=16, dtype="float32",
                       weight_dtype="float32")


def test_train_state_roundtrip_and_resume(tmp_path):
    config = _cfg()
    params = random_parameters(config, seed=1)
    opt_state = make_optimizer().init(params)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 64, (2, 8)).astype(np.int32))

    params, opt_state, _ = train_step(params, opt_state, tokens, config)
    save_train_state(str(tmp_path / "ck"), params, opt_state, step=1)

    # uninterrupted continuation
    cont_params, cont_opt, loss_a = train_step(params, opt_state, tokens, config)

    # resumed continuation must match bit-for-bit
    like_p = random_parameters(config, seed=1)
    like_o = make_optimizer().init(like_p)
    r_params, r_opt, step = load_train_state(str(tmp_path / "ck"), like_p, like_o)
    assert step == 1
    r_params, r_opt, loss_b = train_step(r_params, r_opt, tokens, config)
    assert float(loss_a) == float(loss_b)
    for a, b in zip(jax.tree.leaves(cont_params), jax.tree.leaves(r_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_state_restores_sharded(tmp_path):
    from llamago_tpu.parallel import make_mesh, param_shardings

    config = _cfg()
    params = random_parameters(config, seed=2)
    opt_state = make_optimizer().init(params)
    save_train_state(str(tmp_path / "ck"), params, opt_state, step=5)

    mesh = make_mesh(tp=2, dp=1)
    shardings = param_shardings(config, mesh)
    like_p = random_parameters(config, seed=2, shardings=shardings)
    like_o = make_optimizer().init(like_p)
    r_params, r_opt, step = load_train_state(str(tmp_path / "ck"), like_p, like_o)
    assert step == 5
    # restored onto the mesh with the target shardings
    out_shard = r_params["layers"]["w1"].sharding
    assert out_shard.is_equivalent_to(shardings["layers"]["w1"], 3)
    np.testing.assert_allclose(np.asarray(r_params["layers"]["w1"]),
                               np.asarray(params["layers"]["w1"]))
