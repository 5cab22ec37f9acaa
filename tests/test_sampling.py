"""Sampler tests: pipeline parity with a numpy reimplementation of the
reference order, penalty semantics, window eviction, distribution checks."""

import jax
import jax.numpy as jnp
import numpy as np

from llamago_tpu.ops.sampling import SamplerState, push_tokens, reset_slots, sample

V = 64


def np_pipeline(logits, window_tokens, temp, top_k, top_p, rp):
    """Numpy re-derivation of the reference pipeline (llama.go:455-707),
    up to (but not including) the final draw."""
    scale = 1.0 / temp
    x = logits * scale
    present = np.zeros(V, bool)
    present[[t for t in window_tokens if t >= 0]] = True
    pen = np.where(logits < 0, logits * scale * rp, logits * scale / rp)
    x = np.where(present, pen, x)
    order = np.argsort(-x)[:top_k]
    vals = x[order]
    e = np.exp(vals - vals.max())
    probs = e / e.sum()
    csum = np.cumsum(probs)
    keep = (csum - probs) < top_p
    probs = np.where(keep, probs, 0.0)
    probs = probs / probs.sum()
    return probs, order


def mk_state(window=8, batch=1):
    return SamplerState.create(batch, window, V)


def arr(*vals, dtype=jnp.float32):
    return jnp.array(vals, dtype)


def test_greedy_at_temp_zero():
    logits = jnp.zeros((1, V), jnp.float32).at[0, 17].set(5.0)
    tok = sample(
        jax.random.PRNGKey(0), logits, mk_state(),
        arr(0.0), jnp.array([40]), arr(0.95), arr(1.1),
    )
    assert int(tok[0]) == 17


def test_top_k_one_is_argmax_any_temp():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((1, V)), jnp.float32)
    expect = int(jnp.argmax(logits[0]))
    for seed in range(5):
        tok = sample(
            jax.random.PRNGKey(seed), logits, mk_state(),
            arr(0.8), jnp.array([1]), arr(1.0), arr(1.1),
        )
        assert int(tok[0]) == expect


def test_probs_match_numpy_pipeline():
    rng = np.random.default_rng(7)
    logits = rng.standard_normal(V).astype(np.float32) * 2
    window = [3, 9, 9, 20]
    state = mk_state()
    state = push_tokens(state, jnp.array([window], jnp.int32), jnp.array([True]))
    temp, top_k, top_p, rp = 0.7, 12, 0.9, 1.15
    _, (probs, idx) = sample(
        jax.random.PRNGKey(0), jnp.asarray(logits[None]), state,
        arr(temp), jnp.array([top_k]), arr(top_p), arr(rp),
        return_probs=True,
    )
    ref_probs, ref_order = np_pipeline(logits, window, temp, top_k, top_p, rp)
    got = np.zeros(V)
    got[np.asarray(idx[0])] = np.asarray(probs[0])
    want = np.zeros(V)
    want[ref_order] = ref_probs
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_repeat_penalty_sign_aware():
    # positive logit in window: divided (suppressed); negative: multiplied
    logits = np.full(V, -10.0, np.float32)
    logits[5] = 4.0   # will be in window
    logits[6] = 3.9   # not in window
    state = mk_state()
    state = push_tokens(state, jnp.array([[5]], jnp.int32), jnp.array([True]))
    # with penalty 2.0 at temp 1: token5 -> 2.0, token6 -> 3.9 wins
    tok = sample(
        jax.random.PRNGKey(0), jnp.asarray(logits[None]), state,
        arr(1.0), jnp.array([2]), arr(0.5), arr(2.0),
    )
    assert int(tok[0]) == 6
    # negative logit: -2 in window with penalty 2 -> -4 (worse than -3)
    logits2 = np.full(V, -10.0, np.float32)
    logits2[7] = -2.0
    logits2[8] = -3.0
    state2 = mk_state()
    state2 = push_tokens(state2, jnp.array([[7]], jnp.int32), jnp.array([True]))
    tok2 = sample(
        jax.random.PRNGKey(0), jnp.asarray(logits2[None]), state2,
        arr(1.0), jnp.array([1]), arr(1.0), arr(2.0),
    )
    assert int(tok2[0]) == 8


def test_window_eviction():
    # window of 4: pushing 5 tokens evicts the first
    state = mk_state(window=4)
    state = push_tokens(
        state, jnp.array([[1, 2, 3, 4, 5]], jnp.int32), jnp.array([True])
    )
    counts = np.asarray(state.counts[0])
    assert counts[1] == 0  # evicted
    assert counts[2] == counts[3] == counts[4] == counts[5] == 1
    assert int(state.ptr[0]) == 1


def test_reset_slots():
    state = mk_state(window=4, batch=2)
    state = push_tokens(
        state, jnp.array([[1, 2], [3, 4]], jnp.int32), jnp.array([True, True])
    )
    state = reset_slots(state, jnp.array([True, False]))
    assert np.asarray(state.counts[0]).sum() == 0
    assert np.asarray(state.counts[1]).sum() == 2
    assert int(state.ptr[0]) == 0 and int(state.ptr[1]) == 2


def test_categorical_distribution():
    # 3 tokens with known probs; empirical frequencies must be close
    logits = np.full(V, -1e9, np.float32)
    logits[[10, 11, 12]] = np.log([0.6, 0.3, 0.1]).astype(np.float32)
    counts = np.zeros(V)
    n = 2000
    keys = jax.random.split(jax.random.PRNGKey(42), n)
    batched = jax.vmap(
        lambda k: sample(
            k, jnp.asarray(logits[None]), mk_state(),
            arr(1.0), jnp.array([40]), arr(1.0), arr(1.0),
        )[0]
    )(keys)
    ids, c = np.unique(np.asarray(batched), return_counts=True)
    freq = dict(zip(ids.tolist(), (c / n).tolist()))
    assert abs(freq.get(10, 0) - 0.6) < 0.05
    assert abs(freq.get(11, 0) - 0.3) < 0.05
    assert abs(freq.get(12, 0) - 0.1) < 0.03


def test_top_p_inclusive_cut():
    # probs ~ [0.5, 0.3, 0.2]; top_p=0.6 keeps first TWO (crossing token
    # included, llama.go:618-634), never the third
    logits = np.full(V, -1e9, np.float32)
    logits[[1, 2, 3]] = np.log([0.5, 0.3, 0.2]).astype(np.float32)
    seen = set()
    for seed in range(200):
        tok = sample(
            jax.random.PRNGKey(seed), jnp.asarray(logits[None]), mk_state(),
            arr(1.0), jnp.array([40]), arr(0.6), arr(1.0),
        )
        seen.add(int(tok[0]))
    assert 3 not in seen
    assert seen == {1, 2}


def test_per_slot_params():
    # slot 0 greedy, slot 1 top-k=1: both deterministic, different logits
    logits = np.zeros((2, V), np.float32)
    logits[0, 30] = 9.0
    logits[1, 31] = 9.0
    tok = sample(
        jax.random.PRNGKey(0), jnp.asarray(logits), mk_state(batch=2),
        arr(0.0, 0.8), jnp.array([40, 1]), arr(0.95, 0.95), arr(1.1, 1.1),
    )
    assert int(tok[0]) == 30 and int(tok[1]) == 31


def test_top_p_zero_degrades_to_greedy_not_nan():
    """Regression: top_p=0 used to mask EVERY nucleus candidate, so the
    renorm divided by zero and `jax.random.categorical` over NaN logprobs
    emitted garbage ids. The >=1-candidate invariant (the reference's loop
    always keeps at least one, llama.go:618-634) now forces the top
    candidate, so top_p=0 means greedy-over-top-k."""
    rng = np.random.default_rng(11)
    logits = jnp.asarray(rng.standard_normal((2, V)), jnp.float32)
    expect = np.asarray(jnp.argmax(logits, axis=-1))
    for seed in range(5):
        tok = sample(
            jax.random.PRNGKey(seed), logits, mk_state(batch=2),
            arr(0.9, 0.9), jnp.array([40, 40]), arr(0.0, 0.0), arr(1.1, 1.1),
        )
        t = np.asarray(tok)
        assert (t >= 0).all() and (t < V).all()
        assert (t == expect).all()


def test_tiny_top_p_keeps_only_top_candidate():
    # top_p smaller than the top prob: keep exactly the argmax (inclusive
    # crossing-token rule), never a lower-ranked candidate
    logits = np.full(V, -1e9, np.float32)
    logits[[5, 6]] = np.log([0.7, 0.3]).astype(np.float32)
    for seed in range(50):
        tok = sample(
            jax.random.PRNGKey(seed), jnp.asarray(logits[None]), mk_state(),
            arr(1.0), jnp.array([40]), arr(0.01), arr(1.0),
        )
        assert int(tok[0]) == 5
