"""Test harness: run everything on a simulated 8-device CPU mesh.

The reference has no tests at all (SURVEY.md §4); this suite is designed
from scratch. Multi-chip sharding is validated with XLA's host-platform
device-count trick so no real TPU pod is needed.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Force the CPU backend with 8 virtual devices for mesh/sharding tests.
# NOTE: the JAX_PLATFORMS/XLA_FLAGS env-var route does NOT work under this
# environment's 'axon' TPU plugin — jax.config.update is what takes effect.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# NOTE: do not enable the persistent compilation cache here — XLA:CPU AOT
# entries recorded on this machine reload with mismatched machine features
# ("+prefer-no-scatter ... could lead to SIGILL" warnings) and barely hit.

from llamago_tpu.config import ModelConfig  # noqa: E402
from llamago_tpu.tokenizer import Vocab  # noqa: E402


def make_test_vocab() -> Vocab:
    """A small scored vocab exercising merge priorities and byte fallback.

    ids 0..2 = <unk>/<s>/</s> (control pieces are empty strings in ggjt,
    reference: scripts/convert-pth-to-ggml.py:122-125), ids 3..258 = byte
    pieces, then scored word pieces.
    """
    tokens: list[tuple[bytes, float]] = [(" ⁇ ".encode(), 0.0), (b"", 0.0), (b"", 0.0)]
    tokens += [(bytes([b]), -1000.0) for b in range(256)]
    pieces: list[tuple[bytes, float]] = [
        (b"h", -10.0), (b"e", -10.0), (b"l", -10.0), (b"o", -10.0),
        (b"he", -5.0), (b"ll", -4.0), (b"llo", -3.0), (b"hello", -1.0),
        (b" ", -10.0), (b" hello", -0.5), (b"w", -10.0), (b"o r", -100.0),
        (b"wo", -6.0), (b"r", -10.0), (b"d", -10.0), (b"rl", -7.0),
        (b"wor", -8.0), (b"worl", -7.5),
        (b"world", -1.5), (b" world", -0.6), (b"\n", -20.0),
    ]
    # scores as float32 so ggjt roundtrips are bit-exact
    tokens += [(p, float(np.float32(s))) for p, s in pieces]
    return Vocab(tokens)


@pytest.fixture(scope="session")
def test_vocab() -> Vocab:
    return make_test_vocab()


@pytest.fixture(scope="session")
def tiny_config() -> ModelConfig:
    from llamago_tpu.config import MODEL_PRESETS

    return MODEL_PRESETS["tiny"]


@pytest.fixture(scope="session")
def tiny_gqa_config() -> ModelConfig:
    from llamago_tpu.config import MODEL_PRESETS

    return MODEL_PRESETS["tiny-gqa"]


def random_ggjt_tensors(config: ModelConfig, seed: int = 0) -> dict[str, np.ndarray]:
    """Random checkpoint tensors in the ggjt file layout ([out, in])."""
    rng = np.random.default_rng(seed)
    d, v, f = config.dim, config.vocab_size, config.ffn_hidden
    kvd = config.kv_heads * config.head_dim

    def mat(out_dim, in_dim):
        return (rng.standard_normal((out_dim, in_dim)) * 0.02).astype(np.float32)

    tensors = {
        "tok_embeddings.weight": mat(v, d),
        "norm.weight": np.ones(d, np.float32) + rng.standard_normal(d).astype(np.float32) * 0.01,
        "output.weight": mat(v, d),
    }
    for i in range(config.n_layers):
        p = f"layers.{i}."
        tensors[p + "attention_norm.weight"] = (
            np.ones(d, np.float32) + rng.standard_normal(d).astype(np.float32) * 0.01
        )
        tensors[p + "attention.wq.weight"] = mat(d, d)
        tensors[p + "attention.wk.weight"] = mat(kvd, d)
        tensors[p + "attention.wv.weight"] = mat(kvd, d)
        tensors[p + "attention.wo.weight"] = mat(d, d)
        tensors[p + "ffn_norm.weight"] = (
            np.ones(d, np.float32) + rng.standard_normal(d).astype(np.float32) * 0.01
        )
        tensors[p + "feed_forward.w1.weight"] = mat(f, d)
        tensors[p + "feed_forward.w2.weight"] = mat(d, f)
        tensors[p + "feed_forward.w3.weight"] = mat(f, d)
    return tensors


def pytest_collection_modifyitems(config, items):
    """Mark the recorded long-running tests `slow` so the default gate
    (`make test`, -m "not slow") stays fast on a 1-CPU box while
    `make test-all` runs everything. tests/slow_tests.txt is the
    recorded >=4.5s set from a full single-threaded run (regenerate
    with `pytest --durations=0` and scripts/update_slow_tests.py);
    node ids that stop existing are ignored, new slow tests are added
    by re-recording."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "slow_tests.txt")
    if not os.path.exists(path):
        return
    with open(path) as f:
        slow = {ln.strip() for ln in f if ln.strip()}
    mark = pytest.mark.slow
    for item in items:
        # nodeid is rootdir-relative ("tests/test_x.py::test_y[param]")
        if item.nodeid in slow:
            item.add_marker(mark)
