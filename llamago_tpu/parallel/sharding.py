"""PartitionSpecs for parameters and KV cache (Megatron-style TP).

The sharding rules mirror — in the forward direction — the reference
converter's shard-reassembly table (reference:
scripts/convert-pth-to-ggml.py:161-188, which REASSEMBLES Meta's TP
shards: wq/wk/wv/w1/w3/output were split along out_features, wo/w2 and
tok_embeddings along the other dim). We split them back the same way:

  column-parallel (shard out_features):  wq wk wv w1 w3 output
  row-parallel    (shard in_features):   wo w2      (partial sums ->
                                         XLA inserts the tp all-reduce)
  replicated:                            norms, tok_embeddings

The KV cache shards along kv_heads, so attention is fully local to each
tp shard; per-slot decode batch shards along dp.

A dim is sharded only if divisible by the axis size; otherwise that leaf
falls back to replication (e.g. tiny test configs).
"""

from __future__ import annotations

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llamago_tpu.config import ModelConfig

# PartitionSpecs per parameter leaf, [L, in, out] layout ("layers/" leaves
# carry a leading layer axis that is never sharded).
_LAYER_SPECS = {
    "attention_norm": P(),
    "ffn_norm": P(),
    "wq": P(None, None, "tp"),
    "wk": P(None, None, "tp"),
    "wv": P(None, None, "tp"),
    "wo": P(None, "tp", None),
    "w1": P(None, None, "tp"),
    "w3": P(None, None, "tp"),
    "w2": P(None, "tp", None),
}

_TOP_SPECS = {
    "tok_embeddings": P(),
    "norm": P(),
    "output": P(None, "tp"),  # vocab-sharded lm head
}


def _axis_ok(mesh: Mesh, shape: tuple[int, ...], spec: P) -> bool:
    for dim, names in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if names is None:
            continue
        size = mesh.shape[names] if isinstance(names, str) else 1
        if dim % size != 0:
            return False
    return True


def _shard(mesh: Mesh, shape: tuple[int, ...], spec: P) -> NamedSharding:
    if not _axis_ok(mesh, shape, spec):
        spec = P()
    return NamedSharding(mesh, spec)


def param_shardings(config: ModelConfig, mesh: Mesh):
    """Sharding pytree matching checkpoint/params.py's layout.

    Attention projections shard only when the TP size divides the HEAD
    count (not merely heads*head_dim) — splitting inside head_dim stays
    correct under GSPMD but forces resharding collectives around
    attention; replication is cheaper for those leaves.
    """
    d, v, f = config.dim, config.vocab_size, config.ffn_hidden
    h, kv, hd, n = config.n_heads, config.kv_heads, config.head_dim, config.n_layers
    tp = mesh.shape["tp"]
    heads_ok = h % tp == 0
    kv_ok = kv % tp == 0
    shapes = {
        "tok_embeddings": (v, d),
        "norm": (d,),
        "output": (d, v),
        "layers": {
            "attention_norm": (n, d),
            "ffn_norm": (n, d),
            "wq": (n, d, h * hd),
            "wk": (n, d, kv * hd),
            "wv": (n, d, kv * hd),
            "wo": (n, h * hd, d),
            "w1": (n, d, f),
            "w2": (n, f, d),
            "w3": (n, d, f),
        },
    }
    head_gate = {"wq": heads_ok, "wo": heads_ok, "wk": kv_ok, "wv": kv_ok}
    top = {k: _shard(mesh, shapes[k], _TOP_SPECS[k]) for k in _TOP_SPECS}
    layers = {
        k: _shard(
            mesh,
            shapes["layers"][k],
            _LAYER_SPECS[k] if head_gate.get(k, True) else P(),
        )
        for k in _LAYER_SPECS
    }
    return {**top, "layers": layers}


def cache_sharding(config: ModelConfig, mesh: Mesh,
                   batch: int | None = None) -> NamedSharding:
    """KV cache [L, B, KV, S, hd]: kv_heads on tp, batch slots on dp,
    cache positions on sp (sequence parallel, long-context scaling).
    Pass `batch` (e.g. the engine's slot count) to fall back to a
    replicated batch dim when it doesn't divide dp."""
    tp_ax = "tp" if config.kv_heads % mesh.shape["tp"] == 0 else None
    sp = mesh.shape.get("sp", 1)
    sp_ax = "sp" if sp > 1 and config.max_seq_len % sp == 0 else None
    dp_ax = "dp"
    if batch is not None and batch % mesh.shape.get("dp", 1) != 0:
        dp_ax = None
    return NamedSharding(mesh, P(None, dp_ax, tp_ax, sp_ax, None))


def logits_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp", None))
