"""Tile sweep over the REAL production matmul shapes (7B/13B/70B-shard).

The generic rungs in ops/kernels._plan_tiles pick small tn for the
non-power-of-2 production widths (w13 n=22016 -> tn=512, w1/w3 n=11008
-> tn=256), and the 70B-shard sweep showed base int4 gains ~5% from
wider tiles (tn=3584 vs 1024). This sweeps lane-aligned divisor tiles
per real shape; winners feed a measured-preference table in
ops/kernels.py.

Run: python scripts/shape_sweep.py [base|base8 ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import kernel_lab as lab  # noqa: E402

QK = 32


def aligned_divisors(dim, lane=128, cap=8192):
    out = []
    for t in range(lane, min(dim, cap) + 1, lane):
        if dim % t == 0:
            out.append(t)
    if dim <= cap:
        out.append(dim) if dim not in out else None
    return out


# (label, k, n, layers) — layers scaled so each config streams a similar
# total byte count per sweep step.
SHAPES = [
    ("7b_w13", 4096, 22016, 8),
    ("7b_w2", 11008, 4096, 16),
    ("7b_attn", 4096, 4096, 24),
    ("7b_lmhead", 4096, 32000, 6),
    ("70b_w13sh", 8192, 7168, 12),
    ("70b_w2sh", 3584, 8192, 24),
]

VARS = sys.argv[1:] or ["base", "base8"]

for label, k, n, layers in SHAPES:
    tks = [t for t in (256, 512, 1024, 1792, 2048, 3584, 4096)
           if k % t == 0 and (t // 2) % 32 == 0]
    if not tks and k % QK == 0:
        tks = [k]
    tns = aligned_divisors(n)
    for nm in VARS:
        kern, opts = lab.VARIANTS[nm]
        best = (0.0, None)
        for tk in [max(tks)] if os.environ.get("SWEEP_TK_MAX") else tks:
            for tn in tns:
                # q tile (packed int4) + f32 dequant tile VMEM guard: skip
                # configs far past what the 70B sweep showed compiling.
                if tk * tn * 4 > 15 * 1024 * 1024:
                    continue
                if tk * tn < 512 * 512:  # too small to be competitive
                    continue
                try:
                    lab.run_variant(f"{label}/{nm}", kern, opts, k=k, n=n,
                                    layers=layers, tk=tk, tn=tn)
                except Exception as e:
                    print(f"{label}/{nm}  tk={tk} tn={tn}: SKIP "
                          f"({(str(e).splitlines() or [repr(e)])[0][:80]})")
