"""Tile-size sweep for the fused dequant-matmul (kernel lab follow-up).

The r3 lab run showed int4 `base` at 240 GB/s vs `dma_only` at 311 GB/s
at tk=1024/tn=1024 — while bf16 streaming (4x the bytes per tile) hits
497 GB/s. Hypothesis: the int4 byte rate is capped by per-tile DMA
granularity, not the VPU decode chain; bigger tiles should raise both
the dma_only ceiling and the fused kernel. n=7168 divisors: tn in
{512, 1024, 1792, 3584}; VMEM bounds tk*tn.

Run: python scripts/tile_sweep.py [variant ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import kernel_lab as lab  # noqa: E402

K = int(os.environ.get("LAB_K", 8192))
N = int(os.environ.get("LAB_N", 7168))
VARS = sys.argv[1:] or ["dma_only", "base", "base8"]
TKS = [int(v) for v in os.environ.get("SWEEP_TK", "1024,2048,4096").split(",")]
TNS = [int(v) for v in os.environ.get("SWEEP_TN", "512,1024,1792,3584").split(",")]

for nm in VARS:
    kern, opts = lab.VARIANTS[nm]
    best = (0.0, None)
    for tk in TKS:
        if K % tk:
            continue
        for tn in TNS:
            if N % tn:
                continue
            # q tile bytes (int4 packed): tk/2 * tn; keep under ~6 MB so
            # double-buffering + x/out tiles fit VMEM.
            if tk * tn // 2 > 6 * 1024 * 1024:
                continue
            try:
                gbps = lab.run_variant(nm, kern, opts, k=K, n=N,
                                       tk=tk, tn=tn)
            except Exception as e:
                print(f"{nm:>14s}  tk={tk} tn={tn}: SKIP "
                      f"({(str(e).splitlines() or [repr(e)])[0][:90]})")
                continue
            if gbps > best[0]:
                best = (gbps, (tk, tn))
    print(f"== {nm}: best {best[0]:.1f} GB/s at tk,tn={best[1]}")
