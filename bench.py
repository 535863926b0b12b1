"""jsvx benchmark: 1080p-equivalent decode throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "frames/s", "vs_baseline": N}

Baseline: the reference WebGL player publishes no numbers; its implied
throughput is real-time playback (30 fps at 1080p).  The driver target is
>= 10x that on one v5e chip, so ``vs_baseline`` is fps / 300 — 1.0 means
the 10x north-star is met (BASELINE.md).

The measured step is the full device decode: integer dequant + 8x8 IDCT +
half-pel MC + clamp over a stacked GOP via lax.scan, on synthetic
1080p-shaped FrameTensors with realistic coefficient sparsity (the VLC
host parse is benchmarked separately; see tools/bench_parse.py).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def build_gop(mb_h: int, mb_w: int, n_frames: int, seed: int = 0):
    import jax
    from __graft_entry__ import _synthetic_frame_inputs

    frames = [_synthetic_frame_inputs(mb_h, mb_w, is_p=(i > 0), seed=seed + i,
                                      max_mv=24)
              for i in range(n_frames)]
    return jax.tree.map(lambda *xs: np.stack(xs), *frames)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from jsvx.kernels.decode import make_constants
    from jsvx.pipeline.gop import decode_gop_scan, zero_refs

    platform = jax.devices()[0].platform
    # 1080p coded size: 1920 x 1088 = 120 x 68 macroblocks
    mb_h, mb_w = 68, 120
    n_frames = 8 if platform != "cpu" else 2
    h, w = mb_h * 16, mb_w * 16

    stacked = build_gop(mb_h, mb_w, n_frames)
    consts = make_constants()
    refs = zero_refs(h, w)

    stacked = jax.device_put(stacked)
    refs = jax.device_put(refs)

    # compile + warmup
    outs, final = decode_gop_scan(stacked, refs, consts)
    jax.block_until_ready(outs)

    reps = 5 if platform != "cpu" else 1
    t0 = time.perf_counter()
    for _ in range(reps):
        outs, final = decode_gop_scan(stacked, refs, consts)
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    fps = reps * n_frames / dt
    print(json.dumps({
        "metric": "1080p_device_decode_frames_per_s_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 300.0, 3),
    }))


if __name__ == "__main__":
    main()
