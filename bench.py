"""jsvx benchmark: 1080p-equivalent decode throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "frames/s", "vs_baseline": N}

Baseline: the reference WebGL player publishes no numbers; its implied
throughput is real-time playback (30 fps at 1080p).  The driver target is
>= 10x that on one v5e chip, so ``vs_baseline`` is fps / 300 — 1.0 means
the 10x north-star is met (BASELINE.md).

The measured step is the full device decode over a stacked GOP via
lax.scan (integer dequant + 8x8 IDCT + half-pel MC + clamp) on synthetic
1080p-shaped FrameTensors with realistic coefficient sparsity and motion,
using the fused Pallas kernels on TPU (XLA path on CPU).

Measurement notes: remote-tunnel runtimes may cache identical-input
executions and return from block_until_ready before compute finishes, so
every trial uses fresh input data and the timed program reduces all
output planes to a checksum scalar that is fetched to the host; the
host round-trip cost is measured separately and subtracted.  The VLC
host parse is benchmarked separately (python -m jsvx.tools.bench_parse).
"""

from __future__ import annotations

import json
import time

import numpy as np


def build_gop(mb_h: int, mb_w: int, n_frames: int, seed: int = 0):
    import jax
    from __graft_entry__ import _synthetic_frame_inputs

    frames = [_synthetic_frame_inputs(mb_h, mb_w, is_p=(i > 0),
                                      seed=seed + i, max_mv=24)
              for i in range(n_frames)]
    return jax.tree.map(lambda *xs: np.stack(xs), *frames)


def bench_end_to_end() -> dict:
    """Full product path at 1080p: real encoded stream -> packed parallel
    host parse -> device GOP scan (VERDICT r1 #1: measure the product,
    not just the device stage)."""
    import os
    import tempfile

    from jsvx.pipeline.transcode import transcode

    fix = os.path.join(tempfile.gettempdir(), "jsvx_bench_1080p_v2.jsv")
    if not os.path.exists(fix):
        from jsvx.tools.encoder import EncoderConfig, JsvEncoder

        h, w = 1088, 1920
        rng = np.random.default_rng(3)
        yy, xx = np.mgrid[0:h, 0:w]
        frames = []
        for t in range(8):
            y = np.clip(110 + 70 * np.sin(2 * np.pi * (xx + 5 * t) / w)
                        + 30 * np.cos(2 * np.pi * (yy + 3 * t) / 64)
                        + rng.normal(0, 5, (h, w)), 0, 255)
            cb = np.clip(128 + 30 * np.sin(2 * np.pi * xx[::2, ::2] / w),
                         0, 255)
            cr = np.clip(128 + 30 * np.cos(2 * np.pi * yy[::2, ::2] / h),
                         0, 255)
            frames.append(tuple(p.astype(np.uint8) for p in (y, cb, cr)))
        data = JsvEncoder(w, h, EncoderConfig(
            gop_size=4, quantizer_scale=6, me_range=2,
            half_pel_refine=False)).encode(frames)
        tmp = fix + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, fix)
    data = open(fix, "rb").read()

    res = transcode(data)                  # warm + compile
    best = float("inf")
    trials = {}
    for _ in range(3):
        t0 = time.perf_counter()
        res = transcode(data)
        dt = time.perf_counter() - t0
        if dt < best:
            best = dt
            trials = {k: round(v["total_s"], 4)
                      for k, v in res.metrics.timers.report().items()}
    return {
        "end_to_end_1080p_frames_per_s": round(res.n_frames / best, 2),
        "stage_seconds": trials,
        "stream_bytes": len(data),
        "n_frames": res.n_frames,
    }


def main() -> None:
    import jax
    import jax.numpy as jnp

    from jsvx.kernels.decode import make_constants
    from jsvx.pipeline.gop import decode_gop_scan, zero_refs

    platform = jax.devices()[0].platform
    impl = "xla" if platform == "cpu" else "pallas"
    # 1080p coded size: 1920 x 1088 = 120 x 68 macroblocks
    mb_h, mb_w = 68, 120
    n_frames = 8 if platform != "cpu" else 2
    h, w = mb_h * 16, mb_w * 16

    consts = make_constants()
    refs = jax.device_put(zero_refs(h, w))

    @jax.jit
    def run_sum(s, r):
        outs, fin = decode_gop_scan(s, r, consts, impl=impl,
                                    mc_impl="mvset")
        chk = (jnp.sum(outs[0].astype(jnp.int32))
               + jnp.sum(outs[1].astype(jnp.int32))
               + jnp.sum(outs[2].astype(jnp.int32)))
        return chk

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    xsmall = jax.device_put(np.ones((8, 128), np.float32))
    np.asarray(trivial(xsmall))
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(trivial(xsmall))
    round_trip = (time.perf_counter() - t0) / 5

    # compile + warmup on throwaway data
    np.asarray(run_sum(jax.device_put(build_gop(mb_h, mb_w, n_frames,
                                                seed=999)), refs))

    trials = 6 if platform != "cpu" else 2
    best = float("inf")
    for t in range(trials):
        data = jax.device_put(build_gop(mb_h, mb_w, n_frames, seed=10 * t))
        np.asarray(trivial(xsmall))        # drain the queue
        t0 = time.perf_counter()
        np.asarray(run_sum(data, refs))
        dt = time.perf_counter() - t0 - round_trip
        best = min(best, max(dt, 1e-9))

    fps = n_frames / best
    try:
        e2e = bench_end_to_end()
    except Exception as e:                 # never lose the device metric
        e2e = {"end_to_end_error": repr(e)[:200]}
    host_cores = __import__("os").cpu_count()
    out = {
        "metric": "1080p_device_decode_frames_per_s_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 300.0, 3),
        "host_cores": host_cores,
    }
    out.update(e2e)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
