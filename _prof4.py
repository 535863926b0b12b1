import time
import numpy as np, jax, jax.numpy as jnp
from bench import build_gop
from jsvx.kernels.decode import make_constants
from jsvx.pipeline.gop import decode_gop_scan, zero_refs

mb_h, mb_w, n_frames = 68, 120, 8
h, w = mb_h*16, mb_w*16
consts = make_constants()
refs = jax.device_put(zero_refs(h, w))

@jax.jit
def run_sum(s, r):
    outs, fin = decode_gop_scan(s, r, consts, impl="pallas", mc_impl="mvset")
    return (jnp.sum(outs[0].astype(jnp.int32)) + jnp.sum(outs[1].astype(jnp.int32))
            + jnp.sum(outs[2].astype(jnp.int32)))

# stage 4 distinct datasets fully on device
ds = [jax.device_put(build_gop(mb_h, mb_w, n_frames, seed=100+i)) for i in range(4)]
for d in ds: jax.block_until_ready(d)
np.asarray(run_sum(ds[0], refs))  # warm

# back-to-back: dispatch all 4, block at end
t0 = time.perf_counter()
outs = [run_sum(d, refs) for d in ds]
vals = [np.asarray(o) for o in outs]
dt = time.perf_counter() - t0
print(f"4x8 frames pipelined: {dt*1e3:.2f}ms -> {32/dt:.0f} fps, checksums {[int(v) for v in vals]}")

# one at a time, fetch each
for i,d in enumerate(ds):
    t0 = time.perf_counter()
    v = np.asarray(run_sum(d, refs))
    dt = time.perf_counter() - t0
    print(f"single run {i}: {dt*1e3:.2f}ms -> {n_frames/dt:.0f} fps")
