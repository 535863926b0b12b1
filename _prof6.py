import time
import numpy as np, jax, jax.numpy as jnp
from bench import build_gop
from jsvx.kernels.decode import make_constants
from jsvx.pipeline.gop import decode_gop_scan, zero_refs

mb_h, mb_w, n_frames = 68, 120, 8
consts = make_constants()
refs = jax.device_put(zero_refs(mb_h*16, mb_w*16))

@jax.jit
def run_sum(s, r):
    outs, fin = decode_gop_scan(s, r, consts, impl="pallas", mc_impl="mvset")
    return (jnp.sum(outs[0].astype(jnp.int32)) + jnp.sum(outs[1].astype(jnp.int32))
            + jnp.sum(outs[2].astype(jnp.int32)))

ds = [jax.device_put(build_gop(mb_h, mb_w, n_frames, seed=200+i)) for i in range(8)]
for d in ds: jax.block_until_ready(d)
np.asarray(run_sum(ds[0], refs))

for n_disp in (2, 8, 16):
    t0 = time.perf_counter()
    outs = [run_sum(ds[i % 8], refs) for i in range(n_disp)]
    _ = [np.asarray(o) for o in outs]
    dt = time.perf_counter() - t0
    print(f"{n_disp} dispatches: {dt*1e3:.1f}ms -> {dt/n_disp*1e3:.2f}ms/run -> {n_frames*n_disp/dt:.0f} fps")
