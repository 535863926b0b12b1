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

@jax.jit
def trivial(x): return jnp.sum(x)
xsmall = jax.device_put(np.ones((8,128), np.float32))
np.asarray(trivial(xsmall))
t0=time.perf_counter()
for _ in range(5): np.asarray(trivial(xsmall))
rt=(time.perf_counter()-t0)/5
print(f"round_trip={rt*1e3:.2f}ms")

np.asarray(run_sum(jax.device_put(build_gop(mb_h, mb_w, n_frames, seed=999)), refs))
for t in range(6):
    data = jax.device_put(build_gop(mb_h, mb_w, n_frames, seed=10*t))
    np.asarray(trivial(xsmall))
    t0 = time.perf_counter()
    v = np.asarray(run_sum(data, refs))
    dt = time.perf_counter() - t0 - rt
    print(f"trial {t}: {dt*1e3:.2f}ms chk={int(v)}")
