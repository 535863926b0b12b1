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

# warmup
d0 = jax.device_put(build_gop(mb_h, mb_w, n_frames, seed=999))
jax.block_until_ready(d0)
np.asarray(run_sum(d0, refs))

for trial in range(4):
    data = jax.device_put(build_gop(mb_h, mb_w, n_frames, seed=trial*7+1))
    t_put0 = time.perf_counter()
    jax.block_until_ready(data)
    t_put = time.perf_counter() - t_put0
    t0 = time.perf_counter()
    np.asarray(run_sum(data, refs))
    dt = time.perf_counter() - t0
    print(f"trial {trial}: transfer-wait={t_put*1e3:.1f}ms compute+fetch={dt*1e3:.2f}ms -> {n_frames/dt:.0f} fps")
