import time
import numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _synthetic_frame_inputs
from jsvx.kernels.decode import make_constants
from jsvx.kernels.pallas_decode import decode_frame_planes_pallas
from jsvx.pipeline.gop import decode_gop_scan, zero_refs

mb_h, mb_w = 68, 120
h, w = mb_h*16, mb_w*16
consts = make_constants()
refs = jax.device_put(zero_refs(h, w))
f = jax.device_put(_synthetic_frame_inputs(mb_h, mb_w, is_p=True, seed=0, max_mv=24))

def timeit(fn, *args, n=20):
    o = fn(*args); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(n):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/n*1e3

step = jax.jit(lambda fr, r: decode_frame_planes_pallas(fr, r, consts))
t_step = timeit(lambda: step(f, refs))
print(f"single frame step: {t_step:.3f}ms")

frames = [_synthetic_frame_inputs(mb_h, mb_w, is_p=(i>0), seed=i, max_mv=24) for i in range(8)]
stacked = jax.device_put(jax.tree.map(lambda *xs: np.stack(xs), *frames))
scan8 = jax.jit(lambda s, r: decode_gop_scan(s, r, consts, impl="pallas", mc_impl="mvset"))
t_scan = timeit(lambda: scan8(stacked, refs), n=10)
print(f"scan 8 frames: {t_scan:.3f}ms = {t_scan/8:.3f}ms/frame")
