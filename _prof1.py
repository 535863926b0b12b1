import time, functools
import numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _synthetic_frame_inputs
from jsvx.kernels.decode import make_constants
from jsvx.kernels.pallas_decode import fused_recon_plane
from jsvx.kernels.pallas_mc import predict_plane_mvset_pallas

mb_h, mb_w = 68, 120
f = _synthetic_frame_inputs(mb_h, mb_w, is_p=True, seed=0, max_mv=24)
consts = make_constants()
h, w = mb_h*16, mb_w*16
ref = jax.device_put(np.random.randint(0,255,(h,w),dtype=np.uint8))
y = {k: jax.device_put(v) for k,v in f["y"].items()}
mvt = jax.device_put(f["mv_table"]); mvc = jax.device_put(f["mv_count"])

def timeit(fn, *args, n=20):
    o = fn(*args); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(n):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/n*1e3

mc = jax.jit(functools.partial(predict_plane_mvset_pallas, is_chroma=False, pad=72))
t_mc = timeit(lambda: mc(ref, mvt, y["mv_idx"], y["rep_add"], n_valid=mvc))
pred = mc(ref, mvt, y["mv_idx"], y["rep_add"], n_valid=mvc)
rec = jax.jit(lambda l,m,fl,p: fused_recon_plane(l,m,fl,p))
t_rec = timeit(lambda: rec(y["levels"], y["mult"], y["flags"], pred))
print(f"Y-plane 1080p: mc={t_mc:.3f}ms recon={t_rec:.3f}ms")
