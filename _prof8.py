import time
import numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _synthetic_frame_inputs
from jsvx.kernels.decode import make_constants
from jsvx.pipeline.gop import decode_gop_scan, zero_refs

mb_h, mb_w = 68, 120
consts = make_constants()
refs = jax.device_put(zero_refs(mb_h*16, mb_w*16))

@jax.jit
def run_sum(s, r):
    outs, fin = decode_gop_scan(s, r, consts, impl="pallas", mc_impl="mvset")
    return (jnp.sum(outs[0].astype(jnp.int32)) + jnp.sum(outs[1].astype(jnp.int32))
            + jnp.sum(outs[2].astype(jnp.int32)))

def build(nf, seed, mvc):
    frames = [_synthetic_frame_inputs(mb_h, mb_w, is_p=(i>0), seed=seed+i, max_mv=24)
              for i in range(nf)]
    st = jax.tree.map(lambda *xs: np.stack(xs), *frames)
    st["mv_count"] = np.minimum(st["mv_count"], mvc)
    return st

def slope(mvc):
    ts = {}
    for nf in (4, 32):
        ds = [jax.device_put(build(nf, 400+7*i, mvc)) for i in range(3)]
        for d in ds: jax.block_until_ready(d)
        np.asarray(run_sum(ds[0], refs))
        ts[nf] = min((lambda t0: (np.asarray(run_sum(d, refs)), time.perf_counter()-t0)[1])(time.perf_counter()) for d in ds)
    return (ts[32]-ts[4])/28

for mvc in (12, 4, 1):
    s = slope(mvc)
    print(f"mv_count={mvc}: {s*1e3:.3f}ms/frame -> {1/s:.0f} fps")
