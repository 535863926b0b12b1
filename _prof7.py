import time
import numpy as np, jax, jax.numpy as jnp
from bench import build_gop
from jsvx.kernels.decode import make_constants
from jsvx.pipeline.gop import decode_gop_scan, zero_refs

mb_h, mb_w = 68, 120
consts = make_constants()
refs = jax.device_put(zero_refs(mb_h*16, mb_w*16))

def make_run():
    @jax.jit
    def run_sum(s, r):
        outs, fin = decode_gop_scan(s, r, consts, impl="pallas", mc_impl="mvset")
        return (jnp.sum(outs[0].astype(jnp.int32)) + jnp.sum(outs[1].astype(jnp.int32))
                + jnp.sum(outs[2].astype(jnp.int32)))
    return run_sum

run = make_run()
res = {}
for nf in (4, 16, 32):
    ds = [jax.device_put(build_gop(mb_h, mb_w, nf, seed=300+i)) for i in range(3)]
    for d in ds: jax.block_until_ready(d)
    np.asarray(run(ds[0], refs))  # warm (per-shape compile)
    best = min(
        (lambda t0: (np.asarray(run(d, refs)), time.perf_counter()-t0)[1])(time.perf_counter())
        for d in ds)
    res[nf] = best
    print(f"nf={nf}: {best*1e3:.2f}ms total")
slope = (res[32]-res[4])/(32-4)
print(f"marginal per-frame compute: {slope*1e3:.3f}ms -> {1/slope:.0f} fps")
