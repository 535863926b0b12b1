import time
import numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _synthetic_frame_inputs
from jsvx.kernels.decode import make_constants, decode_frame_planes
from jsvx.kernels.pallas_fused import decode_frame_planes_fused

consts = make_constants()
# correctness on real TPU at 1080p
mb_h, mb_w = 68, 120
f = _synthetic_frame_inputs(mb_h, mb_w, is_p=True, seed=3, max_mv=24)
h, w = mb_h*16, mb_w*16
rng = np.random.default_rng(7)
refs = tuple(jax.device_put(rng.integers(0,255,(h//(1+(i>0)), w//(1+(i>0))),dtype=np.uint8)) for i in range(3))
fd = jax.device_put(f)
want = decode_frame_planes(fd, refs, consts, mc_impl="mvset")
got = jax.jit(lambda fr, r: decode_frame_planes_fused(fr, r, consts))(fd, refs)
for i,(a,b) in enumerate(zip(want, got)):
    d = np.abs(np.asarray(a).astype(int)-np.asarray(b).astype(int))
    print(f"plane{i} maxdiff={d.max()}")
