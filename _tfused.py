import numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _synthetic_frame_inputs
from jsvx.kernels.decode import make_constants, decode_frame_planes
from jsvx.kernels.pallas_fused import decode_frame_planes_fused
from jsvx.pipeline.gop import zero_refs

consts = make_constants()
for mbs, is_p, seed in ((8, False, 0), (8, True, 1), (6, True, 2)):
    mb_h = mb_w = mbs
    f = _synthetic_frame_inputs(mb_h, mb_w, is_p=is_p, seed=seed, max_mv=20)
    h, w = mb_h*16, mb_w*16
    rng = np.random.default_rng(seed+50)
    refs = tuple(jnp.asarray(rng.integers(0,255,(h//(1+(i>0)), w//(1+(i>0))),dtype=np.uint8)) for i in range(3))
    want = decode_frame_planes(f, refs, consts, mc_impl="mvset")
    got = decode_frame_planes_fused(f, refs, consts, interpret=True)
    for i,(a,b) in enumerate(zip(want, got)):
        d = np.abs(np.asarray(a).astype(int) - np.asarray(b).astype(int))
        print(f"mbs={mbs} is_p={is_p} plane{i}: maxdiff={d.max()}")
        assert d.max() == 0, (np.argwhere(d>0)[:5], )
print("fused kernel matches XLA path")
