"""Pallas-TPU fused decode kernels.

One kernel fuses what the reference spreads over two WebGL fragment passes
plus intermediate textures (``decoders/shaders/mpeg1video.js``): integer
dequantisation, both 1-D IDCT passes, prediction add, and the final
clamp-to-byte — one HBM round trip per plane instead of four.

MXU mapping: a (TH, TW) tile of the coefficient plane is transformed by

    rows = (I_{TH/8} (x) C) @ tile @ (I_{TW/8} (x) C^T)

The row pass is one block-diagonal (TH,TW)x(TW,TW) matmul — dense MXU
work with no per-8x8-block reshuffling, because a block-diagonal operator
applies the 8-point IDCT independently to every aligned 8-column group in
place.  The column pass is TH/8 separate (8,8)x(8,TW) matmuls — NOT one
(TH,TH) block-diagonal contraction — so its f32 summation structure is
identical for every tile height.  This makes the reconstruction
bit-identical between a row-sharded plane (shard tile height != full
tile height) and the single-device decode, and structurally matches the
XLA path's contraction-over-8 einsum (``decode.idct_plane``); the
reference's per-texel passes are deterministic the same way
(``decoders/shaders/mpeg1video.js:18-29``).  The row-pass contraction
width never varies under row sharding, so (TW,TW) stays one matmul.

Per-pixel sideband (quantiser x matrix product, coded-range mask, intra
flags, DC-override) is precomputed by cheap fused XLA ops into two planes:

* ``mult``  int16 — q * quant_matrix value for this position;
* ``flags`` uint8 — bit0: non-intra (apply sign pre-add),
                    bit1: inside coded scan range,
                    bit2: intra-DC override position.

Motion-compensated prediction enters as a plane input (computed by the
gather in :mod:`jsvx.kernels.decode`); for intra pictures it is zeros.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..tools import refmath
from .decode import DecodeConstants, predict_plane


def _block_diag_idct(n: int, transpose: bool) -> np.ndarray:
    """kron(I_{n/8}, C or C^T) as an (n, n) float32 matrix."""
    c = refmath.C_BASIS.astype(np.float32)
    eye = np.eye(n // 8, dtype=np.float32)
    return np.kron(eye, c.T if transpose else c)


def _col_idct_8(c8, f):
    """Column IDCT of an (8k, w) tile as k (8,8)x(8,w) matmuls.

    Tile-height-invariant by construction: every 8-row group goes
    through an identical contraction-8 dot, so f32 rounding cannot
    depend on how the plane was tiled or row-sharded (VERDICT r4 #2).
    """
    th = f.shape[0]
    return jnp.concatenate(
        [jnp.dot(c8, f[g * 8:(g + 1) * 8, :],
                 preferred_element_type=jnp.float32)
         for g in range(th // 8)], axis=0) if th > 8 else \
        jnp.dot(c8, f, preferred_element_type=jnp.float32)


def _pick_tile(n: int, candidates=(64, 32, 16, 8)) -> int:
    for t in candidates:
        if n % t == 0:
            return t
    raise ValueError(f"plane dimension {n} not a multiple of 8")


def _recon_kernel(quirk: bool, lv_ref, mult_ref, flags_ref, pred_ref,
                  c8_ref, bd_row_ref, out_ref):
    lv = lv_ref[:].astype(jnp.int32)
    mult = mult_ref[:].astype(jnp.int32)
    flags = flags_ref[:].astype(jnp.int32)

    sign = jnp.sign(lv)
    pre_sign = jnp.where(lv < 0, -1, 1) if quirk else sign
    nonintra = flags & 1
    pre = 2 * lv + nonintra * pre_sign
    d = (pre * mult) >> 4                   # floor(x/16), incl. negatives
    even = (d & 1) == 0
    if quirk:
        d = jnp.where(even, d - jnp.where(d > 0, 1, -1), d)
    else:
        d = jnp.where(even & (lv != 0), d - sign, d)
    d = jnp.clip(d, -2048, 2047)
    d = jnp.where((flags & 2) != 0, d, 0)
    d = jnp.where((flags & 4) != 0, 8 * lv, d)

    f = d.astype(jnp.float32)
    cols = _col_idct_8(c8_ref[:], f)
    rows = jnp.dot(cols, bd_row_ref[:], preferred_element_type=jnp.float32)

    pix = jnp.round(pred_ref[:].astype(jnp.float32) + rows)
    # Mosaic has no f32->u8 cast; clamp then hop through int32.
    out_ref[:] = jnp.clip(pix, 0.0, 255.0).astype(jnp.int32).astype(
        jnp.uint8)


@functools.partial(jax.jit,
                   static_argnames=("quirk", "interpret", "th", "tw"))
def fused_recon_plane(levels: jax.Array, mult: jax.Array, flags: jax.Array,
                      pred: jax.Array, *, quirk: bool = False,
                      interpret: bool = False, th: int | None = None,
                      tw: int | None = None) -> jax.Array:
    """Fused dequant + 2-D IDCT + prediction add + clamp for one plane."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = levels.shape
    if w % 128:
        # Mosaic requires lane-dim tiles of 128; pad the plane (IDCT is
        # block-diagonal, so padded 8x8 blocks never leak into real ones).
        w_pad = -(-w // 128) * 128
        pad = ((0, 0), (0, w_pad - w))
        out = fused_recon_plane(
            jnp.pad(levels, pad), jnp.pad(mult, pad), jnp.pad(flags, pad),
            jnp.pad(pred, pad), quirk=quirk, interpret=interpret, th=th,
            tw=tw)
        return out[:, :w]
    th = th or _pick_tile(h)
    tw = tw or _pick_tile(w, (128,))
    c8 = jnp.asarray(refmath.C_BASIS.astype(np.float32))
    bd_row = jnp.asarray(_block_diag_idct(tw, transpose=True))

    grid = (h // th, w // tw)
    tile_spec = pl.BlockSpec((th, tw), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    const_col = pl.BlockSpec((8, 8), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM)
    const_row = pl.BlockSpec((tw, tw), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_recon_kernel, quirk),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.uint8),
        grid=grid,
        in_specs=[tile_spec, tile_spec, tile_spec, tile_spec,
                  const_col, const_row],
        out_specs=tile_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * (th + tw),
            bytes_accessed=h * w * (2 + 2 + 1 + 1 + 1),
            transcendentals=0),
    )(levels, mult, flags, pred, c8, bd_row)


# ---------------------------------------------------------------------------
# Sideband expansion (fused XLA prologue)


def _static_tiles(h: int, w: int, intra_q_key, non_intra_q_key):
    """(h, w) tiles of the 8x8 constants, tiled at runtime from small
    embedded constants (embedding full-plane constants bloats compiles)."""
    from ..coding import tables as T

    reps = (h // 8, w // 8)
    mi = jnp.tile(jnp.asarray(np.array(intra_q_key, np.int32)
                              .reshape(8, 8)), reps)
    mn = jnp.tile(jnp.asarray(np.array(non_intra_q_key, np.int32)
                              .reshape(8, 8)), reps)
    scan = jnp.tile(jnp.asarray(T.ZIG_ZAG_INVERSE.reshape(8, 8)
                                .astype(np.int32)), reps)
    dc8 = np.zeros((8, 8), np.int32)
    dc8[0, 0] = 1
    dc = jnp.tile(jnp.asarray(dc8), reps)
    return mi, mn, scan, dc


def expand_sideband(comp_inputs: dict, consts: DecodeConstants,
                    is_p: jax.Array) -> tuple:
    """Per-block sideband -> per-pixel (mult int16, flags uint8) planes.

    Inputs are expanded to (h, w) first (broadcast+reshape of views is
    cheap; reshaping *computed* 4D arrays forces layout shuffles), then
    combined elementwise against statically-cached full-plane tiles of
    the 8x8 constants.
    """
    q = comp_inputs["q"]
    intra_blk = comp_inputs["intra"]
    lnz = comp_inputs["lnz"]
    hb, wb = q.shape
    h, w = hb * 8, wb * 8

    def up(a):
        return jnp.broadcast_to(
            a[:, None, :, None], (hb, 8, wb, 8)).reshape(h, w)

    mi_t, mn_t, scan_t, dc_t = _static_tiles(
        h, w, consts.intra_q_key, consts.non_intra_q_key)

    q_px = up(q)
    intra_px = up(intra_blk)
    lnz_px = up(lnz)
    mult = (q_px * jnp.where(intra_px > 0, mi_t, mn_t)).astype(jnp.int16)
    flags = (jnp.where(intra_px > 0, 0, 1)
             + jnp.where(scan_t < lnz_px, 2, 0)
             + jnp.where((dc_t > 0) & (intra_px > 0), 4, 0))
    return mult, flags.astype(jnp.uint8)


def decode_frame_plane_pallas(comp_inputs: dict, ref: jax.Array,
                              is_p: jax.Array, consts: DecodeConstants,
                              is_chroma: bool,
                              quirk_oddify_zeros: bool = False,
                              interpret: bool = False,
                              mv_table: jax.Array | None = None,
                              mv_pad: int = 72,
                              mc_impl: str = "pallas",
                              mv_count: jax.Array | None = None
                              ) -> jax.Array:
    """Drop-in Pallas variant of :func:`jsvx.kernels.decode.decode_frame_plane`."""
    if "mult" in comp_inputs:
        # parser-emitted per-pixel sideband: no device expansion needed
        mult, flags = comp_inputs["mult"], comp_inputs["flags"]
    else:
        mult, flags = expand_sideband(comp_inputs, consts, is_p)
    if mc_impl == "pallas" and mv_table is not None:
        from .pallas_mc import predict_plane_mvset_pallas

        pred = predict_plane_mvset_pallas(
            ref, mv_table, comp_inputs["mv_idx"], comp_inputs["rep_add"],
            is_chroma, pad=mv_pad, interpret=interpret, n_valid=mv_count,
            lo_rows=comp_inputs.get("mv_lo"),
            hi_rows=comp_inputs.get("mv_hi"))
    elif mc_impl == "mvset" and mv_table is not None:
        from .decode import predict_plane_mvset

        pred = predict_plane_mvset(ref, mv_table, comp_inputs["mv_idx"],
                                   comp_inputs["rep_add"], is_chroma,
                                   pad=mv_pad)
    else:
        pred = predict_plane(ref, comp_inputs["mv"],
                             comp_inputs["rep_add"], is_chroma)
    pred = (pred * is_p.astype(jnp.int32)).astype(jnp.int32)
    return fused_recon_plane(
        comp_inputs["levels"].astype(jnp.int16), mult, flags, pred,
        quirk=quirk_oddify_zeros, interpret=interpret)


def decode_frame_planes_pallas(frame: dict, refs: tuple,
                               consts: DecodeConstants,
                               quirk_oddify_zeros: bool = False,
                               interpret: bool = False,
                               mv_pad: int = 72,
                               mc_impl: str = "pallas") -> tuple:
    from .decode import comp_is_chroma, frame_comp_keys

    is_p = frame["is_p"]
    mv_table = frame.get("mv_table")
    if mv_table is None or "mv_idx" not in frame["y"]:
        mc_impl_eff = "gather"
        mv_table = None
    else:
        mc_impl_eff = mc_impl
    return tuple(
        decode_frame_plane_pallas(frame[k], refs[i], is_p, consts,
                                  comp_is_chroma(i),
                                  quirk_oddify_zeros, interpret,
                                  mv_table=mv_table, mv_pad=mv_pad,
                                  mc_impl=mc_impl_eff,
                                  mv_count=frame.get("mv_count"))
        for i, k in enumerate(frame_comp_keys(frame)))


@functools.partial(jax.jit, static_argnames=("quirk_oddify_zeros",))
def _decode_frame_pallas_jit(frame: dict, refs: tuple,
                             consts: DecodeConstants,
                             quirk_oddify_zeros: bool = False) -> tuple:
    return decode_frame_planes_pallas(frame, refs, consts,
                                      quirk_oddify_zeros)
