"""Single fully-fused Pallas-TPU decode kernel per plane.

Collapses the whole per-picture pipeline — half-pel motion compensation,
integer dequantisation, both 1-D IDCT passes, prediction add, and the
final clamp-to-byte — into ONE kernel: one HBM read of the inputs, one
HBM write of the reconstructed plane.  This is the end point of the
reference's four WebGL fragment passes (``decoders/shaders/
mpeg1video.js``): where the two-kernel path (:mod:`.pallas_mc` +
:mod:`.pallas_decode`) still materialises the prediction plane in HBM,
here it lives only in VMEM scratch.

Input format (per-pixel, parser-emittable, 1 byte each where the
two-kernel path used 2-byte planes):

* ``levels`` int16 — raw VLC coefficient levels (zig-zag undone);
* ``qf``     uint8 — packed ``q | nonintra<<5 | inscan<<6 | dc<<7``
  (quantiser scale is 5 bits, ``decoders/jsv.js:700``); the quant-matrix
  value itself is static per position and supplied as two constant
  tiles, so the multiplier ``q*m`` never touches HBM;
* ``sel``    uint8 — index into the frame's distinct-MV table, or 255
  for intra-in-P macroblocks (``macroblockRepAdd`` semantics,
  ``decoders/jsv.js:1502-1505``): 255 matches no table row, so the
  prediction stays at its zero initialisation.

The MC part keeps the distinct-MV formulation of :mod:`.pallas_mc`
(window DMA per distinct vector, double-buffered, sub-tile remainder
undone with vector rolls); I pictures skip every window DMA via the
``is_p`` prefetch scalar.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..coding import tables as T
from ..tools import refmath
from .pallas_decode import _block_diag_idct, _col_idct_8
from .pallas_mc import _mv_parts

QF_Q_MASK = 31
QF_NONINTRA = 5         # bit positions
QF_INSCAN = 6
QF_DC = 7
SEL_INTRA = 255


def _fused_kernel(quirk, k_cap, pad_y, pad_x, th, w, w_win, is_chroma,
                  hb, chunk_map, mv_ref, ref_hbm, lv_ref, qf_ref, sel_ref,
                  mi_ref, mn_ref, c8_ref, *rest):
    bd_rows = rest[:-4]                    # one block per DISTINCT width
    out_ref, win_ref, pred_ref, sems = rest[-4:]
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    h_win = win_ref.shape[1]
    n_valid = mv_ref[2 * k_cap]
    is_p = mv_ref[2 * k_cap + 1]
    # dynamic MC loop bound: the blend is O(K x pixels), so each tile
    # iterates only ITS row band's table-index range [lo, hi] (bounds
    # per block row in mv_ref; tables centroid-row-sorted so the range
    # is tight — mvset_sort_and_bounds) plus index 0, the (0,0) vector,
    # unconditionally.  0 iterations for I pictures; compile time does
    # not scale with the k_cap bucket.
    base = 2 * k_cap + 2
    rpt = th // 8                          # block rows per tile
    lo_t = mv_ref[base + i * rpt]
    hi_t = mv_ref[base + hb + i * rpt]
    for r in range(1, rpt):
        lo_t = jnp.minimum(lo_t, mv_ref[base + i * rpt + r])
        hi_t = jnp.maximum(hi_t, mv_ref[base + hb + i * rpt + r])
    lo_eff = jnp.maximum(lo_t, 1)
    hi_eff = jnp.minimum(hi_t, n_valid - 1)
    n_loop = jnp.maximum(hi_eff - lo_eff + 1, 0)
    n_iter = jnp.where((is_p > 0) & (n_valid > 0), 1 + n_loop, 0)

    def kof(j):
        return jnp.where(j == 0, 0, lo_eff + j - 1)

    # ---- motion compensation into VMEM scratch --------------------------
    def aligned_parts(k):
        fy, _, fx, _ = _mv_parts(mv_ref, k, is_chroma)
        ry = fy & 7
        rx = fx & 127
        row0 = i * th + pad_y + pl.multiple_of(8 * (fy >> 3), 8)
        col0 = pad_x + pl.multiple_of(128 * (fx >> 7), 128)
        return row0, col0, ry, rx

    def start_dma(k, slot):
        row0, col0, _, _ = aligned_parts(k)
        return pltpu.make_async_copy(
            ref_hbm.at[pl.ds(row0, h_win), pl.ds(col0, w_win)],
            win_ref.at[slot], sems.at[slot])

    @pl.when(n_iter > 0)
    def _():
        start_dma(0, 0).start()               # kof(0) == 0
    pred_ref[:] = jnp.zeros((th, w), jnp.int16)
    sel = sel_ref[:].astype(jnp.int32)

    def mc_body(j, carry):
        slot = jax.lax.rem(j, 2)
        k = kof(j)

        @pl.when(j + 1 < n_iter)
        def _():
            start_dma(kof(j + 1), 1 - slot).start()

        start_dma(k, slot).wait()
        _, _, ry, rx = aligned_parts(k)
        win = win_ref[slot].astype(jnp.int32)      # rotate needs 32-bit
        win = pltpu.roll(win, (h_win - ry) % h_win, 0)
        win = pltpu.roll(win, (w_win - rx) % w_win, 1)
        _, oy, _, ox = _mv_parts(mv_ref, k, is_chroma)
        sel_k = sel == k

        # specialize per half-pel case (shader INTER_1's odd_h/odd_v):
        # full-pel MVs — the common case in real streams — reduce to a
        # single select instead of a 4-tap blend
        @pl.when((ox == 0) & (oy == 0))
        def _():
            pred_ref[:] = jnp.where(
                sel_k, win[0:th, 0:w].astype(jnp.int16), pred_ref[:])

        @pl.when((ox == 1) & (oy == 0))
        def _():
            interp = ((win[0:th, 0:w] + win[0:th, 1:w + 1] + 1)
                      >> 1).astype(jnp.int16)
            pred_ref[:] = jnp.where(sel_k, interp, pred_ref[:])

        @pl.when((ox == 0) & (oy == 1))
        def _():
            interp = ((win[0:th, 0:w] + win[1:th + 1, 0:w] + 1)
                      >> 1).astype(jnp.int16)
            pred_ref[:] = jnp.where(sel_k, interp, pred_ref[:])

        @pl.when((ox == 1) & (oy == 1))
        def _():
            interp = ((win[0:th, 0:w] + win[0:th, 1:w + 1]
                       + win[1:th + 1, 0:w] + win[1:th + 1, 1:w + 1]
                       + 2) >> 2).astype(jnp.int16)
            pred_ref[:] = jnp.where(sel_k, interp, pred_ref[:])
        return carry

    jax.lax.fori_loop(0, n_iter, mc_body, jnp.int32(0))

    # ---- dequantise (reference COL_* integer semantics) -----------------
    lv = lv_ref[:].astype(jnp.int32)
    qf = qf_ref[:].astype(jnp.int32)
    q = qf & QF_Q_MASK
    nonintra = (qf >> QF_NONINTRA) & 1
    mult = q * jnp.where(nonintra > 0, mn_ref[:], mi_ref[:]).astype(
        jnp.int32)

    sign = jnp.sign(lv)
    pre_sign = jnp.where(lv < 0, -1, 1) if quirk else sign
    pre = 2 * lv + nonintra * pre_sign
    d = (pre * mult) >> 4                   # floor(x/16), incl. negatives
    even = (d & 1) == 0
    if quirk:
        d = jnp.where(even, d - jnp.where(d > 0, 1, -1), d)
    else:
        d = jnp.where(even & (lv != 0), d - sign, d)
    d = jnp.clip(d, -2048, 2047)
    d = jnp.where((qf >> QF_INSCAN) & 1 > 0, d, 0)
    d = jnp.where((qf >> QF_DC) & 1 > 0, 8 * lv, d)

    # ---- 2-D IDCT: column pass full-width as per-8-row-group dots (a
    # tile-height-invariant contraction, see pallas_decode._col_idct_8 —
    # bit-identical between shard and full-plane tilings), row pass per
    # 128-col chunk ---
    f = d.astype(jnp.float32)
    cols = _col_idct_8(c8_ref[:], f)
    for off, cw, bi in chunk_map:
        bd_row_ref = bd_rows[bi]
        rows = jnp.dot(cols[:, off:off + cw], bd_row_ref[:],
                       preferred_element_type=jnp.float32)
        pix = jnp.round(pred_ref[0:th, off:off + cw].astype(jnp.float32)
                        + rows)
        out_ref[:, off:off + cw] = jnp.clip(pix, 0.0, 255.0).astype(
            jnp.int32).astype(jnp.uint8)


@functools.cache
def _static_tiles_np(th: int, w: int, intra_q_key, non_intra_q_key):
    mi = np.tile(np.array(intra_q_key, np.uint8).reshape(8, 8),
                 (th // 8, w // 8))
    mn = np.tile(np.array(non_intra_q_key, np.uint8).reshape(8, 8),
                 (th // 8, w // 8))
    return mi, mn


def pack_qf(q_blk, intra_blk, lnz_blk) -> jax.Array:
    """Block-level sideband -> per-pixel packed uint8 ``qf`` plane (XLA)."""
    hb, wb = q_blk.shape
    h, w = hb * 8, wb * 8

    def up(a):
        return jnp.broadcast_to(
            a[:, None, :, None], (hb, 8, wb, 8)).reshape(h, w)

    scan_t = jnp.tile(jnp.asarray(
        T.ZIG_ZAG_INVERSE.reshape(8, 8).astype(np.int32)), (hb, wb))
    dc8 = np.zeros((8, 8), np.int32)
    dc8[0, 0] = 1
    dc_t = jnp.tile(jnp.asarray(dc8), (hb, wb))

    intra = up(intra_blk) > 0
    qf = (up(q_blk)
          + jnp.where(intra, 0, 1 << QF_NONINTRA)
          + jnp.where(scan_t < up(lnz_blk), 1 << QF_INSCAN, 0)
          + jnp.where((dc_t > 0) & intra, 1 << QF_DC, 0))
    return qf.astype(jnp.uint8)


def pack_sel(mv_idx_blk, rep_add_blk) -> jax.Array:
    """Block-level MV index + intra-in-P flag -> per-pixel ``sel`` (XLA)."""
    hb, wb = mv_idx_blk.shape
    h, w = hb * 8, wb * 8
    sel = jnp.where(rep_add_blk > 0, SEL_INTRA, mv_idx_blk)
    return jnp.broadcast_to(
        sel[:, None, :, None], (hb, 8, wb, 8)).reshape(h, w).astype(
            jnp.uint8)


@functools.partial(jax.jit, static_argnames=("intra_q_key",
                                             "non_intra_q_key", "is_chroma",
                                             "quirk", "pad", "th",
                                             "interpret"))
def fused_decode_plane(levels: jax.Array, qf: jax.Array, sel: jax.Array,
                       ref: jax.Array, mv_table: jax.Array,
                       n_valid: jax.Array, is_p: jax.Array,
                       intra_q_key: tuple, non_intra_q_key: tuple,
                       is_chroma: bool, quirk: bool = False,
                       pad: int = 72, th: int | None = None,
                       interpret: bool = False,
                       lo_rows: jax.Array | None = None,
                       hi_rows: jax.Array | None = None) -> jax.Array:
    """One plane of one picture -> reconstructed uint8 plane (one kernel).

    ``lo_rows``/``hi_rows`` ((h//8,) int32): per-block-row MC table-
    index bounds (see :func:`jsvx.kernels.decode.mvset_sort_and_bounds`);
    omitted -> trivial bounds (full scan, identical output)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = ref.shape
    k_cap = int(mv_table.shape[0])
    assert k_cap <= 255, \
        "sel is uint8 with 255 reserved for intra-in-P (SEL_INTRA)"

    if th is None:
        th = 64
        while h % th:
            th //= 2

    pad_y = -(-pad // 8) * 8
    pad_x = -(-pad // 128) * 128
    h_win = th + 16
    w_win = -(-(w + 1) // 128) * 128 + 128
    # Window DMA bounds (see pallas_mc): rows reach
    # (h - th) + pad_y + 8*((pad-1)>>3) + h_win, cols reach
    # pad_x + 128*((pad-1)>>7) + w_win.
    refp = jnp.pad(
        ref,
        ((pad_y, 8 * ((pad - 1) >> 3) + 16),
         (pad_x, 128 * ((pad - 1) >> 7) + w_win - w)),
        mode="edge")

    c8 = jnp.asarray(refmath.C_BASIS.astype(np.float32))
    chunks = [128] * (w // 128)
    if w % 128:
        chunks.append(w % 128)
    widths = list(dict.fromkeys(chunks))
    bd_row_args = [jnp.asarray(_block_diag_idct(cw, transpose=True))
                   for cw in widths]
    chunk_map, off = [], 0
    for cw in chunks:
        chunk_map.append((off, cw, widths.index(cw)))
        off += cw
    chunk_map = tuple(chunk_map)

    mi, mn = _static_tiles_np(th, w, intra_q_key, non_intra_q_key)

    if lo_rows is None:
        lo_rows = jnp.ones((h // 8,), jnp.int32)
        hi_rows = jnp.full((h // 8,), k_cap - 1, jnp.int32)
    mv_scalars = jnp.concatenate(
        [jnp.asarray(mv_table).reshape(-1).astype(jnp.int32),
         jnp.asarray(n_valid, jnp.int32).reshape(1),
         jnp.asarray(is_p, jnp.int32).reshape(1),
         jnp.asarray(lo_rows, jnp.int32).reshape(-1),
         jnp.asarray(hi_rows, jnp.int32).reshape(-1)])

    tile = pl.BlockSpec((th, w), lambda i, mv: (i, 0),
                        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, mv: (0,) * len(shape), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_fused_kernel, quirk, k_cap, pad_y, pad_x, th, w,
                          w_win, is_chroma, h // 8, chunk_map),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.uint8),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(h // th,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # padded reference
                tile, tile, tile,                       # levels, qf, sel
                const((th, w)), const((th, w)),         # mi, mn
                const((8, 8)),                          # IDCT basis C
                *[const((int(b.shape[0]), int(b.shape[0])))
                  for b in bd_row_args],
            ],
            out_specs=tile,
            scratch_shapes=[
                pltpu.VMEM((2, h_win, w_win), jnp.uint8),
                pltpu.VMEM((th, w), jnp.int16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * (th + 128),
            bytes_accessed=h * w * (2 + 1 + 1 + 1) + h * w_win * 2,
            transcendentals=0),
    )(mv_scalars, refp, levels, qf, sel, jnp.asarray(mi), jnp.asarray(mn),
      c8, *bd_row_args)


@functools.partial(jax.jit, static_argnames=("quirk_oddify_zeros",))
def decode_frame_fused_jit(frame: dict, refs: tuple, consts,
                           quirk_oddify_zeros: bool = False) -> tuple:
    return decode_frame_planes_fused(frame, refs, consts,
                                     quirk_oddify_zeros)


def decode_frame_planes_fused(frame: dict, refs: tuple, consts,
                              quirk_oddify_zeros: bool = False,
                              mv_pad: int = 72,
                              interpret: bool = False) -> tuple:
    """Fully-fused variant of ``decode_frame_planes`` (one kernel/plane).

    Accepts per-pixel ``qf``/``sel`` planes when present (parser- or
    encoder-emitted); otherwise packs them from block-level sideband with
    cheap XLA broadcasts.
    """
    from .decode import comp_is_chroma, frame_comp_keys

    is_p = frame["is_p"]
    keys = frame_comp_keys(frame)
    mv_table = frame.get("mv_table")
    if mv_table is None or not all(
            ("sel" in frame[k]) or ("mv_idx" in frame[k]) for k in keys):
        # No distinct-MV sideband: a P frame would silently decode with
        # (0,0) prediction here, so delegate to the two-kernel path whose
        # gather MC needs only per-block vectors (ADVICE r1).
        from .pallas_decode import decode_frame_planes_pallas

        return decode_frame_planes_pallas(
            frame, refs, consts, quirk_oddify_zeros, interpret=interpret,
            mv_pad=mv_pad, mc_impl="gather")
    n_valid = frame.get("mv_count", jnp.int32(mv_table.shape[0]))
    out = []
    for i, key in enumerate(keys):
        c = frame[key]
        qf = c["qf"] if "qf" in c else pack_qf(c["q"], c["intra"], c["lnz"])
        sel = c["sel"] if "sel" in c else pack_sel(c["mv_idx"],
                                                   c["rep_add"])
        out.append(fused_decode_plane(
            c["levels"].astype(jnp.int16), qf, sel, refs[i], mv_table,
            n_valid, is_p, consts.intra_q_key, consts.non_intra_q_key,
            is_chroma=comp_is_chroma(i), quirk=quirk_oddify_zeros,
            pad=mv_pad, interpret=interpret,
            lo_rows=c.get("mv_lo"), hi_rows=c.get("mv_hi")))
    return tuple(out)
