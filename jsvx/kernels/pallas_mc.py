"""Pallas-TPU motion compensation: distinct-MV slices in VMEM.

The joint (vy, vx) selection over a frame's distinct motion vectors is the
correct vectorised MC formulation (see ``predict_plane_mvset``), but in
XLA each of the K candidate planes re-reads HBM.  This kernel keeps a
row strip of the padded reference resident in VMEM and performs the K
dynamic slices there, so the K-way amplification hits on-chip bandwidth:

    per strip: DMA strip (TH + 2*pad + 1 rows) of the padded ref
    for k < K:  slice 4 half-pel taps at (fy_k, fx_k) from VMEM,
                blend where mv_idx == k

``mv_table`` rows arrive via scalar prefetch (SMEM), so slice offsets are
scalars available before the body runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _mv_parts(mv_ref, k, is_chroma):
    vy = mv_ref[2 * k]
    vx = mv_ref[2 * k + 1]
    if is_chroma:
        vy = jax.lax.div(vy, 2)            # trunc toward zero
        vx = jax.lax.div(vx, 2)
    return vy >> 1, vy & 1, vx >> 1, vx & 1


def _mc_kernel(k_cap, pad_y, pad_x, th, w, w_win, is_chroma, hb, mv_ref,
               ref_hbm, idx_ref, rep_ref, out_ref, win_ref, pred_ref,
               sems):
    """Per k: DMA a tile-ALIGNED window around the (fy_k, fx_k) shift
    (Mosaic requires provably (8,128)-aligned slice starts), then undo
    the sub-tile remainder with dynamic rolls.  Windows are
    double-buffered so DMA k+1 overlaps compute k; entries past the
    frame's actual distinct-MV count (``mv_ref[2*k_cap]``) are skipped.

    The blend is O(K x pixels), so each tile iterates only ITS row
    band's table-index range ``[lo, hi]`` (from the per-block-row
    bounds in ``mv_ref``; tables are centroid-row-sorted so the range
    is tight — ``mvset_sort_and_bounds``), plus index 0 — the (0,0)
    vector of skipped MBs — unconditionally.  Trivial bounds (lo=1,
    hi=k_cap-1) reproduce the full scan exactly.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    h_win = win_ref.shape[1]
    n_valid = mv_ref[2 * k_cap]
    base = 2 * k_cap + 1
    rpt = th // 8                          # block rows per tile
    lo_t = mv_ref[base + i * rpt]
    hi_t = mv_ref[base + hb + i * rpt]
    for r in range(1, rpt):
        lo_t = jnp.minimum(lo_t, mv_ref[base + i * rpt + r])
        hi_t = jnp.maximum(hi_t, mv_ref[base + hb + i * rpt + r])
    lo_eff = jnp.maximum(lo_t, 1)
    hi_eff = jnp.minimum(hi_t, n_valid - 1)
    n_loop = jnp.maximum(hi_eff - lo_eff + 1, 0)
    n_iter = jnp.where(n_valid > 0, 1 + n_loop, 0)

    def kof(j):
        return jnp.where(j == 0, 0, lo_eff + j - 1)

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

    # Guarded like pallas_fused: an unconsumed slot-0 DMA from a
    # n_iter=0 call would leak its semaphore into the next grid
    # iteration (first wait succeeds early, reads a stale window).
    @pl.when(n_iter > 0)
    def _():
        start_dma(0, 0).start()               # kof(0) == 0
    pred_ref[:] = jnp.zeros((th, w), jnp.int16)
    idx = idx_ref[:].astype(jnp.int32)

    # dynamic loop bound: iterate this tile's band range — compile time
    # stops scaling with the k_cap bucket and runtime with the frame's
    # total distinct-MV count
    def mc_body(j, carry):
        slot = jax.lax.rem(j, 2)
        k = kof(j)

        @pl.when(j + 1 < n_iter)
        def _():
            start_dma(kof(j + 1), 1 - slot).start()

        start_dma(k, slot).wait()
        _, _, ry, rx = aligned_parts(k)
        # dynamic rotate needs 32-bit lanes
        win = win_ref[slot].astype(jnp.int32)
        win = pltpu.roll(win, (h_win - ry) % h_win, 0)
        win = pltpu.roll(win, (w_win - rx) % w_win, 1)
        _, oy, _, ox = _mv_parts(mv_ref, k, is_chroma)
        a = win[0:th, 0:w]
        b = win[0:th, 1:w + 1]
        c = win[1:th + 1, 0:w]
        d = win[1:th + 1, 1:w + 1]
        bias = (ox + oy + ox * oy + 1) >> 1
        interp = ((a + ox * b + oy * c + (ox * oy) * d + bias)
                  >> (ox + oy)).astype(jnp.int16)
        pred_ref[:] = jnp.where(idx == k, interp, pred_ref[:])
        return carry

    jax.lax.fori_loop(0, n_iter, mc_body, jnp.int32(0))
    rep = rep_ref[:].astype(jnp.int32)   # i16 compare unsupported
    out_ref[:] = jnp.where(rep > 0, jnp.int16(0), pred_ref[:])


@functools.partial(jax.jit, static_argnames=("is_chroma", "pad", "th",
                                             "interpret"))
def predict_plane_mvset_pallas(ref: jax.Array, mv_table: jax.Array,
                               mv_idx_blk: jax.Array,
                               rep_add_blk: jax.Array, is_chroma: bool,
                               pad: int = 72, th: int | None = None,
                               interpret: bool = False,
                               n_valid: jax.Array | None = None,
                               lo_rows: jax.Array | None = None,
                               hi_rows: jax.Array | None = None
                               ) -> jax.Array:
    """Drop-in fast variant of ``predict_plane_mvset`` (same semantics).

    ``n_valid`` (scalar) bounds the populated rows of ``mv_table``;
    padded entries are skipped entirely.  ``lo_rows``/``hi_rows``
    ((hb,) int32, per block row) bound the table indices present in
    each row — each tile then blends only its band's range (plus index
    0).  Omitted -> trivial bounds (the full scan, identical output).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = ref.shape
    k_cap = int(mv_table.shape[0])
    hb, wb = mv_idx_blk.shape

    if th is None:
        th = 64
        while h % th:
            th //= 2

    # Edge-replication == CLAMP_TO_EDGE.  Vertical pad is a multiple of 8
    # and horizontal a multiple of 128 so the aligned window DMA starts
    # stay in bounds for |full-pel shift| <= pad-1.
    pad_y = -(-pad // 8) * 8
    pad_x = -(-pad // 128) * 128
    h_win = th + 16                        # covers row remainder + 1 tap
    w_win = -(-(w + 1) // 128) * 128 + 128
    # Bottom bound: the last strip's window DMA reaches row
    # (h - th) + pad_y + 8*((pad-1)>>3) + h_win, so the bottom pad must
    # be >= 8*((pad-1)>>3) + 16 for ANY tile height (h_win = th+16 was
    # only sufficient for th >= 64).  Right bound: window cols end at
    # pad_x + 128*((pad-1)>>7) + w_win.
    refp = jnp.pad(
        ref,
        ((pad_y, 8 * ((pad - 1) >> 3) + 16),
         (pad_x, 128 * ((pad - 1) >> 7) + w_win - w)),
        mode="edge")

    # per-pixel expansions (cheap XLA broadcasts)
    idx_px = jnp.broadcast_to(
        mv_idx_blk[:, None, :, None], (hb, 8, wb, 8)).reshape(h, w) \
        .astype(jnp.int16)
    rep_px = jnp.broadcast_to(
        rep_add_blk[:, None, :, None], (hb, 8, wb, 8)).reshape(h, w) \
        .astype(jnp.int16)

    grid = (h // th,)
    if n_valid is None:
        n_valid = jnp.int32(k_cap)
    if lo_rows is None:
        lo_rows = jnp.ones((hb,), jnp.int32)
        hi_rows = jnp.full((hb,), k_cap - 1, jnp.int32)
    mv_scalars = jnp.concatenate(
        [jnp.asarray(mv_table).reshape(-1).astype(jnp.int32),
         jnp.asarray(n_valid, jnp.int32).reshape(1),
         jnp.asarray(lo_rows, jnp.int32).reshape(-1),
         jnp.asarray(hi_rows, jnp.int32).reshape(-1)])

    out = pl.pallas_call(
        functools.partial(_mc_kernel, k_cap, pad_y, pad_x, th, w, w_win,
                          is_chroma, hb),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int16),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                # full padded reference stays off-chip; windows are DMA'd
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((th, w), lambda i, mv: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((th, w), lambda i, mv: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((th, w), lambda i, mv: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, h_win, w_win), jnp.uint8),
                pltpu.VMEM((th, w), jnp.int16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=interpret,
    )(mv_scalars, refp, idx_px, rep_px)
    return out.astype(jnp.int32)
