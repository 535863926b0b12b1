"""Slice-row sharding: one frame's rows across chips, halo exchange for MC.

BASELINE.md config 3: "slice-rows of one frame sharded across 8 chips,
boundary-row exchange".  Dequant and IDCT are block-local, so a row shard
needs no communication; only P-frame motion compensation reads up to
``halo`` rows past the shard boundary.  Those boundary strips of the
*reconstructed reference planes* are exchanged once per frame with
``lax.ppermute`` over the ``rows`` mesh axis — the ICI-native equivalent of
the reference's single-GPU texture rebind (``decoders/jsv.js:1320``).

The required halo is ``8 * forward_f + 1`` pixels of luma (motion range is
``+/-(16*forward_f - 1)`` half-pel, jsv.js:850-855).  When a picture's
f_code exceeds the static halo budget the caller should fall back to the
all-gather path (:mod:`jsvx.shard.gop_parallel` uses full gathers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels.decode import DecodeConstants, decode_frame_plane


def exchange_row_halo(local: jax.Array, halo: int,
                      axis_name: str) -> jax.Array:
    """Extend a local row shard with ``halo`` rows from each neighbour.

    Devices at the global edges receive zero rows there; they are never
    read because edge clamping in :func:`predict_plane` keeps global row
    indices inside [0, H).
    """
    n = jax.lax.axis_size(axis_name)
    if halo == 0 or n == 1:
        return jnp.pad(local, ((halo, halo), (0, 0)))
    down = [(i, i + 1) for i in range(n - 1)]     # my bottom rows -> below's top halo... see below
    up = [(i + 1, i) for i in range(n - 1)]
    # rows just above my shard live on device i-1 (its bottom halo rows)
    from_above = jax.lax.ppermute(local[-halo:], axis_name, down)
    # rows just below my shard live on device i+1 (its top halo rows)
    from_below = jax.lax.ppermute(local[:halo], axis_name, up)
    return jnp.concatenate([from_above, local, from_below], axis=0)


def _decode_frame_local(frame, refs, consts, halo_y, axis_name, h_globals,
                        quirk):
    """Per-device body: decode one frame's local row shard of all planes."""
    idx = jax.lax.axis_index(axis_name)
    outs = []
    for comp, key in enumerate(("y", "cb", "cr")):
        halo = halo_y if comp == 0 else halo_y // 2
        local_ref = refs[comp]
        h_local = local_ref.shape[0]
        ext = exchange_row_halo(local_ref, halo, axis_name)
        row0 = idx * h_local
        outs.append(decode_frame_plane(
            frame[key], ext, frame["is_p"], consts, comp != 0, quirk,
            halo=halo, row0=row0, h_global=h_globals[comp]))
    return tuple(outs)


def decode_gop_rows_sharded(stacked: dict, init_refs: tuple,
                            consts: DecodeConstants, mesh: Mesh,
                            axis_name: str = "rows", halo_y: int = 64,
                            quirk_oddify_zeros: bool = False):
    """Decode a stacked GOP with every plane row-sharded over ``axis_name``.

    ``stacked`` as produced by :func:`jsvx.pipeline.gop.stack_device_frames`
    (leading frame axis); plane/sideband arrays are sharded on their row
    axis, the scan carry (reference planes) stays sharded, and each P frame
    performs one halo exchange per plane.  Returns (stacked planes, final
    refs) with the same shardings.
    """
    h_globals = (init_refs[0].shape[0], init_refs[1].shape[0],
                 init_refs[2].shape[0])

    has_mvset = "mv_table" in stacked
    has_sideband = "mult" in stacked["y"]

    def comp_spec():
        d = dict(levels=P(None, axis_name, None),
                 lnz=P(None, axis_name, None),
                 q=P(None, axis_name, None),
                 intra=P(None, axis_name, None),
                 mv=P(None, axis_name, None, None),
                 rep_add=P(None, axis_name, None))
        if has_mvset:
            d["mv_idx"] = P(None, axis_name, None)
        if has_sideband:
            d["mult"] = P(None, axis_name, None)
            d["flags"] = P(None, axis_name, None)
        return d

    top_spec = dict(y=comp_spec(), cb=comp_spec(), cr=comp_spec(),
                    is_p=P(None))
    if has_mvset:
        top_spec["mv_table"] = P(None, None, None)   # replicated
    in_specs = (top_spec,
                (P(axis_name, None), P(axis_name, None), P(axis_name, None)))
    out_specs = ((P(None, axis_name, None),) * 3,
                 (P(axis_name, None),) * 3)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False)
    def run(stacked_local, refs_local):
        def step(refs, frame):
            planes = _decode_frame_local(frame, refs, consts, halo_y,
                                         axis_name, h_globals,
                                         quirk_oddify_zeros)
            return planes, planes

        final, outs = jax.lax.scan(step, refs_local, stacked_local)
        return outs, final

    return run(stacked, init_refs)


def decode_gops_2d_sharded(batch: dict, init_refs: tuple,
                           consts: DecodeConstants, mesh: Mesh,
                           gop_axis: str = "gop", rows_axis: str = "rows",
                           halo_y: int = 64,
                           quirk_oddify_zeros: bool = False):
    """The full two-axis step: GOP batch data-parallel over ``gop_axis``
    (DP) x slice-rows over ``rows_axis`` (SP) with per-frame halo exchange.

    ``batch`` leaves have leading axes ``(n_gops, n_frames, ...)``;
    ``init_refs`` planes are ``(n_gops, H, W)``.  This is the layout a
    multi-host pod runs: GOPs across hosts (DCN-distributed manifest),
    rows across each host's chips (ICI halo exchange).
    """
    h_globals = (init_refs[0].shape[1], init_refs[1].shape[1],
                 init_refs[2].shape[1])

    has_mvset = "mv_table" in batch
    has_sideband = "mult" in batch["y"]

    def comp_spec():
        d = dict(levels=P(gop_axis, None, rows_axis, None),
                 lnz=P(gop_axis, None, rows_axis, None),
                 q=P(gop_axis, None, rows_axis, None),
                 intra=P(gop_axis, None, rows_axis, None),
                 mv=P(gop_axis, None, rows_axis, None, None),
                 rep_add=P(gop_axis, None, rows_axis, None))
        if has_mvset:
            d["mv_idx"] = P(gop_axis, None, rows_axis, None)
        if has_sideband:
            d["mult"] = P(gop_axis, None, rows_axis, None)
            d["flags"] = P(gop_axis, None, rows_axis, None)
        return d

    top_spec = dict(y=comp_spec(), cb=comp_spec(), cr=comp_spec(),
                    is_p=P(gop_axis, None))
    if has_mvset:
        top_spec["mv_table"] = P(gop_axis, None, None, None)
    in_specs = (top_spec,
                (P(gop_axis, rows_axis, None),) * 3)
    out_specs = ((P(gop_axis, None, rows_axis, None),) * 3,
                 (P(gop_axis, rows_axis, None),) * 3)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False)
    def run(batch_local, refs_local):
        def one_gop(stacked_local, refs0):
            def step(refs, frame):
                planes = _decode_frame_local(frame, refs, consts, halo_y,
                                             rows_axis, h_globals,
                                             quirk_oddify_zeros)
                return planes, planes

            final, outs = jax.lax.scan(step, refs0, stacked_local)
            return outs, final

        return jax.vmap(one_gop)(batch_local, refs_local)

    return run(batch, init_refs)
