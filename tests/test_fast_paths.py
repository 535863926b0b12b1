"""Fast MC and Pallas kernel paths vs the spec paths (CPU/interpret)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jsvx.kernels.decode import (decode_frame_planes, frame_to_device,
                                 make_constants, mv_bucket,
                                 predict_plane, predict_plane_mvset)
from jsvx.kernels.pallas_decode import (decode_frame_planes_pallas,
                                        fused_recon_plane)
from jsvx.tools.encoder import EncoderConfig, JsvEncoder
from jsvx.tools.oracle import reconstruct_frame

from conftest import synthetic_frames
from test_kernels import _walk


def _stream_frames(clip, emit_sideband=False, **cfg):
    h, w = clip[0][0].shape
    data = JsvEncoder(w, h, EncoderConfig(**cfg)).encode(clip)
    return list(_walk(data, emit_sideband=emit_sideband))


def test_mv_bucket():
    assert mv_bucket(1) == 8
    assert mv_bucket(8) == 8
    assert mv_bucket(9) == 16
    assert mv_bucket(257) == 0


def test_frame_to_device_mv_table(tiny_clip):
    frames = _stream_frames(tiny_clip, gop_size=3, quantizer_scale=4)
    for ft, seq in frames:
        n = len(np.unique(ft.mb_mv.reshape(-1, 2), axis=0)) + 1
        cap = mv_bucket(n)
        d = frame_to_device(ft, mv_capacity=cap)
        tbl, idx = d["mv_table"], d["y"]["mv_idx"]
        assert np.array_equal(tbl[0], [0, 0])
        # table lookup reproduces the per-block vectors
        assert np.array_equal(tbl[idx], d["y"]["mv"])


def test_mv_bounds_sound_and_equal(tiny_clip):
    """Per-block-row MC index bounds (mvset_sort_and_bounds): (a) every
    index present in a row lies within that row's [lo, hi]; (b) the
    Pallas paths decode BIT-IDENTICALLY with bounds vs without them
    (trivial full-scan bounds) — bounds only skip no-op blends."""
    from jsvx.kernels.pallas_fused import decode_frame_planes_fused

    frames = _stream_frames(tiny_clip, gop_size=3, quantizer_scale=4,
                            me_range=4, half_pel_refine=True)
    consts = make_constants(frames[0][1])
    seq = frames[0][1]
    z = lambda h, w: np.zeros((h, w), np.uint8)  # noqa: E731
    refs = (z(seq.coded_height, seq.coded_width),
            z(seq.coded_height // 2, seq.coded_width // 2),
            z(seq.coded_height // 2, seq.coded_width // 2))
    checked_nontrivial = False
    for ft, seq in frames:
        cap = mv_bucket(len(np.unique(ft.mb_mv.reshape(-1, 2),
                                      axis=0)) + 1)
        d = frame_to_device(ft, mv_capacity=cap)
        for key in ("y", "cb", "cr"):
            idx, lo, hi = (np.asarray(d[key]["mv_idx"]),
                           np.asarray(d[key]["mv_lo"]),
                           np.asarray(d[key]["mv_hi"]))
            nz = idx > 0
            for r in range(idx.shape[0]):
                if nz[r].any():
                    assert idx[r][nz[r]].min() >= lo[r]
                    assert idx[r].max() <= hi[r]
            if (hi - np.minimum(lo, hi)).max() + 1 < int(idx.max()):
                checked_nontrivial = True
        d_trivial = {
            k: ({kk: vv for kk, vv in v.items()
                 if kk not in ("mv_lo", "mv_hi")}
                if isinstance(v, dict) else v)
            for k, v in d.items()}
        a = decode_frame_planes_fused(d, refs, consts, interpret=True)
        b = decode_frame_planes_fused(d_trivial, refs, consts,
                                      interpret=True)
        ap = decode_frame_planes_pallas(d, refs, consts, interpret=True)
        for pa, pb, pc in zip(a, b, ap):
            assert np.array_equal(np.asarray(pa), np.asarray(pb))
            assert np.array_equal(np.asarray(pa), np.asarray(pc))
        refs = tuple(np.asarray(p) for p in a)
    assert checked_nontrivial, \
        "fixture never produced a band tighter than the full range"


def test_mvset_equals_gather_on_stream(tiny_clip):
    frames = _stream_frames(tiny_clip, gop_size=3, quantizer_scale=4)
    consts = None
    refs = None
    ref_o = None
    for ft, seq in frames:
        if consts is None:
            consts = make_constants(seq)
            z = lambda h, w: np.zeros((h, w), np.uint8)
            refs = (z(seq.coded_height, seq.coded_width),
                    z(seq.coded_height // 2, seq.coded_width // 2),
                    z(seq.coded_height // 2, seq.coded_width // 2))
        cap = mv_bucket(len(np.unique(ft.mb_mv.reshape(-1, 2), axis=0)) + 1)
        d = frame_to_device(ft, mv_capacity=cap)
        a = decode_frame_planes(d, refs, consts, mc_impl="gather")
        b = decode_frame_planes(d, refs, consts, mc_impl="mvset")
        for pa, pb in zip(a, b):
            assert np.array_equal(np.asarray(pa), np.asarray(pb))
        oracle = reconstruct_frame(ft, seq, ref_o)
        for pb, po in zip(b, oracle):
            assert np.abs(np.asarray(pb).astype(int)
                          - po.astype(int)).max() <= 1
        refs = tuple(np.asarray(p) for p in b)
        ref_o = oracle


def test_mvset_out_of_bounds_clamp(rng):
    """mvset must reproduce CLAMP_TO_EDGE exactly for out-of-picture MVs."""
    h, w = 32, 32
    ref = rng.integers(0, 256, (h, w)).astype(np.uint8)
    mv_tbl = np.array([[0, 0], [-13, -9], [15, 21]], np.int32)
    mv_tbl = np.vstack([mv_tbl, np.zeros((5, 2), np.int32)])
    idx = rng.integers(0, 3, (h // 8, w // 8)).astype(np.int32)
    rep = np.zeros((h // 8, w // 8), np.int32)
    mv_blk = mv_tbl[idx]
    a = np.asarray(predict_plane(jnp.asarray(ref), jnp.asarray(mv_blk),
                                 jnp.asarray(rep), False))
    b = np.asarray(predict_plane_mvset(jnp.asarray(ref),
                                       jnp.asarray(mv_tbl),
                                       jnp.asarray(idx), jnp.asarray(rep),
                                       False, pad=24))
    assert np.array_equal(a, b)


def test_pallas_recon_interpret_matches_xla(tiny_clip):
    frames = _stream_frames(tiny_clip[:2], gop_size=2, quantizer_scale=4)
    consts = None
    refs = None
    for ft, seq in frames:
        if consts is None:
            consts = make_constants(seq)
            z = lambda h, w: np.zeros((h, w), np.uint8)
            refs = (z(seq.coded_height, seq.coded_width),
                    z(seq.coded_height // 2, seq.coded_width // 2),
                    z(seq.coded_height // 2, seq.coded_width // 2))
        cap = mv_bucket(len(np.unique(ft.mb_mv.reshape(-1, 2), axis=0)) + 1)
        d = frame_to_device(ft, mv_capacity=cap)
        a = decode_frame_planes(d, refs, consts, mc_impl="mvset")
        b = decode_frame_planes_pallas(d, refs, consts, interpret=True,
                                       mc_impl="mvset")
        for pa, pb in zip(a, b):
            assert np.array_equal(np.asarray(pa), np.asarray(pb))
        refs = tuple(np.asarray(p) for p in a)


def test_fused_kernel_interpret_matches_xla(tiny_clip):
    """Fully-fused single-kernel path == the spec XLA path, bit-exactly."""
    from jsvx.kernels.pallas_fused import decode_frame_planes_fused

    frames = _stream_frames(tiny_clip, gop_size=3, quantizer_scale=4)
    consts = None
    refs = None
    for ft, seq in frames:
        if consts is None:
            consts = make_constants(seq)
            z = lambda h, w: np.zeros((h, w), np.uint8)
            refs = (z(seq.coded_height, seq.coded_width),
                    z(seq.coded_height // 2, seq.coded_width // 2),
                    z(seq.coded_height // 2, seq.coded_width // 2))
        cap = mv_bucket(len(np.unique(ft.mb_mv.reshape(-1, 2), axis=0)) + 1)
        d = frame_to_device(ft, mv_capacity=cap)
        a = decode_frame_planes(d, refs, consts, mc_impl="mvset")
        b = decode_frame_planes_fused(d, refs, consts, interpret=True)
        for pa, pb in zip(a, b):
            assert np.array_equal(np.asarray(pa), np.asarray(pb))
        refs = tuple(np.asarray(p) for p in a)


def test_fused_kernel_falls_back_without_mv_sideband(tiny_clip):
    """A P frame without the distinct-MV decomposition must not silently
    decode with zero motion (ADVICE r1): the fused entry delegates to the
    two-kernel gather path instead."""
    from jsvx.kernels.pallas_fused import decode_frame_planes_fused

    frames = _stream_frames(tiny_clip[:3], gop_size=3, quantizer_scale=4)
    consts = None
    refs = None
    for ft, seq in frames:
        if consts is None:
            consts = make_constants(seq)
            z = lambda h, w: np.zeros((h, w), np.uint8)
            refs = (z(seq.coded_height, seq.coded_width),
                    z(seq.coded_height // 2, seq.coded_width // 2),
                    z(seq.coded_height // 2, seq.coded_width // 2))
        d = frame_to_device(ft)           # no mv_capacity: no mv_table
        a = decode_frame_planes(d, refs, consts, mc_impl="gather")
        b = decode_frame_planes_fused(d, refs, consts, interpret=True)
        for pa, pb in zip(a, b):
            assert np.array_equal(np.asarray(pa), np.asarray(pb))
        refs = tuple(np.asarray(p) for p in a)


def test_mc_pallas_small_tile_tall_pad(rng):
    """Regression (ADVICE r1): plane heights forcing tile height < 64 made
    the window DMA read past the padded reference for large downward MVs."""
    from jsvx.kernels.pallas_mc import predict_plane_mvset_pallas

    h, w = 24, 128                         # th collapses to 8
    ref = rng.integers(0, 256, (h, w)).astype(np.uint8)
    mv_tbl = np.array([[0, 0], [141, 3], [-140, -95]], np.int32)
    mv_tbl = np.vstack([mv_tbl, np.zeros((5, 2), np.int32)])
    idx = rng.integers(0, 3, (h // 8, w // 8)).astype(np.int32)
    rep = np.zeros((h // 8, w // 8), np.int32)
    a = np.asarray(predict_plane_mvset(
        jnp.asarray(ref), jnp.asarray(mv_tbl), jnp.asarray(idx),
        jnp.asarray(rep), False, pad=72))
    b = np.asarray(predict_plane_mvset_pallas(
        jnp.asarray(ref), jnp.asarray(mv_tbl), jnp.asarray(idx),
        jnp.asarray(rep), False, pad=72, interpret=True))
    assert np.array_equal(a, b)


def test_native_sideband_matches_xla_expand(tiny_clip):
    """C++-emitted mult/flags planes == the XLA expansion."""
    from jsvx.bitstream.native import get_native_parser

    if get_native_parser() is None:
        pytest.skip("native parser unavailable")
    frames = _stream_frames(tiny_clip, emit_sideband=True,
                            gop_size=3, quantizer_scale=4)
    from jsvx.kernels.pallas_decode import expand_sideband

    n_checked = 0
    for ft, seq in frames:
        if ft.mult is None:
            continue
        consts = make_constants(seq)
        d = frame_to_device(ft)
        for comp, key in enumerate(("y", "cb", "cr")):
            mult, flags = expand_sideband(d[key], consts, d["is_p"])
            # XLA expand marks every block by its per-MB intra/lnz values,
            # including uncoded blocks (lnz=0 -> flags bit1=0 everywhere);
            # C++ leaves uncoded blocks zero.  Compare where coded.
            lnz = d[key]["lnz"]
            coded = np.repeat(np.repeat(np.asarray(lnz) > 0, 8, 0), 8, 1)
            got_m = np.asarray(d[key]["mult"])
            got_f = np.asarray(d[key]["flags"])
            np.testing.assert_array_equal(got_m[coded],
                                          np.asarray(mult)[coded])
            np.testing.assert_array_equal(got_f[coded],
                                          np.asarray(flags)[coded])
            # uncoded blocks: flags bit1 must be 0 both ways (zero output)
            assert not np.any(got_f[~coded] & 2)
            assert not np.any(np.asarray(flags)[~coded] & 2)
            n_checked += 1
    assert n_checked > 0


def test_decode_with_native_sideband_matches_oracle(tiny_clip):
    """Pallas path consuming parser-emitted sideband == oracle."""
    from jsvx.bitstream.native import get_native_parser

    if get_native_parser() is None:
        pytest.skip("native parser unavailable")
    frames = _stream_frames(tiny_clip, emit_sideband=True,
                            gop_size=3, quantizer_scale=4)
    consts = None
    refs = None
    ref_o = None
    for ft, seq in frames:
        if consts is None:
            consts = make_constants(seq)
            z = lambda h, w: np.zeros((h, w), np.uint8)
            refs = (z(seq.coded_height, seq.coded_width),
                    z(seq.coded_height // 2, seq.coded_width // 2),
                    z(seq.coded_height // 2, seq.coded_width // 2))
        assert ft.mult is not None
        cap = mv_bucket(len(np.unique(ft.mb_mv.reshape(-1, 2), axis=0)) + 1)
        d = frame_to_device(ft, mv_capacity=cap)
        assert "mult" in d["y"]
        out = decode_frame_planes_pallas(d, refs, consts, interpret=True,
                                         mc_impl="mvset")
        oracle = reconstruct_frame(ft, seq, ref_o)
        for a, b in zip(out, oracle):
            assert np.abs(np.asarray(a).astype(int)
                          - b.astype(int)).max() <= 1
        refs = tuple(np.asarray(p) for p in out)
        ref_o = oracle
