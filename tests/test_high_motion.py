"""High-motion streams: >255 distinct MVs per frame must decode.

The reference decoder accepts any in-range motion vector
(``decoders/jsv.js:831-893``); a 1080p frame has 8160 macroblocks, so
frames whose distinct-MV count exceeds the fast path's top capacity
bucket (255) are realistic.  Round 3 crashed here: the sticky capacity
paths computed ``cap = max(sticky, mv_bucket(n))`` and ``mv_bucket``
returns 0 above 255, so once any earlier frame set a nonzero sticky cap
a later high-motion frame raised ValueError out of the public
``decode_frame()`` / ``transcode()``.  These tests pin the fix: such
frames route to the exact gather MC path instead.
"""

import numpy as np
import pytest

from jsvx.api.decoder import Decoder
from jsvx.api.config import PlayerConfig
from jsvx.tools.encoder import EncoderConfig, JsvEncoder

from conftest import synthetic_frames

MB = 20          # 20x20 macroblocks = 320x320


def _forced_mvs(call_index: int) -> np.ndarray:
    """Per-P-picture motion field: call 0 is low-motion (sets the sticky
    capacity bucket), call 1 carries 256 distinct vectors (incl. (0,0)),
    which with the +1 zero-row accounting overflows the 255 top bucket.

    Interior MBs (rows/cols 2..17) keep every vector legal under the
    encoder's picture-bounds clamp for |v| <= 31 half-pel.
    """
    mv = np.zeros((MB, MB, 2), np.int64)
    if call_index == 0:
        mv[2:18, 2:18] = (2, 2)
    else:
        idx = np.arange(256)
        mv[2:18, 2:18, 0] = (2 * (idx // 16 - 8)).reshape(16, 16)
        mv[2:18, 2:18, 1] = (2 * (idx % 16 - 8)).reshape(16, 16)
    return mv


@pytest.fixture(scope="module")
def high_motion_stream():
    frames = synthetic_frames(4, MB * 16, MB * 16, seed=11)
    cfg = EncoderConfig(gop_size=2, quantizer_scale=8, f_code=3,
                        intra_sad_threshold=1e9,   # never fall back to intra
                        key_map=True)
    enc = JsvEncoder(MB * 16, MB * 16, cfg)
    calls = []

    def forced(y, ref_y):
        i = len(calls)
        calls.append(i)
        return _forced_mvs(i)

    enc._motion_search = forced
    data = enc.encode(frames)
    assert len(calls) == 2
    return data


def _oracle_frames(data: bytes):
    dec = Decoder(backend="oracle")
    dec.feed(0, data, total=len(data))
    return [tuple(np.asarray(p) for p in f.planes)
            for f in dec.iter_frames()]


def _assert_matches(got, want):
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for pg, pw in zip(g, w):
            assert np.abs(np.asarray(pg).astype(int)
                          - pw.astype(int)).max() <= 1


def _distinct_mv_counts(data: bytes):
    from test_kernels import _walk

    return [len(np.unique(ft.mb_mv.reshape(-1, 2), axis=0))
            for ft, _ in _walk(data)]


def test_stream_overflows_top_bucket(high_motion_stream):
    counts = _distinct_mv_counts(high_motion_stream)
    assert max(counts) >= 256            # +1 zero-row accounting > 255
    assert 1 < min(c for c in counts if c > 1) <= 255  # sticky cap primed


def test_decoder_gop_batch_survives(high_motion_stream):
    """GOP-batched decode_frame(): previously ValueError on GOP 2."""
    want = _oracle_frames(high_motion_stream)
    dec = Decoder()
    dec.feed(0, high_motion_stream, total=len(high_motion_stream))
    got = [f.planes for f in dec.iter_frames()]
    assert dec.ended
    assert dec._mv_cap and dec._mv_cap <= 255   # sticky cap stayed sane
    _assert_matches(got, want)


def test_decoder_per_frame_survives(high_motion_stream):
    """Picture-at-a-time decode_frame() (use_gop_scan off)."""
    want = _oracle_frames(high_motion_stream)
    dec = Decoder(config=PlayerConfig(use_gop_scan=False))
    dec.feed(0, high_motion_stream, total=len(high_motion_stream))
    got = [f.planes for f in dec.iter_frames()]
    assert dec.ended
    _assert_matches(got, want)


def test_transcode_survives(high_motion_stream):
    """transcode() (compact/packed native paths): previously ValueError."""
    from jsvx.bitstream.native import get_native_parser
    from jsvx.pipeline.transcode import transcode

    if get_native_parser() is None:
        pytest.skip("native parser unavailable")
    want = _oracle_frames(high_motion_stream)
    out = {}
    res = transcode(high_motion_stream,
                    sink=lambda gi, frames: out.setdefault(gi, frames))
    assert res.n_frames == 4
    got = []
    for gi in sorted(out):
        stacks = out[gi]
        for i in range(np.asarray(stacks[0]).shape[0]):
            got.append(tuple(np.asarray(p)[i] for p in stacks))
    _assert_matches(got, want)


@pytest.fixture(scope="module")
def high_motion_first_stream():
    """The REVERSE order: the overflowing frame comes FIRST (sticky cap
    still 0), then normal motion grows the cap — pins the per-GOP
    mc_impl decision in both directions."""
    frames = synthetic_frames(4, MB * 16, MB * 16, seed=12)
    cfg = EncoderConfig(gop_size=2, quantizer_scale=8, f_code=3,
                        intra_sad_threshold=1e9, key_map=True)
    enc = JsvEncoder(MB * 16, MB * 16, cfg)
    calls = []

    def forced(y, ref_y):
        i = len(calls)
        calls.append(i)
        return _forced_mvs(1 - i)          # overflow first, normal second
    enc._motion_search = forced
    return enc.encode(frames)


def test_decoder_overflow_first_gop(high_motion_first_stream):
    data = high_motion_first_stream
    counts = _distinct_mv_counts(data)
    assert counts[1] >= 256                # P frame of GOP 1 overflows
    want = _oracle_frames(data)
    dec = Decoder()
    dec.feed(0, data, total=len(data))
    got = [f.planes for f in dec.iter_frames()]
    assert dec.ended
    _assert_matches(got, want)


def test_transcode_overflow_first_gop(high_motion_first_stream):
    from jsvx.bitstream.native import get_native_parser
    from jsvx.pipeline.transcode import transcode

    if get_native_parser() is None:
        pytest.skip("native parser unavailable")
    data = high_motion_first_stream
    want = _oracle_frames(data)
    out = {}
    res = transcode(data,
                    sink=lambda gi, frames: out.setdefault(gi, frames))
    assert res.n_frames == 4
    got = []
    for gi in sorted(out):
        stacks = out[gi]
        for i in range(np.asarray(stacks[0]).shape[0]):
            got.append(tuple(np.asarray(p)[i] for p in stacks))
    _assert_matches(got, want)
