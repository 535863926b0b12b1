"""C++ parser vs Python parser equivalence (fuzzed).

The Python parser is the executable spec; the native back-end must produce
bit-identical FrameTensors on every stream.
"""

import numpy as np
import pytest

from jsvx.bitstream.bitio import BitReader
from jsvx.bitstream.container import StartCodeIndex, parse_container_header
from jsvx.bitstream.native import get_native_parser
from jsvx.bitstream.parser import StreamParser
from jsvx.coding import tables as T
from jsvx.tools.encoder import EncoderConfig, JsvEncoder

from conftest import synthetic_frames

native_available = get_native_parser() is not None

pytestmark = pytest.mark.skipif(not native_available,
                                reason="native parser unavailable")


def _parse_stream(data, use_native):
    r = BitReader(bytes(data))
    parse_container_header(r)
    index = StartCodeIndex.scan(bytes(data))
    parser = StreamParser(use_native=use_native)
    out = []
    while True:
        nxt = index.next_code(r.byte_pos)
        if nxt is None:
            return out
        off, code = nxt
        r.seek_bits((off + 4) << 3)
        if code == T.START_SEQUENCE:
            parser.parse_sequence_header(r)
        elif code == T.START_GOP:
            parser.parse_gop_header(r)
        elif code == T.START_PICTURE:
            ft = parser.parse_picture(r, index, len(data))
            if ft is not None:
                out.append(ft)


def _assert_equal_fts(a, b):
    assert a.picture_type == b.picture_type
    assert a.f_code == b.f_code
    for i in range(3):
        np.testing.assert_array_equal(a.levels[i], b.levels[i])
        np.testing.assert_array_equal(a.lnz[i], b.lnz[i])
    np.testing.assert_array_equal(a.mb_quant, b.mb_quant)
    np.testing.assert_array_equal(a.mb_intra, b.mb_intra)
    np.testing.assert_array_equal(a.mb_mv, b.mb_mv)
    np.testing.assert_array_equal(a.mb_rep_add, b.mb_rep_add)


@pytest.mark.parametrize("seed,hw,cfg", [
    (1, (48, 64), dict(gop_size=3, quantizer_scale=4)),
    (2, (96, 112), dict(gop_size=5, quantizer_scale=8, me_range=6)),
    (3, (64, 80), dict(gop_size=4, quantizer_scale=2, use_skips=False)),
    (4, (48, 48), dict(gop_size=2, quantizer_scale=12, f_code=2)),
    (5, (80, 64), dict(gop_size=8, quantizer_scale=6, full_pel=True,
                       me_range=4)),
])
def test_native_matches_python(seed, hw, cfg):
    clip = synthetic_frames(6, hw[0], hw[1], seed=seed)
    data = JsvEncoder(hw[1], hw[0], EncoderConfig(**cfg)).encode(clip)
    py = _parse_stream(data, use_native=False)
    nat = _parse_stream(data, use_native=True)
    assert len(py) == len(nat) == 6
    for a, b in zip(nat, py):
        _assert_equal_fts(a, b)


def test_native_custom_matrices():
    clip = synthetic_frames(3, 48, 64, seed=9)
    iq = np.clip(T.DEFAULT_INTRA_QUANT_MATRIX * 2, 1, 255).astype(np.uint8)
    data = JsvEncoder(64, 48, EncoderConfig(
        gop_size=3, custom_intra_q=iq)).encode(clip)
    py = _parse_stream(data, use_native=False)
    nat = _parse_stream(data, use_native=True)
    for a, b in zip(nat, py):
        _assert_equal_fts(a, b)


def test_native_corrupt_stream_no_crash():
    clip = synthetic_frames(3, 48, 64, seed=10)
    data = bytearray(JsvEncoder(64, 48, EncoderConfig(
        gop_size=3)).encode(clip))
    rng = np.random.default_rng(0)
    for _ in range(20):
        bad = bytearray(data)
        n = rng.integers(1, 30)
        for _ in range(n):
            bad[rng.integers(60, len(bad))] = rng.integers(0, 256)
        try:
            _parse_stream(bytes(bad), use_native=True)
        except Exception as e:
            # errors are fine; crashes / hangs are not
            assert isinstance(e, Exception)
