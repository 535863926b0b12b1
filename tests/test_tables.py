"""VLC table integrity tests."""

import numpy as np
import pytest

from jsvx.coding import tables as T
from jsvx.coding.vlc import build_lut, compiled_tables


ALL_TABLES = [
    T.MACROBLOCK_ADDRESS_INCREMENT,
    T.MACROBLOCK_TYPE_I,
    T.MACROBLOCK_TYPE_P,
    T.MACROBLOCK_TYPE_B,
    T.CODE_BLOCK_PATTERN,
    T.MOTION,
    T.DCT_DC_SIZE_LUMINANCE,
    T.DCT_DC_SIZE_CHROMINANCE,
    T.DCT_COEFF,
]


@pytest.mark.parametrize("entries", ALL_TABLES, ids=lambda e: f"n{len(e)}")
def test_prefix_free(entries):
    codes = [c for _, c in entries]
    assert len(set(codes)) == len(codes)
    for i, a in enumerate(codes):
        for b in codes[i + 1:]:
            assert not a.startswith(b) and not b.startswith(a), (a, b)


def test_lut_roundtrip():
    for entries in ALL_TABLES:
        t = build_lut(entries)
        for value, code in entries:
            peek = int(code, 2) << (t.max_len - len(code))
            # all fillings of the don't-care bits decode identically
            for fill in (0, (1 << (t.max_len - len(code))) - 1):
                v, n = t.decode_peek(peek | fill)
                assert v == value and n == len(code)


def test_zigzag_inverse():
    assert np.array_equal(T.ZIG_ZAG[T.ZIG_ZAG_INVERSE], np.arange(64))
    assert np.array_equal(T.ZIG_ZAG_INVERSE[T.ZIG_ZAG], np.arange(64))
    assert T.ZIG_ZAG[0] == 0 and T.ZIG_ZAG[63] == 63


def test_cbp_covers_all_values():
    vals = sorted(v for v, _ in T.CODE_BLOCK_PATTERN)
    # cbp 0 is not codable (signalled by mb_type without the pattern bit)
    assert vals == list(range(1, 64)) + [60] or len(vals) == 63
    assert set(vals) == set(range(1, 64))


def test_motion_symmetry():
    m = dict(T.MOTION)
    for v in range(1, 17):
        assert len(m[v]) == len(m[-v])


def test_dct_coeff_contents():
    vals = {v for v, _ in T.DCT_COEFF}
    assert T.DCT_COEFF_ESCAPE in vals
    # spot checks against ISO 11172-2 table B.5c
    d = {v: c for v, c in T.DCT_COEFF}
    assert d[(0 << 8) | 1] == "1"
    assert d[(1 << 8) | 1] == "011"
    assert d[(0 << 8) | 2] == "0100"
    assert d[(13 << 8) | 1] == "00100000"
    assert d[(1 << 8) | 18] == "0000000000010000"


def test_premultiplier_matches_reference_matrix():
    expected = np.array([
        32, 44, 42, 38, 32, 25, 17, 9,
        44, 62, 58, 52, 44, 35, 24, 12,
        42, 58, 55, 49, 42, 33, 23, 12,
        38, 52, 49, 44, 38, 30, 20, 10,
        32, 44, 42, 38, 32, 25, 17, 9,
        25, 35, 33, 30, 25, 20, 14, 7,
        17, 24, 23, 20, 17, 14, 9, 5,
        9, 12, 12, 10, 9, 7, 5, 2,
    ], dtype=np.uint8).reshape(8, 8)
    assert np.array_equal(T.PREMULTIPLIER, expected)


def test_compiled_tables_cached():
    assert compiled_tables() is compiled_tables()
