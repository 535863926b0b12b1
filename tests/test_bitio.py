"""Bit reader/writer and container tests."""

import numpy as np
import pytest

from jsvx.bitstream.bitio import BitReader, BitStallError, BitWriter
from jsvx.bitstream.container import find_start_codes, parse_container_header
from jsvx.coding.vlc import compiled_tables


def test_writer_reader_roundtrip(rng):
    w = BitWriter()
    fields = []
    for _ in range(500):
        n = int(rng.integers(1, 25))
        v = int(rng.integers(0, 1 << n))
        fields.append((v, n))
        w.put_bits(v, n)
    w.byte_align()
    r = BitReader(w.getvalue())
    for v, n in fields:
        assert r.get_bits(n) == v


def test_reader_peek_and_stall():
    r = BitReader(b"\xAB\xCD")
    assert r.peek(4) == 0xA
    assert r.get_bits(8) == 0xAB
    assert r.get_bits(8) == 0xCD
    with pytest.raises(BitStallError):
        r.get_bits(1)
    # peek past end zero-pads
    r2 = BitReader(b"\xFF")
    assert r2.peek(16) == 0xFF00


def test_reader_base_offset():
    r = BitReader(b"\x12\x34", base=100)
    assert r.byte_pos == 100
    assert r.get_bits(8) == 0x12
    assert r.byte_pos == 101


def test_vlc_readwrite():
    t = compiled_tables()["motion"]
    w = BitWriter()
    values = list(range(-16, 17))
    for v in values:
        w.put_code(t, v)
    w.byte_align()
    r = BitReader(w.getvalue())
    for v in values:
        assert r.read_vlc(t) == v


def test_find_start_codes():
    data = b"\x00\x00\x01\xB8junk\x00\x00\x01\x01xx\x00\x00\x01\xC3"
    hits = find_start_codes(data)
    assert [(int(o), int(c)) for o, c in hits] == [
        (0, 0xB8), (8, 0x01), (14, 0xC3)]


def test_container_header_roundtrip():
    w = BitWriter()
    w.put_bits(0x4A56, 16)
    w.put_bits(320, 16)
    w.put_bits(240, 16)
    w.put_bits(1234, 16)   # 12.34 s
    w.byte_align()
    meta = parse_container_header(BitReader(w.getvalue() + b"\x00" * 8))
    assert meta.width == 320 and meta.height == 240
    assert abs(meta.duration - 12.34) < 1e-9
    assert not meta.yuva and meta.key_map is None


def test_container_header_extended_duration_and_map():
    w = BitWriter()
    w.put_bits(0, 16)
    w.put_bits(1920, 16)
    w.put_bits(1080, 16)
    w.put_bits(0, 16)          # extended form
    w.put_bits(1, 1)           # yuva
    w.put_bits(123456, 23)
    w.put_bits(0x000001C4, 32)
    w.put_bits(2, 32)
    for off, tc in [(100, 0x04000080), (200, 0x04100100)]:
        w.put_bits(off, 32)
        w.put_bits(tc, 32)
    w.byte_align()
    meta = parse_container_header(BitReader(w.getvalue()))
    assert meta.yuva and meta.n_components == 4
    assert abs(meta.duration - 1234.56) < 1e-9
    assert meta.key_map is not None and meta.key_map.count == 2
    assert list(meta.key_map.offsets) == [100, 200]
