"""Corrupt/truncated stream robustness (VERDICT r1 item 8).

The reference tolerates damage silently: illegal MB address increments are
dropped (jsv.js:750-753), zero-f_code pictures skipped (jsv.js:625-629),
and end-of-data mid-picture surfaces as a stall.  jsvx must never crash,
hang, or corrupt state on hostile input: the Decoder either produces
frames, stalls (awaiting bytes), or ends; the Player surfaces MediaError
for unrecoverable sources.  Both parser back-ends must survive the same
inputs.
"""

import numpy as np
import pytest

from jsvx.api import Decoder, Player, PlayerConfig
from jsvx.tools.encoder import EncoderConfig, JsvEncoder

from conftest import synthetic_frames


@pytest.fixture(scope="module")
def good_stream():
    clip = synthetic_frames(6, 48, 64, seed=9)
    return JsvEncoder(64, 48, EncoderConfig(
        gop_size=3, quantizer_scale=4)).encode(clip), len(clip)


def _drain(dec, data, total=None):
    """Feed everything, decode until stall/end; return frames."""
    dec.feed(0, data, total=total if total is not None else len(data))
    frames = []
    for _ in range(100):
        f = dec.decode_frame()
        if f is None:
            break
        frames.append(f)
    return frames


@pytest.mark.parametrize("use_native", [False, True])
def test_truncated_stream_stalls_not_crashes(good_stream, use_native):
    from jsvx.bitstream.native import get_native_parser

    if use_native and get_native_parser() is None:
        pytest.skip("native parser unavailable")
    data, n = good_stream
    for cut in (len(data) // 3, len(data) // 2, len(data) - 5):
        cfg = PlayerConfig(use_native_parser=use_native)
        dec = Decoder(cfg, backend="jax")
        stalls = []
        dec.on("stalled", stalls.append)
        # feed the truncated prefix but declare the TRUE total: decoder
        # must stall awaiting the missing tail, never crash
        frames = _drain(dec, data[:cut], total=len(data))
        assert len(frames) < n
        assert stalls and not dec.ended


@pytest.mark.parametrize("use_native", [False, True])
def test_truncated_final_stream_ends(good_stream, use_native):
    """When the truncated prefix IS the whole stream (total == cut), the
    decoder must terminate (ended or stall-at-end), not loop forever."""
    from jsvx.bitstream.native import get_native_parser

    if use_native and get_native_parser() is None:
        pytest.skip("native parser unavailable")
    data, n = good_stream
    cut = int(len(data) * 0.7)
    cfg = PlayerConfig(use_native_parser=use_native)
    dec = Decoder(cfg, backend="jax")
    try:
        frames = _drain(dec, data[:cut])
    except ValueError:
        frames = []                          # clean parse error is fine
    assert len(frames) <= n


@pytest.mark.parametrize("use_native", [False, True])
def test_bit_flips_never_crash(good_stream, use_native):
    """Randomly corrupted payload bytes: decode must finish (frames,
    stall, end, or a clean error) for every corruption."""
    from jsvx.bitstream.native import get_native_parser

    if use_native and get_native_parser() is None:
        pytest.skip("native parser unavailable")
    data, n = good_stream
    rng = np.random.default_rng(42)
    for trial in range(12):
        buf = bytearray(data)
        for _ in range(4):
            pos = int(rng.integers(60, len(buf)))   # keep container header
            buf[pos] ^= 1 << int(rng.integers(0, 8))
        cfg = PlayerConfig(use_native_parser=use_native)
        dec = Decoder(cfg, backend="jax")
        try:
            frames = _drain(dec, bytes(buf))
        except ValueError:
            continue                         # clean parse error
        assert len(frames) <= n + 2


def test_garbage_source_reports_error_or_nothing():
    """A source that is not JSV at all must not loop or crash."""
    p = Player(PlayerConfig(), backend="oracle")
    junk = bytes(np.random.default_rng(1).integers(0, 256, 4096,
                                                   dtype=np.uint8))
    p.src = junk
    for i in range(30):
        p.tick(i / 30.0)
    # no frames were produced and no exception escaped
    assert p.current_time == 0.0


def test_player_survives_corrupt_midstream(good_stream):
    data, n = good_stream
    buf = bytearray(data)
    mid = len(buf) // 2
    for i in range(mid, min(mid + 40, len(buf))):
        buf[i] ^= 0x55
    p = Player(PlayerConfig(), backend="oracle")
    shown = []
    p.set_frame_sink(lambda f, t: shown.append(t))
    p.src = bytes(buf)
    p.play()
    t = 0.0
    for _ in range(90):
        t += 1 / 30.0
        try:
            p.tick(t)
        except ValueError:
            break                            # clean decode error is fine
    # some prefix decoded; player did not hang or crash
    assert len(shown) <= n
