"""Streaming Decoder + Player behaviour tests (oracle backend).

Covers the HTML5-video-emulation semantics of SURVEY.md section 2.4:
progressive loading with stall/refill, readyState promotion, playback
clock, timeupdate/ended/loop, key-map seeking, ABR down-switch, and
played/buffered ranges.
"""

import numpy as np
import pytest

from jsvx.api import Decoder, MediaError, Player, PlayerConfig, ReadyState
from jsvx.api.player import TimeRanges
from jsvx.coding import tables as T
from jsvx.runtime.source import MemorySource
from jsvx.tools.encoder import EncoderConfig, JsvEncoder
from jsvx.tools.oracle import decode_stream_oracle

from conftest import synthetic_frames


@pytest.fixture(scope="module")
def stream():
    clip = synthetic_frames(12, 48, 64, seed=5)
    data = JsvEncoder(64, 48, EncoderConfig(
        gop_size=4, quantizer_scale=4)).encode(clip)
    return data, clip


# ---------------------------------------------------------------------------
# Decoder (streaming pull API)


def test_decoder_progressive_feed(stream):
    data, clip = stream
    dec = Decoder(PlayerConfig(), backend="oracle")
    stalls = []
    dec.on("stalled", stalls.append)

    # nothing fed yet
    assert dec.decode_frame() is None
    got = []
    pos = 0
    chunk = 400
    while len(got) < len(clip):
        frame = dec.decode_frame()
        if frame is not None:
            got.append(frame)
            continue
        if pos >= len(data):
            break
        dec.feed(pos, data[pos:pos + chunk], len(data))
        pos += chunk
    assert len(got) == len(clip)
    assert stalls, "progressive feed should have produced stall events"
    # frames identical to whole-stream oracle decode
    want = decode_stream_oracle(data)
    for a, b in zip(got, want):
        for pa, pb in zip(a.planes, b.planes):
            np.testing.assert_array_equal(np.asarray(pa), pb)
    assert dec.decode_frame() is None
    assert dec.ended


def test_decoder_events_and_meta(stream):
    data, _ = stream
    dec = Decoder(PlayerConfig(), backend="oracle")
    events = []
    for name in ("meta", "seq", "frame", "ended"):
        dec.on(name, lambda *a, n=name: events.append(n))
    dec.feed(0, data, len(data))
    assert dec.meta.width == 64 and dec.meta.height == 48
    while dec.decode_frame() is not None:
        pass
    assert events[0] == "meta"
    assert "seq" in events and "ended" in events
    assert events.count("frame") == 12


def test_decoder_seek_keymap(stream):
    data, _ = stream
    dec = Decoder(PlayerConfig(), backend="oracle")
    dec.feed(0, data, len(data))
    dec.decode_frame()                      # init sequence
    seeked = []
    dec.on("seeked", lambda *a: seeked.append(a))
    # seek to ~ second GOP (frame 4 @30fps ~ 133ms... use 200ms)
    assert dec.seek(200.0)
    assert seeked
    frame = dec.decode_frame()
    assert frame is not None and frame.is_intra


# ---------------------------------------------------------------------------
# Player


def _make_player(data, **cfg):
    p = Player(PlayerConfig(**cfg), backend="oracle")
    p.src = data                             # bytes -> MemorySource
    return p


def test_player_load_events_and_metadata(stream):
    data, _ = stream
    p = Player(PlayerConfig(), backend="oracle")
    events = []
    for name in ("loadstart", "durationchange", "loadedmetadata",
                 "loadeddata", "canplay", "canplaythrough"):
        p.on(name, lambda n=name: events.append(n))
    p.src = data
    assert events.index("loadstart") == 0
    assert "loadedmetadata" in events and "canplay" in events
    assert p.video_width == 64 and p.video_height == 48
    assert abs(p.duration - 0.4) < 0.02      # 12 frames @ 30fps
    assert p.ready_state == ReadyState.HAVE_ENOUGH_DATA
    assert p.buffered.length == 1


def test_player_playback_clock(stream):
    data, clip = stream
    p = _make_player(data)
    shown = []
    p.set_frame_sink(lambda f, t: shown.append(t))
    updates = []
    p.on("timeupdate", lambda: updates.append(p.current_time))
    ended = []
    p.on("ended", lambda: ended.append(1))

    p.play()
    assert not p.paused
    t = 0.0
    while not ended and t < 2.0:
        t += 1 / 30.0
        p.tick(t)
    assert ended, "playback should finish"
    assert len(shown) == len(clip)
    assert p.ended and p.paused
    # times advance by ~ frame duration
    deltas = np.diff(shown)
    assert np.all(deltas > 0)
    # played ranges recorded
    assert p.played.length >= 1


def test_player_loop(stream):
    data, clip = stream
    p = _make_player(data, loop=True)
    p.play()
    shown = []
    p.set_frame_sink(lambda f, t: shown.append(t))
    t = 0.0
    for _ in range(int(2.2 * len(clip))):
        t += 1 / 30.0
        p.tick(t)
    assert len(shown) > len(clip), "loop should restart playback"
    assert not p.ended


def test_player_seek(stream):
    data, _ = stream
    p = _make_player(data)
    events = []
    p.on("seeking", lambda: events.append("seeking"))
    p.on("seeked", lambda: events.append("seeked"))
    p.current_time = 0.25
    assert events == ["seeking", "seeked"]
    assert not p.seeking
    # lands on a GOP boundary at/below target with <=150ms precision
    assert p.current_time <= 0.25 + 1e-6
    assert 0.25 - p.current_time <= 0.151
    p.play()
    shown = []
    p.set_frame_sink(lambda f, t: shown.append((f, t)))
    t = 0.0
    for _ in range(3):
        t += 1 / 30.0
        p.tick(t)
    assert shown and shown[0][0].is_intra


def test_player_abr_downswitch(stream):
    data, _ = stream
    p = Player(PlayerConfig(max_waitings=2), backend="oracle")
    switches = []
    p.on("bitratechange", switches.append)
    p.src = [{"src": data, "b": 800}, {"src": data, "b": 400}]
    assert p.src == data
    p.play()
    # drain the queue then force underruns past max_waitings
    t = 0.0
    for _ in range(40):
        t += 1 / 30.0
        p.tick(t)
    p._frames.clear()
    p.decoder._ended = False                 # simulate starvation
    p.decoder.buffer.fully_loaded = False
    waits = []
    p.on("waiting", lambda: waits.append(1))
    for _ in range(3):
        p._underrun()
    assert switches == [400.0]


def test_player_volume_and_rate(stream):
    data, _ = stream
    p = _make_player(data)
    events = []
    p.on("volumechange", lambda: events.append("v"))
    p.on("ratechange", lambda: events.append("r"))
    p.volume = 0.5
    p.muted = True
    p.playback_rate = 2.0
    assert events == ["v", "v", "r"]
    with pytest.raises(ValueError):
        p.volume = 1.5
    assert p.can_play_type("video/jsv") == "probably"
    assert p.can_play_type("video/mp4") == ""


def test_player_config_validation():
    with pytest.raises(MediaError):
        PlayerConfig(buffer_min_sec=50, buffer_sec=30).validate()


def test_player_chunked_loading_stall_refill(stream):
    """Small forward window + chunked source exercises stall/refill."""
    data, clip = stream
    p = Player(PlayerConfig(chunk_size=256, buffer_sec=0.2,
                            buffer_min_sec=0.1), backend="oracle")
    p.src = data
    p.play()
    shown = []
    p.set_frame_sink(lambda f, t: shown.append(t))
    t = 0.0
    for _ in range(80):
        t += 1 / 30.0
        p.tick(t)
        if p.ended:
            break
    assert len(shown) == len(clip)


def test_player_background_decode_thread(stream):
    """The front/back split the reference designed but disabled
    (worker bridge, easybits.player.js:216) — decode off the clock."""
    import time as _time

    data, clip = stream
    p = _make_player(data)
    p.start_background_decode(poll_s=0.001)
    try:
        shown = []
        p.set_frame_sink(lambda f, t: shown.append(t))
        p.play()
        t = 0.0
        deadline = _time.time() + 5.0
        while not p.ended and _time.time() < deadline:
            t += 1 / 30.0
            p.tick(t)
            _time.sleep(0.002)
        assert len(shown) == len(clip)
        assert p.metrics.counters["frames_displayed"] == len(clip)
        assert p.display_fps > 0
    finally:
        p.stop_background_decode()


def test_audio_map_resolution(stream):
    data, _ = stream
    p = Player(PlayerConfig(audio_map=[(r"\.jsv$", ".mp3")]),
               backend="oracle")
    p._sources = [type("V", (), {"src": "http://x/clip.jsv",
                                 "bitrate": 0})()]
    assert p.audio_src == "http://x/clip.mp3"
    p._sources = [type("V", (), {"src": data, "bitrate": 0})()]
    assert p.audio_src == ""


class _FakeTime:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_wall_clock_audio():
    from jsvx.api.player import WallClockAudio

    ft = _FakeTime()
    a = WallClockAudio(b"\0" * 32000 * 10, bytes_per_sec=32000, time_fn=ft)
    assert a.duration == 10.0 and not a.playing
    a.play()
    ft.t += 2.5
    assert abs(a.current_time - 2.5) < 1e-9
    a.pause()
    ft.t += 5.0
    assert abs(a.current_time - 2.5) < 1e-9   # frozen while paused
    a.seek(9.5)
    a.play()
    ft.t += 3.0
    assert a.current_time == 10.0             # clamped to duration


def test_av_sync_pauses_ahead_audio(stream):
    """Audio running ahead beyond the limit pauses the AUDIO side and
    resumes it once video catches up (easybits.player.js:2326-2368)."""
    from jsvx.api.player import WallClockAudio

    data, clip = stream
    ft = _FakeTime()
    clock = WallClockAudio(b"\0" * 32000 * 30, time_fn=ft)
    p = Player(PlayerConfig(sync_interval_ms=50, av_sync_limit_ms=100),
               backend="oracle", audio_clock=clock)
    p.src = data
    p.play()
    assert clock.playing
    # audio sprints 250 ms ahead while video shows its first frames
    t = 0.0
    for _ in range(3):
        t += 1 / 30.0
        ft.t = t + 0.25
        p.tick(t)
    assert not clock.playing, "ahead audio should be paused"
    # video keeps playing; once it passes the (frozen) audio clock the
    # next sync check resumes audio
    while p.current_time <= clock.current_time and t < 1.0:
        t += 1 / 30.0
        p.tick(t)
    t += 0.06
    p.tick(t)
    assert clock.playing, "audio should resume when video catches up"


def test_av_sync_holds_ahead_video(stream):
    """Video running ahead beyond the limit holds the render clock until
    the audio clock catches up."""
    from jsvx.api.player import WallClockAudio

    data, clip = stream
    ft = _FakeTime()
    clock = WallClockAudio(b"\0" * 32000 * 30, time_fn=ft)
    p = Player(PlayerConfig(sync_interval_ms=50, av_sync_limit_ms=100),
               backend="oracle", audio_clock=clock)
    p.src = data
    p.play()
    # audio clock frozen (ft.t fixed): video runs ahead
    t = 0.0
    while p.current_time < 0.15 and t < 1.0:
        t += 1 / 30.0
        p.tick(t)
    t += 0.06
    p.tick(t)
    held_at = p.current_time
    assert p._av_hold == "video"
    for _ in range(4):                      # video must not advance
        t += 1 / 30.0
        p.tick(t)
    assert p.current_time == held_at
    # let audio catch up, next sync releases the hold
    ft.t = held_at + 0.05
    t += 0.06
    p.tick(t)
    assert p._av_hold is None
    t += 1 / 30.0
    p.tick(t)
    assert p.current_time > held_at


def test_audio_map_fetch_installs_wall_clock(stream, tmp_path):
    """config.audio_map resolves a sidecar URL whose payload is FETCHED
    and drives a concrete WallClockAudio (VERDICT r1: the reference
    plays a real companion <audio>; nothing fetched audio before)."""
    from jsvx.api.player import NullAudioClock, WallClockAudio

    data, _ = stream
    video = tmp_path / "movie.jsv"
    video.write_bytes(data)
    audio = tmp_path / "movie.pcm"
    audio.write_bytes(b"\0" * 64000)
    p = Player(PlayerConfig(audio_map=[(r"\.jsv$", ".pcm")]),
               backend="oracle")
    loaded = []
    p.on("audioloaded", lambda: loaded.append(1))
    p.src = str(video)
    for _ in range(200):
        if loaded:
            break
        import time as _t

        _t.sleep(0.01)
    assert loaded and isinstance(p.audio, WallClockAudio)
    assert abs(p.audio.duration - 2.0) < 1e-9   # 64000 B / 32000 Bps


def test_audio_unlock_ceremony(stream):
    """config.unlock_audio gates the audio clock behind an explicit
    unlock_audio() call (features/unlockaudio.js analog)."""
    from jsvx.api.player import WallClockAudio

    data, _ = stream
    ft = _FakeTime()
    clock = WallClockAudio(b"\0" * 32000 * 30, time_fn=ft)
    p = Player(PlayerConfig(unlock_audio=True), backend="oracle",
               audio_clock=clock)
    events = []
    p.on("audiounlocked", lambda: events.append(1))
    p.src = data
    p.play()
    assert not clock.playing and not p.audio_unlocked
    p.unlock_audio()
    assert events == [1] and clock.playing and p.audio_unlocked
    p.unlock_audio()                       # idempotent
    assert events == [1]


def test_buffered_vbr_uses_key_map():
    """buffered must map bytes to time through the GOP key map, not a
    global average rate: GOPs of very different sizes would otherwise
    misreport (VERDICT r1 item 9)."""
    # first GOP: noisy (big); second GOP: flat (small)
    rng = np.random.default_rng(0)
    noisy = [(rng.integers(0, 256, (48, 64)).astype(np.uint8),
              np.full((24, 32), 128, np.uint8),
              np.full((24, 32), 128, np.uint8)) for _ in range(4)]
    flat = [(np.full((48, 64), 100, np.uint8),
             np.full((24, 32), 128, np.uint8),
             np.full((24, 32), 128, np.uint8)) for _ in range(4)]
    data = JsvEncoder(64, 48, EncoderConfig(
        gop_size=4, quantizer_scale=4)).encode(noisy + flat)
    p = Player(PlayerConfig(), backend="oracle")
    p.src = data
    km = p.decoder.meta.key_map
    assert km is not None and km.count == 2
    gop1_bytes = int(km.offsets[1])
    assert gop1_bytes / len(data) > 0.6       # genuinely VBR-ish
    t = p._byte_to_time(gop1_bytes)
    # byte at the 2nd GOP's start is ~half the stream's duration even
    # though it sits way past half the bytes
    assert abs(t - km.time_of(1, 30.0)) < 0.05
    avg = gop1_bytes / (len(data) / p.duration)
    assert abs(avg - t) > 0.05               # the naive estimate is off
    full = p.buffered
    assert full.length == 1
    assert abs(full.end(0) - p.duration) < 0.1


def test_gop_batch_decode_matches_per_frame(stream):
    """With use_gop_scan and a fully-buffered key-map GOP, the Decoder
    reconstructs whole GOPs in one device scan; output must equal the
    picture-at-a-time path exactly, including after a seek."""
    data, clip = stream

    def run(use_gop_scan):
        d = Decoder(PlayerConfig(use_gop_scan=use_gop_scan))
        d.feed(0, data, total=len(data))
        return d, [f for f in d.iter_frames()]

    d_batch, batch = run(True)
    d_one, single = run(False)
    assert d_batch._mv_cap and batch and d_batch.ended
    assert len(batch) == len(single) == len(clip)
    # the batch path actually engaged (frames were queued)
    for a, b in zip(batch, single):
        assert a.picture_type == b.picture_type
        for pa, pb in zip(a.planes, b.planes):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

    # seek drops the internal queue and stays consistent
    d = Decoder(PlayerConfig(use_gop_scan=True))
    d.feed(0, data, total=len(data))
    first = d.decode_frame()
    assert first is not None and d._pending      # queue populated
    assert d.seek(250.0)
    got = [f for f in d.iter_frames()]
    assert got and got[0].is_intra
    # frames after seek equal the tail of the straight decode
    tail = single[len(single) - len(got):]
    for a, b in zip(got, tail):
        for pa, pb in zip(a.planes, b.planes):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_gop_batch_partial_buffer_falls_back(stream):
    """A partially-buffered GOP must still decode per-frame (no batch),
    then batching resumes once the data arrives."""
    data, clip = stream
    d = Decoder(PlayerConfig(use_gop_scan=True))
    # feed only the first half: the early GOPs batch, later ones stall
    half = len(data) // 2
    d.feed(0, data[:half], total=len(data))
    got = [f for f in d.iter_frames()]
    assert 0 < len(got) < len(clip) and not d.ended
    d.feed(half, data[half:], total=len(data))
    got += [f for f in d.iter_frames()]
    assert len(got) == len(clip) and d.ended


def test_top_level_exports():
    import jsvx

    assert jsvx.Player is not None
    assert jsvx.PlayerConfig is not None
    assert callable(jsvx.encode_frames)
    with pytest.raises(AttributeError):
        jsvx.nonexistent


def test_player_pending_seek_while_streaming(stream):
    """Seek beyond buffered data defers until the bytes arrive
    (the reference's re-seek-on-chunk path, easybits.player.js:2139)."""
    data, _ = stream
    p = Player(PlayerConfig(), backend="oracle")
    seeked = []
    p.on("seeked", lambda: seeked.append(1))
    # manual drip-feed: install decoder without a source
    p._sources = [type("V", (), {"src": data, "bitrate": 0})()]
    p._reset_for_source()
    p.decoder.feed(0, data[:600], len(data))
    p.current_time = 0.3                   # target GOP not yet buffered
    assert p.seeking and not seeked
    # feed the rest: pending seek should resolve
    p._on_chunk(600, data[600:], len(data))
    assert seeked and not p.seeking
    assert 0.3 - p.current_time <= 0.151


def test_player_emit_rgb(stream):
    """config.emit_rgb: the sink receives a display-size (H, W, 3) uint8
    RGB array converted on device (the reference's display-time
    YCbCrToRGBA pass, player/parts/end.js:77-156)."""
    data, _ = stream
    p = Player(PlayerConfig(emit_rgb=True), backend="jax")
    p.src = data
    got, raw = [], []
    p.set_frame_sink(lambda rgb, t: got.append(np.asarray(rgb)))
    p.on("frameout", lambda f, t: raw.append(f))
    p.play()
    t = 0.0
    while not got and t < 1.0:
        t += 1 / 30.0
        p.tick(t)
    rgb = got[0]
    assert rgb.shape == (48, 64, 3) and rgb.dtype == np.uint8
    # pixel-exact against the float64 reference math on the same planes
    from jsvx.tools.refmath import ycbcr_to_rgb

    planes = [np.asarray(pl) for pl in raw[0].planes]
    want = ycbcr_to_rgb(planes[0], planes[1], planes[2])[:48, :64]
    diff = np.abs(rgb.astype(int) - want.astype(int))
    assert diff.max() <= 1                 # float32-vs-float64 rounding
    assert (diff == 0).mean() > 0.99
    assert np.array_equal(rgb[20, 30], want[20, 30])


def test_player_emit_rgb_yuva():
    """YUVA streams deliver (H, W, 4) with the DECODED alpha plane."""
    from conftest import synthetic_frames_yuva

    clip = synthetic_frames_yuva(4, 48, 64, seed=8)
    data = JsvEncoder(64, 48, EncoderConfig(
        gop_size=4, quantizer_scale=4)).encode(clip)
    p = Player(PlayerConfig(emit_rgb=True), backend="jax")
    p.src = data
    got, raw = [], []
    p.set_frame_sink(lambda rgb, t: got.append(np.asarray(rgb)))
    p.on("frameout", lambda f, t: raw.append(f))
    p.play()
    t = 0.0
    while not got and t < 1.0:
        t += 1 / 30.0
        p.tick(t)
    rgba = got[0]
    assert rgba.shape == (48, 64, 4) and rgba.dtype == np.uint8
    alpha = np.asarray(raw[0].planes[3])[:48, :64]
    assert np.array_equal(rgba[..., 3], alpha)


def test_request_alignment_tiles_chunks(stream):
    """Non-streaming transports align the start DOWN and the end UP to
    chunk boundaries so successive requests tile exactly
    (easybits.player.js:1895)."""
    data, _ = stream

    from jsvx.runtime.source import ByteSource

    class FakeSource(ByteSource):
        streaming = False

        def __init__(self):
            self.requests = []

        def total_length(self):
            return len(data)

        def request(self, s, e, on_data, on_error=None, on_complete=None,
                    chunk_size=300000):
            self.requests.append((s, e))
            # deliver open-ended requests only partially (with the total)
            # so the planner issues BOUNDED follow-up windows
            stop = (e + 1) if e is not None else min(s + 150, len(data))
            on_data(s, data[s:stop], len(data))
            if on_complete:
                on_complete()
            return object()

        def cancel(self, h):
            pass

    p = Player(PlayerConfig(chunk_size=100), backend="oracle")
    src = FakeSource()
    p._sources = [type("V", (), {"src": src, "bitrate": 0})()]
    p.load()
    assert src.requests, "player issued no range requests"
    windowed = [(s, e) for s, e in src.requests if e is not None]
    for s, e in src.requests:
        assert s % 100 == 0
        if e is not None and e != len(data) - 1:
            assert (e + 1) % 100 == 0
    assert windowed, "no windowed request exercised the end-ceiling"


# ---------------------------------------------------------------------------
# preload semantics (easybits.player.js:692-694,884-896)


from jsvx.runtime.source import ByteSource as _ByteSource


class _ManualSource(_ByteSource):
    """ByteSource that records requests and delivers only on demand."""

    def __init__(self, data):
        self.data = bytes(data)
        self.requests = []
        self._sink = None

    def total_length(self):
        return len(self.data)

    def request(self, s, e, on_data, on_error=None, on_complete=None,
                chunk_size=300000):
        self.requests.append((s, e))
        self._sink = (on_data, on_complete)
        return object()

    def cancel(self, h):
        pass

    def deliver(self, start, stop):
        on_data, _ = self._sink
        on_data(start, self.data[start:stop], len(self.data))


def test_preload_none_defers_network(stream):
    data, clip = stream
    src = _ManualSource(data)
    p = Player(PlayerConfig(preload="none"), backend="oracle")
    suspends = []
    p.on("suspend", lambda: suspends.append(1))
    p.src = src
    assert src.requests == [], "preload=none must not touch the network"
    assert suspends
    from jsvx.api.player import NetworkState

    assert p.network_state == NetworkState.NETWORK_IDLE
    # play() lifts the gate and starts loading
    p.play()
    assert src.requests, "play() must start loading"
    # drive full delivery and playback to the end
    s, e = src.requests[-1]
    src.deliver(s, len(data))
    shown = []
    p.set_frame_sink(lambda f, t: shown.append(t))
    t = 0.0
    for _ in range(3 * len(clip)):
        t += 1 / 30.0
        p.tick(t)
        if p.ended:
            break
    assert len(shown) == len(clip)


def test_preload_gate_reapplies_per_source(stream):
    """The preload hint gates EACH resource load: play() releasing the
    gate on src A must not let a later src B start fetching on
    assignment (ADVICE r4; easybits.player.js:692-697 gates every
    load on the preload mode)."""
    data, _ = stream
    a, b = _ManualSource(data), _ManualSource(data)
    p = Player(PlayerConfig(preload="none"), backend="oracle")
    p.src = a
    p.play()
    assert a.requests, "play() lifts the gate for the current src"
    p.pause()
    p.src = b
    assert b.requests == [], \
        "a new src must re-apply the preload=none gate"
    p.play()
    assert b.requests


def test_preload_none_explicit_load_fetches(stream):
    data, _ = stream
    src = _ManualSource(data)
    p = Player(PlayerConfig(preload="none"), backend="oracle")
    p.src = src
    assert src.requests == []
    p.load()                               # explicit load overrides hint
    assert src.requests


def test_preload_metadata_stops_after_header(stream):
    data, _ = stream
    p = Player(PlayerConfig(preload="metadata", chunk_size=300),
               backend="oracle")
    suspends = []
    p.on("suspend", lambda: suspends.append(1))
    p.src = data                           # sync MemorySource
    # metadata is in...
    assert p.decoder.meta is not None
    assert p.video_width == 64 and p.duration > 0
    # ...but the stream was not fully buffered
    buffered = p.decoder.buffer.buffered_from(0)
    assert buffered < len(data) // 2, \
        f"preload=metadata buffered {buffered}/{len(data)} bytes"
    assert suspends
    from jsvx.api.player import NetworkState

    assert p.network_state == NetworkState.NETWORK_IDLE
    # play() resumes loading and playback completes
    p.play()
    shown = []
    p.set_frame_sink(lambda f, t: shown.append(t))
    t = 0.0
    for _ in range(60):
        t += 1 / 30.0
        p.tick(t)
        if p.ended:
            break
    assert p.ended and len(shown) == 12


# ---------------------------------------------------------------------------
# buffer_min_sec stall-recovery gating (easybits.player.js:406-407,1079)


def test_buffer_min_sec_gates_stall_recovery():
    clip = synthetic_frames(8, 48, 64, seed=6)
    data = JsvEncoder(64, 48, EncoderConfig(
        gop_size=1, quantizer_scale=4)).encode(clip)
    src = _ManualSource(data)
    # 0.1 s at 30 fps = 3 decoded frames of forward buffer before resume.
    # jax backend: its GOP-batch path decodes per fully-buffered GOP, so
    # delivery at GOP granularity yields exactly one frame per GOP here
    p = Player(PlayerConfig(buffer_min_sec=0.1, buffer_sec=1.0),
               backend="jax")
    p.src = src
    shown = []
    p.set_frame_sink(lambda f, t: shown.append(t))
    waits, unstalls = [], []
    p.on("waiting", lambda: waits.append(1))
    p.on("unstalled", lambda: unstalls.append(1))
    p.play()
    t = [0.0]

    def tick():
        t[0] += 1 / 30.0
        p.tick(t[0])

    tick()
    assert waits and not shown              # starved: underrun recorded
    # GOP byte offsets via a throwaway decode pass; +4 so the next GOP's
    # start code is visible (bounds the final picture of each GOP)
    dec = Decoder(PlayerConfig(), backend="oracle")
    dec.feed(0, data, len(data))
    offs = list(dec.meta.key_map.offsets) + [len(data)]
    src.deliver(0, offs[1] + 4)
    assert len(p._frames) == 1
    tick()
    assert not shown, "resume below buffer_min_sec of forward buffer"
    src.deliver(offs[1], offs[2] + 4)
    tick()
    assert not shown, "2 frames = 66ms < buffer_min_sec=100ms"
    src.deliver(offs[2], offs[3] + 4)
    assert len(p._frames) >= 3
    tick()
    assert shown and unstalls, "3 frames = 100ms >= buffer_min_sec"
    # playback continues normally afterwards
    src.deliver(offs[3], len(data))
    for _ in range(30):
        tick()
        if p.ended:
            break
    assert len(shown) == len(clip)


# ---------------------------------------------------------------------------
# WallClockAudio duration hardening (VERDICT r3 item 7)


def _tiny_wav(n_sec: float, byte_rate: int = 8000) -> bytes:
    n = int(n_sec * byte_rate)
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (8000).to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (8).to_bytes(2, "little"))
    dat = b"data" + n.to_bytes(4, "little") + bytes(n)
    body = b"WAVE" + fmt + dat
    return b"RIFF" + (4 + len(body) - 8 + 8).to_bytes(4, "little") + body


def test_wallclock_audio_wav_duration():
    from jsvx.api.player import WallClockAudio

    wav = _tiny_wav(2.5, byte_rate=8000)
    # declared byte rate is WRONG on purpose: the WAV header must win
    clock = WallClockAudio(wav, bytes_per_sec=32000)
    assert abs(clock.duration - 2.5) < 1e-6


def test_wallclock_audio_explicit_duration():
    from jsvx.api.player import WallClockAudio

    clock = WallClockAudio(b"\x00" * 64000, bytes_per_sec=32000,
                           duration=7.25)
    assert clock.duration == 7.25


def test_wallclock_audio_raw_fallback():
    from jsvx.api.player import WallClockAudio

    clock = WallClockAudio(b"\x00" * 64000, bytes_per_sec=32000)
    assert abs(clock.duration - 2.0) < 1e-6


def test_wav_clock_keeps_av_sync():
    """A/V sync must hold with a WAV-derived clock: virtual time drives
    both clocks; drift stays inside av_sync_limit_ms."""
    from jsvx.api.player import WallClockAudio

    clip = synthetic_frames(12, 48, 64, seed=5)
    data = JsvEncoder(64, 48, EncoderConfig(
        gop_size=4, quantizer_scale=4)).encode(clip)
    vt = [0.0]
    clock = WallClockAudio(_tiny_wav(10.0), bytes_per_sec=999,
                           time_fn=lambda: vt[0])
    p = Player(PlayerConfig(), backend="oracle", audio_clock=clock)
    p.src = data
    p.play()
    assert clock.playing
    drift = []
    p.on("avsync", lambda d: drift.append(d))
    while not p.ended and vt[0] < 2.0:
        vt[0] += 1 / 30.0
        p.tick(vt[0])
    assert p.ended
    assert not drift, f"A/V drift exceeded the sync limit: {drift}"


# ---------------------------------------------------------------------------
# multi-source "use" flag (easybits.player.js:1208-1230)


def test_multi_source_use_flag(stream):
    data, _ = stream
    p = Player(PlayerConfig(), backend="oracle")
    p.src = [{"src": data, "b": 800},
             {"src": data + b"x", "b": 400, "use": 1}]
    # the use-flagged source starts, not the highest bitrate
    assert p._sources[p._source_index].bitrate == 400
    assert p._sources[p._source_index].use


def test_multi_source_default_highest_bitrate(stream):
    data, _ = stream
    p = Player(PlayerConfig(), backend="oracle")
    p.src = [{"src": data, "b": 400}, {"src": data, "b": 800}]
    assert p._sources[p._source_index].bitrate == 800


def test_seek_releases_preload_gate(stream):
    """Seeking implies loading: a preload=metadata player that seeks
    must resume fetching and play from the target."""
    data, _ = stream
    p = Player(PlayerConfig(preload="metadata", chunk_size=300),
               backend="oracle")
    p.src = data
    buffered_before = p.decoder.buffer.buffered_from(0)
    assert buffered_before < len(data)
    p.current_time = 0.25                  # seek while gated
    shown = []
    p.set_frame_sink(lambda f, t: shown.append(t))
    p.play()
    t = 0.0
    for _ in range(40):
        t += 1 / 30.0
        p.tick(t)
        if p.ended:
            break
    assert shown, "seek must have released the preload gate"
    # lands on a GOP boundary within the 150 ms seek precision
    assert shown[0] >= 0.25 - 0.151


def test_wav_duration_malformed_falls_back():
    from jsvx.api.player import WallClockAudio, _wav_duration

    # truncated / wrong magic / missing data chunk -> not parsed as WAV
    assert _wav_duration(b"RIFF") is None
    assert _wav_duration(b"RIFX" + b"\x00" * 60) is None
    no_data = (b"RIFF" + (36).to_bytes(4, "little") + b"WAVE"
               + b"fmt " + (16).to_bytes(4, "little") + bytes(16))
    assert _wav_duration(no_data + bytes(8)) is None
    clock = WallClockAudio(b"\x00" * 32000, bytes_per_sec=16000)
    assert abs(clock.duration - 2.0) < 1e-6    # byte-rate fallback


def test_wav_duration_odd_chunk_alignment():
    """Chunks are word-aligned; an odd-sized extra chunk before fmt/data
    must not desync the walk."""
    from jsvx.api.player import _wav_duration

    byte_rate = 4000
    odd = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"  # pad
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (4000).to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (8).to_bytes(2, "little"))
    dat = b"data" + (8000).to_bytes(4, "little") + bytes(8000)
    body = b"WAVE" + odd + fmt + dat
    wav = b"RIFF" + (len(body)).to_bytes(4, "little") + body
    assert abs(_wav_duration(wav) - 2.0) < 1e-6


def test_wav_duration_truncated_payload_clamped():
    """A data chunk whose declared size exceeds the bytes actually
    present must clamp to the real payload, not overstate the audio
    duration and skew the A/V clock (ADVICE r4)."""
    from jsvx.api.player import _wav_duration

    byte_rate = 4000
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (4000).to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (8).to_bytes(2, "little"))
    # declares 8000 bytes (2.0 s) but ships only 2000 (0.5 s)
    dat = b"data" + (8000).to_bytes(4, "little") + bytes(2000)
    body = b"WAVE" + fmt + dat
    wav = b"RIFF" + (len(body)).to_bytes(4, "little") + body
    assert abs(_wav_duration(wav) - 0.5) < 1e-6
