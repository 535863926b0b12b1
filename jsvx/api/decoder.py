"""Streaming Decoder: the public decode API over a sparse byte buffer.

The framework equivalent of the reference's ``jsv_dec`` object
(``decoders/jsv.js:20-50,426-465,1618-1648``): it owns the stream buffer,
parses the container header and GOP key map when enough bytes arrive,
pulls one picture per ``decode_frame()`` against availability gates
(emitting ``stalled`` with the missing byte offset for the streaming layer
to refill), reconstructs on the configured backend (JAX device kernels or
the float64 oracle), and seeks via the key map to <= 150 ms precision.

Events: ``meta``(ContainerMeta), ``seq``(dict), ``frame``(DecodedFrame),
``ended``, ``seeked``(target_ms, actual_ms), ``stalled``(byte).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..bitstream.bitio import BitReader, BitStallError
from ..bitstream.container import (ContainerMeta, StartCodeIndex,
                                   find_start_codes, parse_container_header)
from ..bitstream.parser import FrameTensors, StreamParser
from ..bitstream.ranges import RangeBuffer
from ..coding import tables as T
from .config import PlayerConfig
from .events import EventDispatcher


@dataclass
class DecodedFrame:
    planes: tuple                 # (Y, Cb, Cr) uint8 arrays (device or host)
    picture_type: int
    ts_ms: float                  # GOP timecode resync (0 = none)

    @property
    def is_intra(self) -> bool:
        return self.picture_type == T.PICTURE_TYPE_I


class Decoder(EventDispatcher):
    def __init__(self, config: PlayerConfig | None = None,
                 backend: str = "jax"):
        super().__init__()
        self.config = config or PlayerConfig()
        self.backend = backend
        self.buffer = RangeBuffer()
        self.buffer.on("stalled", lambda pos: self.emit("stalled", pos))
        self.parser = StreamParser(use_native=self.config.use_native_parser)
        self.meta: ContainerMeta | None = None
        self.current_time_ms = 0.0
        self._skip_till_gop = False
        self._ended = False
        self._refs = None
        self._consts = None
        self._index_cache: tuple[int, int, StartCodeIndex] | None = None
        self._decode_backend = None
        self._pending: list[DecodedFrame] = []   # GOP-batch output queue

    # ------------------------------------------------------------------
    # Ingest

    def feed(self, start: int, data: bytes, total: int | None = None) -> None:
        """Add downloaded bytes; parses metadata once the header is in."""
        self.buffer.add(start, data, total)
        if self.meta is None:
            self._try_init_meta()

    def _try_init_meta(self) -> None:
        view = self.buffer.contiguous_view(0)
        if view is None:
            return
        data, base = view
        try:
            r = BitReader(data.tobytes(), base=base)
            meta = parse_container_header(r)
        except BitStallError:
            return                        # not enough header bytes yet
        self.meta = meta
        self.parser.yuva = meta.yuva       # 4th component (jsv.js:256-259)
        self.buffer.read_pos = meta.header_bytes
        self.emit("meta", meta)

    # ------------------------------------------------------------------
    # Helpers

    def _view_and_index(self):
        view = self.buffer.contiguous_view(self.buffer.read_pos)
        if view is None:
            self.emit("stalled", self.buffer.read_pos)
            return None
        data, base = view
        key = (base, len(data))
        if self._index_cache is None or self._index_cache[:2] != key:
            idx = StartCodeIndex(find_start_codes(data, base))
            self._index_cache = (base, len(data), idx)
        return data, base, self._index_cache[2]

    def _known_end(self, base: int, data_len: int) -> int | None:
        """Absolute end-of-stream byte when this view reaches it."""
        total = self.buffer.total_length
        if total and base + data_len >= total:
            return total
        if self.buffer.fully_loaded:
            return base + data_len
        return None

    @property
    def sequence(self):
        return self.parser.seq

    # ------------------------------------------------------------------
    # Decode

    def decode_frame(self) -> DecodedFrame | None:
        """Decode the next picture; None on stall or end (check
        ``ended``).  Mirrors the reference decode loop (jsv.js:426-465).

        With ``config.use_gop_scan`` and a key map, a fully-buffered GOP
        is decoded as ONE batched device scan (per-frame dispatch and
        transfer amortize across the GOP); frames stream out of an
        internal queue.  Falls back to picture-at-a-time whenever the
        next GOP is not fully buffered yet.
        """
        if self._pending:
            frame = self._pending.pop(0)
            self.emit("frame", frame)
            return frame
        if self.meta is None:
            self.emit("stalled", 0)
            return None
        if self.config.use_gop_scan and self.backend == "jax":
            span = self._buffered_gop_span()
            if span is not None:
                got = self._decode_gop_batch(span)
                if got is not None:
                    return got
        while True:
            total = self.buffer.total_length
            if ((total and self.buffer.read_pos >= total)
                    or (self.buffer.fully_loaded
                        and self.buffer.buffered_from(
                            self.buffer.read_pos) == 0)):
                self._ended = True
                self.emit("ended")
                return None
            vi = self._view_and_index()
            if vi is None:
                return None
            data, base, index = vi
            pos = self.buffer.read_pos
            nxt = index.next_code(pos)
            if nxt is None:
                end = self._known_end(base, len(data))
                if end is not None:
                    self._ended = True
                    self.emit("ended")
                else:
                    self.emit("stalled", base + len(data))
                return None
            off, code = nxt
            r = BitReader(data.tobytes(), base=base,
                          pos_bits=(off + 4) << 3)
            try:
                if code == T.START_SEQUENCE:
                    if not self.buffer.has(18, off):   # header size gate
                        return None
                    seq = self.parser.parse_sequence_header(r)
                    if self._skip_till_gop:
                        self._skip_till_gop = False
                    self._on_sequence(seq)
                    self.buffer.advance_to(r.byte_pos)
                elif self._skip_till_gop:
                    self.buffer.advance_to(off + 4)
                elif code == T.START_GOP:
                    if not self.buffer.has(8, off):
                        return None
                    t = self.parser.parse_gop_header(r)
                    self.current_time_ms = t
                    self.buffer.advance_to(r.byte_pos)
                elif code == T.START_PICTURE:
                    gate = (self.parser.seq.vbv_buffer_bytes
                            if self.parser.seq else 300000)
                    if not self.buffer.has(gate, off):
                        return None
                    eos = self._known_end(base, len(data))
                    ft = self.parser.parse_picture(r, index, eos)
                    self.buffer.advance_to(r.byte_pos)
                    if ft is None:
                        continue           # skipped picture type
                    frame = self._reconstruct(ft)
                    self.emit("frame", frame)
                    return frame
                else:
                    self.buffer.advance_to(off + 4)
            except BitStallError as e:
                self.emit("stalled", e.needed_byte)
                return None

    # ------------------------------------------------------------------
    # GOP-batched decode (device scan over a fully-buffered GOP)

    def _buffered_gop_span(self) -> tuple | None:
        """Byte span [start, end) of the key-map GOP containing read_pos
        iff every byte of it is buffered; None otherwise."""
        if self._skip_till_gop or self.meta is None:
            return None
        km = self.meta.key_map
        if km is None or km.count == 0:
            return None
        pos = self.buffer.read_pos
        offs = km.offsets
        i = int(np.searchsorted(offs, pos, side="right")) - 1
        if i < 0:
            return None
        if i + 1 < km.count:
            end = int(offs[i + 1])
            # +4: the next GOP's start code must be visible so the native
            # parser can bound this GOP's final picture
            need = end - pos + 4
        else:
            total = self.buffer.total_length
            if not total:
                return None
            end = total
            need = end - pos
        if end <= pos:
            return None
        if self.buffer.buffered_from(pos) < need:
            return None
        return (pos, end)

    def _decode_gop_batch(self, span) -> DecodedFrame | None:
        """Parse every picture in the buffered span and reconstruct them
        with ONE ``decode_gop_scan`` (dispatch + transfer amortize over
        the GOP); the first frame returns, the rest queue in
        ``_pending``.  Any surprise stall falls back to the
        picture-at-a-time loop."""
        start, end = span
        fts = []
        while True:
            pos = self.buffer.read_pos
            if pos >= end:
                break
            vi = self._view_and_index()
            if vi is None:
                break
            data, base, index = vi
            nxt = index.next_code(pos)
            if nxt is None or nxt[0] >= end:
                self.buffer.advance_to(min(end, base + len(data)))
                break
            off, code = nxt
            r = BitReader(data.tobytes(), base=base,
                          pos_bits=(off + 4) << 3)
            try:
                if code == T.START_SEQUENCE:
                    self._on_sequence(self.parser.parse_sequence_header(r))
                    self.buffer.advance_to(r.byte_pos)
                elif code == T.START_GOP:
                    self.current_time_ms = self.parser.parse_gop_header(r)
                    self.buffer.advance_to(r.byte_pos)
                elif code == T.START_PICTURE:
                    ft = self.parser.parse_picture(
                        r, index, self._known_end(base, len(data)) or end)
                    self.buffer.advance_to(min(r.byte_pos, end))
                    if ft is not None:
                        fts.append(ft)
                else:
                    self.buffer.advance_to(off + 4)
            except BitStallError as e:
                self.emit("stalled", e.needed_byte)
                break
        if not fts:
            return None

        from ..kernels.decode import (frame_to_device, make_constants,
                                      mv_capacity_for)
        from ..pipeline.gop import (decode_gop_scan, default_impl,
                                    stack_device_frames, zero_refs)

        seq = self.parser.seq
        if self._consts is None:
            self._consts = make_constants(seq)
        if self._refs is None:
            self._refs = zero_refs(seq.coded_height, seq.coded_width,
                                   n_comps=fts[0].n_comps)
        n_mv = max(len(np.unique(ft.mb_mv.reshape(-1, 2), axis=0)) + 1
                   for ft in fts)
        cap, self._mv_cap = mv_capacity_for(
            n_mv, getattr(self, "_mv_cap", 0) or 0)
        stacked = stack_device_frames(
            [frame_to_device(ft, mv_capacity=cap) for ft in fts])
        outs, refs = decode_gop_scan(
            stacked, self._refs, self._consts,
            self.config.quirk_oddify_zeros,
            mc_impl="mvset" if cap else "gather", impl=default_impl())
        self._refs = refs
        frames = [DecodedFrame(planes=tuple(p[i] for p in outs),
                               picture_type=fts[i].picture_type,
                               ts_ms=fts[i].gop_time_ms)
                  for i in range(len(fts))]
        self._pending = frames[1:]
        first = frames[0]
        self.emit("frame", first)
        return first

    @property
    def ended(self) -> bool:
        return self._ended

    def iter_frames(self):
        """Yield frames until end of stream (data must be fed; stops at a
        stall — check ``ended`` to distinguish starvation from EOS)."""
        while True:
            frame = self.decode_frame()
            if frame is None:
                return
            yield frame

    def _on_sequence(self, seq) -> None:
        if self.meta and seq.bit_rate:
            self.buffer.bytes_backward_limit = int(
                seq.bit_rate * self.config.seconds_played_limit) >> 3
        self.emit("seq", {"r": seq.picture_rate, "w": seq.width,
                          "h": seq.height})

    # ------------------------------------------------------------------
    # Reconstruction backends

    def _reconstruct(self, ft: FrameTensors) -> DecodedFrame:
        ts = ft.gop_time_ms
        if self.backend == "oracle":
            from ..tools.oracle import reconstruct_frame

            planes = reconstruct_frame(ft, self.parser.seq, self._refs,
                                       self.config.quirk_oddify_zeros)
            self._refs = planes
        else:
            import jax

            from ..kernels.decode import (decode_frame_jit, frame_to_device,
                                          make_constants, mv_capacity_for)

            seq = self.parser.seq
            if self._consts is None:
                self._consts = make_constants(seq)
            if self._refs is None:
                from ..pipeline.gop import zero_refs

                self._refs = zero_refs(seq.coded_height, seq.coded_width,
                                       n_comps=ft.n_comps)
            n_mv = len(np.unique(ft.mb_mv.reshape(-1, 2), axis=0)) + 1
            # sticky capacity: grow-only bucket avoids a recompile per
            # frame when distinct-MV counts fluctuate; cap 0 = this
            # frame overflows every bucket -> exact gather MC
            cap, self._mv_cap = mv_capacity_for(
                n_mv, getattr(self, "_mv_cap", 0) or 0)
            if self._decode_backend is None:
                self._decode_backend = (
                    "fused" if jax.devices()[0].platform != "cpu"
                    else "xla")
            if self._decode_backend == "fused" and cap:
                from ..kernels.pallas_fused import decode_frame_fused_jit

                planes = decode_frame_fused_jit(
                    frame_to_device(ft, mv_capacity=cap), self._refs,
                    self._consts, self.config.quirk_oddify_zeros)
            else:
                planes = decode_frame_jit(
                    frame_to_device(ft, mv_capacity=cap), self._refs,
                    self._consts, self.config.quirk_oddify_zeros,
                    mc_impl="mvset" if cap else "gather")
            self._refs = planes
        return DecodedFrame(planes=planes, picture_type=ft.picture_type,
                            ts_ms=ts)

    # ------------------------------------------------------------------
    # Seeking (jsv.js:1618-1648)

    def seek(self, target_ms: float) -> bool:
        """Key-map (or linear-estimate) seek to <= 150 ms precision.
        Returns False when more data must be fetched first (a ``stalled``
        event carries the byte to fetch)."""
        meta = self.meta
        if meta is None:
            return False
        if meta.key_map is not None and meta.key_map.count > 0:
            rate = (self.parser.seq.picture_rate
                    if self.parser.seq is not None else 30.0)
            byte = meta.key_map.byte_for_time(
                target_ms / 1000.0, meta.duration, rate)
        else:
            total = self.buffer.total_length or 1
            byte = int(round(total * (target_ms / 1000.0)
                             / max(meta.duration, 1e-9)))
        if not self.buffer.seek(byte):
            return False

        while True:
            if not self._seek_find_and_parse(T.START_SEQUENCE):
                return False
            if not self._seek_find_and_parse(T.START_GOP):
                return False
            if (target_ms - self.parser.current_time_ms
                    <= self.config.seek_precision_ms):
                break
        self.current_time_ms = self.parser.current_time_ms
        self._refs = None                 # next picture is an I frame
        self._ended = False
        self._pending.clear()             # drop batched frames pre-seek
        self.emit("seeked", target_ms, self.current_time_ms)
        return True

    def _seek_find_and_parse(self, want_code: int) -> bool:
        vi = self._view_and_index()
        if vi is None:
            return False
        data, base, index = vi
        nxt = index.next_code(self.buffer.read_pos, codes={want_code})
        if nxt is None:
            self.emit("stalled", base + len(data))
            return False
        off, _ = nxt
        r = BitReader(data.tobytes(), base=base, pos_bits=(off + 4) << 3)
        try:
            if want_code == T.START_SEQUENCE:
                self.parser.parse_sequence_header(r)
                self._on_sequence(self.parser.seq)
            else:
                self.parser.parse_gop_header(r)
        except BitStallError as e:
            self.emit("stalled", e.needed_byte)
            return False
        self.buffer.advance_to(r.byte_pos)
        return True
