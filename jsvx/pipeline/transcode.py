"""End-to-end batch decode: parallel parse -> device GOP scan -> sink.

The production-serving shape of the framework: a complete (or assigned
slice of a) stream is parsed with picture-level thread parallelism,
decoded GOP-by-GOP on the device with the fused kernels, and delivered to
a sink, with GOP-granular checkpoint/resume via
:class:`jsvx.runtime.multihost.GopManifest` and stage metrics from
:mod:`jsvx.runtime.profiler`.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..kernels.decode import frame_to_device, make_constants, mv_bucket
from ..runtime.multihost import GopManifest
from ..runtime.profiler import Metrics
from .gop import decode_gop_scan, zero_refs
from .parallel_parse import parse_stream_parallel


@dataclass
class TranscodeResult:
    n_frames: int
    n_gops: int
    metrics: Metrics
    width: int
    height: int


def transcode(data: bytes, sink=None, *, impl: str | None = None,
              manifest: GopManifest | None = None,
              process_id: int = 0, process_count: int = 1,
              n_parse_threads: int | None = None,
              quirk_oddify_zeros: bool = False,
              metrics: Metrics | None = None) -> TranscodeResult:
    """Decode every (assigned, pending) GOP of ``data``.

    ``sink(gop_index, frames)`` receives each GOP's decoded (Y, Cb, Cr)
    stacks (device arrays).  With a ``manifest``, completed GOPs are
    journaled and skipped on resume; with ``process_count > 1`` only this
    process's round-robin share is decoded (multi-host operation).
    """
    import jax

    metrics = metrics or Metrics()
    if impl is None:
        impl = "xla" if jax.devices()[0].platform == "cpu" else "pallas"

    with metrics.timers.stage("parse"):
        parsed = parse_stream_parallel(data, n_threads=n_parse_threads)
    seq = parsed.seq
    consts = make_constants(seq)

    # group frames into GOPs by the recorded boundaries
    bounds = parsed.gop_starts or [0]
    if bounds[0] != 0:
        bounds = [0] + bounds
    groups = [parsed.frames[bounds[i]:
                            (bounds[i + 1] if i + 1 < len(bounds)
                             else len(parsed.frames))]
              for i in range(len(bounds))]
    groups = [g for g in groups if g]

    if manifest is None:
        todo = list(range(len(groups)))
    else:
        todo = [s.index for s in manifest.pending(process_id, process_count)
                if s.index < len(groups)]

    # one distinct-MV capacity bucket for the whole stream: stable
    # shapes -> one compiled executable for every GOP
    cap = 1
    for ft in parsed.frames:
        cap = max(cap, len(np.unique(ft.mb_mv.reshape(-1, 2), axis=0)) + 1)
    cap = mv_bucket(cap)

    n_frames = 0
    for gi in todo:
        group = groups[gi]
        with metrics.timers.stage("pack"):
            stacked = jax.tree.map(
                lambda *xs: np.stack(xs),
                *[frame_to_device(ft, mv_capacity=cap) for ft in group])
        with metrics.timers.stage("device_decode"):
            refs = zero_refs(seq.coded_height, seq.coded_width,
                             n_comps=parsed.meta.n_components)
            outs, _ = decode_gop_scan(
                stacked, refs, consts, quirk_oddify_zeros,
                mc_impl="mvset" if cap else "gather", impl=impl)
            jax.block_until_ready(outs)
        if sink is not None:
            with metrics.timers.stage("sink"):
                sink(gi, outs)
        n_frames += len(group)
        metrics.count("frames", len(group))
        metrics.count("gops")
        if manifest is not None:
            manifest.mark_done(gi, frames=len(group))

    metrics.gauge("width", parsed.meta.width)
    metrics.gauge("height", parsed.meta.height)
    return TranscodeResult(n_frames=n_frames, n_gops=len(todo),
                           metrics=metrics, width=parsed.meta.width,
                           height=parsed.meta.height)
