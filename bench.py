"""jsvx benchmark: 1080p-equivalent decode throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "frames/s", "vs_baseline": N}

Baseline: the reference WebGL player publishes no numbers; its implied
throughput is real-time playback (30 fps at 1080p).  The driver target is
>= 10x that on one v5e chip, so ``vs_baseline`` is fps / 300 — 1.0 means
the 10x north-star is met (BASELINE.md).

The measured step is the full device decode over a stacked GOP via
lax.scan (integer dequant + 8x8 IDCT + half-pel MC + clamp) using the
fused Pallas kernels on TPU (XLA path on CPU).  Since round 5 the GOP is
REAL CONTENT: the 1080p bench fixture's first GOP, parsed by the native
C++ parser into device tensors (VERDICT r4 #3) — the same coefficient
density and motion statistics the end-to-end path decodes, resident on
device.

Measurement methodology (rebuilt in round 3 after the round-2 artifact
was invalidated by noise): the timed program is ONE jitted
``lax.fori_loop`` of K GOP scans where every iteration's input is
perturbed by the previous iteration's output checksum — a hard data
dependency, so no iteration can be elided, reordered, or served from a
result cache — and K is auto-calibrated so the loop runs >= ~1.2 s of
device work, making the host round-trip (measured, reported, never
subtracted) a <10% perturbation.  The run is marked
``measurement_invalid`` if elapsed < 10x round_trip or < 0.5 s.  The VLC
host parse is benchmarked separately (python -m jsvx.tools.bench_parse).

Scheduling (round 5, VERDICT r4 #1): the end-to-end measurement runs in
a FRESH subprocess spawned at t~0, so its ~500 s cold wire-program
compile overlaps the parent's ~500 s chained-program compile instead of
serialising after it (compiles go through a remote service; measured:
concurrent parent+child device claims work on this runtime).  The child
compiles, then WAITS for the parent's go-file (written once the
parent's device-heavy stages are done) before its timed trials, so the
two processes never time against each other's device traffic; the
parent runs the (CPU-subprocess) scaling stage while the child times.
On timeout the child's last stage lines are reported, not a bare skip.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_T0 = time.monotonic()


def _stage(msg: str) -> None:
    """Stage progress to stderr (stdout stays the one JSON line)."""
    print(f"[bench +{time.monotonic() - _T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


def build_gop(mb_h: int, mb_w: int, n_frames: int, seed: int = 0):
    """Synthetic GOP (CPU/CI path; the TPU metric uses the real fixture)."""
    import jax

    from __graft_entry__ import _synthetic_frame_inputs

    frames = [_synthetic_frame_inputs(mb_h, mb_w, is_p=(i > 0),
                                      seed=seed + i, max_mv=24)
              for i in range(n_frames)]
    return jax.tree.map(lambda *xs: np.stack(xs), *frames)


def _zoom_clip(h: int, w: int, n: int, seed: int = 3) -> list:
    """Zooming + half-pel-translating band-limited pattern.

    A zoom makes the motion field vary across the frame (many distinct
    MVs — forces the big-K mvset regime) and a 1.5 px/frame pan lands on
    half-pel positions, so the 4-tap interpolation path is inside the
    end-to-end number (VERDICT r2 #3; half-pel cases:
    reference decoders/shaders/mpeg1video.js INTER_1).
    """
    rng = np.random.default_rng(seed)
    cy, cx = h / 2, w / 2
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    # rich 1/f texture: low components steer the motion search, high
    # components lose energy under half-pel interpolation (real residual
    # load), per-frame sensor noise keeps the coefficient planes dense
    n_comp = 40
    freq = rng.uniform(0.02, 1.4, (n_comp, 2))
    ph = rng.uniform(0, 2 * np.pi, n_comp)
    mag = np.linalg.norm(freq, axis=1)
    amp = 9.0 / np.sqrt(mag / mag.min())

    def tex(u, v):
        out = np.full(u.shape, 120.0)
        for (kyy, kxx), p, a in zip(freq, ph, amp):
            out += a * np.sin(kyy * u + kxx * v + p)
        return out

    zoom_rate = 3.0 / (w / 2)            # ~3 px at the side midpoints
    frames = []
    for t in range(n):
        s = 1.0 / (1.0 + zoom_rate * t)  # sample source = inverse zoom
        u = (yy - cy) * s + cy + 1.5 * t
        v = (xx - cx) * s + cx + 1.5 * t
        y = np.clip(tex(u, v) + rng.normal(0, 4, u.shape), 0, 255)
        cb = np.clip(128 + 24 * np.sin(0.05 * v[::2, ::2])
                     + rng.normal(0, 2, (h // 2, w // 2)), 0, 255)
        cr = np.clip(128 + 24 * np.cos(0.05 * u[::2, ::2])
                     + rng.normal(0, 2, (h // 2, w // 2)), 0, 255)
        frames.append(tuple(p.astype(np.uint8) for p in (y, cb, cr)))
    return frames


def _motion_stats(data: bytes) -> dict:
    """Per-frame distinct-MV count and half-pel MB fraction of the bench
    stream, so the payload proves the hard MC regimes are inside the
    end-to-end number (VERDICT r2 #3)."""
    from jsvx.pipeline.packed_parse import (BufferPool, parse_gop_packed,
                                            walk_stream)

    arr = np.frombuffer(data, np.uint8)
    meta, seq, groups = walk_stream(data)
    pool = BufferPool()
    ks, half = [], []
    for gi, group in enumerate(groups):
        g = parse_gop_packed(arr, group, seq, meta, 0, pool=pool)
        for ft in g.fts:
            mv = ft.mb_mv.reshape(-1, 2)
            ks.append(int(len(np.unique(mv, axis=0))))
            if not ft.is_intra_picture:
                moving = (mv != 0).any(axis=1)
                if moving.any():
                    half.append(float(((mv[moving] & 1).any(axis=1))
                                      .mean()))
        for buf in g.pooled:
            pool.release(buf)
    return {
        "distinct_mvs_per_frame": ks,
        "half_pel_mb_fraction": round(float(np.mean(half)), 3) if half
        else 0.0,
    }


def _fixture_path() -> str:
    """Bench fixture path, versioned by the encoder source + clip params
    so a stale tmp file from an older encoder can never silently change
    the measured workload (VERDICT r3 weak #6)."""
    import hashlib
    import tempfile

    import jsvx.tools.encoder as enc_mod

    tag = hashlib.sha256(
        open(enc_mod.__file__, "rb").read()
        + b"|1088x1920x8|gop4|q6|me8|halfpel|zoomclip-v1"
    ).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(),
                        f"jsvx_bench_1080p_{tag}.jsv")


def ensure_fixture() -> str:
    """Create the 1080p bench fixture if missing; return its path."""
    fix = _fixture_path()
    if not os.path.exists(fix):
        from jsvx.tools.encoder import EncoderConfig, JsvEncoder

        _stage("encoding 1080p fixture (cold tmp)")
        h, w = 1088, 1920
        frames = _zoom_clip(h, w, 8)
        data = JsvEncoder(w, h, EncoderConfig(
            gop_size=4, quantizer_scale=6, me_range=8,
            half_pel_refine=True)).encode(frames)
        tmp = fix + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, fix)
    return fix


def load_fixture_gop(data: bytes, gop_index: int = 0):
    """Parse one GOP of the fixture into decode_gop_scan-ready tensors.

    Returns (stacked, seq, content_stats): the native-parsed dense
    coefficient planes + mvset sideband of REAL 1080p content — what the
    flagship device metric scans (VERDICT r4 #3) — and the content stats
    proving it (coded-coefficient density, distinct MVs per frame).
    """
    from jsvx.kernels.decode import mv_capacity_for
    from jsvx.pipeline.packed_parse import (BufferPool, _mv_unique,
                                            attach_mvset, parse_gop_packed,
                                            walk_stream)

    arr = np.frombuffer(data, np.uint8)
    meta, seq, groups = walk_stream(data)
    g = parse_gop_packed(arr, groups[gop_index], seq, meta, 0,
                         pool=BufferPool())
    uniqs = [_mv_unique(ft.mb_mv) for ft in g.fts]
    cap, _ = mv_capacity_for(max(len(u[0]) + 1 for u in uniqs))
    if cap:
        attach_mvset(g, cap, seq, meta, uniqs=uniqs)
    stats = {
        "coded_coefficients_per_frame": [
            int(np.count_nonzero(ft.levels[0]))
            + int(np.count_nonzero(ft.levels[1]))
            + int(np.count_nonzero(ft.levels[2])) for ft in g.fts],
        "distinct_mvs_per_frame": [int(len(u[0])) for u in uniqs],
        "mv_capacity_bucket": cap,
    }
    # deep-copy out of the parser's pooled buffers: the pool may hand
    # these views to a later parse
    import jax

    stacked = jax.tree.map(np.array, g.stacked)
    return stacked, seq, stats


def bench_end_to_end(partial_sink=None) -> dict:
    """Full product path at 1080p: real encoded stream -> compact-wire
    host parse -> device GOP scan (VERDICT r1 #1: measure the product,
    not just the device stage).  Content is hardened per VERDICT r2 #3:
    half-pel refine on, me_range 8, zoom motion field (K > 64 distinct
    MVs per P frame).

    When ``JSVX_E2E_GO_FILE`` is set (the concurrent bench scheduling),
    the timed trials wait for that file to appear after the warm/compile
    pass, so they never overlap the parent's device-heavy stages.
    """
    from jsvx.pipeline.transcode import transcode

    fix = ensure_fixture()
    data = open(fix, "rb").read()

    # The sink fetches one pixel of every GOP's output: on the tunnel
    # runtime ``jax.block_until_ready`` is a WEAK sync (it returns
    # before the device work actually completes — measured: 81 fps
    # "no sink" vs 6 fps with a forced fetch, round 4), so an honest
    # number needs a real data dependency, exactly like a consumer
    # reading frames would create.
    sink = lambda gi, outs: int(np.asarray(outs[0][-1][0, 0]))  # noqa:E731
    _stage("e2e: compiling + warming the wire program")
    res = transcode(data, sink=sink)       # warm + compile
    _stage("e2e: warm done")

    gate_expired = False
    go_file = os.environ.get("JSVX_E2E_GO_FILE")
    if go_file:
        timeout = float(os.environ.get("JSVX_E2E_GO_TIMEOUT_S", "600"))
        t0 = time.monotonic()
        while (not os.path.exists(go_file)
               and time.monotonic() - t0 < timeout):
            time.sleep(1.0)
        gate_expired = not os.path.exists(go_file)
        _stage(f"e2e: go signal after {time.monotonic() - t0:.0f}s wait"
               + (" (EXPIRED — trials run ungated)" if gate_expired
                  else ""))

    best = float("inf")
    trials = {}
    wire = 0
    for _ in range(3):
        t0 = time.perf_counter()
        res = transcode(data, sink=sink)
        dt = time.perf_counter() - t0
        if dt < best:
            best = dt
            trials = {k: round(v["total_s"], 4)
                      for k, v in res.metrics.timers.report().items()}
            wire = int(res.metrics.gauges.get("wire_bytes", 0))
    _stage("e2e: timed trials done")
    if partial_sink is not None:
        # bank the headline number NOW: the expand probe below compiles
        # another program, and a pathological compile must not be able
        # to push the child past the parent's deadline with nothing
        # banked (trial 2 of round 5 saw a 376 s probe compile)
        partial_sink({
            "end_to_end_1080p_frames_per_s": round(res.n_frames / best,
                                                   2),
            "stage_seconds": trials,
            "n_frames": res.n_frames,
            "stage_split_per_gop": "probe_pending",
        })
    # one more pass with the expand probe: splits the fused
    # expand+decode device stage for attribution (VERDICT r4 #8); its
    # own wall time is excluded from the timed trials above
    expand_s = None
    try:
        resp = transcode(data, sink=sink, probe_expand=True)
        expand_s = resp.metrics.gauges.get("expand_probe_s_per_gop")
    except Exception as e:  # pragma: no cover - probe must never kill e2e
        trials["expand_probe_error"] = repr(e)[:120]
    _stage("e2e: expand probe done")

    # host->device link probe with a forced on-device consume + scalar
    # fetch (a bare device_put + block_until_ready under-reports by
    # ~70x on this runtime)
    import jax
    import jax.numpy as jnp

    consume = jax.jit(lambda x: x[::65537].astype(jnp.int32).sum())
    big = np.ones((8 << 20,), np.uint8)
    np.asarray(consume(jax.device_put(big)))
    t0 = time.perf_counter()
    np.asarray(consume(jax.device_put(big)))
    # MB = 1e6 bytes consistently, over the bytes actually moved
    # (ADVICE r4: 8.0 MB for an 8 MiB buffer under-reported ~4.6%)
    put_mb_s = (big.nbytes / 1e6) / max(time.perf_counter() - t0, 1e-9)
    n_gops = max(res.n_gops, 1)
    dw = trials.get("device_wait", 0.0)
    out = {
        "end_to_end_1080p_frames_per_s": round(res.n_frames / best, 2),
        "stage_seconds": trials,
        # the four-way split of one GOP's pipeline (VERDICT r4 #8):
        # transfer = un-overlapped wire-upload tail, expand = standalone
        # probe of the on-device wire expansion, decode = fused
        # device_wait minus the probe, sink = output fetch
        "stage_split_per_gop": {
            "transfer_s": round(trials.get("wire_wait", 0.0) / n_gops, 4),
            "expand_s": expand_s,
            "decode_s": (round(max(dw / n_gops - expand_s, 0.0), 4)
                         if expand_s is not None else None),
            "sink_s": round(trials.get("sink", 0.0) / n_gops, 4),
            # decode_s is the UN-OVERLAPPED decode tail: frames are
            # delivered one GOP behind the dispatch, so expand+decode
            # usually hide behind the next GOP's transfer+parse and
            # device_wait ~ 0; the pure decode rate is the headline
            # device metric ("value")
            "note": "pipelined: decode overlaps next GOP transfer/parse",
        },
        "stream_bytes": len(data),
        "n_frames": res.n_frames,
        "wire_bytes_per_frame": wire // max(res.n_frames, 1),
        "host_to_device_mb_per_s": round(put_mb_s, 1),
        # the link ceiling for this run: moving the wire alone at the
        # measured link speed (end-to-end can't beat this on a tunnel)
        "e2e_link_bound_fps": round(
            res.n_frames / max(wire / (put_mb_s * 1e6), 1e-9), 1),
    }
    out.update(_motion_stats(data))
    if gate_expired:
        # the timed trials ran without the parent's go signal, possibly
        # against its device traffic: mark the number as contaminated
        # instead of letting the artifact pass it off as clean
        out["e2e_gate_expired_trials_ungated"] = True
    _stage("e2e: complete")
    return out


# Fixed child command: a stable entry (same code + same command => the
# persistent cache's trace-history-dependent keys hit across driver
# re-runs, PERF.md r4 #4).
_E2E_CHILD_CODE = (
    "import sys, json; sys.path.insert(0, {r!r})\n"
    "import jax\n"
    "jax.config.update('jax_compilation_cache_dir', {c!r})\n"
    "jax.config.update("
    "'jax_persistent_cache_min_compile_time_secs', 1.0)\n"
    "import bench\n"
    "sink = lambda d: print('E2E_JSON ' + json.dumps(d), flush=True)\n"
    "sink(bench.bench_end_to_end(partial_sink=sink))\n"
)


def spawn_e2e(cache_dir: str):
    """Start the end-to-end child at t~0 (VERDICT r4 #1).

    Runs in a FRESH subprocess for two measured reasons (PERF.md r4):
    (1) executing the chained device-metric program degrades every
    subsequent host<->device round trip ~10x in the same process on the
    axon tunnel runtime; (2) a fixed subprocess command gives the big
    wire program a stable persistent-cache key across driver runs.
    """
    import subprocess
    import tempfile

    repo = os.path.dirname(os.path.abspath(__file__))
    go_file = os.path.join(
        tempfile.gettempdir(), f"jsvx_e2e_go_{os.getpid()}")
    if os.path.exists(go_file):
        os.unlink(go_file)
    env = dict(os.environ)
    env["JSVX_E2E_GO_FILE"] = go_file
    out_f = tempfile.NamedTemporaryFile(
        mode="w+", suffix=".out", delete=False)
    err_f = tempfile.NamedTemporaryFile(
        mode="w+", suffix=".err", delete=False)
    code = _E2E_CHILD_CODE.format(r=repo, c=cache_dir)
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=out_f, stderr=err_f, cwd=repo, env=env)
    out_f.close()                          # the child holds the fds now
    err_f.close()
    return {"proc": proc, "out": out_f.name, "err": err_f.name,
            "go_file": go_file}


def signal_e2e(handle) -> None:
    """Release the child's timed trials (parent device stages are done)."""
    with open(handle["go_file"], "w") as f:
        f.write("go")


def collect_e2e(handle, deadline_monotonic: float) -> dict:
    """Join the e2e child; on timeout, kill the EXACT pid and surface
    its last stage lines instead of a bare skip marker (VERDICT r4 #1).
    """
    import json as _json

    proc = handle["proc"]
    while proc.poll() is None and time.monotonic() < deadline_monotonic:
        time.sleep(2.0)
    timed_out = proc.poll() is None
    if timed_out:
        proc.kill()                        # exact child PID only
        proc.wait(timeout=30)
    out = open(handle["out"]).read()
    err = open(handle["err"]).read()
    for p in (handle["go_file"], handle["out"], handle["err"]):
        try:
            os.unlink(p)
        except OSError:
            pass
    for line in reversed(out.splitlines()):
        if line.startswith("E2E_JSON "):
            try:
                return _json.loads(line[len("E2E_JSON "):])
            except ValueError:
                continue               # torn by the kill: try the
                                       # banked earlier line instead
    stages = [ln for ln in err.splitlines() if ln.startswith("[bench")]
    return {
        "end_to_end": ("timeout_killed" if timed_out
                       else f"child_rc={proc.returncode}"),
        "e2e_child_stages": stages[-4:],
        "e2e_child_stderr_tail": err[-400:],
    }


def bench_device_correctness() -> dict:
    """On-device correctness gate (VERDICT r1 #5): decode a real encoded
    stream with the ACTUAL compiled kernels on the current backend and
    check (a) XLA / two-kernel Pallas / fused Pallas bit-agreement and
    (b) PSNR vs the float64 oracle >= the reference integer-shader
    simulation's PSNR (the north-star accuracy bar, BASELINE.md)."""
    import jax

    from jsvx.kernels.decode import (decode_frame_planes, frame_to_device,
                                     make_constants, mv_bucket)
    from jsvx.kernels.pallas_decode import decode_frame_planes_pallas
    from jsvx.kernels.pallas_fused import decode_frame_planes_fused
    from jsvx.pipeline.stream import JaxStreamDecoder
    from jsvx.tools.encoder import EncoderConfig, JsvEncoder
    from jsvx.tools.oracle import (reconstruct_frame,
                                   reconstruct_frame_intsim)
    from jsvx.tools.psnr import psnr

    rng = np.random.default_rng(7)
    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(6):
        y = np.clip(110 + 70 * np.sin(2 * np.pi * (xx + 4 * t) / w)
                    + rng.normal(0, 6, (h, w)), 0, 255)
        cb = np.clip(128 + 30 * np.sin(2 * np.pi * xx[::2, ::2] / w), 0, 255)
        cr = np.clip(128 + 30 * np.cos(2 * np.pi * yy[::2, ::2] / h), 0, 255)
        frames.append(tuple(p.astype(np.uint8) for p in (y, cb, cr)))
    data = JsvEncoder(w, h, EncoderConfig(
        gop_size=3, quantizer_scale=6)).encode(frames)

    interpret = jax.devices()[0].platform == "cpu"
    d = JaxStreamDecoder(data)
    fts = d.parse_all()
    seq = d.parser.seq
    consts = make_constants(seq)
    z = lambda hh, ww: np.zeros((hh, ww), np.uint8)  # noqa: E731
    refs = (z(seq.coded_height, seq.coded_width),
            z(seq.coded_height // 2, seq.coded_width // 2),
            z(seq.coded_height // 2, seq.coded_width // 2))
    ref_o = ref_i = None
    dev_psnr, int_psnr = [], []
    mismatches = 0
    for ft in fts:
        cap = mv_bucket(len(np.unique(ft.mb_mv.reshape(-1, 2),
                                      axis=0)) + 1)
        fd = frame_to_device(ft, mv_capacity=cap)
        xla = [np.asarray(p) for p in decode_frame_planes(
            fd, refs, consts, mc_impl="mvset")]
        # gather-vs-mvset on THIS device backs the 1080p parity
        # arbiter's use of the gather path (ADVICE r3)
        gat = decode_frame_planes(fd, refs, consts, mc_impl="gather")
        pal = decode_frame_planes_pallas(fd, refs, consts,
                                         interpret=interpret)
        fus = decode_frame_planes_fused(fd, refs, consts,
                                        interpret=interpret)
        oracle = reconstruct_frame(ft, seq, ref_o)
        intsim = reconstruct_frame_intsim(ft, seq, ref_i)
        for a, g, b, c in zip(xla, gat, pal, fus):
            if not (np.array_equal(a, np.asarray(g))
                    and np.array_equal(a, np.asarray(b))
                    and np.array_equal(a, np.asarray(c))):
                mismatches += 1
        for a, o, s in zip(xla, oracle, intsim):
            dev_psnr.append(psnr(a, o))
            int_psnr.append(psnr(s, o))
        refs, ref_o, ref_i = tuple(xla), oracle, intsim
    out = {
        "device_kernel_mismatch_planes": mismatches,
        "device_vs_oracle_psnr_db": round(float(min(dev_psnr)), 2),
        "intsim_vs_oracle_psnr_db": round(float(min(int_psnr)), 2),
        "device_psnr_beats_reference_int_path":
            bool(min(dev_psnr) >= min(int_psnr)),
    }
    return out


def bench_1080p_parity() -> dict:
    """1080p-shaped on-device kernel parity (VERDICT r2 #8): one
    1920x1088 P frame through XLA / two-kernel Pallas / fused Pallas
    with bit-equality — catches tile-size/VMEM regressions the 96x128
    correctness gate can't see (the fused kernel's chunking is
    shape-dependent)."""
    import jax

    if jax.devices()[0].platform == "cpu":
        return {"parity_1080p": "skipped_cpu_interpret_too_slow"}
    from __graft_entry__ import _synthetic_frame_inputs
    from jsvx.kernels.decode import decode_frame_planes, make_constants
    from jsvx.kernels.pallas_decode import decode_frame_planes_pallas
    from jsvx.kernels.pallas_fused import decode_frame_planes_fused

    mb_h, mb_w = 68, 120
    rng = np.random.default_rng(17)
    refs = (rng.integers(0, 256, (mb_h * 16, mb_w * 16), np.uint8),
            rng.integers(0, 256, (mb_h * 8, mb_w * 8), np.uint8),
            rng.integers(0, 256, (mb_h * 8, mb_w * 8), np.uint8))
    frame = _synthetic_frame_inputs(mb_h, mb_w, is_p=True, seed=23,
                                    max_mv=24, mv_capacity=128)
    consts = make_constants()
    # arbiter: the XLA *gather* MC path — bit-identical to mvset (the
    # 96x128 gate and tests pin that down) but compiles in seconds at
    # 1080p, where the K-plane mvset XLA program takes minutes
    xla = [np.asarray(p) for p in decode_frame_planes(
        frame, refs, consts, mc_impl="gather")]
    pal = decode_frame_planes_pallas(frame, refs, consts)
    fus = decode_frame_planes_fused(frame, refs, consts)
    bad = sum(1 for a, b in zip(xla, pal)
              if not np.array_equal(a, np.asarray(b)))
    bad += sum(1 for a, b in zip(xla, fus)
               if not np.array_equal(a, np.asarray(b)))
    return {"parity_1080p_mismatch_planes": bad}


def bench_scaling(budget_s: float = 300.0) -> dict:
    """Multi-process GOP-manifest scaling efficiency as a driver-visible
    artifact (VERDICT r2 #6, r4 #6): median of >= 7 pinned-core trials
    with min/max dispersion via jsvx.tools.bench_scaling."""
    if (os.cpu_count() or 1) < 2:
        return {"scaling": "skipped_single_core"}
    from jsvx.tools.bench_scaling import measure

    return measure(n=2, trials=7, budget_s=budget_s)


def bench_device_phases(fix: str | None) -> dict:
    """Device metric + correctness gate + 1080p parity, in THIS process.

    Raises on a fatal device error (e.g. the axon tunnel's transient
    "TPU worker process crashed" — observed in ~2/9 round-5 runs during
    the sustained chained run); :func:`main` then retries the whole
    phase in a FRESH subprocess, whose new backend connection is
    healthy (the e2e child demonstrably survives a parent-side crash).
    """
    import jax
    import jax.numpy as jnp

    from jsvx.kernels.decode import make_constants
    from jsvx.pipeline.gop import decode_gop_scan, zero_refs

    platform = jax.devices()[0].platform
    impl = "xla" if platform == "cpu" else "fused"

    consts = make_constants()
    content_stats = {}
    if fix is not None and platform != "cpu":
        # REAL CONTENT device metric (VERDICT r4 #3): the 1080p bench
        # fixture's first GOP, native-parsed to device tensors.
        fdata = open(fix, "rb").read()
        stacked, seq, content_stats = load_fixture_gop(fdata)
        consts = make_constants(seq)
        mb_h, mb_w = seq.mb_height, seq.mb_width
        n_frames = int(np.asarray(stacked["is_p"]).shape[0])
        data = jax.device_put(stacked)
        _stage(f"fixture GOP parsed: {n_frames} frames, "
               f"{content_stats['coded_coefficients_per_frame']} coefs, "
               f"K={content_stats['distinct_mvs_per_frame']}")
    else:
        # CI smoke: synthetic tensors
        mb_h, mb_w = 68, 120
        n_frames = 2
        data = jax.device_put(build_gop(mb_h, mb_w, n_frames, seed=999))
    h, w = mb_h * 16, mb_w * 16
    refs = jax.device_put(zero_refs(h, w))

    def decode_chk(s, r, delta):
        # perturb the coefficient planes by `delta` ON DEVICE so the
        # decode's input depends on the previous iteration's output
        s = dict(s)
        for k in ("y", "cb", "cr"):
            c = dict(s[k])
            c["levels"] = (c["levels"].astype(jnp.int32)
                           + delta).astype(jnp.int16)
            s[k] = c
        outs, _ = decode_gop_scan(s, r, consts, impl=impl,
                                  mc_impl="mvset")
        return (jnp.sum(outs[0].astype(jnp.int32))
                + jnp.sum(outs[1].astype(jnp.int32))
                + jnp.sum(outs[2].astype(jnp.int32)))

    # K GOP scans inside one program, serialised by a data dependency:
    # iteration i's input shifts by iteration i-1's checksum mod 5.  No
    # iteration can be elided or cached.  The trip count is TRACED (one
    # compile serves calibration and the timed run — compiling this
    # program twice cost ~8 min of bench wall time on the axon backend).
    @jax.jit
    def chained(k, s, r, seed):
        def body(_, chk):
            return decode_chk(s, r, chk % 5)
        return jax.lax.fori_loop(0, k, body, seed)

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    xsmall = jax.device_put(np.ones((8, 128), np.float32))
    np.asarray(trivial(xsmall))
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(trivial(xsmall))
    round_trip = (time.perf_counter() - t0) / 5

    jax.block_until_ready(data)

    # calibrate K so one timed call covers >= ~1.2 s of device work.
    # MIN of 3 calibration shots: the concurrent e2e child's warm pass
    # can claim the device during a single shot and inflate it 10x
    # (observed: k=7 and an invalid 0.06 s timed run in a fully-warm
    # round-5 trial)
    np.asarray(chained(jnp.int32(2), data, refs, jnp.int32(99)))  # compile
    _stage("chained program compiled")
    cal = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(jnp.int32(2), data, refs, jnp.int32(1)))
        cal = min(cal, time.perf_counter() - t0)
    # calibration only: net out the (dominant, jittery) tunnel round-trip
    # to estimate per-scan device time; the timed run below never
    # subtracts anything
    per_scan = max((cal - round_trip) / 2, 1e-6)
    k_iters = max(2, int(np.ceil(1.5 / per_scan)))
    if platform == "cpu":
        k_iters = min(k_iters, 4)          # CI smoke: keep CPU runs short
    np.asarray(chained(jnp.int32(k_iters), data, refs, jnp.int32(98)))

    def run_trials(k):
        n = 3 if platform != "cpu" else 1
        b = float("inf")
        for t in range(n):
            t0 = time.perf_counter()
            np.asarray(chained(jnp.int32(k), data, refs, jnp.int32(t)))
            b = min(b, time.perf_counter() - t0)
        return b

    best = run_trials(k_iters)
    if platform != "cpu" and best < 0.6:
        # calibration was contaminated after all: rescale the trip count
        # to the MEASURED per-scan rate and re-time (the compiled
        # program takes k as data, so this costs no recompile)
        k_iters = max(int(np.ceil(k_iters * 1.5 / max(best, 1e-3))),
                      2 * k_iters)
        _stage(f"device metric too short; rescaled to k={k_iters}")
        best = run_trials(k_iters)
    _stage(f"device metric done (k={k_iters}, best={best:.2f}s)")

    fps = k_iters * n_frames / best
    measurement_invalid = bool(best < 10 * round_trip
                               or (platform != "cpu" and best < 0.5))
    dev = {
        "value": round(fps, 2),
        "vs_baseline": round(fps / 300.0, 3),
        "measurement_invalid": measurement_invalid,
        "timed_seconds": round(best, 3),
        "chained_iters": k_iters,
        "round_trip_s": round(round_trip, 4),
        "device_metric_content": (
            {"source": "1080p bench fixture GOP 0 (native parse)",
             **content_stats} if content_stats
            else {"source": "synthetic (CPU CI smoke)"}),
    }
    try:
        dev.update(bench_device_correctness())
    except Exception as e:
        dev["correctness_error"] = repr(e)[:200]
    _stage("correctness gate done")
    try:
        dev.update(bench_1080p_parity())
    except Exception as e:
        dev["parity_1080p_error"] = repr(e)[:200]
    _stage("1080p parity done")
    return dev


# Fixed subprocess command (stable persistent-cache identity, like the
# e2e child).
_DEV_CHILD_CODE = (
    "import sys, json; sys.path.insert(0, {r!r})\n"
    "import jax\n"
    "jax.config.update('jax_compilation_cache_dir', {c!r})\n"
    "jax.config.update("
    "'jax_persistent_cache_min_compile_time_secs', 1.0)\n"
    "import bench\n"
    "print('DEV_JSON ' + json.dumps("
    "bench.bench_device_phases(bench.ensure_fixture())), flush=True)\n"
)


def bench_device_phases_isolated(cache_dir: str,
                                 timeout_s: float) -> dict:
    """Retry the device phases in a fresh subprocess after an in-process
    backend crash (the crashed PJRT client cannot recover in-process)."""
    import json as _json
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    code = _DEV_CHILD_CODE.format(r=repo, c=cache_dir)
    try:
        p = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout_s,
                           cwd=repo)
    except subprocess.TimeoutExpired:
        return {"value": 0.0, "vs_baseline": 0.0,
                "measurement_invalid": True,
                "device_phases": "subprocess_timeout"}
    for line in reversed(p.stdout.decode().splitlines()):
        if line.startswith("DEV_JSON "):
            try:
                return _json.loads(line[len("DEV_JSON "):])
            except ValueError:
                continue
    return {"value": 0.0, "vs_baseline": 0.0, "measurement_invalid": True,
            "device_phases_error":
            (p.stderr.decode()[-300:] or f"rc={p.returncode}")}


def main() -> None:
    import jax

    # persistent XLA compilation cache: the bench compiles several large
    # programs (chained scan, e2e scan, 3 kernel impls at two shapes);
    # repeat driver runs must not pay cold-compile time again.  NOTE the
    # cache key of a program depends on the process's trace history, so
    # hits require re-running the same entry command (python bench.py)
    # on unchanged code — which is exactly the driver pattern.
    cache_dir = os.environ.get("JSVX_JIT_CACHE", "/tmp/jsvx_jit_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    t_start = time.monotonic()
    budget_s = float(os.environ.get("JSVX_BENCH_BUDGET_S", "900"))

    def left() -> float:
        return budget_s - (time.monotonic() - t_start)

    platform = jax.devices()[0].platform
    e2e_handle = None
    fix = None
    if platform != "cpu":
        # the fixture is created BEFORE the child spawns (both need it)
        fix = ensure_fixture()
        e2e_handle = spawn_e2e(cache_dir)
        _stage("e2e child spawned (concurrent compile)")
    try:
        if os.environ.get("JSVX_FORCE_DEVICE_SUBPROC"):
            raise RuntimeError("forced device-subprocess test mode")
        dev = bench_device_phases(fix)
    except Exception as e:
        # transient axon tunnel fault ("TPU worker process crashed"):
        # the in-process backend is poisoned, but a fresh subprocess
        # gets a healthy connection — never lose the whole artifact
        _stage(f"device phases crashed in-process ({repr(e)[:120]}); "
               "retrying in a fresh subprocess")
        if platform != "cpu":
            dev = bench_device_phases_isolated(
                cache_dir, timeout_s=float(np.clip(left() - 240, 120,
                                                   600)))
            dev["in_process_device_crash"] = repr(e)[:160]
        else:
            raise
    e2e = {}
    if e2e_handle is not None:
        # parent device stages done: release the child's timed trials,
        # then run the (CPU-subprocess) scaling stage while it measures
        signal_e2e(e2e_handle)
        _stage("e2e go signal sent")
    if left() > 90:
        try:
            e2e.update(bench_scaling(
                budget_s=float(np.clip(left() - 60, 60, 300))))
        except Exception as e:
            e2e["scaling_error"] = repr(e)[:200]
        _stage("scaling done")
    else:
        e2e["scaling"] = "skipped_time_budget"
    if e2e_handle is not None:
        # child started at t~0; give it a floor of 550 s from ITS start
        # even if the parent stages overran (VERDICT r4 #1)
        deadline = t_start + max(550.0, budget_s - 25)
        try:
            e2e.update(collect_e2e(e2e_handle, deadline))
        except Exception as e:             # never lose the device metric
            e2e["end_to_end_error"] = repr(e)[:200]
        _stage("end-to-end collected")
    else:
        try:
            e2e.update(bench_end_to_end())  # CPU CI smoke: in-process
        except Exception as e:
            e2e["end_to_end_error"] = repr(e)[:200]
        _stage("end-to-end done")
    out = {
        "metric": "1080p_device_decode_frames_per_s_per_chip",
        "unit": "frames/s",
        "host_cores": os.cpu_count(),
        "bench_wall_s": round(time.monotonic() - t_start, 1),
    }
    out.update(dev)
    out.update(e2e)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
