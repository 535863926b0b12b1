"""jsvx command line: info / decode / encode / bench.

Usage:
  python -m jsvx info CLIP.jsv
  python -m jsvx decode CLIP.jsv OUT_DIR [--rgb] [--impl pallas|xla|oracle]
  python -m jsvx encode FRAMES.npy CLIP.jsv [--gop 12] [--q 8]
  python -m jsvx bench CLIP.jsv
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def cmd_info(args) -> int:
    from .bitstream.bitio import BitReader
    from .bitstream.container import StartCodeIndex, parse_container_header
    from .coding import tables as T

    data = open(args.stream, "rb").read()
    meta = parse_container_header(BitReader(data))
    idx = StartCodeIndex.scan(data)
    codes = idx.entries[:, 1]
    info = {
        "bytes": len(data),
        "width": meta.width,
        "height": meta.height,
        "duration_s": meta.duration,
        "yuva": meta.yuva,
        "gop_key_map": meta.key_map.count if meta.key_map else 0,
        "sequences": int(np.count_nonzero(codes == T.START_SEQUENCE)),
        "gops": int(np.count_nonzero(codes == T.START_GOP)),
        "pictures": int(np.count_nonzero(codes == T.START_PICTURE)),
    }
    print(json.dumps(info, indent=2))
    return 0


def cmd_decode(args) -> int:
    data = open(args.stream, "rb").read()
    os.makedirs(args.out_dir, exist_ok=True)
    t0 = time.perf_counter()
    if args.impl == "oracle":
        from .tools.oracle import decode_stream_oracle

        frames = [(f.planes, f.picture_type)
                  for f in decode_stream_oracle(data)]
    else:
        from .pipeline.stream import JaxStreamDecoder

        res = JaxStreamDecoder(data).decode(
            impl=None if args.impl == "auto" else args.impl)
        frames = [(tuple(np.asarray(p) for p in f), t)
                  for f, t in zip(res.frames, res.picture_types)]
    dt = time.perf_counter() - t0

    from .tools.refmath import ycbcr_to_rgb

    for i, (planes, _ptype) in enumerate(frames):
        if args.rgb:
            rgb = ycbcr_to_rgb(*planes)
            _write_ppm(os.path.join(args.out_dir, f"frame_{i:05d}.ppm"),
                       rgb)
        else:
            np.savez(os.path.join(args.out_dir, f"frame_{i:05d}.npz"),
                     y=planes[0], cb=planes[1], cr=planes[2])
    print(json.dumps({"frames": len(frames), "seconds": round(dt, 3),
                      "fps": round(len(frames) / dt, 1)}))
    return 0


def _write_ppm(path: str, rgb: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (rgb.shape[1], rgb.shape[0]))
        f.write(rgb.tobytes())


def cmd_encode(args) -> int:
    from .tools.encoder import EncoderConfig, JsvEncoder

    arr = np.load(args.frames)
    if isinstance(arr, np.lib.npyio.NpzFile):
        ys, cbs, crs = arr["y"], arr["cb"], arr["cr"]
        frames = [(ys[i], cbs[i], crs[i]) for i in range(ys.shape[0])]
    else:
        # (N, H, W, 3) RGB
        from .tools.encoder import rgb_to_ycbcr

        frames = [rgb_to_ycbcr(arr[i]) for i in range(arr.shape[0])]
    h, w = frames[0][0].shape
    data = JsvEncoder(w, h, EncoderConfig(
        gop_size=args.gop, quantizer_scale=args.q)).encode(frames)
    with open(args.out, "wb") as f:
        f.write(data)
    print(json.dumps({"frames": len(frames), "bytes": len(data)}))
    return 0


def cmd_bench(args) -> int:
    from .pipeline.transcode import transcode
    from .runtime.profiler import device_trace

    data = open(args.stream, "rb").read()
    t0 = time.perf_counter()
    with device_trace(args.trace):
        res = transcode(data)
    dt = time.perf_counter() - t0
    out = res.metrics.to_dict()
    out["fps_end_to_end"] = round(res.n_frames / dt, 1)
    if args.trace:
        out["trace_dir"] = args.trace
    print(json.dumps(out, indent=2))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="jsvx")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("info")
    pi.add_argument("stream")
    pi.set_defaults(fn=cmd_info)

    pd = sub.add_parser("decode")
    pd.add_argument("stream")
    pd.add_argument("out_dir")
    pd.add_argument("--rgb", action="store_true")
    pd.add_argument("--impl", default="auto",
                    choices=["auto", "pallas", "xla", "oracle"])
    pd.set_defaults(fn=cmd_decode)

    pe = sub.add_parser("encode")
    pe.add_argument("frames")
    pe.add_argument("out")
    pe.add_argument("--gop", type=int, default=12)
    pe.add_argument("--q", type=int, default=8)
    pe.set_defaults(fn=cmd_encode)

    pb = sub.add_parser("bench")
    pb.add_argument("stream")
    pb.add_argument("--trace", default=None, metavar="DIR",
                    help="write a jax.profiler device trace to DIR")
    pb.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
