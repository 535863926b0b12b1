"""Two-process multi-host smoke test (BASELINE config 5 shape).

Each subprocess is an independent "host": it takes its round-robin GOP
share from the manifest, decodes on its own (CPU) device, and journals
completion.  The parent verifies the union covers the stream and that
per-host results match the oracle.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from jsvx.tools.encoder import EncoderConfig, JsvEncoder

from conftest import synthetic_frames

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PYPATH = REPO_ROOT + ((os.pathsep + os.environ["PYTHONPATH"])
                       if os.environ.get("PYTHONPATH") else "")

WORKER = r"""
import json, os, sys
import numpy as np
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from jsvx.pipeline.transcode import transcode
from jsvx.runtime.multihost import GopManifest

stream_path, journal, pid, n = sys.argv[1:5]
data = open(stream_path, "rb").read()
m = GopManifest.from_stream(data, journal_path=journal)
sums = {}
def sink(gi, outs):
    sums[gi] = [int(np.asarray(p).astype(np.int64).sum()) for p in outs]
res = transcode(data, sink=sink, manifest=m,
                process_id=int(pid), process_count=int(n))
print(json.dumps({"pid": int(pid), "gops": res.n_gops,
                  "frames": res.n_frames, "sums": sums}))
"""


def test_two_process_gop_distribution(tmp_path):
    clip = synthetic_frames(9, 48, 64, seed=61)
    data = JsvEncoder(64, 48, EncoderConfig(
        gop_size=3, quantizer_scale=4)).encode(clip)
    stream_path = str(tmp_path / "clip.jsv")
    open(stream_path, "wb").write(data)
    worker_py = str(tmp_path / "worker.py")
    open(worker_py, "w").write(WORKER)

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=_PYPATH)
    procs = []
    for pid in range(2):
        journal = str(tmp_path / f"journal_{pid}.jsonl")
        procs.append(subprocess.Popen(
            [sys.executable, worker_py, stream_path, journal, str(pid),
             "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=REPO_ROOT))
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]
        r = json.loads(out.decode().strip().splitlines()[-1])
        results[r["pid"]] = r

    # host 0 gets GOPs 0 and 2, host 1 gets GOP 1; union covers all 9
    assert results[0]["gops"] == 2 and results[1]["gops"] == 1
    assert results[0]["frames"] + results[1]["frames"] == 9
    got = {int(k): v for r in results.values() for k, v in r["sums"].items()}
    assert set(got) == {0, 1, 2}

    # verify against the oracle's per-GOP plane sums
    from jsvx.tools.oracle import decode_stream_oracle

    frames = decode_stream_oracle(data)
    for gi in range(3):
        fs = frames[gi * 3:(gi + 1) * 3]
        want = [int(sum(f.planes[c].astype(np.int64).sum() for f in fs))
                for c in range(3)]
        assert got[gi] == want, f"GOP {gi} mismatch"


# ---------------------------------------------------------------------------
# Real jax.distributed bring-up (VERDICT r3 item 5): a localhost
# coordinator, two processes, gloo CPU collectives, ONE global mesh
# spanning both — then the manifest split running on top of it.

DIST_WORKER = r"""
import json, os, sys
import numpy as np
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)         # per-process device count below
import jax
jax.config.update("jax_platforms", "cpu")
from jsvx.runtime.multihost import GopManifest, initialize

stream_path, journal, pid, n, port = sys.argv[1:6]
pi, pc = initialize(coordinator_address="127.0.0.1:" + port,
                    num_processes=int(n), process_id=int(pid),
                    num_local_devices=2)
assert (pi, pc) == (int(pid), int(n)), (pi, pc)
assert len(jax.local_devices()) == 2
assert len(jax.devices()) == 2 * int(n)   # the GLOBAL device list

# global 2x2 (host, chip) mesh + a cross-process collective: each host
# contributes its process index, the psum must see both
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

mesh = Mesh(np.array(jax.devices()).reshape(int(n), 2), ("host", "chip"))
local = np.full((1, 2), float(pid) + 1.0)
garr = multihost_utils.host_local_array_to_global_array(
    local, mesh, P("host", "chip"))
tot = jax.jit(lambda a: a.sum(), out_shardings=NamedSharding(mesh, P()))(
    garr)
tot = float(np.asarray(tot.addressable_data(0)))
assert tot == 2.0 * (1.0 + 2.0), tot      # both hosts' contributions

# manifest split on top of the distributed runtime
from jsvx.pipeline.transcode import transcode

data = open(stream_path, "rb").read()
m = GopManifest.from_stream(data, journal_path=journal)
sums = {}
def sink(gi, outs):
    sums[gi] = [int(np.asarray(p).astype(np.int64).sum()) for p in outs]
res = transcode(data, sink=sink, manifest=m,
                process_id=pi, process_count=pc)
print(json.dumps({"pid": pi, "gops": res.n_gops,
                  "frames": res.n_frames, "sums": sums}))
"""


def _free_port():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_jax_distributed_two_process_bringup(tmp_path):
    clip = synthetic_frames(9, 48, 64, seed=61)
    data = JsvEncoder(64, 48, EncoderConfig(
        gop_size=3, quantizer_scale=4)).encode(clip)
    stream_path = str(tmp_path / "clip.jsv")
    open(stream_path, "wb").write(data)
    worker_py = str(tmp_path / "dist_worker.py")
    open(worker_py, "w").write(DIST_WORKER)
    port = _free_port()

    env = dict(os.environ, PYTHONPATH=_PYPATH)
    env.pop("XLA_FLAGS", None)
    procs = []
    for pid in range(2):
        journal = str(tmp_path / f"dj_{pid}.jsonl")
        procs.append(subprocess.Popen(
            [sys.executable, worker_py, stream_path, journal, str(pid),
             "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=REPO_ROOT))
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-3000:]
        r = json.loads(out.decode().strip().splitlines()[-1])
        results[r["pid"]] = r

    assert results[0]["gops"] == 2 and results[1]["gops"] == 1
    assert results[0]["frames"] + results[1]["frames"] == 9
    got = {int(k): v for r in results.values()
           for k, v in r["sums"].items()}
    assert set(got) == {0, 1, 2}

    from jsvx.tools.oracle import decode_stream_oracle

    frames = decode_stream_oracle(data)
    for gi in range(3):
        fs = frames[gi * 3:(gi + 1) * 3]
        want = [int(sum(f.planes[c].astype(np.int64).sum() for f in fs))
                for c in range(3)]
        assert got[gi] == want, f"GOP {gi} mismatch"
