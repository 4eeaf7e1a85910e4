"""Scale rehearsal (VERDICT r2 item 10): >= 1 GiB deterministic corpus
through the pipelined corpus API for every codec, plus a kill-and-resume
checkpoint job asserted bitwise identical to an uninterrupted run.

Runs wherever the session is (CPU host or chip); records wall rates and
ratios as JSON for BASELINE.md's 1 GB rows.

Usage:
    python bench/scale_rehearsal.py [--gib 1.0] [--codecs lz4,rle,...]
                                    [--out bench/scale_r3.json]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_corpus(n_bytes: int, seed: int = 42) -> bytes:
    """Deterministic mixed corpus: 60% tiled text (varied by a rolling
    counter so blocks differ), 25% low-entropy structured records, 15%
    incompressible pseudorandom."""
    rng = np.random.default_rng(seed)
    text = open(os.path.join(REPO, "SURVEY.md"), "rb").read()
    parts = []
    total = 0
    i = 0
    while total < n_bytes:
        r = i % 20
        if r < 12:
            stamp = (b"[chunk %08d] " % i)
            parts.append(stamp + text[(i * 997) % len(text):][: 1 << 16])
        elif r < 17:
            rec = np.zeros(1 << 16, np.uint8)
            rec[:: 16] = (i * 31) & 0xFF
            rec[1:: 16] = np.arange(len(rec) // 16, dtype=np.uint8)
            parts.append(rec.tobytes())
        else:
            parts.append(rng.integers(0, 256, 1 << 16, dtype=np.uint8
                                      ).tobytes())
        total += len(parts[-1])
        i += 1
    return b"".join(parts)[:n_bytes]


def corpus_pass(data: bytes, codec: str, superbatch: int) -> dict:
    import tpuzip

    t0 = time.perf_counter()
    blob = tpuzip.compress_corpus(data, codec=codec, block_size=1 << 16,
                                  superbatch=superbatch, pipeline=2)
    te = time.perf_counter() - t0
    t0 = time.perf_counter()
    back = tpuzip.decompress_corpus(blob)
    td = time.perf_counter() - t0
    assert back == data, f"{codec}: round-trip mismatch"
    return {
        "codec": codec,
        "bytes": len(data),
        "ratio": round(len(blob) / len(data), 4),
        "enc_MBps": round(len(data) / te / 1e6, 1),
        "dec_MBps": round(len(data) / td / 1e6, 1),
    }


_KILL_CHILD = """
import importlib.util, os, sys
sys.path.insert(0, %r)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
spec = importlib.util.spec_from_file_location(
    "_sr", os.path.join(%r, "bench", "scale_rehearsal.py"))
sr = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sr)
from tpuzip.runtime import checkpoint
data = sr.make_corpus(int(sys.argv[1]))
checkpoint.run_job(data, sys.argv[2], codec="lz4", block_size=1 << 16,
                   batch_blocks=256)
print("child finished")
"""


def resume_rehearsal(n_bytes: int, workdir: str) -> dict:
    """SIGKILL a checkpoint job mid-run, resume it, and compare against an
    uninterrupted run — must be bitwise identical."""
    from tpuzip.runtime import checkpoint

    data = make_corpus(n_bytes)
    wd_killed = os.path.join(workdir, "killed")
    wd_clean = os.path.join(workdir, "clean")
    env = {k: v for k, v in os.environ.items()}
    proc = subprocess.Popen(
        [sys.executable, "-c", _KILL_CHILD % (REPO, REPO),
         str(n_bytes), wd_killed],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    # let it complete some batches, then kill it hard (exact PID only)
    deadline = time.time() + 600
    while time.time() < deadline:
        time.sleep(0.02)
        done = len([f for f in os.listdir(wd_killed)
                    if f.startswith("part_")]) if os.path.isdir(wd_killed) \
            else 0
        if done >= 2:
            break
        if proc.poll() is not None:
            raise RuntimeError("child finished before the kill "
                               "(corpus too small for the rehearsal)")
    os.kill(proc.pid, signal.SIGKILL)
    proc.wait()
    man = checkpoint.Manifest.load(os.path.join(wd_killed, "manifest.json"))
    missing_before = len(man.missing_batches(256))
    assert missing_before > 0, "kill landed after the job finished"
    resumed = checkpoint.run_job(data, wd_killed, codec="lz4",
                                 block_size=1 << 16, batch_blocks=256)
    clean = checkpoint.run_job(data, wd_clean, codec="lz4",
                               block_size=1 << 16, batch_blocks=256)
    assert resumed == clean, "resumed container differs from clean run"
    from tpuzip.dist import runner

    assert runner.decompress(resumed) == data
    return {"resume": "ok", "bytes": n_bytes,
            "batches_missing_at_kill": missing_before,
            "container_bytes": len(clean)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gib", type=float, default=1.0)
    ap.add_argument("--codecs", default="lz4,rle,deflate,ari,bwt,bwtdc,"
                                        "lz4p,bin,apm")
    ap.add_argument("--out", default=os.path.join(REPO, "bench",
                                                  "scale_r3.json"))
    ap.add_argument("--resume-gib", type=float, default=None,
                    help="corpus size for the kill/resume rehearsal "
                         "(default: same as --gib)")
    ap.add_argument("--skip-resume", action="store_true")
    args = ap.parse_args()

    # decide the platform BEFORE any backend query: with the axon relay
    # down, jax backend init blocks forever (see bench.py's probe)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_benchmod", os.path.join(REPO, "bench.py"))
    benchmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(benchmod)
    import jax

    if benchmod._axon_tunnel_down():
        jax.config.update("jax_platforms", "cpu")
    if jax.default_backend() != "tpu":
        jax.config.update("jax_platforms", "cpu")
    n = int(args.gib * (1 << 30))
    print(f"building {n / 2**30:.2f} GiB corpus...", flush=True)
    data = make_corpus(n)
    results = {"gib": args.gib, "backend": jax.default_backend(),
               "rows": []}
    for codec in args.codecs.split(","):
        print(f"[{codec}] compress/decompress {n >> 20} MiB...", flush=True)
        row = corpus_pass(data, codec, superbatch=64 << 20)
        results["rows"].append(row)
        print("   ", json.dumps(row), flush=True)
    if not args.skip_resume:
        import tempfile

        rn = int((args.resume_gib or args.gib) * (1 << 30))
        with tempfile.TemporaryDirectory() as wd:
            print("kill/resume rehearsal...", flush=True)
            results["resume"] = resume_rehearsal(rn, wd)
            print("   ", json.dumps(results["resume"]), flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
