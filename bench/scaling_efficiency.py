"""Scaling-efficiency harness (VERDICT r3 task 9, BASELINE north-star
scaling clause): weak-scaling compress_corpus_multihost over 1/2/4
CPU-mesh processes — the SAME code path a real pod runs (jax.distributed
+ DCN allgather), so a pod measurement only swaps the backend.

Weak scaling: every host owns PER_HOST_MB of corpus; efficiency(N) =
rate(N) / rate(1) where rate = total_bytes / max_host_wall.  The DCN
gather phase is reported separately (it is the only non-local stage).

Usage: python bench/scaling_efficiency.py [--codec lz4] [--mb 64]
Writes bench/scaling_r4.json.
"""
import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker() -> None:
    coord, nproc, pid, mb, codec = (sys.argv[2], int(sys.argv[3]),
                                    int(sys.argv[4]), int(sys.argv[5]),
                                    sys.argv[6])
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tpuzip.dist import multihost
    from tpuzip.utils.metrics import RunMetrics

    multihost.initialize(coord, nproc, pid)
    # deterministic corpus, identical on every host (weak scaling: the
    # corpus grows with the host count; each host encodes its own range).
    # A 1 MiB text-like seed tiled up: blocks are encoded independently,
    # so tiling does not change per-block work (~2.5:1 LZ4)
    from bench import make_corpus

    total = nproc * mb << 20
    seed = make_corpus(1 << 20)
    data = (seed * ((total + len(seed) - 1) // len(seed)))[:total]
    # warmup (compiles + native lib load), then the timed run
    multihost.compress_corpus_multihost(data[: 4 << 20], codec=codec)
    m = RunMetrics()
    t0 = time.perf_counter()
    container = multihost.compress_corpus_multihost(data, codec=codec,
                                                    metrics=m)
    wall = time.perf_counter() - t0
    enc = m.phases["local_encode"].seconds
    gat = m.phases["dcn_gather"].seconds
    print(json.dumps({"pid": pid, "wall_s": round(wall, 4),
                      "local_encode_s": round(enc, 4),
                      "dcn_gather_s": round(gat, 4),
                      "container_len": len(container)}), flush=True)


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def run_scale(nproc: int, mb: int, codec: str, local_devs: int = 2):
    coord = f"127.0.0.1:{free_port()}"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devs}")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", coord,
         str(nproc), str(p), str(mb), codec],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for p in range(nproc)]
    rows = []
    for p, pr in enumerate(procs):
        out, err = pr.communicate(timeout=1800)
        if pr.returncode != 0:
            raise RuntimeError(
                f"worker {p} rc={pr.returncode}:\n"
                f"{err.decode(errors='replace')[-2000:]}")
        rows.append(json.loads(out.decode().strip().splitlines()[-1]))
    total = nproc * mb << 20
    wall = max(r["wall_s"] for r in rows)
    return {
        "nproc": nproc, "total_MB": total >> 20,
        "rate_MBps": round(total / wall / 1e6, 1),
        "max_wall_s": wall,
        "max_local_encode_s": max(r["local_encode_s"] for r in rows),
        "max_dcn_gather_s": max(r["dcn_gather_s"] for r in rows),
        "container_len": rows[0]["container_len"],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--codec", default="lz4")
    ap.add_argument("--mb", type=int, default=64,
                    help="per-host corpus MiB (weak scaling)")
    ap.add_argument("--procs", default="1,2,4")
    ap.add_argument("--dcn_gbps", type=float, default=5.0,
                    help="modeled pod DCN allgather GB/s per host")
    args = ap.parse_args()
    results = []
    for n in [int(x) for x in args.procs.split(",")]:
        r = run_scale(n, args.mb, args.codec)
        results.append(r)
        print(json.dumps(r), flush=True)
    base = results[0]["rate_MBps"]
    enc1 = results[0]["max_local_encode_s"]
    other1 = results[0]["max_wall_s"] - results[0]["max_local_encode_s"]

    # pod-predicted: on a real pod every host has its OWN cores, so
    # per-host encode time stays at the 1-proc value (weak scaling:
    # per-host work is constant); the only growing term is the DCN
    # gather.  Two variants: (a) with the MEASURED gather time — itself
    # a loopback artifact (~40-80 MB/s through the local coordinator vs
    # multi-GB/s pod DCN), and (b) with the gather bytes replayed at a
    # parameterized pod-DCN rate.  Each variant normalizes by ITS OWN
    # 1-proc rate (weak-scaling efficiency = rate(N)/rate(1) per model).
    def _pred(r, gather_s):
        return (r["nproc"] * args.mb << 20) / (enc1 + other1 + gather_s)

    base_meas = _pred(results[0], results[0]["max_dcn_gather_s"])
    base_dcn = _pred(results[0],
                     results[0]["container_len"] / (args.dcn_gbps * 1e9))
    for r in results:
        r["efficiency_raw"] = round(r["rate_MBps"] / base, 4)
        r["gather_frac"] = round(
            r["max_dcn_gather_s"] / r["max_wall_s"], 4)
        r["gather_bytes"] = r["container_len"]
        r["efficiency_pod_measured_gather"] = round(
            _pred(r, r["max_dcn_gather_s"]) / (r["nproc"] * base_meas), 4)
        dcn_s = r["container_len"] / (args.dcn_gbps * 1e9)
        r["efficiency_pod_dcn_model"] = round(
            _pred(r, dcn_s) / (r["nproc"] * base_dcn), 4)
    out = {"codec": args.codec, "per_host_MiB": args.mb,
           "mode": "weak_scaling_cpu_mesh",
           "note": ("raw efficiency is bounded by shared-VM core "
                    "contention (N processes, one core budget); "
                    "pod_predicted holds per-host encode at the 1-proc "
                    "time and adds the measured DCN gather"),
           "rows": results}
    with open(os.path.join(REPO, "bench", "scaling_r4.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(
        {"efficiency_raw": results[-1]["efficiency_raw"],
         "efficiency_pod_dcn_model":
             results[-1]["efficiency_pod_dcn_model"]}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker()
    else:
        main()
