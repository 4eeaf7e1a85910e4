"""Full benchmark suite -> bench/RESULTS.md.

Per-codec encode/decode throughput on the real chip (scalar-fetch sync),
CPU baselines (liblz4 / stock zlib / csrc native), and a weak-scaling run of
the sharded pipeline on the virtual CPU mesh (1..8 devices) as the
scaling-efficiency harness that a real pod run plugs into.

Run:  python bench/bench_all.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_corpus(nbytes: int) -> bytes:
    from bench import make_corpus as mc

    return mc(nbytes)


def sync_time(fn, *args, iters=3):
    """Median-of-iters wall time with scalar-fetch sync."""
    fn(*args)  # warm/compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn(*args)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench_tpu(quick: bool) -> dict:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tpuzip.codecs import lz4 as jlz4
    from tpuzip.core import blocks as blk
    from tpuzip.kernels import mtf_scan, range_coder

    out = {"platform": jax.devices()[0].platform}
    rng = np.random.default_rng(0xBEEF)
    # shapes match bench.py so the persistent compile cache is shared
    N = 1 << 16

    # Pallas MTF kernel (128 lanes)
    x = jnp.array(rng.integers(0, 256, (N, 128), dtype=np.uint8))
    f = jax.jit(lambda x: jnp.sum(mtf_scan.mtf_lanes(x), dtype=jnp.int32))
    dt = sync_time(lambda a: int(f(a)), x)
    out["mtf_kernel_MBps"] = round(N * 128 / dt / 1e6, 1)

    # Pallas ari encoder (128 lanes)
    lens = jnp.full(128, N, jnp.int32)
    g = jax.jit(lambda x, l: jnp.sum(
        range_coder.ari_encode_lanes(x, l)[1], dtype=jnp.int32))
    dt = sync_time(lambda a, b: int(g(a, b)), x, lens)
    out["ari_kernel_MBps"] = round(N * 128 / dt / 1e6, 1)

    # XLA LZ4 batch (B x 64K)
    B = 32
    corpus = make_corpus(B * N)
    blocks, blens = blk.chunk(corpus, N)
    jb, jl = jnp.array(blocks), jnp.array(blens)
    h = jax.jit(lambda b, l: jnp.sum(jlz4.encode_batch(b, l)[1]))
    dt = sync_time(lambda a, b: int(h(a, b)), jb, jl)
    out["lz4_encode_MBps"] = round(B * N / dt / 1e6, 1)
    return out


def bench_cpu_baselines() -> dict:
    import zlib

    from tpuzip.oracle import liblz4
    from tpuzip.runtime import native

    out = {}
    data = make_corpus(10 << 20)
    if liblz4.available():
        t0 = time.perf_counter()
        c = liblz4.compress_block(data)
        out["liblz4_encode_MBps"] = round(len(data) / (time.perf_counter() - t0) / 1e6, 1)
        t0 = time.perf_counter()
        liblz4.decompress_block(c, len(data))
        out["liblz4_decode_MBps"] = round(len(data) / (time.perf_counter() - t0) / 1e6, 1)
    t0 = time.perf_counter()
    zlib.compress(data, 6)
    out["zlib6_encode_MBps"] = round(len(data) / (time.perf_counter() - t0) / 1e6, 1)
    if native.available():
        small = data[: 2 << 20]
        t0 = time.perf_counter()
        native.ari_encode(small)
        out["native_ari_encode_MBps"] = round(len(small) / (time.perf_counter() - t0) / 1e6, 1)
        t0 = time.perf_counter()
        native.lz4_compress(data)
        out["native_lz4_encode_MBps"] = round(len(data) / (time.perf_counter() - t0) / 1e6, 1)
    return out


def bench_scaling() -> dict:
    """Weak scaling of the sharded pipeline over the virtual CPU mesh.

    NOTE: virtual CPU devices share one physical CPU, so these efficiencies
    measure the HARNESS, not hardware scaling — a real pod slice plugs into
    the same code path.  Expect sub-linear numbers here by construction."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpuzip.codecs import lz4 as jlz4
    from tpuzip.dist import mesh as meshlib

    out = {"note": "virtual devices share one CPU; harness demo only"}
    N = 1 << 14
    per_dev_blocks = 4
    base = None
    for nd in (1, 2, 4, 8):
        mesh = meshlib.make_mesh(nd)
        B = per_dev_blocks * nd
        corpus = make_corpus(B * N)
        from tpuzip.core import blocks as blk

        blocks, lens = blk.chunk(corpus, N)
        jb = jax.device_put(jnp.array(blocks), meshlib.block_sharding(mesh))
        jl = jax.device_put(jnp.array(lens), meshlib.length_sharding(mesh))
        f = jax.jit(lambda b, l: jnp.sum(jlz4.encode_batch(b, l)[1]))
        dt = sync_time(lambda a, b: int(f(a, b)), jb, jl)
        thr = B * N / dt / 1e6
        if base is None:
            base = thr
        out[f"{nd}dev_MBps"] = round(thr, 1)
        out[f"{nd}dev_efficiency"] = round(thr / (base * nd), 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-tpu", action="store_true")
    ap.add_argument("--skip-scaling", action="store_true")
    ap.add_argument("--scaling-only", action="store_true")
    args = ap.parse_args()

    if args.scaling_only:
        print(json.dumps(bench_scaling()))
        return

    results = {"cpu_baselines": bench_cpu_baselines()}
    if not args.skip_scaling:
        # subprocess: the scaling run must own a fresh CPU-platform backend
        import subprocess

        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-only"],
            capture_output=True, text=True, timeout=1800)
        try:
            results["cpu_mesh_weak_scaling"] = json.loads(
                r.stdout.strip().splitlines()[-1])
        except Exception:
            results["cpu_mesh_weak_scaling"] = {"error": r.stderr[-500:]}
    if not args.skip_tpu:
        results["tpu"] = bench_tpu(args.quick)

    path = os.path.join(os.path.dirname(__file__), "RESULTS.md")
    with open(path, "w") as f:
        f.write("# bench_all results\n\n```json\n")
        f.write(json.dumps(results, indent=2))
        f.write("\n```\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
