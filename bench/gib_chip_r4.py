"""Round-4 chip-resident GiB-class run (VERDICT r3 task 7).

Two measurements per staged-family codec (ari / bwt / bwtdc), 512 MiB
each, with the corpus GENERATED ON DEVICE (a 16 MiB text seed uploaded
once, then byte-rolled per superbatch — per-block content differs, the
2 MB/s tunnel is never paid for raw data):

1. chip_sustained: the device encode stages (BWT doubling sort, MTF,
   packed ari kernel) looped over 32×16 MiB device-resident superbatches,
   scalar-fetch timed — sustained GiB-class chip throughput with no
   host/tunnel traffic in the measured region.
2. end_to_end: compress_from_device -> standard tpz containers, with
   RunMetrics phases recorded.  The encode phase INCLUDES the compressed
   payload download through the ~2 MB/s axon tunnel (a dev-tunnel
   artifact: on a real TPU host this hop is PCIe/DMA); the phase split
   plus the chip_sustained row makes the attribution explicit.

One serving-decode sample per codec (decompress to_device=True of one
superbatch container) closes the loop on device.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from bench import make_corpus
from tpuzip.dist import mesh as meshlib, runner
from tpuzip.utils.metrics import RunMetrics

SB_BLOCKS, N = 1024, 1 << 16         # 64 MiB per superbatch (1024
                                     # blocks = one full-width lane group)
SUPERBATCHES = 8                     # -> 512 MiB per codec
TOTAL = SB_BLOCKS * N * SUPERBATCHES

mesh = meshlib.make_mesh()
seed_host = np.frombuffer(make_corpus(256 * N), np.uint8).reshape(256, N)
seed = jnp.tile(jnp.array(seed_host), (SB_BLOCKS // 256, 1))  # 16 MiB up,
lens = jnp.full(SB_BLOCKS, N, jnp.int32)                      # 64 MiB dev
lens_np = np.full(SB_BLOCKS, N, np.int64)


@jax.jit
def variant(s):
    # byte-roll: distinct block contents per superbatch, same statistics
    return jnp.roll(seed, s * 509, axis=1)


def staged_sync(codec):
    """One jitted device-only staged encode chain returning a scalar."""
    from tpuzip.codecs import bwt as jbwt, dc as jdc
    from tpuzip.kernels.range_coder import ari_encode_lanes_packed_indexed

    def chain(jb, jl):
        if codec == "ari":
            syms, sl = jb, jl
        else:
            # private all_full variant: the public wrapper peeks at
            # lengths on the host, which a jit trace cannot
            L, origins = jbwt._encode_batch_fast(jb, jl, all_full=True)
            if codec == "bwt":
                syms = runner._mtf_encode_auto(L, jl)
                sl = jl
            else:
                dcomp, dlens = jdc.encode_batch(L, jl)
                syms, sl = dcomp[:, : jb.shape[1]], dlens
        acc = jnp.int32(0)
        for g in range(0, SB_BLOCKS, 1024):
            x = jnp.transpose(syms[g : g + 1024])
            st, slens2, dts = ari_encode_lanes_packed_indexed(
                x, sl[g : g + 1024].astype(jnp.int32))
            acc = acc + jnp.sum(slens2.astype(jnp.int32))
        return acc

    return jax.jit(chain)


results = {}
for codec in ("ari", "bwt", "bwtdc"):
    fn = staged_sync(codec)
    int(fn(variant(0), lens))  # compile
    t0 = time.perf_counter()
    tot = 0
    for s in range(SUPERBATCHES):
        tot += int(fn(variant(s), lens))
    dt = time.perf_counter() - t0
    chip_rate = TOTAL / dt
    row = {"chip_sustained_MBps": round(chip_rate / 1e6, 1),
           "payload_MB": round(tot / 1e6, 1),
           "ratio": round(tot / TOTAL, 4)}
    print(json.dumps({codec: row}), flush=True)
    results[codec] = row

# end-to-end containers (tunnel-inclusive) + one serving-decode sample
for codec in ("ari", "bwt", "bwtdc"):
    m = RunMetrics()
    t0 = time.perf_counter()
    containers = []
    for s in range(SUPERBATCHES):
        containers.append(runner.compress_from_device(
            variant(s), lens_np, codec=codec, mesh=mesh, metrics=m))
    wall = time.perf_counter() - t0
    payload = sum(len(c) for c in containers)
    # verify one container round-trips bit-exactly (host decode)
    back = runner.decompress(containers[3], mesh=mesh)
    want = np.asarray(variant(3)).tobytes()
    assert back == want, f"{codec} container 3 mismatch"
    # serving decode sample: one container back to device
    t1 = time.perf_counter()
    blocks, olens, orig = runner.decompress(containers[5], mesh=mesh,
                                            to_device=True)
    jax.block_until_ready(blocks)
    serve_s = time.perf_counter() - t1
    row = results[codec]
    row.update({
        "e2e_wall_s": round(wall, 1),
        "e2e_MBps": round(TOTAL / wall / 1e6, 1),
        "container_MB": round(payload / 1e6, 1),
        "phases": {k: round(p.seconds, 1) for k, p in m.phases.items()},
        "tunnel_MB": round(payload / 1e6, 1),
        "serve_decode_sample_MBps": round(SB_BLOCKS * N / serve_s / 1e6,
                                          1)})
    print(json.dumps({codec: row}), flush=True)

with open("/root/repo/bench/gib_chip_r4.json", "w") as f:
    json.dump({"total_MiB_per_codec": TOTAL >> 20, "rows": results}, f,
              indent=1)
print("done")
