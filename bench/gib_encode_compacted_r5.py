"""Round-5 chip row: 512 MiB ari encode WITH on-device stream compaction
materialized (the compress_from_device basis — nothing DCE-able, every
superbatch's compacted streams + index come into existence on device).

Companion to gib_chip_r4's kernel-basis sustained rows (which sum slens
inside a jit and therefore measure the kernel alone — DESIGN note 27)
and to bench/gib_decode_r5.py's 512 MiB decode row.
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
from tpuzip.kernels import range_coder as rc

BW, N = 1024, 1 << 16
SUPERBATCHES = 8

seed_host = np.frombuffer(make_corpus(256 * N), np.uint8).reshape(256, N)
seed = jnp.tile(jnp.array(np.ascontiguousarray(seed_host.T)), (1, BW // 256))
jl = jnp.full(BW, N, jnp.int32)


@jax.jit
def variant(s):
    return jnp.roll(seed, s * 509, axis=0)


def one(s):
    streams, slens, deltas = rc.ari_encode_lanes_packed_indexed(
        variant(s), jl)
    # sync on slices of ALL outputs — nothing can be elided
    return (int(jnp.sum(slens.astype(jnp.int32)))
            + int(jnp.sum(streams[:8, :8].astype(jnp.int32)))
            + int(jnp.sum(deltas[:8, :8])))


one(0)  # warm
t0 = time.perf_counter()
acc = 0
for s in range(SUPERBATCHES):
    acc += one(s)
dt = time.perf_counter() - t0
total = SUPERBATCHES * BW * N
print(json.dumps({
    "codec": f"ari packed encode + device compaction ({rc.COMPACTION})",
    "total_MiB": total >> 20,
    "chip_sustained_encode_compacted_MBps": round(total / dt / 1e6, 1),
}))
