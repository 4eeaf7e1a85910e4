"""Round-4 chip A/B (VERDICT r3 task 4): bin/apm bit-coder at 128 vs
1024 lanes.  The kernel pays 8 VPU steps per byte, so lane width is the
whole ballgame — round-3 production ran hardwired at 128 lanes
(25-28 MB/s)."""
import json
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from bench import make_corpus, timed
from tpuzip.codecs import bin_apm as jbin
from tpuzip.kernels import bin_coder as kbin

N = 1 << 14  # bytes/block -> 128K bit steps
data = make_corpus(1024 * N)
blocks = np.frombuffer(data, np.uint8).reshape(1024, N)

for BW in (128, 1024):
    bits = jbin.bytes_to_bits(jnp.array(blocks[:BW]))
    x = jnp.transpose(bits)
    jl = jnp.full(BW, 8 * N, jnp.int32)
    for use_apm in (False, True):
        sync = jax.jit(lambda a, b_, u=use_apm: jnp.sum(
            kbin.bin_encode_lanes(a, b_, use_apm=u)[1][:8, :8]
            .astype(jnp.int32)))
        int(sync(x, jl))
        s = timed(lambda: int(sync(x, jl)))
        # bit-exactness on one lane vs the XLA scan
        if BW == 1024 and not use_apm:
            bits2 = jbin.bytes_to_bits(jnp.array(blocks[:2]))
            streams = kbin.bin_encode_streams(
                bits2, jnp.array([8 * N, 8 * N], jnp.int32),
                use_apm=use_apm)
            comp, clen = jbin.encode_bits(
                bits2[0], jnp.int32(8 * N), use_apm=use_apm)
            assert streams[0] == np.asarray(comp)[: int(clen)].tobytes()
        print(json.dumps({
            "lanes": BW, "apm": use_apm,
            "encode_MBps": round(BW * N / s / 1e6, 1)}), flush=True)
