"""Batch-width sweep for the wplan8 LZ4 device gather (to_device serving).

The bulk gather has a fixed per-call cost; B=128 amortized it to 230 MB/s
(wplan4) in round 2.  This sweeps B at the round-3 production granularity
(wplan8) to see where the curve flattens — serving batches are free to
buffer wider than 128 blocks.
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from bench import make_corpus, timed
from tpuzip.codecs import lz4 as jlz4
from tpuzip.runtime import native

N = 1 << 16
for B in (128, 256, 512):
    data = make_corpus(B * N)
    blocks = np.frombuffer(data, np.uint8).reshape(B, N)
    lens = np.full(B, N, np.int32)
    comp, cl64 = native.lz4_compress_batch(blocks, lens)
    clens = cl64.astype(np.int64)
    cpad = comp[:, : (int(clens.max()) + 7) & ~7].copy()

    t0 = time.perf_counter()
    w8, p8, st8, _u = native.lz4_decode_wplan8_batch(
        cpad, clens.astype(np.int32), N)
    parse_s = time.perf_counter() - t0
    assert (st8 == N).all()
    j8 = (jnp.array(cpad), jnp.array(p8), jnp.array(w8),
          jnp.full(B, N, jnp.int32))
    g8 = jax.jit(lambda c, p, w, o: jnp.sum(
        jlz4._gather_wplan8(c, p, w, o)[:4, :4].astype(jnp.int32)))
    int(g8(*j8))
    s8 = timed(lambda: int(g8(*j8)))
    o8 = np.asarray(jlz4._gather_wplan8(*j8))
    assert o8[0].tobytes() == blocks[0].tobytes()
    assert o8[B - 1].tobytes() == blocks[B - 1].tobytes()
    gather = B * N / s8
    parse = B * N / parse_s
    print(json.dumps({"B": B, "gather_MBps": round(gather / 1e6, 1),
                      "parse_MBps": round(parse / 1e6, 1),
                      "combined_MBps": round(
                          1.0 / (1.0 / gather + 1.0 / parse) / 1e6, 1)}),
          flush=True)
