"""Round-4 A/B: wplan8 vs wplan16 device gather at the production slice
width (B=256), with the run-based parse rates alongside.  The serving
combined metric is serial parse+gather; the gather is now the binding
side (391-413 MB/s), and wplan16 halves its row count."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from bench import make_corpus, timed_host
from tpuzip.codecs import lz4 as jlz4
from tpuzip.runtime import native

B, N = 256, 1 << 16
data = make_corpus(B * N)
blocks = np.frombuffer(data, np.uint8).reshape(B, N)
lens = np.full(B, N, np.int32)
comp, cl64 = native.lz4_compress_batch(blocks, lens)
clens = cl64.astype(np.int32)
cpad = comp[:, : (int(cl64.max()) + 3) & ~3].copy()
jo = jnp.full(B, N, jnp.int32)


def timed(fn, iters=3):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


for name, parse, gather in (
        ("wplan8", native.lz4_decode_wplan8_batch, jlz4._gather_wplan8),
        ("wplan16", native.lz4_decode_wplan16_batch, jlz4._gather_wplan16)):
    wp, pt, st, used = parse(cpad, clens, N)
    parse_s = timed_host(lambda p=parse: p(cpad, clens, N))
    j = (jnp.array(cpad), jnp.array(pt), jnp.array(wp), jo)
    g = jax.jit(lambda c, p, w, o, _g=gather: jnp.sum(
        _g(c, p, w, o)[:4, :4].astype(jnp.int32)))
    int(g(*j))
    s = timed(lambda: int(g(*j)))
    out = np.asarray(gather(*j))
    assert out[0].tobytes() == blocks[0].tobytes()
    assert out[B - 1].tobytes() == blocks[B - 1].tobytes()
    gr = B * N / s
    pr = B * N / parse_s
    print(json.dumps({
        "plan": name, "B": B,
        "gather_MBps": round(gr / 1e6, 1),
        "parse_MBps": round(pr / 1e6, 1),
        "combined_MBps": round(1.0 / (1.0 / gr + 1.0 / pr) / 1e6, 1),
        "patch_frac": round(float(used.sum()) / (B * N), 3)}), flush=True)
