"""A/B: LZ4 device gather — word plan (4 B/row) vs dword (8) vs quad (16).

Run on the real chip once the relay is up; flip runner.LZ4_DECODE_PLAN to
"wplan8" if the halved-row gather wins (expected ~350-400 vs 230 MB/s).
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from bench import make_corpus
from tpuzip.codecs import lz4 as jlz4
from tpuzip.runtime import native

B, N = 128, 1 << 16
data = make_corpus(B * N)
blocks = np.frombuffer(data, np.uint8).reshape(B, N)
lens = np.full(B, N, np.int32)
comp, cl64 = native.lz4_compress_batch(blocks, lens)
clens = cl64.astype(np.int64)
cpad = comp[:, : (int(clens.max()) + 3) & ~3].copy()


def timed(fn, iters=3):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


# word plan (current production)
w4, p4, st4, _ = native.lz4_decode_wplan_batch(cpad, clens.astype(np.int32), N)
j = (jnp.array(cpad), jnp.array(p4), jnp.array(w4), jnp.full(B, N, jnp.int32))
g4 = jax.jit(lambda c, p, w, o: jnp.sum(
    jlz4._gather_wplan(c, p, w, o)[:4, :4].astype(jnp.int32)))
int(g4(*j))
s4 = timed(lambda: int(g4(*j)))
o4 = np.asarray(jlz4._gather_wplan(*j))
assert o4[0].tobytes() == blocks[0].tobytes()
print(json.dumps({"plan": "wplan4", "gather_MBps": round(B * N / s4 / 1e6, 1),
                  "patch_frac": round(float(_.sum()) / (B * N), 3)}),
      flush=True)

# dword plan
w8, p8, st8, u8_ = native.lz4_decode_wplan8_batch(cpad, clens.astype(np.int32), N)
j8 = (jnp.array(cpad), jnp.array(p8), jnp.array(w8), jnp.full(B, N, jnp.int32))
g8 = jax.jit(lambda c, p, w, o: jnp.sum(
    jlz4._gather_wplan8(c, p, w, o)[:4, :4].astype(jnp.int32)))
int(g8(*j8))
s8 = timed(lambda: int(g8(*j8)))
o8 = np.asarray(jlz4._gather_wplan8(*j8))
assert o8[0].tobytes() == blocks[0].tobytes()
assert o8[B - 1].tobytes() == blocks[B - 1].tobytes()
print(json.dumps({"plan": "wplan8", "gather_MBps": round(B * N / s8 / 1e6, 1),
                  "patch_frac": round(float(u8_.sum()) / (B * N), 3)}),
      flush=True)

# quad-word plan (16 B/row — quarter the rows; round-3 candidate)
w16, p16, st16, u16_ = native.lz4_decode_wplan16_batch(
    cpad, clens.astype(np.int32), N)
j16 = (jnp.array(cpad), jnp.array(p16), jnp.array(w16),
       jnp.full(B, N, jnp.int32))
g16 = jax.jit(lambda c, p, w, o: jnp.sum(
    jlz4._gather_wplan16(c, p, w, o)[:4, :4].astype(jnp.int32)))
int(g16(*j16))
s16 = timed(lambda: int(g16(*j16)))
o16 = np.asarray(jlz4._gather_wplan16(*j16))
assert o16[0].tobytes() == blocks[0].tobytes()
assert o16[B - 1].tobytes() == blocks[B - 1].tobytes()
print(json.dumps({"plan": "wplan16",
                  "gather_MBps": round(B * N / s16 / 1e6, 1),
                  "patch_frac": round(float(u16_.sum()) / (B * N), 3)}),
      flush=True)

# wider batch sweep at the winning granularity would go here after the
# first chip read (B=256/512 amortize the gather's fixed cost further)
