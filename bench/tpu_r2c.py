"""TPU probe: deflate loop cost (single vs vmap), optimized BWT forward,
segmented big-block bwt roundtrip."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emit(d):
    print(json.dumps(d), flush=True)


def timed(fn, iters=2):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def make_corpus(nbytes: int, seed=0xBEEF) -> bytes:
    rng = np.random.default_rng(seed)
    words = [b"the", b"quick", b"brown", b"fox", b"jumps", b"over", b"lazy",
             b"dog", b"compression", b"pipeline", b"tensor", b"block",
             b"stream", b"entropy", b"huffman", b"suffix"]
    out = bytearray()
    while len(out) < nbytes:
        out += words[int(rng.integers(len(words)))] + b" "
        if rng.integers(12) == 0:
            out += b"\n"
    return bytes(out[:nbytes])


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpuzip.codecs import bwt as jbwt, deflate as jdef

    emit({"platform": jax.devices()[0].platform})
    N = 1 << 16
    data = make_corpus(N * 8)
    blocks = np.frombuffer(data, np.uint8).reshape(8, N)

    # ---------------- deflate lz77_stage: single vs vmap4
    jb1, jl1 = jnp.array(blocks[0]), jnp.int32(N)
    f1 = jax.jit(lambda b_, l: jdef.lz77_stage(b_, l)[4].sum())
    s = timed(lambda: int(f1(jb1, jl1)))
    emit({"bench": "lz77_stage_single", "s": round(s, 3),
          "MBps": round(N / s / 1e6, 2)})
    jb4, jl4 = jnp.array(blocks[:4]), jnp.full(4, N, jnp.int32)
    f4 = jax.jit(lambda b_, l: jax.vmap(jdef.lz77_stage)(b_, l)[4].sum())
    s = timed(lambda: int(f4(jb4, jl4)))
    emit({"bench": "lz77_stage_vmap4", "s": round(s, 3),
          "MBps": round(4 * N / s / 1e6, 2)})

    # ---------------- deflate decode kernel: single vs vmap4
    comp1, cl1 = jdef.deflate_batch(jnp.array(blocks[:1]),
                                    jnp.full(1, N, jnp.int32))
    comp4, cl4 = jdef.deflate_batch(jnp.array(blocks[:4]),
                                    jnp.full(4, N, jnp.int32))
    t0 = time.perf_counter()
    o, ol = jdef.inflate_batch(comp1, cl1, N)
    s1 = time.perf_counter() - t0
    assert o[0].tobytes() == blocks[0].tobytes()
    emit({"bench": "inflate_single", "s": round(s1, 3),
          "MBps": round(N / s1 / 1e6, 2)})
    t0 = time.perf_counter()
    o, ol = jdef.inflate_batch(comp4, cl4, N)
    s4 = time.perf_counter() - t0
    emit({"bench": "inflate_vmap4", "s": round(s4, 3),
          "MBps": round(4 * N / s4 / 1e6, 2)})

    # ---------------- optimized BWT forward (roll + sort-invert)
    B2 = 128
    data2 = make_corpus(N * B2)
    jb = jnp.array(np.frombuffer(data2, np.uint8).reshape(B2, N))
    jl = jnp.full(B2, N, jnp.int32)
    enc_sync = jax.jit(lambda b_, l: jnp.sum(
        jbwt._encode_batch_fast(b_, l, True)[0][:4, :4].astype(jnp.int32)))
    int(enc_sync(jb, jl))
    s = timed(lambda: int(enc_sync(jb, jl)))
    emit({"bench": "bwt_encode_fast_v2", "MBps":
          round(N * B2 / s / 1e6, 1)})

    # ---------------- segmented big-block bwt (config 4 shape, 8 MiB blk)
    from tpuzip.dist import runner

    big = make_corpus(8 << 20, seed=99)
    t0 = time.perf_counter()
    c = runner.compress(big, codec="bwt", block_size=8 << 20)
    enc_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = runner.decompress(c)
    dec_s = time.perf_counter() - t0
    emit({"bench": "bwt_segmented_8MiB_block", "ok": out == big,
          "ratio": round(len(c) / len(big), 4),
          "enc_MBps": round(len(big) / enc_s / 1e6, 1),
          "dec_MBps": round(len(big) / dec_s / 1e6, 1)})


if __name__ == "__main__":
    sys.exit(main())
