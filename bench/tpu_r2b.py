"""Round-2 TPU bench, part B: decode-kernel matmul variant, fast BWT
paths, LZ4 planned decode phases, deflate phase split."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emit(d):
    print(json.dumps(d), flush=True)


def timed(fn, iters=3):
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

    from tpuzip.codecs import ari as jari, bwt as jbwt, lz4 as jlz4
    from tpuzip.kernels import range_coder as rc, range_decoder as rd
    from tpuzip.oracle import ari as oari

    emit({"platform": jax.devices()[0].platform})
    B, N = 128, 1 << 16
    data = make_corpus(N * B)
    blocks = np.frombuffer(data, np.uint8).reshape(B, N)
    jb = jnp.array(blocks)
    jl = jnp.full(B, N, jnp.int32)

    # ---------------- ari decode with split-dot kernel
    x = jnp.array(blocks.T)
    streams, slens, deltas = rc.ari_encode_lanes_packed_indexed(x, jl)
    d2 = np.asarray(deltas).T
    cap2 = jari.encode_cap(N)
    st2 = np.asarray(streams)[:, :cap2]
    slens_np = np.asarray(slens)
    # correctness first
    out = np.asarray(rd.ari_decode_batch_kernel(jnp.array(st2), d2, jl, N))
    ok = all(out[i].tobytes() == blocks[i].tobytes() for i in (0, 13, 127))
    emit({"stage": "split-dot decoder bit-exact", "ok": ok})
    if not ok:
        return 1
    # oracle spot-check lane 0
    assert st2[0, :slens_np[0]].tobytes() == oari.encode_bytes(
        blocks[0].tobytes())

    w = rd.window_words(int(d2.max()))
    comp_d = jnp.zeros((cap2, rd.LANES), jnp.uint8).at[:, :B].set(
        jnp.array(st2.T))
    dT = jnp.array(d2.T)
    starts = 4 + jnp.cumsum(dT, axis=0) - dT
    cu = jnp.array(st2[:, :4].astype(np.uint32))
    code0 = (cu[:, 0] << 24) | (cu[:, 1] << 16) | (cu[:, 2] << 8) | cu[:, 3]
    windows = rd.build_windows(comp_d, starts, w)
    dec_sync = jax.jit(lambda wi, c0, l: jnp.sum(
        rd.ari_decode_lanes(wi, c0, l, w=w)[:8, :8].astype(jnp.int32)))
    int(dec_sync(windows, code0, jl))
    s = timed(lambda: int(dec_sync(windows, code0, jl)))
    emit({"bench": "ari_decode_kernel_splitdot", "MBps":
          round(N * B / s / 1e6, 1)})

    # ---------------- fast BWT forward/inverse at (128, 64K)
    enc_sync = jax.jit(lambda b_, l: jnp.sum(
        jbwt.encode_batch_fast(b_, l)[0][:4, :4].astype(jnp.int32)))
    int(enc_sync(jb, jl))
    s = timed(lambda: int(enc_sync(jb, jl)))
    emit({"bench": "bwt_encode_batch_fast", "MBps":
          round(N * B / s / 1e6, 1)})

    L, orgs = jbwt.encode_batch_fast(jb, jl)
    for r in (0, 1, 2, 3):
        dec_b = jax.jit(lambda L_, o, l: jnp.sum(
            jbwt.decode_batch_fast(L_, o, l, walkers_log2=r)[:4, :4]
            .astype(jnp.int32)))
        int(dec_b(L, orgs, jl))
        s = timed(lambda: int(dec_b(L, orgs, jl)))
        emit({"bench": "bwt_decode_batch_fast", "r": r, "MBps":
              round(N * B / s / 1e6, 1)})
    # correctness on chip
    outb = np.asarray(jbwt.decode_batch_fast(L, orgs, jl, walkers_log2=2))
    emit({"stage": "bwt fast roundtrip on chip", "ok":
          bool((outb == blocks).all())})

    # ---------------- LZ4 planned decode phases
    from tpuzip.runtime import native

    Bl = 32
    jb32, jl32 = jnp.array(blocks[:Bl]), jnp.full(Bl, N, jnp.int32)
    comp, clens = jax.jit(jlz4.encode_batch)(jb32, jl32)
    comp_np = np.asarray(comp)
    clens_np = np.asarray(clens)
    t0 = time.perf_counter()
    plans = np.zeros((Bl, N), np.int32)
    for i in range(Bl):
        p = native.lz4_decode_plan(comp_np[i, :clens_np[i]].tobytes(), N)
        plans[i, :len(p)] = p
    host_s = time.perf_counter() - t0
    emit({"bench": "lz4_plan_host_parse", "MBps":
          round(N * Bl / host_s / 1e6, 1)})
    jplans = jnp.array(plans)
    jcomp = jnp.array(comp_np)
    olens = jnp.full(Bl, N, jnp.int32)
    g_sync = jax.jit(lambda c, p, o: jnp.sum(
        jlz4._gather_plan(c, p, o)[:4, :4].astype(jnp.int32)))
    int(g_sync(jcomp, jplans, olens))
    s = timed(lambda: int(g_sync(jcomp, jplans, olens)))
    emit({"bench": "lz4_plan_device_gather", "MBps":
          round(N * Bl / s / 1e6, 1)})

    # ---------------- deflate phases (16 x 64K)
    from tpuzip.codecs import deflate as jdef

    Bd = 16
    jbd, jld = jnp.array(blocks[:Bd]), jnp.full(Bd, N, jnp.int32)
    t0 = time.perf_counter()
    r1 = jdef._lz77_stage_vmap(jbd, jld)
    jax.block_until_ready(r1)
    int(jnp.sum(r1[2][:, :4]).astype(jnp.int32))
    lz77_s = time.perf_counter() - t0
    emit({"bench": "deflate_lz77_stage", "MBps":
          round(N * Bd / lz77_s / 1e6, 1)})
    t0 = time.perf_counter()
    comp_d, clens_d = jdef.deflate_batch(jbd, jld)
    cl = np.asarray(clens_d)
    total_s = time.perf_counter() - t0
    emit({"bench": "deflate_batch_total", "MBps":
          round(N * Bd / total_s / 1e6, 1)})
    t0 = time.perf_counter()
    outs, olens_d = jdef.inflate_batch(comp_d, clens_d, N)
    inf_s = time.perf_counter() - t0
    emit({"bench": "inflate_batch_total", "MBps":
          round(N * Bd / inf_s / 1e6, 1)})
    ok = (outs[:2] == blocks[:2]).all()
    emit({"stage": "deflate roundtrip", "ok": bool(ok)})


if __name__ == "__main__":
    sys.exit(main())
