"""TPU probe D: v2 ari decoder A/B, flat vs batched plan gather, and the
config-4 100 MB single-block BWT job."""

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

    from tpuzip.codecs import ari as jari, lz4 as jlz4
    from tpuzip.kernels import range_coder as rc, range_decoder as rd

    emit({"platform": jax.devices()[0].platform})
    B, N = 128, 1 << 16
    data = make_corpus(N * B)
    blocks = np.frombuffer(data, np.uint8).reshape(B, N)
    jl = jnp.full(B, N, jnp.int32)

    # ---------------- ari v2 decoder: correctness then speed
    x = jnp.array(blocks.T)
    streams, slens, deltas = rc.ari_encode_lanes_packed_indexed(x, jl)
    d2 = np.asarray(deltas).T
    cap2 = jari.encode_cap(N)
    st2 = np.asarray(streams)[:, :cap2]
    # mixed-content correctness batch (reuse st2 text + add random block)
    out = np.asarray(rd.ari_decode_batch_kernel(jnp.array(st2), d2, jl, N))
    ok = all(out[i].tobytes() == blocks[i].tobytes()
             for i in (0, 3, 77, 127))
    emit({"stage": "v2 cum decoder bit-exact (text)", "ok": ok})
    if not ok:
        return 1
    rng = np.random.default_rng(5)
    mixed = np.zeros((B, N), np.uint8)
    for i in range(B):
        if i % 3 == 0:
            mixed[i] = rng.integers(0, 256, N, dtype=np.uint8)
        elif i % 3 == 1:
            mixed[i] = blocks[i]
        else:
            mixed[i] = rng.integers(0, 6, N, dtype=np.uint8)
    xm = jnp.array(mixed.T)
    s2, sl2, dl2 = rc.ari_encode_lanes_packed_indexed(xm, jl)
    d2m = np.asarray(dl2).T
    st2m = np.asarray(s2)[:, :cap2]
    outm = np.asarray(rd.ari_decode_batch_kernel(jnp.array(st2m), d2m,
                                                 jl, N))
    okm = all(outm[i].tobytes() == mixed[i].tobytes() for i in range(B))
    emit({"stage": "v2 cum decoder bit-exact (mixed all lanes)", "ok": okm})
    if not okm:
        bad = [i for i in range(B)
               if outm[i].tobytes() != mixed[i].tobytes()]
        emit({"bad_lanes": bad[:8]})
        return 1

    for algo in ("cum", "dot"):
        w = rd.window_words(int(d2m.max()))
        comp_d = jnp.zeros((cap2, rd.LANES), jnp.uint8).at[:, :B].set(
            jnp.array(st2m.T))
        dT = jnp.array(d2m.T)
        starts = 4 + jnp.cumsum(dT, axis=0) - dT
        cu = jnp.array(st2m[:, :4].astype(np.uint32))
        code0 = ((cu[:, 0] << 24) | (cu[:, 1] << 16) | (cu[:, 2] << 8)
                 | cu[:, 3])
        f = jax.jit(lambda c, s_, c0, l: jnp.sum(rd.ari_decode_lanes(
            rd.build_windows(c, s_, w), c0, l, w=w,
            algo=algo)[:8, :8].astype(jnp.int32)), static_argnames=())
        int(f(comp_d, starts, code0, jl))
        s = timed(lambda: int(f(comp_d, starts, code0, jl)))
        emit({"bench": f"ari_decode_{algo}", "w": w,
              "MBps": round(N * B / s / 1e6, 1)})

    # ---------------- lz4 plan gather: batched vs flat
    Bl = 32
    comp, clens = jax.jit(jlz4.encode_batch)(
        jnp.array(blocks[:Bl]), jnp.full(Bl, N, jnp.int32))
    comp_np, clens_np = np.asarray(comp), np.asarray(clens)
    from tpuzip.runtime import native

    plans = np.zeros((Bl, N), np.int32)
    for i in range(Bl):
        p = native.lz4_decode_plan(comp_np[i, :clens_np[i]].tobytes(), N)
        plans[i, :len(p)] = p
    jplans = jnp.array(plans)
    jcomp = jnp.array(comp_np)
    olens = jnp.full(Bl, N, jnp.int32)

    g1 = jax.jit(lambda c, p, o: jnp.sum(
        jlz4._gather_plan(c, p, o)[:4, :4].astype(jnp.int32)))
    int(g1(jcomp, jplans, olens))
    s = timed(lambda: int(g1(jcomp, jplans, olens)))
    emit({"bench": "plan_gather_batched", "MBps":
          round(Bl * N / s / 1e6, 1)})

    cap = comp_np.shape[1]

    @jax.jit
    def g2(c, p):
        flat = c.reshape(-1)
        idx = (p + (jnp.arange(Bl, dtype=jnp.int32) * cap)[:, None]
               ).reshape(-1)
        return jnp.sum(flat[idx][:64].astype(jnp.int32))

    int(g2(jcomp, jplans))
    s = timed(lambda: int(g2(jcomp, jplans)))
    emit({"bench": "plan_gather_flat", "MBps":
          round(Bl * N / s / 1e6, 1)})

    # ---------------- config 4: 100 MB single-block BWT job
    from tpuzip.dist import runner

    big = make_corpus(100 << 20, seed=77)
    t0 = time.perf_counter()
    c = runner.compress(big, codec="bwt", block_size=100 << 20)
    enc_s = time.perf_counter() - t0
    emit({"stage": "100MB block compressed", "s": round(enc_s, 1),
          "ratio": round(len(c) / len(big), 4)})
    t0 = time.perf_counter()
    out = runner.decompress(c)
    dec_s = time.perf_counter() - t0
    emit({"bench": "bwt_100MB_single_block", "ok": out == big,
          "enc_MBps": round(len(big) / enc_s / 1e6, 1),
          "dec_MBps": round(len(big) / dec_s / 1e6, 1)})


def quick_bwt():
    """Re-measure the BWT forward after the h=6 + fused-final-sort tweaks."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpuzip.codecs import bwt as jbwt

    B, N = 128, 1 << 16
    data = make_corpus(N * B)
    jb = jnp.array(np.frombuffer(data, np.uint8).reshape(B, N))
    jl = jnp.full(B, N, jnp.int32)
    f = jax.jit(lambda b_, l: jnp.sum(
        jbwt._encode_batch_fast(b_, l, True)[0][:4, :4].astype(jnp.int32)))
    int(f(jb, jl))
    s = timed(lambda: int(f(jb, jl)))
    emit({"bench": "bwt_encode_fast_v3", "MBps": round(N * B / s / 1e6, 1)})
    # correctness spot check on chip vs oracle
    from tpuzip.oracle import bwt as obwt

    L, orgs = jbwt.encode_batch_fast(jb, jl)
    L0 = np.asarray(L[0])
    expL, expo = obwt.encode_block(bytes(np.asarray(jb[0])))
    emit({"stage": "v3 fwd bit-exact", "ok":
          L0.tobytes() == expL and int(orgs[0]) == expo})


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "bwt":
        sys.exit(quick_bwt())
    sys.exit(main())
