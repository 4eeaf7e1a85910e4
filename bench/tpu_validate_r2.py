"""Round-2 TPU validation + throughput: ari decode kernel, staged
pipelines, and the BWT-redesign micro numbers.  JSON per line, flushed."""

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

    from tpuzip.codecs import ari as jari
    from tpuzip.kernels import range_coder as rc, range_decoder as rd
    from tpuzip.oracle import ari as oari

    emit({"platform": jax.devices()[0].platform})

    # ---------------- 1. bit-exactness: kernel decode vs oracle, 128 lanes
    N = 1 << 14  # 16 KiB blocks keep oracle encode time sane
    B = 128
    rng = np.random.default_rng(3)
    text = make_corpus(N * B // 2)
    blocks = np.zeros((B, N), np.uint8)
    lens = np.full(B, N, np.int32)
    for i in range(B):
        if i % 4 == 0:
            blocks[i] = rng.integers(0, 256, N, dtype=np.uint8)  # random
        elif i % 4 == 1:
            blocks[i] = np.frombuffer(
                text[(i * N // 2) % (len(text) - N): ][:N], np.uint8)
        elif i % 4 == 2:
            blocks[i] = rng.integers(0, 8, N, dtype=np.uint8)    # skewed
        else:
            ln = int(rng.integers(1, N))
            blocks[i, :ln] = rng.integers(0, 256, ln, dtype=np.uint8)
            lens[i] = ln

    # encode on device with index
    x = jnp.array(blocks.T)
    jlens = jnp.array(lens)
    streams, slens, deltas = rc.ari_encode_lanes_packed_indexed(x, jlens)
    streams_np = np.asarray(streams)
    slens_np = np.asarray(slens)
    deltas_np = np.asarray(deltas).T  # (B, NC)
    emit({"stage": "encode_indexed done",
          "max_delta": int(deltas_np.max())})

    # spot-check encoder vs oracle (kernel was proven round 1; cheap check)
    for i in (0, 1, 127):
        exp = oari.encode_bytes(blocks[i, :lens[i]].tobytes())
        got = streams_np[i, :slens_np[i]].tobytes()
        assert got == exp, f"encoder mismatch lane {i}"
    emit({"stage": "encoder bit-exact vs oracle", "ok": True})

    # decode via the Pallas kernel
    cap = jari.encode_cap(N)
    st = np.zeros((B, cap), np.uint8)
    for i in range(B):
        st[i, : slens_np[i]] = streams_np[i, : slens_np[i]]
    out = np.asarray(rd.ari_decode_batch_kernel(
        jnp.array(st), deltas_np, jlens, N))
    bad = []
    for i in range(B):
        if out[i, :lens[i]].tobytes() != blocks[i, :lens[i]].tobytes():
            bad.append(i)
    emit({"stage": "DECODER bit-exact vs input", "ok": not bad,
          "bad_lanes": bad[:8]})
    if bad:
        i = bad[0]
        g = out[i, :lens[i]]
        e = blocks[i, :lens[i]]
        j = int(np.nonzero(g != e)[0][0])
        emit({"first_mismatch": {"lane": i, "pos": j,
                                 "got": g[max(0, j - 2):j + 3].tolist(),
                                 "exp": e[max(0, j - 2):j + 3].tolist()}})
        return 1

    # ---------------- 2. throughput: decode kernel (64 KiB blocks)
    N2 = 1 << 16
    data2 = make_corpus(N2 * B)
    blocks2 = np.frombuffer(data2, np.uint8).reshape(B, N2)
    jl2 = jnp.full(B, N2, jnp.int32)
    x2 = jnp.array(blocks2.T)
    enc_sync = jax.jit(lambda a, b_: jnp.sum(
        rc.ari_encode_lanes_packed_indexed(a, b_)[1]))
    int(enc_sync(x2, jl2))
    s = timed(lambda: int(enc_sync(x2, jl2)))
    emit({"bench": "ari_encode_packed_indexed", "MBps":
          round(N2 * B / s / 1e6, 1)})

    streams2, slens2, deltas2 = rc.ari_encode_lanes_packed_indexed(x2, jl2)
    d2 = np.asarray(deltas2).T
    cap2 = jari.encode_cap(N2)
    st2 = np.asarray(streams2)[:, :cap2]
    # device-resident pieces for the kernel-only measurement
    w = rd.window_words(int(d2.max()))
    comp_d = jnp.zeros((cap2, rd.LANES), jnp.uint8).at[:, :B].set(
        jnp.array(st2.T))
    dT = jnp.array(d2.T)
    starts = 4 + jnp.cumsum(dT, axis=0) - dT
    cu = jnp.array(st2[:, :4].astype(np.uint32))
    code0 = (cu[:, 0] << 24) | (cu[:, 1] << 16) | (cu[:, 2] << 8) | cu[:, 3]

    prep_sync = jax.jit(
        lambda c, s_: jnp.sum(rd.build_windows(c, s_, w)[:4, :4]),
        static_argnames=())
    int(prep_sync(comp_d, starts))
    s_prep = timed(lambda: int(prep_sync(comp_d, starts)))
    emit({"bench": "decode_prepack_only", "w": w,
          "MBps": round(N2 * B / s_prep / 1e6, 1)})

    windows = rd.build_windows(comp_d, starts, w)
    dec_sync = jax.jit(
        lambda wi, c0, l: jnp.sum(
            rd.ari_decode_lanes(wi, c0, l, w=w)[:8, :8].astype(jnp.int32)),
        static_argnames=())
    int(dec_sync(windows, code0, jl2))
    s_kern = timed(lambda: int(dec_sync(windows, code0, jl2)))
    emit({"bench": "ari_decode_kernel_only", "MBps":
          round(N2 * B / s_kern / 1e6, 1)})

    both = jax.jit(lambda c, s_, c0, l: jnp.sum(rd.ari_decode_lanes(
        rd.build_windows(c, s_, w), c0, l, w=w)[:8, :8].astype(jnp.int32)))
    int(both(comp_d, starts, code0, jl2))
    s_both = timed(lambda: int(both(comp_d, starts, code0, jl2)))
    emit({"bench": "ari_decode_prepack+kernel", "MBps":
          round(N2 * B / s_both / 1e6, 1)})

    # quick correctness at this size too (block 0)
    out2 = np.asarray(rd.ari_decode_batch_kernel(
        jnp.array(st2), d2, jl2, N2))
    assert (out2[0] == blocks2[0]).all() and (out2[77] == blocks2[77]).all()
    emit({"stage": "64KiB decode spot-check", "ok": True})

    # ---------------- 3. BWT redesign numbers
    from jax import lax, random

    key = random.PRNGKey(0)
    Bs, Ns = 128, 1 << 16

    @jax.jit
    def bsort(k):
        keys = random.randint(k, (Bs, Ns), 0, 2 ** 31 - 1, jnp.int32)
        v = jnp.broadcast_to(jnp.arange(Ns, dtype=jnp.int32)[None],
                             (Bs, Ns))
        k2, v2 = lax.sort([keys, v], dimension=1, num_keys=1)
        return jnp.sum(v2[:, :4])

    s = timed(lambda: int(bsort(key)))
    emit({"bench": "sort_batched_axis1", "B": Bs, "N": Ns,
          "mkps": round(Bs * Ns / s / 1e6, 1)})

    @jax.jit
    def walk(k):
        nxt = random.randint(k, (Bs, Ns), 0, Ns, jnp.int32)

        def body(i, p):
            return jnp.take_along_axis(nxt, p, axis=1)

        p0 = random.randint(random.fold_in(k, 1), (Bs, 4), 0, Ns, jnp.int32)
        return jnp.sum(lax.fori_loop(0, 4096, body, p0))

    s = timed(lambda: int(walk(key)))
    emit({"bench": "walk_gather_loop", "us_per_iter":
          round(s / 4096 * 1e6, 2)})

    @jax.jit
    def dbl(k):
        nxt = random.randint(k, (Bs, Ns), 0, Ns, jnp.int32)
        return jnp.sum(jnp.take_along_axis(nxt, nxt, axis=1)[:, :8])

    s = timed(lambda: int(dbl(key)))
    emit({"bench": "doubling_gather", "meps":
          round(Bs * Ns / s / 1e6, 1)})


if __name__ == "__main__":
    sys.exit(main())
