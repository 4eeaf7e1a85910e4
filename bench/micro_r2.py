"""Round-2 design micro-benchmarks on the real chip.

Measures the primitives the round-2 designs hinge on:
  0. host<->device transfer bandwidth through the tunnel (small sizes FIRST
     -- uploads are slow; everything else generates data on device)
  1. bulk XLA gather / scatter throughput (elements/s) at plan-decode sizes
  2. lax.sort / sort_key_val throughput (keys/s) at BWT block sizes

Timing per environment rules: scalar-reduction fetch, data device-resident,
persistent compile cache.  Prints one JSON object per measurement (flush)
so a hung stage still leaves the earlier numbers on disk.
"""

import json
import sys
import time

import numpy as np


def emit(d):
    print(json.dumps(d), flush=True)


def timed(fn, iters=3):
    fn()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax, random

    dev = jax.devices()[0]
    emit({"platform": dev.platform, "device": str(dev)})

    ssum = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))

    # ---------------- transfer bandwidth (tiny first)
    for kb in (64, 1024):
        arr = np.zeros(kb << 10, np.uint8)
        t0 = time.perf_counter()
        d = jax.device_put(arr)
        int(ssum(d))
        up = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = np.asarray(d)
        down = time.perf_counter() - t0
        emit({"op": "transfer", "kb": kb,
              "up_MBps": round(kb / 1024 / up, 3),
              "down_MBps": round(kb / 1024 / down, 3)})

    # ---------------- on-device data
    key = random.PRNGKey(0)

    # ---------------- bulk gather, random u8 / i32
    n = 1 << 22

    @jax.jit
    def gather_u8(k):
        src = random.randint(k, (n,), 0, 256, jnp.int32).astype(jnp.uint8)
        idx = random.randint(jax.random.fold_in(k, 1), (n,), 0, n, jnp.int32)
        return jnp.sum(src[idx].astype(jnp.int32))

    s = timed(lambda: int(gather_u8(key)))
    emit({"op": "gather_u8_random+gen", "n": n,
          "meps": round(n / s / 1e6, 1)})

    @jax.jit
    def gen_only(k):
        src = random.randint(k, (n,), 0, 256, jnp.int32).astype(jnp.uint8)
        idx = random.randint(jax.random.fold_in(k, 1), (n,), 0, n, jnp.int32)
        return jnp.sum(src.astype(jnp.int32)) + jnp.sum(idx)

    s0 = timed(lambda: int(gen_only(key)))
    emit({"op": "gen_only", "n": n, "s": round(s0, 4),
          "gather_net_meps": round(n / max(s - s0, 1e-9) / 1e6, 1)})

    # windowed gather (ari decode pre-pass shape): (NC,W,L) from (CAP,L)
    CAP, L, W, NC = 1 << 17, 128, 516, 512

    @jax.jit
    def windowed(k):
        src2 = random.randint(k, (CAP, L), 0, 255, jnp.int32)
        st = (jnp.arange(NC, dtype=jnp.int32)[:, None]
              * ((CAP - W) // NC)) + jnp.zeros((1, L), jnp.int32)
        ii = st[:, None, :] + jnp.arange(W, dtype=jnp.int32)[None, :, None]
        g = jnp.take_along_axis(src2[None], ii.reshape(1, NC * W, L), axis=1)
        return jnp.sum(g)

    s = timed(lambda: int(windowed(key)))
    ne = NC * W * L
    emit({"op": "gather_i32_windowed+gen", "n": ne,
          "meps": round(ne / s / 1e6, 1)})

    # ---------------- bulk scatter
    @jax.jit
    def scat(k):
        vals = random.randint(k, (n,), 0, 256, jnp.int32).astype(jnp.uint8)
        idx = random.permutation(jax.random.fold_in(k, 2),
                                 jnp.arange(n, dtype=jnp.int32))
        out = jnp.zeros(n, jnp.uint8).at[idx].set(vals, mode="drop")
        return jnp.sum(out.astype(jnp.int32))

    s = timed(lambda: int(scat(key)))
    emit({"op": "scatter_u8_random+gen", "n": n,
          "meps": round(n / s / 1e6, 1)})

    # ---------------- lax.sort at BWT sizes
    for nn in (1 << 16, 1 << 20, 1 << 23):
        @jax.jit
        def srt(k):
            keys = random.randint(k, (nn,), 0, 2 ** 31 - 1, jnp.int32)
            v = jnp.arange(nn, dtype=jnp.int32)
            k2, v2 = lax.sort([keys, v], num_keys=1)
            return jnp.sum(v2[:16])

        s = timed(lambda: int(srt(key)))
        emit({"op": "sort_kv_i32", "n": nn, "mkps": round(nn / s / 1e6, 1)})

    nn = 1 << 20

    @jax.jit
    def srt2(k):
        a = random.randint(k, (nn,), 0, 2 ** 31 - 1, jnp.int32)
        b = random.randint(jax.random.fold_in(k, 1), (nn,), 0, 2 ** 31 - 1,
                           jnp.int32)
        v = jnp.arange(nn, dtype=jnp.int32)
        r = lax.sort([a, b, v], num_keys=2)
        return jnp.sum(r[2][:16])

    s = timed(lambda: int(srt2(key)))
    emit({"op": "sort_2key_i32", "n": nn, "mkps": round(nn / s / 1e6, 1)})


if __name__ == "__main__":
    sys.exit(main())
