"""Round-2 micro-benchmarks, part 2: the exact access patterns the new
ari-decode prepack, BWT batched sort, and BWT multi-walker inverse use."""

import json
import sys
import time


def emit(d):
    print(json.dumps(d), flush=True)


def timed(fn, iters=3):
    fn()
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

    key = random.PRNGKey(0)

    # 1. monotone per-lane 2D scatter (ari packed-encode compaction shape)
    CAP, L = 1 << 17, 128
    n = CAP * L

    @jax.jit
    def mono_scatter(k):
        vals = random.randint(k, (CAP, L), 0, 255, jnp.int32)
        # per-lane monotone destinations (roughly 0.6x compaction)
        keep = random.uniform(jax.random.fold_in(k, 1), (CAP, L)) < 0.6
        pos = jnp.cumsum(keep.astype(jnp.int32), axis=0) - 1
        flat = jnp.where(keep, pos * L
                         + jnp.arange(L, dtype=jnp.int32)[None, :], n)
        out = jnp.zeros(n, jnp.int32).at[flat.reshape(-1)].set(
            vals.reshape(-1), mode="drop")
        return jnp.sum(out[:64])

    s = timed(lambda: int(mono_scatter(key)))
    emit({"op": "scatter_monotone_2d", "n": n, "meps": round(n / s / 1e6, 1)})

    # 2. prepack-shaped word gather: (NC*(C+1), L) from (CAP, L), per-lane
    #    monotone chunk starts
    C, NC = 64, 1024
    W = C + 1
    ne = NC * W * L

    @jax.jit
    def prepack_gather(k):
        src = random.randint(k, (CAP, L), 0, 2 ** 31 - 1, jnp.int32)
        rate = random.uniform(jax.random.fold_in(k, 1), (NC, L)) * 60.0
        starts = jnp.cumsum(rate.astype(jnp.int32), axis=0)
        idx = (starts[:, None, :]
               + jnp.arange(W, dtype=jnp.int32)[None, :, None])
        idx = jnp.clip(idx, 0, CAP - 1).reshape(NC * W, L)
        out = jnp.take_along_axis(src, idx, axis=0)
        return jnp.sum(out[:8])

    s = timed(lambda: int(prepack_gather(key)))
    emit({"op": "prepack_word_gather", "n": ne, "meps": round(ne / s / 1e6, 1)})

    # 3. batched per-block sort along axis 1: (B, N) keys+values
    for B, N in ((128, 1 << 16), (32, 1 << 16)):
        @jax.jit
        def bsort(k):
            keys = random.randint(k, (B, N), 0, 2 ** 31 - 1, jnp.int32)
            v = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
            k2, v2 = lax.sort([keys, v], dimension=1, num_keys=1)
            return jnp.sum(v2[:, :4])

        s = timed(lambda: int(bsort(key)))
        nk = B * N
        emit({"op": "sort_batched_axis1", "B": B, "N": N,
              "mkps": round(nk / s / 1e6, 1)})

    # 4. in-loop walker gather (BWT LF-walk shape): per-iteration cost of a
    #    (B, K) gather from (B, N) inside fori_loop
    B, N, K, iters_in = 128, 1 << 16, 4, 4096

    @jax.jit
    def walk(k):
        nxt = random.randint(k, (B, N), 0, N, jnp.int32)

        def body(i, p):
            return jnp.take_along_axis(nxt, p, axis=1)

        p0 = random.randint(jax.random.fold_in(k, 1), (B, K), 0, N, jnp.int32)
        pf = lax.fori_loop(0, iters_in, body, p0)
        return jnp.sum(pf)

    s = timed(lambda: int(walk(key)))
    emit({"op": "walk_gather_loop", "iters": iters_in, "B": B, "K": K,
          "us_per_iter": round(s / iters_in * 1e6, 2)})

    # 5. doubling-round gather: full (B, N) take_along_axis, one round
    @jax.jit
    def dbl(k):
        nxt = random.randint(k, (B, N), 0, N, jnp.int32)
        n2 = jnp.take_along_axis(nxt, nxt, axis=1)
        return jnp.sum(n2[:, :8])

    s = timed(lambda: int(dbl(key)))
    emit({"op": "doubling_gather", "n": B * N,
          "meps": round(B * N / s / 1e6, 1)})


if __name__ == "__main__":
    sys.exit(main())
