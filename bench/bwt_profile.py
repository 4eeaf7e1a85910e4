"""Piece-wise chip profile of the packed BWT forward (way-8).

Times each component of _encode_batch_fast separately on the bench corpus
(128 x 64 KiB text): the 5-operand initial sort, one doubling-round body
(rolls + packs + 5-operand sort + rank reassign), the packed permutation
inversion, and counts how many while_loop rounds the corpus actually takes.
Decides where a Pallas sorter could possibly pay before anyone builds one.
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax import lax
from bench import make_corpus, timed

B, N = 128, 1 << 16
data = make_corpus(B * N)
blocks = np.frombuffer(data, np.uint8).reshape(B, N)
d = jnp.array(blocks).astype(jnp.int32)
idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))

res = {}


def cyc(k):
    return jnp.roll(d, -k, axis=1)


@jax.jit
def initial_sort(d_):
    keys = [(jnp.roll(d_, -(4 * j), axis=1).astype(jnp.uint32) << 24)
            | (jnp.roll(d_, -(4 * j + 1), axis=1).astype(jnp.uint32) << 16)
            | (jnp.roll(d_, -(4 * j + 2), axis=1).astype(jnp.uint32) << 8)
            | jnp.roll(d_, -(4 * j + 3), axis=1).astype(jnp.uint32)
            for j in range(4)]
    *ks, order = lax.sort(keys + [idx], dimension=1, num_keys=4,
                          is_stable=True)
    return ks[0][:4, :4].astype(jnp.int32).sum(), order


s, order0 = initial_sort(d)
res["initial_sort_ms"] = round(1e3 * timed(
    lambda: int(initial_sort(d)[0])), 1)

# a standalone packed inv_perm
rank_demo = jnp.remainder(idx * 7919, 1 << 16)


@jax.jit
def inv(o, v):
    pk = (o.astype(jnp.uint32) << 16) | v.astype(jnp.uint32)
    r = lax.sort(pk, dimension=1).astype(jnp.int32) & jnp.int32(0xFFFF)
    return r[:4, :4].sum(), r


int(inv(order0, rank_demo)[0])
res["inv_perm_ms"] = round(1e3 * timed(
    lambda: int(inv(order0, rank_demo)[0])), 1)


# one round body at way-8 (rolls + packs + 5-op sort + diff/cumsum + inv)
@jax.jit
def round_body(rank, k):
    ranks_at = [rank] + [jnp.roll(rank, -(k * j), axis=1)
                         for j in range(1, 8)]
    keys = [(ranks_at[2 * i].astype(jnp.uint32) << 16)
            | ranks_at[2 * i + 1].astype(jnp.uint32) for i in range(4)]
    *kr, order = lax.sort(keys + [idx], dimension=1, num_keys=4,
                          is_stable=True)
    diff = (kr[0][:, 1:] != kr[0][:, :-1])
    for kk in kr[1:]:
        diff = diff | (kk[:, 1:] != kk[:, :-1])
    changed = jnp.concatenate(
        [jnp.ones((B, 1), jnp.int32), diff.astype(jnp.int32)], axis=1)
    rs = jnp.cumsum(changed, axis=1) - 1
    pk = (order.astype(jnp.uint32) << 16) | rs.astype(jnp.uint32)
    nr = lax.sort(pk, dimension=1).astype(jnp.int32) & jnp.int32(0xFFFF)
    return nr[:4, :4].sum(), nr


int(round_body(rank_demo, 16)[0])
res["round_body_ms"] = round(1e3 * timed(
    lambda: int(round_body(rank_demo, 16)[0])), 1)

# how many rounds does the corpus take? replay the doubling eagerly
from tpuzip.codecs import bwt as jbwt  # noqa: E402

keys0 = [(cyc(4 * j).astype(jnp.uint32) << 24)
         | (cyc(4 * j + 1).astype(jnp.uint32) << 16)
         | (cyc(4 * j + 2).astype(jnp.uint32) << 8)
         | cyc(4 * j + 3).astype(jnp.uint32) for j in range(4)]
*ks0, o0 = lax.sort(keys0 + [idx], dimension=1, num_keys=4, is_stable=True)
diff0 = None
for kk in ks0:
    dd = (kk[:, 1:] != kk[:, :-1])
    diff0 = dd if diff0 is None else (diff0 | dd)
changed0 = jnp.concatenate([jnp.ones((B, 1), jnp.int32),
                            diff0.astype(jnp.int32)], axis=1)
rs0 = jnp.cumsum(changed0, axis=1) - 1
pk0 = (o0.astype(jnp.uint32) << 16) | rs0.astype(jnp.uint32)
rank = lax.sort(pk0, dimension=1).astype(jnp.int32) & jnp.int32(0xFFFF)


def uniq(rank):
    return bool(jnp.all(jnp.max(rank, axis=1) == (N - 1)))


k, rounds = 16, 0
while not uniq(rank) and k < N:
    _, rank = round_body(rank, k)
    k *= 8
    rounds += 1
res["rounds_taken_way8"] = rounds
res["context_at_exit"] = k

# full forward for reference
sync = jax.jit(lambda b_, l: jnp.sum(
    jbwt._encode_batch_fast(b_, l, all_full=True)[0][:8, :8]
    .astype(jnp.int32)))
jb = jnp.array(blocks)
jl = jnp.full(B, N, jnp.int32)
int(sync(jb, jl))
res["full_forward_ms"] = round(1e3 * timed(lambda: int(sync(jb, jl))), 1)
res["full_forward_MBps"] = round(B * N / (res["full_forward_ms"] / 1e3)
                                 / 1e6, 1)

print(json.dumps(res))
