"""Burrows–Wheeler transform — TPU formulation.

Format/semantics: tpuzip.oracle.bwt (cyclic-rotation BWT + origin; reference
parity src/bwt/mod.rs).

Forward: prefix doubling — ceil(log2 N) rounds of `lax.sort` over
(rank, rank-at-offset-k, index) triples.  This is the same algorithm the
oracle runs (numpy lexsort), so suffix arrays — and therefore L columns and
origins — agree exactly, including tied ranks on periodic inputs (stable
final sort breaks ties by index in both).

Inverse: counting sort (one stable sort) gives the LF "next" permutation;
the sequential n-step walk of the reference becomes log2(N) rounds of
pointer-doubling composition (orbit fill), fully parallel.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax


def encode_block(block: jnp.ndarray, length: jnp.ndarray
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (L (N,) u8, origin i32). Invalid lanes (>= length) sort last."""
    n = block.shape[0]
    length = jnp.asarray(length, jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < length
    big = jnp.int32(n + 1)
    rank = jnp.where(valid, block.astype(jnp.int32), big)
    safe_len = jnp.maximum(length, 1)

    rounds = max(int(math.ceil(math.log2(max(n, 2)))), 1)
    k = jnp.int32(1)
    for _ in range(rounds):
        second = jnp.where(valid, rank[(idx + k) % safe_len], big)
        _, _, order = lax.sort((rank, second, idx), num_keys=2, is_stable=True)
        key_r = rank[order]
        key_s = second[order]
        changed = jnp.concatenate([
            jnp.array([1], jnp.int32),
            ((key_r[1:] != key_r[:-1]) | (key_s[1:] != key_s[:-1])
             ).astype(jnp.int32)])
        ranks_sorted = jnp.cumsum(changed) - 1
        rank = jnp.zeros(n, jnp.int32).at[order].set(ranks_sorted)
        rank = jnp.where(valid, rank, big)
        k = k * 2

    # stable argsort of final ranks = suffix array (ties broken by index)
    _, sa = lax.sort((rank, idx), num_keys=1, is_stable=True)
    prev = (sa - 1) % safe_len
    L = jnp.where(jnp.arange(n) < length, block[prev], 0).astype(jnp.uint8)
    origin = jnp.where(length > 0, sa_zero_pos(sa, n), 0)
    return L, origin


def sa_zero_pos(sa: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.argmax((sa == 0).astype(jnp.int32)).astype(jnp.int32)


def decode_block(L: jnp.ndarray, origin: jnp.ndarray, length: jnp.ndarray
                 ) -> jnp.ndarray:
    """Inverse BWT: stable counting sort -> orbit fill by pointer doubling."""
    n = L.shape[0]
    length = jnp.asarray(length, jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < length
    key = jnp.where(valid, L.astype(jnp.int32), jnp.int32(256))
    _, order = lax.sort((key, idx), num_keys=1, is_stable=True)
    # orbit of `origin` under `order`: pos[t] = order^(t+1)(origin)
    pos = jnp.full(n, 0, jnp.int32).at[0].set(order[jnp.clip(origin, 0, n - 1)])
    step = order
    filled = 1
    rounds = max(int(math.ceil(math.log2(max(n, 2)))), 1)
    for _ in range(rounds):
        if filled >= n:
            break
        shifted = step[pos]                      # applies order^filled
        take_idx = jnp.arange(n, dtype=jnp.int32)
        write_pos = take_idx + filled
        pos = pos.at[jnp.where((take_idx < filled) & (write_pos < n),
                               write_pos, n)].set(shifted, mode="drop")
        step = step[step]
        filled *= 2
    out = jnp.where(valid, L[jnp.clip(pos, 0, n - 1)], 0)
    return out.astype(jnp.uint8)


encode_batch = jax.vmap(encode_block, in_axes=(0, 0))
decode_batch = jax.vmap(decode_block, in_axes=(0, 0, 0))
