"""Distance coding — TPU formulation (format: tpuzip.oracle.dc; reference
parity src/bwt/dc.rs).

Encode is parallel: run decomposition (compare-shift), per-symbol first
occurrences (scatter-min), next-head distances via one stable sort by
(symbol, head), varint emission through the prefix-sum byte packer.

Decode is a scan over runs: at most one outstanding scheduled head exists
per symbol, so the scheduler state is a dense (256,) position table — the
"min over scheduled" of the reference's walk becomes a vectorized min.
Output expansion is the usual parallel run-fill.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from tpuzip.core.bitio import pack_bytes_varlen

VARINT_MAX = 5  # u32 varints
HDR = 4 + 256 * 4


def encode_cap(n: int) -> int:
    return HDR + VARINT_MAX * n + 8


def _varint_bytes(v: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """v (T,) i32 -> (bytes (T, VARINT_MAX) u8, lens (T,))  LEB128."""
    v = v.astype(jnp.uint32)
    parts = []
    for k in range(VARINT_MAX):
        parts.append((v >> (7 * k)) & 0x7F)
    parts = jnp.stack(parts, axis=1)  # (T, 5)
    nbits = 32 - jnp.sum(jnp.cumsum(
        jnp.flip(parts, axis=1) != 0, axis=1) == 0, axis=1) * 7
    lens = jnp.maximum((nbits + 6) // 7, 1).astype(jnp.int32)
    k = jnp.arange(VARINT_MAX)[None, :]
    cont = k < (lens[:, None] - 1)
    out = jnp.where(cont, parts | 0x80, parts).astype(jnp.uint8)
    return out, lens


def encode(block: jnp.ndarray, length: jnp.ndarray,
           cap: int | None = None) -> tuple[jnp.ndarray, jnp.ndarray]:
    n = block.shape[0]
    cap = cap or encode_cap(n)
    length = jnp.asarray(length, jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < length
    d = block.astype(jnp.int32)
    prev = jnp.concatenate([jnp.array([-1], jnp.int32), d[:-1]])
    head = valid & ((idx == 0) | (d != prev))
    run_id = jnp.cumsum(head.astype(jnp.int32)) - 1
    num_runs = jnp.maximum(run_id[-1] + 1, 0)

    # dense per-run tables (runs <= n)
    rid = jnp.where(head, run_id, n)
    run_start = jnp.full(n + 1, 0, jnp.int32).at[rid].max(
        jnp.where(head, idx, 0), mode="drop")[:n]
    run_sym = jnp.zeros(n + 1, jnp.int32).at[rid].max(
        jnp.where(head, d, 0), mode="drop")[:n]
    r_valid = jnp.arange(n) < num_runs
    nxt_start = jnp.concatenate([run_start[1:], jnp.array([0], jnp.int32)])
    run_end = jnp.where(jnp.arange(n) == num_runs - 1, length, nxt_start)
    run_end = jnp.where(r_valid, run_end, 0)

    # first occurrence per symbol: scatter-min of head positions
    first = jnp.full(256, 0x7FFFFFFF, jnp.int32).at[
        jnp.where(head, d, 256)].min(jnp.where(head, idx, 0x7FFFFFFF),
                                     mode="drop")
    first = jnp.where(first == 0x7FFFFFFF, length, first)

    # next head of the same symbol: stable sort runs by (sym, start)
    key_sym = jnp.where(r_valid, run_sym, 257)
    _, _, perm = lax.sort(
        (key_sym, jnp.where(r_valid, run_start, n + 1),
         jnp.arange(n, dtype=jnp.int32)), num_keys=2, is_stable=True)
    sym_sorted = key_sym[perm]
    start_sorted = jnp.where(r_valid[perm], run_start[perm], 0)
    nxt_same = jnp.concatenate([start_sorted[1:], jnp.array([-1], jnp.int32)])
    same_sym = jnp.concatenate([sym_sorted[1:] == sym_sorted[:-1],
                                jnp.array([False])])
    next_head_sorted = jnp.where(same_sym, nxt_same, -1)
    next_head = jnp.zeros(n, jnp.int32).at[perm].set(next_head_sorted)

    dists = jnp.where(next_head >= 0, next_head - (run_end - 1), 0)
    dists = jnp.where(r_valid, dists, 0)

    vb, vl = _varint_bytes(dists)
    vl = jnp.where(r_valid, vl, 0)

    # header: [length u32 LE][first[256] u32 LE]
    hdr_vals = jnp.concatenate([length[None], first])
    hdr = jnp.stack([(hdr_vals >> (8 * k)) & 0xFF for k in range(4)],
                    axis=1).reshape(-1).astype(jnp.uint8)
    body, body_len = pack_bytes_varlen(vb, vl, cap - HDR)
    out = jnp.zeros(cap, jnp.uint8).at[:HDR].set(hdr)
    out = lax.dynamic_update_slice(out, body, (HDR,))[:cap]
    # re-zero past the body (dynamic_update_slice wrote the whole buffer)
    pos = jnp.arange(cap)
    out = jnp.where(pos < HDR + body_len, out, 0)
    return out, HDR + body_len


def decode(comp: jnp.ndarray, comp_len: jnp.ndarray, out_n: int
           ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (out (out_n,) u8, out_len i32, err i32)."""
    cap = comp.shape[0]
    comp32 = comp.astype(jnp.int32)
    length = (comp32[0] | (comp32[1] << 8) | (comp32[2] << 16)
              | (comp32[3] << 24))
    length = jnp.minimum(length, out_n)
    sym4 = 4 + jnp.arange(256) * 4
    first = (comp32[sym4] | (comp32[sym4 + 1] << 8)
             | (comp32[sym4 + 2] << 16) | (comp32[sym4 + 3] << 24))
    INF = jnp.int32(0x7FFFFFFF)
    sched0 = jnp.where(first < length, first, INF)

    def read_varint(pos):
        val = jnp.int32(0)
        done = jnp.bool_(False)
        for k in range(VARINT_MAX):
            b = comp32[jnp.clip(pos + k, 0, cap - 1)]
            val = jnp.where(done, val, val | ((b & 0x7F) << (7 * k)))
            stop = (b < 0x80) & ~done
            done = done | stop
        # byte count = index of first byte < 0x80, +1
        cnt = jnp.int32(1)
        chain = jnp.bool_(True)
        for k in range(VARINT_MAX - 1):
            b = comp32[jnp.clip(pos + k, 0, cap - 1)]
            chain = chain & (b >= 0x80)
            cnt = cnt + chain.astype(jnp.int32)
        return val, pos + cnt

    def step(state, t):
        pos, in_pos, sched, err = state
        active = pos < length
        # current run's symbol: the one scheduled exactly at pos
        hit = sched == pos
        any_hit = hit.any()
        s = jnp.argmax(hit).astype(jnp.int32)
        sched = jnp.where(active & any_hit, sched.at[s].set(INF), sched)
        nxt = jnp.minimum(jnp.min(sched), length)
        d, new_in = read_varint(in_pos)
        run_end = nxt - 1
        target = run_end + d
        bad = active & ((~any_hit) | ((d > 0) & ((target >= length)
                                                 | (target < nxt))))
        sched = jnp.where(active & (d > 0) & ~bad,
                          sched.at[s].set(target), sched)
        out_run = (jnp.where(active, pos, 0),
                   jnp.where(active, nxt - pos, 0),
                   jnp.where(active, s, 0))
        pos = jnp.where(active, nxt, pos)
        in_pos = jnp.where(active, new_in, in_pos)
        err = err | bad.astype(jnp.int32)
        return (pos, in_pos, sched, err), out_run

    init = (jnp.int32(0), jnp.int32(HDR), sched0, jnp.int32(0))
    (_, _, _, err), (starts, lens_, syms) = lax.scan(
        step, init, jnp.arange(out_n, dtype=jnp.int32))

    # parallel run-fill
    scat = jnp.where(lens_ > 0, starts, out_n)
    run_at = jnp.full(out_n, -1, jnp.int32).at[scat].max(
        jnp.arange(out_n, dtype=jnp.int32), mode="drop")
    run_of = lax.cummax(run_at)
    out = syms[jnp.clip(run_of, 0, out_n - 1)].astype(jnp.uint8)
    out = jnp.where(jnp.arange(out_n) < length, out, 0)
    return out, length, err


encode_batch = jax.vmap(encode, in_axes=(0, 0))
decode_batch = jax.vmap(decode, in_axes=(0, 0, None))
