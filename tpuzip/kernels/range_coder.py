"""Lane-parallel adaptive range ENCODER — Pallas TPU kernel.

Same pattern as the MTF kernel: 128 independent streams advance one byte per
VPU step; coder state (low/range u32, adaptive freq table (256,128) i32,
total) lives in VMEM scratch and survives across grid steps.  Format is
bit-exact tpuzip.oracle.ari (carryless Subbotin; reference parity
src/entropy/ari/mod.rs+table.rs) — the coder was chosen precisely because
its renorm emits a bounded (<=4) byte count per symbol with u32-only state.

Integer division r = range // total has no TPU vector instruction; it is
done exactly as 4-stage base-256 schoolbook division: each digit's
numerator is < total*256 <= 2^21, exactly representable in f32, with a
one-step floor fixup.

Per-lane masking (`step < len[lane]`) freezes state so every lane halts at
its own length; the 4 tail bytes of `low` (finish()) are emitted host-side
from the final-state output.

Emissions land at fixed (step, slot<4) positions + a count; compaction to
contiguous streams is a prefix-sum byte pack outside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128       # minimum / default lane width (one VPU lane row)
MAX_LANES = 1024  # widest measured win: 270 MB/s vs 142 at 128 (v5e)
CHUNK = 256
GROUP = 32


def lane_width(b: int) -> int:
    """Smallest power-of-two lane width >= b, in [LANES, MAX_LANES].
    Wider kernels amortize the fixed per-step cost: measured 142 / 190 /
    270 MB/s at 128 / 512 / 1024 lanes on v5e (64 KiB blocks)."""
    w = LANES
    while w < b and w < MAX_LANES:
        w *= 2
    return w
# plain ints: jnp scalars at module scope would be captured as consts
TOP = 1 << 24
BOT = 1 << 16


def _div_u32_by_small(num: jnp.ndarray, den: jnp.ndarray):
    """Exact (q, r) = divmod(num, den) for u32 num, den in [1, 2^14)."""
    q = jnp.zeros_like(num)
    rem = jnp.zeros_like(num)
    for k in (24, 16, 8, 0):
        cur = (rem << 8) | ((num >> k) & jnp.uint32(0xFF))  # < den*256 <= 2^22
        # Mosaic has no u32->f32 cast; values are < 2^22 so route via i32
        cur_f = cur.astype(jnp.int32).astype(jnp.float32)
        den_f = den.astype(jnp.int32).astype(jnp.float32)
        qk = jnp.floor(cur_f / den_f).astype(jnp.int32).astype(jnp.uint32)
        rk = cur - qk * den
        # f32 rounding can land one off either way
        over = rk >= den
        qk = jnp.where(over, qk + 1, qk)
        rk = jnp.where(over, rk - den, rk)
        under = rk > cur  # wrapped negative
        qk = jnp.where(under, qk - 1, qk)
        rk = jnp.where(under, rk + den, rk)
        q = (q << 8) | qk
        rem = rk
    return q, rem


def _ari_encode_kernel(x_ref, len_ref, out_ref, cnt_ref, state_ref,
                       low_r, rng_r, freq, total, *,
                       increment: int, threshold: int):
    lanes = out_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        low_r[0, :] = jnp.zeros((lanes,), jnp.uint32)
        rng_r[0, :] = jnp.full((lanes,), 0xFFFFFFFF, jnp.uint32)
        freq[:, :] = jnp.ones((256, lanes), jnp.int32)
        total[0, :] = jnp.full((lanes,), 256, jnp.int32)

    iota256 = jax.lax.broadcasted_iota(jnp.int32, (256, lanes), 0)

    def group_body(g, _):
        base = pl.multiple_of(g * GROUP, GROUP)
        slab = x_ref[pl.ds(base, GROUP), :].astype(jnp.int32)
        out_rows = []
        cnt_rows = []
        for j in range(GROUP):
            step = pl.program_id(0) * CHUNK + base + j
            active = step < len_ref[0, :]
            sym = slab[j, :]
            ft = freq[:, :]
            below = iota256 < sym[None, :]
            onehot = iota256 == sym[None, :]
            cum_lo = jnp.sum(jnp.where(below, ft, 0), axis=0).astype(jnp.uint32)
            f = jnp.sum(jnp.where(onehot, ft, 0), axis=0).astype(jnp.uint32)
            low = low_r[0, :]
            rng = rng_r[0, :]
            tot = total[0, :].astype(jnp.uint32)
            r, _rem = _div_u32_by_small(rng, tot)
            low2 = low + r * cum_lo
            rng2 = r * f
            row_bytes = []
            row_mask = []
            for _ in range(4):
                settled = ((low2 ^ (low2 + rng2)) < TOP)
                force = (~settled) & (rng2 < BOT)
                rng2 = jnp.where(force, (~low2 + 1) & (BOT - 1), rng2)
                emit = (settled | force) & active
                row_bytes.append((low2 >> 24).astype(jnp.uint8))
                row_mask.append(emit)
                low2 = jnp.where(emit, low2 << 8, low2)
                rng2 = jnp.where(emit, rng2 << 8, rng2)
            # model update with halving downscale
            nf = ft + jnp.where(onehot, increment, 0)
            ntot = total[0, :] + increment
            scale = ntot >= threshold
            sf = (nf + 1) >> 1
            nf = jnp.where(scale[None, :], sf, nf)
            ntot = jnp.where(scale, jnp.sum(sf, axis=0), ntot)
            # masked lanes freeze
            low_r[0, :] = jnp.where(active, low2, low)
            rng_r[0, :] = jnp.where(active, rng2, rng)
            freq[:, :] = jnp.where(active[None, :], nf, ft)
            total[0, :] = jnp.where(active, ntot, total[0, :])
            out_rows.append(jnp.stack(row_bytes))          # (4, LANES)
            cnt = sum(m.astype(jnp.int32) for m in row_mask)
            cnt_rows.append(cnt.astype(jnp.uint8))
        out_ref[pl.ds(base * 4, GROUP * 4), :] = jnp.concatenate(out_rows)
        cnt_ref[pl.ds(base, GROUP), :] = jnp.stack(cnt_rows)
        return 0

    jax.lax.fori_loop(0, CHUNK // GROUP, group_body, 0)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        state_ref[0, :] = low_r[0, :]
        state_ref[1, :] = rng_r[0, :]


@functools.partial(jax.jit,
                   static_argnames=("increment", "threshold", "interpret"))
def ari_encode_lanes(x: jnp.ndarray, lens: jnp.ndarray,
                     increment: int = 8, threshold: int = 1 << 13,
                     interpret: bool = False):
    """x: (N, 128) u8 time-major; lens: (128,) i32.
    Returns (bytes (N*4, 128) u8, counts (N, 128) u8, final_low (2,128) u32).
    Stream for lane l = concat over steps of bytes[4t : 4t+counts[t,l], l]
    plus the 4 finish() bytes of final_low[0, l]."""
    n, lanes = x.shape
    assert lanes % LANES == 0 and n % CHUNK == 0
    grid = n // CHUNK
    return pl.pallas_call(
        functools.partial(_ari_encode_kernel, increment=increment,
                          threshold=threshold),
        out_shape=(
            jax.ShapeDtypeStruct((n * 4, lanes), jnp.uint8),
            jax.ShapeDtypeStruct((n, lanes), jnp.uint8),
            jax.ShapeDtypeStruct((2, lanes), jnp.uint32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((CHUNK, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((CHUNK * 4, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, lanes), jnp.uint32),   # low
            pltpu.VMEM((1, lanes), jnp.uint32),   # range
            pltpu.VMEM((256, lanes), jnp.int32),  # freq
            pltpu.VMEM((1, lanes), jnp.int32),    # total
        ],
        interpret=interpret,
    )(x, lens.reshape(1, lanes).astype(jnp.int32))


def ari_encode_batch_kernel(blocks: jnp.ndarray, lengths: jnp.ndarray,
                            interpret: bool = False):
    """(B<=128, N) u8 + (B,) i32 -> list of per-block compressed byte strings
    (host-side compaction; bit-exact vs oracle.encode_bytes)."""
    import numpy as np

    b, n = blocks.shape
    width = lane_width(b)
    assert b <= width
    pad_n = (-n) % CHUNK
    x = jnp.zeros((n + pad_n, width), jnp.uint8)
    x = x.at[:n, :b].set(jnp.transpose(blocks))
    lens = jnp.zeros(width, jnp.int32).at[:b].set(lengths)
    bytes_, counts, state = ari_encode_lanes(x, lens, interpret=interpret)
    bytes_np = np.asarray(bytes_)
    counts_np = np.asarray(counts)
    low = np.asarray(state)[0]
    out = []
    for l in range(b):
        c = counts_np[:, l]
        nz = np.nonzero(c)[0]
        parts = [bytes_np[4 * t : 4 * t + c[t], l].tobytes() for t in nz]
        tail = bytes(((int(low[l]) >> (24 - 8 * k)) & 0xFF) for k in range(4))
        out.append(b"".join(parts) + tail)
    return out


@functools.partial(jax.jit, static_argnames=("increment", "threshold",
                                              "interpret"))
def ari_encode_lanes_packed_indexed(x: jnp.ndarray, lens: jnp.ndarray,
                                    increment: int = 8,
                                    threshold: int = 1 << 13,
                                    interpret: bool = False):
    """ari_encode_lanes_packed + the per-chunk byte-consumption index the
    Pallas decoder needs (kernels/range_decoder.py): returns
    (streams (128, CAP) u8, stream_lens (128,) i32, deltas (NC, 128) i32)
    where deltas[k, l] = renorm bytes emitted by lane l during chunk k
    (CHUNK_STEPS symbols)."""
    from tpuzip.kernels.range_decoder import chunk_deltas

    streams, slens, counts = _encode_lanes_packed_core(
        x, lens, increment, threshold, interpret)
    return streams, slens, chunk_deltas(counts)


@functools.partial(jax.jit, static_argnames=("increment", "threshold",
                                              "interpret"))
def ari_encode_lanes_packed(x: jnp.ndarray, lens: jnp.ndarray,
                            increment: int = 8, threshold: int = 1 << 13,
                            interpret: bool = False):
    """Kernel + ON-DEVICE compaction: returns (streams (128, CAP) u8,
    stream_lens (128,) i32) — each row a complete oracle-format ari stream
    (renorm bytes + the 4 finish bytes).  No host round-trips."""
    streams, slens, _ = _encode_lanes_packed_core(x, lens, increment,
                                                  threshold, interpret)
    return streams, slens


def _encode_lanes_packed_core(x, lens, increment, threshold,
                              interpret=False):
    n, lanes = x.shape
    bytes_, counts, state = ari_encode_lanes(x, lens, increment, threshold,
                                             interpret)
    cap = 2 * n + 64
    cnt = counts.astype(jnp.int32)                      # (N, L)
    offs = jnp.cumsum(cnt, axis=0) - cnt                # exclusive, per lane
    totals = cnt.sum(axis=0)                            # (L,)
    b4 = bytes_.reshape(n, 4, lanes)
    j = jnp.arange(4, dtype=jnp.int32)[None, :, None]
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, 4, lanes), 2)
    pos = offs[:, None, :] + j
    valid = j < cnt[:, None, :]
    flat = jnp.where(valid, pos * lanes + lane, cap * lanes)
    out = jnp.zeros(cap * lanes, jnp.uint8).at[flat.reshape(-1)].set(
        b4.reshape(-1), mode="drop")
    # finish(): 4 tail bytes of final low per lane
    low = state[0]
    tail = jnp.stack([(low >> (24 - 8 * k)).astype(jnp.uint8)
                      for k in range(4)])               # (4, L)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (4, lanes), 1)
    tpos = (totals[None, :] + jnp.arange(4, dtype=jnp.int32)[:, None]) \
        * lanes + lane2
    out = out.at[tpos.reshape(-1)].set(tail.reshape(-1), mode="drop")
    return jnp.transpose(out.reshape(cap, lanes)), totals + 4, counts
