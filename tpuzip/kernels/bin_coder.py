"""Lane-parallel binary adaptive coder — Pallas TPU kernel.

Encodes 128 independent BIT streams, one bit per VPU step, with the
shift-update binary model (bin.rs parity) and optionally the APM/SSE gate
(apm.rs parity) — bit-exact vs tpuzip.oracle.ari's BinaryModel/ApmGate
driven through the carryless range coder (same formats as codecs.bin_apm).

State per lane: low/range u32, p0 i32, gate (33, L) i32.  Far lighter than
the 256-symbol ari kernel (no one-hot table scans), so this is the fastest
entropy path in the framework.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
CHUNK = 256
GROUP = 32
TOP = 1 << 24
BOT = 1 << 16
APM_BITS = 12
APM_SLOTS = 33


def _bin_update(p0, bit, bits, rate):
    up = p0 + (((1 << bits) - p0) >> rate)
    dn = p0 - (p0 >> rate)
    return jnp.clip(jnp.where(bit == 0, up, dn), 1, (1 << bits) - 1)


def _bin_kernel(x_ref, len_ref, out_ref, cnt_ref, state_ref,
                low_r, rng_r, p0_r, gate_r, *,
                model_bits: int, rate: int, use_apm: bool, apm_rate: int):
    lanes = out_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        low_r[0, :] = jnp.zeros((lanes,), jnp.uint32)
        rng_r[0, :] = jnp.full((lanes,), 0xFFFFFFFF, jnp.uint32)
        p0_r[0, :] = jnp.full((lanes,), 1 << (model_bits - 1), jnp.int32)
        slot = jax.lax.broadcasted_iota(jnp.int32, (APM_SLOTS, lanes), 0)
        gate_r[:, :] = jnp.clip((slot * (1 << APM_BITS)) // (APM_SLOTS - 1),
                                1, (1 << APM_BITS) - 1)

    iota_slots = jax.lax.broadcasted_iota(jnp.int32, (APM_SLOTS, lanes), 0)

    def group_body(g, _):
        base = pl.multiple_of(g * GROUP, GROUP)
        slab = x_ref[pl.ds(base, GROUP), :].astype(jnp.int32)
        out_rows = []
        cnt_rows = []
        for j in range(GROUP):
            step = pl.program_id(0) * CHUNK + base + j
            active = step < len_ref[0, :]
            bit = slab[j, :]
            p0 = p0_r[0, :]
            low = low_r[0, :]
            rng = rng_r[0, :]
            if use_apm:
                gt = gate_r[:, :]
                scaled = p0 * (APM_SLOTS - 1)
                idx = jnp.minimum(scaled >> APM_BITS, APM_SLOTS - 2)
                frac = scaled & ((1 << APM_BITS) - 1)
                last = jnp.where(frac < (1 << (APM_BITS - 1)), idx, idx + 1)
                onehot_a = iota_slots == idx[None, :]
                onehot_b = iota_slots == (idx + 1)[None, :]
                a = jnp.sum(jnp.where(onehot_a, gt, 0), axis=0)
                b = jnp.sum(jnp.where(onehot_b, gt, 0), axis=0)
                pp = (a * ((1 << APM_BITS) - frac) + b * frac) >> APM_BITS
                split = jnp.clip(pp, 1, (1 << APM_BITS) - 1)
                denom_bits = APM_BITS
            else:
                split = p0
                denom_bits = model_bits
            # range split: denominator is a power of two -> shift, no divide
            r = rng >> denom_bits
            cl = jnp.where(bit == 0, 0, split).astype(jnp.uint32)
            width = jnp.where(bit == 0, split,
                              (1 << denom_bits) - split).astype(jnp.uint32)
            low2 = low + r * cl
            rng2 = r * width
            row_bytes = []
            row_mask = []
            for _k in range(4):
                settled = ((low2 ^ (low2 + rng2)) < TOP)
                force = (~settled) & (rng2 < BOT)
                rng2 = jnp.where(force, (~low2 + 1) & (BOT - 1), rng2)
                emit = (settled | force) & active
                row_bytes.append((low2 >> 24).astype(jnp.uint8))
                row_mask.append(emit)
                low2 = jnp.where(emit, low2 << 8, low2)
                rng2 = jnp.where(emit, rng2 << 8, rng2)
            np0 = _bin_update(p0, bit, model_bits, rate)
            low_r[0, :] = jnp.where(active, low2, low)
            rng_r[0, :] = jnp.where(active, rng2, rng)
            p0_r[0, :] = jnp.where(active, np0, p0)
            if use_apm:
                onehot_l = iota_slots == last[None, :]
                cell = jnp.sum(jnp.where(onehot_l, gt, 0), axis=0)
                ncell = _bin_update(cell, bit, APM_BITS, apm_rate)
                gate_r[:, :] = jnp.where(onehot_l & active[None, :],
                                         ncell[None, :], gt)
            out_rows.append(jnp.stack(row_bytes))
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


@functools.partial(jax.jit, static_argnames=(
    "model_bits", "rate", "use_apm", "apm_rate", "interpret"))
def bin_encode_lanes(x: jnp.ndarray, lens: jnp.ndarray,
                     model_bits: int = 12, rate: int = 5,
                     use_apm: bool = False, apm_rate: int = 5,
                     interpret: bool = False):
    """x: (N, 128) u8 of 0/1 bits, time-major; lens (128,) i32.
    Returns (bytes (N*4,128), counts (N,128), final_low (2,128))."""
    n, lanes = x.shape
    assert lanes % LANES == 0 and n % CHUNK == 0
    return pl.pallas_call(
        functools.partial(_bin_kernel, model_bits=model_bits, rate=rate,
                          use_apm=use_apm, apm_rate=apm_rate),
        out_shape=(
            jax.ShapeDtypeStruct((n * 4, lanes), jnp.uint8),
            jax.ShapeDtypeStruct((n, lanes), jnp.uint8),
            jax.ShapeDtypeStruct((2, lanes), jnp.uint32),
        ),
        grid=(n // CHUNK,),
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
            pltpu.VMEM((1, lanes), jnp.uint32),
            pltpu.VMEM((1, lanes), jnp.uint32),
            pltpu.VMEM((1, lanes), jnp.int32),
            pltpu.VMEM((APM_SLOTS, lanes), jnp.int32),
        ],
        interpret=interpret,
    )(x, lens.reshape(1, lanes).astype(jnp.int32))


def bin_encode_streams(bit_blocks, lengths, use_apm: bool = False,
                       model_bits: int = 12, rate: int = 5,
                       apm_rate: int = 5, interpret: bool = False):
    """(B<=128, N) 0/1 u8 + (B,) -> list of per-stream compressed bytes
    (host compaction; bit-exact vs codecs.bin_apm / the oracle chain)."""
    import numpy as np

    from tpuzip.kernels.range_coder import lane_width

    b, n = bit_blocks.shape
    pad_n = (-n) % CHUNK
    # wide lane groups amortize the kernel's fixed per-step cost exactly
    # as they do for the 256-symbol ari kernel (142 -> 270 MB/s at
    # 128 -> 1024 lanes); the bit coder pays 8 steps/byte, so width
    # matters even more here (VERDICT r3 task 4 optimization pass)
    width = lane_width(b)
    x = jnp.zeros((n + pad_n, width), jnp.uint8)
    x = x.at[:n, :b].set(jnp.transpose(bit_blocks))
    lens = jnp.zeros(width, jnp.int32).at[:b].set(lengths)
    bytes_, counts, state = bin_encode_lanes(
        x, lens, model_bits=model_bits, rate=rate, use_apm=use_apm,
        apm_rate=apm_rate, interpret=interpret)
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
