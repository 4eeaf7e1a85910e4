"""Lane-parallel binary adaptive coder — Pallas TPU kernel.

Encodes 128 independent BIT streams, one bit per VPU step, with the
shift-update binary model (bin.rs parity) and optionally the APM/SSE gate
(apm.rs parity) — bit-exact vs tpuzip.oracle.ari's BinaryModel/ApmGate
driven through the carryless range coder (same formats as codecs.bin_apm).

State per lane: low/range u32, p0 i32, gate (17, L) i32 (u16 pair-packed slots).  Far lighter than
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
GATE_ROWS = (APM_SLOTS + 1) // 2   # pair-packed u16 halves


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
        # gate slots pair-packed two-per-i32-row (values < 2^12): row p
        # holds slot 2p (lo u16) and slot 2p+1 (hi); the idx/idx+1
        # interpolation reads become ONE masked pass over 17 rows instead
        # of two over 33 (slot 33 = row 16 hi is padding, never touched:
        # idx <= 31 and the update slot `last` <= 32 = row 16 LO)
        p_r = jax.lax.broadcasted_iota(jnp.int32, (GATE_ROWS, lanes), 0)

        def _init(s):
            return jnp.clip((s * (1 << APM_BITS)) // (APM_SLOTS - 1),
                            1, (1 << APM_BITS) - 1)

        gate_r[:, :] = _init(2 * p_r) | (_init(2 * p_r + 1) << 16)

    iota_rows = jax.lax.broadcasted_iota(jnp.int32, (GATE_ROWS, lanes), 0)

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
                # slots idx, idx+1 live in packed rows q, q+1: one masked
                # pass reads both (plus the update cell) — vs two full
                # 33-row passes in the unpacked layout
                q = idx >> 1
                acc0 = jnp.sum(jnp.where(iota_rows == q[None, :], gt, 0),
                               axis=0)
                acc1 = jnp.sum(
                    jnp.where(iota_rows == (q + 1)[None, :], gt, 0), axis=0)
                even = (idx & 1) == 0
                a = jnp.where(even, acc0 & 0xFFFF, acc0 >> 16)
                b = jnp.where(even, acc0 >> 16, acc1 & 0xFFFF)
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
                cell = jnp.where(last == idx, a, b)
                ncell = _bin_update(cell, bit, APM_BITS, apm_rate)
                lp = last >> 1
                lodd = (last & 1) == 1
                packed_new = jnp.where(
                    lodd,
                    (gt & 0xFFFF) | (ncell[None, :] << 16),
                    (gt & ~jnp.int32(0xFFFF)) | ncell[None, :])
                rowsel = iota_rows == lp[None, :]
                gate_r[:, :] = jnp.where(rowsel & active[None, :],
                                         packed_new, gt)
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
            pltpu.VMEM((GATE_ROWS, lanes), jnp.int32),
        ],
        interpret=interpret,
    )(x, lens.reshape(1, lanes).astype(jnp.int32))


def bin_encode_streams(bit_blocks, lengths, use_apm: bool = False,
                       model_bits: int = 12, rate: int = 5,
                       apm_rate: int = 5, interpret: bool = False,
                       with_counts: bool = False):
    """(B<=128, N) 0/1 u8 + (B,) -> list of per-stream compressed bytes
    (host compaction; bit-exact vs codecs.bin_apm / the oracle chain).
    with_counts=True also returns the per-bit renorm counts (N+pad, B)
    np.int32 — raw material of the fast-decode chunk index."""
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
    if with_counts:
        return out, counts_np[:, :b].astype(np.int32)
    return out


# ---------------------------------------------------------------------------
# Lane-parallel bin/apm DECODER (round 4): the bin family joins ari's
# chunk-indexed fast-decode design — per-chunk consumed-byte deltas let the
# window prepack position every lane, so 128-1024 independent bit streams
# decode one bit per VPU step with no per-lane gathers.
# ---------------------------------------------------------------------------

def bin_window_words(max_delta: int) -> int:
    """Window words per CHUNK-bit chunk.  A bit can emit up to 4 renorm
    bytes, so the worst chunk consumes 4*CHUNK+4 bytes — far beyond the
    ari symbol buckets; size from the measured max instead."""
    need = (max_delta + 8 + 3) // 4
    for w in (16, 32, 64, 136, 264):
        if w >= need:
            return w
    raise ValueError(f"bin chunk delta {max_delta} exceeds 4*CHUNK+4")


def _gate_init_packed(lanes: int):
    p_r = jax.lax.broadcasted_iota(jnp.int32, (GATE_ROWS, lanes), 0)

    def _init(s):
        return jnp.clip((s * (1 << APM_BITS)) // (APM_SLOTS - 1),
                        1, (1 << APM_BITS) - 1)

    return _init(2 * p_r) | (_init(2 * p_r + 1) << 16)


def _bin_decode_step(low, rng, code, p0, gate, posB, active, win_i, iotaW,
                     iota_rows, *, model_bits: int, rate: int,
                     use_apm: bool, apm_rate: int):
    """One decode step over the lane axis; shared verbatim by the Pallas
    kernel and the XLA reference path (same pattern as the ari decoder).
    Mirrors the encoder's model math bit for bit."""
    from tpuzip.kernels.range_decoder import u32_div_exact

    if use_apm:
        gt = gate
        scaled = p0 * (APM_SLOTS - 1)
        idx = jnp.minimum(scaled >> APM_BITS, APM_SLOTS - 2)
        frac = scaled & ((1 << APM_BITS) - 1)
        last = jnp.where(frac < (1 << (APM_BITS - 1)), idx, idx + 1)
        q = idx >> 1
        acc0 = jnp.sum(jnp.where(iota_rows == q[None, :], gt, 0), axis=0)
        acc1 = jnp.sum(jnp.where(iota_rows == (q + 1)[None, :], gt, 0),
                       axis=0)
        even = (idx & 1) == 0
        a = jnp.where(even, acc0 & 0xFFFF, acc0 >> 16)
        b = jnp.where(even, acc0 >> 16, acc1 & 0xFFFF)
        pp = (a * ((1 << APM_BITS) - frac) + b * frac) >> APM_BITS
        split = jnp.clip(pp, 1, (1 << APM_BITS) - 1)
        denom_bits = APM_BITS
    else:
        split = p0
        denom_bits = model_bits
    r = rng >> denom_bits
    v, _ = u32_div_exact(code - low, r)
    # no unsigned vector min in Mosaic (arith.minui) — compare+select
    lim = (1 << denom_bits) - 1
    v = jnp.where(v > lim, jnp.full_like(v, lim), v)
    bit = (v >= split.astype(jnp.uint32)).astype(jnp.int32)
    cl = jnp.where(bit == 0, 0, split).astype(jnp.uint32)
    width = jnp.where(bit == 0, split,
                      (1 << denom_bits) - split).astype(jnp.uint32)
    low2 = low + r * cl
    rng2 = r * width
    # fetch the next 4 stream bytes (same mechanics as the ari decoder)
    widx = posB >> 2
    m0 = iotaW == widx[None, :]
    m1 = iotaW == (widx + 1)[None, :]
    w0 = jnp.sum(jnp.where(m0, win_i, 0), axis=0).astype(jnp.uint32)
    w1 = jnp.sum(jnp.where(m1, win_i, 0), axis=0).astype(jnp.uint32)
    b_ = posB & 3
    wrd = jnp.where(
        b_ == 0, w0,
        jnp.where(b_ == 1, (w0 << 8) | (w1 >> 24),
                  jnp.where(b_ == 2, (w0 << 16) | (w1 >> 16),
                            (w0 << 24) | (w1 >> 8))))
    pulled = jnp.zeros_like(posB)
    for rd_ in range(4):
        settled = ((low2 ^ (low2 + rng2)) < TOP)
        force = (~settled) & (rng2 < BOT)
        rng2 = jnp.where(force, (~low2 + 1) & (BOT - 1), rng2)
        pull = (settled | force) & active
        byte = wrd >> 24
        for kk in range(1, rd_ + 1):
            byte = jnp.where(pulled == kk, (wrd >> (24 - 8 * kk)), byte)
        byte = byte & jnp.uint32(0xFF)
        code = jnp.where(pull, (code << 8) | byte, code)
        low2 = jnp.where(pull, low2 << 8, low2)
        rng2 = jnp.where(pull, rng2 << 8, rng2)
        pulled = pulled + pull.astype(jnp.int32)
    posB = posB + jnp.where(active, pulled, 0)
    np0 = _bin_update(p0, bit, model_bits, rate)
    p0 = jnp.where(active, np0, p0)
    if use_apm:
        cell = jnp.where(last == idx, a, b)
        ncell = _bin_update(cell, bit, APM_BITS, apm_rate)
        lp = last >> 1
        lodd = (last & 1) == 1
        packed_new = jnp.where(
            lodd,
            (gt & 0xFFFF) | (ncell[None, :] << 16),
            (gt & ~jnp.int32(0xFFFF)) | ncell[None, :])
        rowsel = iota_rows == lp[None, :]
        gate = jnp.where(rowsel & active[None, :], packed_new, gt)
    low = jnp.where(active, low2, low)
    rng = jnp.where(active, rng2, rng)
    return low, rng, code, p0, gate, posB, bit


def _bin_decode_kernel(win_ref, code0_ref, len_ref, out_ref,
                       low_r, rng_r, code_r, p0_r, gate_r, *,
                       model_bits: int, rate: int, use_apm: bool,
                       apm_rate: int, w: int):
    lanes = out_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        low_r[0, :] = jnp.zeros((lanes,), jnp.uint32)
        rng_r[0, :] = jnp.full((lanes,), 0xFFFFFFFF, jnp.uint32)
        code_r[0, :] = code0_ref[0, :]
        p0_r[0, :] = jnp.full((lanes,), 1 << (model_bits - 1), jnp.int32)
        gate_r[:, :] = _gate_init_packed(lanes)

    iotaW = jax.lax.broadcasted_iota(jnp.int32, (w, lanes), 0)
    iota_rows = jax.lax.broadcasted_iota(jnp.int32, (GATE_ROWS, lanes), 0)
    win_i = win_ref[:, :].astype(jnp.int32)
    lens = len_ref[0, :]

    def group_body(g, posB):
        rows = []
        low = low_r[0, :]
        rng = rng_r[0, :]
        code = code_r[0, :]
        p0 = p0_r[0, :]
        gate = gate_r[:, :]
        for j in range(GROUP):
            step = pl.program_id(0) * CHUNK + g * GROUP + j
            active = step < lens
            low, rng, code, p0, gate, posB, bit = _bin_decode_step(
                low, rng, code, p0, gate, posB, active, win_i, iotaW,
                iota_rows, model_bits=model_bits, rate=rate,
                use_apm=use_apm, apm_rate=apm_rate)
            rows.append(bit.astype(jnp.uint8))
        low_r[0, :] = low
        rng_r[0, :] = rng
        code_r[0, :] = code
        p0_r[0, :] = p0
        gate_r[:, :] = gate
        out_ref[pl.ds(g * GROUP, GROUP), :] = jnp.stack(rows)
        return posB

    jax.lax.fori_loop(0, CHUNK // GROUP, group_body,
                      jnp.zeros((lanes,), jnp.int32))


@functools.partial(jax.jit, static_argnames=(
    "w", "model_bits", "rate", "use_apm", "apm_rate", "interpret"))
def bin_decode_lanes(windows: jnp.ndarray, code0: jnp.ndarray,
                     lens: jnp.ndarray, w: int,
                     model_bits: int = 12, rate: int = 5,
                     use_apm: bool = False, apm_rate: int = 5,
                     interpret: bool = False) -> jnp.ndarray:
    """windows: (NC*w, LANES) u32 prepacked chunk windows (CHUNK bits per
    chunk); code0 (LANES,) u32 = first 4 stream bytes BE; lens (LANES,)
    i32 BIT counts.  Returns (NC*CHUNK, LANES) u8 bits, time-major."""
    total_rows, lanes = windows.shape
    assert lanes % LANES == 0 and total_rows % w == 0
    nc = total_rows // w
    n = nc * CHUNK
    return pl.pallas_call(
        functools.partial(_bin_decode_kernel, model_bits=model_bits,
                          rate=rate, use_apm=use_apm, apm_rate=apm_rate,
                          w=w),
        out_shape=jax.ShapeDtypeStruct((n, lanes), jnp.uint8),
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((w, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, lanes), jnp.uint32),     # low
            pltpu.VMEM((1, lanes), jnp.uint32),     # range
            pltpu.VMEM((1, lanes), jnp.uint32),     # code
            pltpu.VMEM((1, lanes), jnp.int32),      # p0
            pltpu.VMEM((GATE_ROWS, lanes), jnp.int32),  # packed gate
        ],
        interpret=interpret,
    )(windows, code0.reshape(1, lanes).astype(jnp.uint32),
      lens.reshape(1, lanes).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=(
    "w", "model_bits", "rate", "use_apm", "apm_rate"))
def bin_decode_reference(windows: jnp.ndarray, code0: jnp.ndarray,
                         lens: jnp.ndarray, w: int,
                         model_bits: int = 12, rate: int = 5,
                         use_apm: bool = False, apm_rate: int = 5):
    """Pure-XLA replica of the Pallas decode kernel (same step function,
    nested lax.scan instead of a grid) — CPU ground truth for the kernel
    wiring, and the off-TPU to_device path for indexed bin containers."""
    total_rows, lanes = windows.shape
    assert lanes % LANES == 0 and total_rows % w == 0
    nc = total_rows // w
    iotaW = jax.lax.broadcasted_iota(jnp.int32, (w, lanes), 0)
    iota_rows = jax.lax.broadcasted_iota(jnp.int32, (GATE_ROWS, lanes), 0)
    win_chunks = windows.reshape(nc, w, lanes).astype(jnp.int32)
    lens = lens.astype(jnp.int32)

    def chunk_body(carry, xs):
        low, rng, code, p0, gate = carry
        win_i, k = xs

        def step_body(c2, j):
            low, rng, code, p0, gate, posB = c2
            active = (k * CHUNK + j) < lens
            low, rng, code, p0, gate, posB, bit = _bin_decode_step(
                low, rng, code, p0, gate, posB, active, win_i, iotaW,
                iota_rows, model_bits=model_bits, rate=rate,
                use_apm=use_apm, apm_rate=apm_rate)
            return (low, rng, code, p0, gate, posB), bit.astype(jnp.uint8)

        (low, rng, code, p0, gate, _), bits = jax.lax.scan(
            step_body,
            (low, rng, code, p0, gate, jnp.zeros((lanes,), jnp.int32)),
            jnp.arange(CHUNK, dtype=jnp.int32))
        return (low, rng, code, p0, gate), bits

    init = (jnp.zeros((lanes,), jnp.uint32),
            jnp.full((lanes,), 0xFFFFFFFF, jnp.uint32),
            code0.astype(jnp.uint32),
            jnp.full((lanes,), 1 << (model_bits - 1), jnp.int32),
            _gate_init_packed(lanes))
    _, bits = jax.lax.scan(chunk_body, init,
                           (win_chunks, jnp.arange(nc, dtype=jnp.int32)))
    return bits.reshape(nc * CHUNK, lanes)
