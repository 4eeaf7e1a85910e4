"""Lane-parallel MTF scan — Pallas TPU kernel.

TPU grid cells run sequentially, so batch throughput for the inherently
serial MTF recurrence comes from the VECTOR axis: LANES=128 independent
blocks advance one byte per VPU step.  State is the rank permutation
``rank_of[sym, lane]`` (256, 128) held in VMEM scratch (persists across
grid steps); every update is a one-hot masked vector op — no gathers:

  onehot = (iota256 == sym[lane])            # (256, 128)
  r      = sum(rank_of * onehot, axis=0)     # the emitted rank
  rank_of = where(onehot, 0, rank_of + (rank_of < r))

Mosaic alignment: u8 VMEM rows must be loaded at multiples of the sublane
tile, so bytes stream in GROUP=32-row aligned slabs with a static inner
unroll.  The grid walks CHUNK-row tiles of the time-major (N, 128) input.
Reference parity: src/bwt/mtf.rs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
CHUNK = 256
GROUP = 32  # u8 sublane tile height — aligned slab size


def _mtf_kernel(x_ref, out_ref, rank, *, decode: bool, sdtype=jnp.int32):
    """sdtype stays i32: v5e Mosaic supports vector add/compare only for
    i32 (i8 adds and i16 compares both fail to compile), so narrower rank
    state cannot cut VMEM traffic on this target."""
    lanes = out_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        rank[:, :] = jax.lax.broadcasted_iota(
            jnp.int32, (256, lanes), 0).astype(sdtype)

    iota256 = jax.lax.broadcasted_iota(
        jnp.int32, (256, lanes), 0).astype(sdtype)

    def group_body(g, _):
        base = pl.multiple_of(g * GROUP, GROUP)
        slab = x_ref[pl.ds(base, GROUP), :].astype(sdtype)  # (32, 128)
        rows = []
        for j in range(GROUP):  # static unroll — aligned vector ops only
            sym = slab[j, :]
            st = rank[:, :]
            if decode:
                r = sym
                onehot = st == r[None, :]
                out = jnp.sum(jnp.where(onehot, iota256, 0), axis=0,
                              dtype=jnp.int32).astype(sdtype)
            else:
                onehot = iota256 == sym[None, :]
                r = jnp.sum(jnp.where(onehot, st, 0), axis=0,
                            dtype=jnp.int32).astype(sdtype)
                out = r
            bump = (st < r[None, :]).astype(sdtype)
            rank[:, :] = jnp.where(onehot, sdtype(0), st + bump)
            rows.append(out.astype(jnp.uint8))
        out_ref[pl.ds(base, GROUP), :] = jnp.stack(rows)
        return 0

    jax.lax.fori_loop(0, x_ref.shape[0] // GROUP, group_body, 0)


@functools.partial(jax.jit, static_argnames=("decode", "interpret"))
def mtf_lanes(x: jnp.ndarray, decode: bool = False,
              interpret: bool = False) -> jnp.ndarray:
    """x: (N, LANES) u8 time-major — N bytes of 128 independent streams.
    Returns the transformed streams, same layout.  N % CHUNK == 0."""
    n, lanes = x.shape
    assert lanes % LANES == 0 and n % CHUNK == 0
    grid = n // CHUNK
    sdtype = jnp.int32
    return pl.pallas_call(
        functools.partial(_mtf_kernel, decode=decode, sdtype=sdtype),
        out_shape=jax.ShapeDtypeStruct((n, lanes), jnp.uint8),
        grid=(grid,),
        in_specs=[pl.BlockSpec((CHUNK, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CHUNK, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((256, lanes), sdtype)],
        interpret=interpret,
    )(x)


def mtf_batch(blocks: jnp.ndarray, decode: bool = False,
              interpret: bool = False) -> jnp.ndarray:
    """(B, N) u8 -> (B, N) u8 via the lane kernel; batches loop in
    lane-width groups (128..1024 — wider groups amortize fixed cost)."""
    from tpuzip.kernels.range_coder import lane_width

    b, n = blocks.shape
    pad_n = (-n) % CHUNK
    width = lane_width(b)
    outs = []
    for g in range(0, b, width):
        grp = blocks[g : g + width]
        gb = grp.shape[0]
        x = jnp.zeros((n + pad_n, width), jnp.uint8)
        x = x.at[:n, :gb].set(jnp.transpose(grp))
        y = mtf_lanes(x, decode=decode, interpret=interpret)
        outs.append(jnp.transpose(y[:n, :gb]))
    return jnp.concatenate(outs, axis=0)
