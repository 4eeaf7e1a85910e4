"""Lane-parallel DC (distance coding) decode — Pallas TPU kernel.

Reference parity: the decoder half of src/bwt/dc.rs (run walk over the
scheduler table).  Same lane pattern as the MTF/ari kernels: 128
independent blocks advance ONE RUN per VPU step; the scheduler state
``sched[sym, lane]`` (256, 128) i32 lives in VMEM scratch.  The varint
distance stream is pre-parsed in parallel by XLA (codecs/dc._parse_varints
— LEB128 is self-delimiting) and streams into the kernel as a dense
(T, 128) i32 input, so the kernel needs no byte pulls at all.

Per step, everything is one-hot masked vector math (no gathers):

  hit      = sched == pos                      # <= 1 True per lane
  nxt      = min(where(hit, INF, sched), len)  # next run head
  sym      = sum(where(hit, iota256, 0))
  resched  = where(hit & d>0, nxt-1+d, INF at hit)

Outputs are per-step run triples (start, len, sym) as (T, 128) i32; the
run-expansion to bytes is the existing parallel fill in codecs/dc.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
CHUNK = 256
GROUP = 8   # i32 sublane tile height — aligned slab size
INF = 0x7FFFFFFF


def _dc_decode_kernel(vals_ref, first_ref, len_ref,
                      start_ref, rlen_ref, sym_ref, err_ref,
                      sched, pos_r, err_r):
    lanes = err_ref.shape[1]
    length = len_ref[0, :]

    @pl.when(pl.program_id(0) == 0)
    def _():
        first = first_ref[:, :]
        sched[:, :] = jnp.where(first < length[None, :], first,
                                jnp.int32(INF))
        pos_r[0, :] = jnp.zeros((lanes,), jnp.int32)
        err_r[0, :] = jnp.zeros((lanes,), jnp.int32)

    iota256 = jax.lax.broadcasted_iota(jnp.int32, (256, lanes), 0)

    def group_body(g, _):
        base = pl.multiple_of(g * GROUP, GROUP)
        slab = vals_ref[pl.ds(base, GROUP), :]          # (8, lanes) i32
        srows, lrows, yrows = [], [], []
        for j in range(GROUP):
            d = slab[j, :]
            pos = pos_r[0, :]
            active = pos < length
            st = sched[:, :]
            hit = st == pos[None, :]
            anyh = jnp.max(jnp.where(hit, 1, 0), axis=0) > 0
            cleared = jnp.where(hit, jnp.int32(INF), st)
            nxt = jnp.minimum(jnp.min(cleared, axis=0), length)
            target = nxt - 1 + d
            bad = active & ((~anyh) | ((d > 0) & ((target >= length)
                                                  | (target < nxt))))
            resched = jnp.where(
                hit & (d > 0)[None, :] & (~bad)[None, :],
                target[None, :], cleared)
            s = jnp.sum(jnp.where(hit, iota256, 0), axis=0,
                        dtype=jnp.int32)
            srows.append(jnp.where(active, pos, 0))
            lrows.append(jnp.where(active, nxt - pos, 0))
            yrows.append(jnp.where(active, s, 0))
            sched[:, :] = jnp.where(active[None, :], resched, st)
            pos_r[0, :] = jnp.where(active, nxt, pos)
            err_r[0, :] = err_r[0, :] | bad.astype(jnp.int32)
        start_ref[pl.ds(base, GROUP), :] = jnp.stack(srows)
        rlen_ref[pl.ds(base, GROUP), :] = jnp.stack(lrows)
        sym_ref[pl.ds(base, GROUP), :] = jnp.stack(yrows)
        return 0

    jax.lax.fori_loop(0, CHUNK // GROUP, group_body, 0)

    # an unfinished walk (steps exhausted before pos reached length) is an
    # error — folded in on the final grid step
    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        err_r[0, :] = err_r[0, :] | (pos_r[0, :] < length).astype(jnp.int32)

    err_ref[0, :] = err_r[0, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def dc_decode_lanes(vals: jnp.ndarray, first: jnp.ndarray,
                    lengths: jnp.ndarray, interpret: bool = False):
    """vals: (T, L) i32 pre-parsed distances time-major (L a multiple of
    128, up to MAX_LANES — wide groups amortize the fixed per-step cost);
    first: (256, L) i32 per-symbol first occurrence; lengths: (L,) i32.
    Returns (starts, run_lens, syms) (T, L) i32 + err (L,) i32."""
    t, lanes = vals.shape
    assert lanes % LANES == 0 and t % CHUNK == 0
    grid = t // CHUNK
    starts, rlens, syms, err = pl.pallas_call(
        _dc_decode_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t, lanes), jnp.int32),
            jax.ShapeDtypeStruct((t, lanes), jnp.int32),
            jax.ShapeDtypeStruct((t, lanes), jnp.int32),
            jax.ShapeDtypeStruct((1, lanes), jnp.int32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((CHUNK, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((CHUNK, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((256, lanes), jnp.int32),  # sched
            pltpu.VMEM((1, lanes), jnp.int32),    # pos
            pltpu.VMEM((1, lanes), jnp.int32),    # err
        ],
        interpret=interpret,
    )(vals, first, lengths.reshape(1, lanes).astype(jnp.int32))
    return starts, rlens, syms, err[0]
