"""Vectorized checksums on device.

Adler-32 as fully-parallel segmented sums (no scan): the stream is cut into
NMAX-byte chunks; within a chunk the weighted sum uses local weights
(bounded so the u32 partial sums cannot overflow), and the global weight is
factored out per chunk:

    sum_i (length - i) * d_i
      = sum_c [ (length - end_c) * chunk_sum_c  +  sum_{i in c} (end_c - i) * d_i ]

with every per-chunk term reduced mod 65521 before the final tree-sum, and
the tree-sum itself re-reduced every 4096 terms so no u32 partial can wrap.
Validated bit-exactly against ``zlib.adler32``.  Valid for any block size
the padded-buffer shape allows (the mod-tree keeps partials < 2^28).

Reference parity: rust-compress ``src/checksum/adler.rs`` (same NMAX idea,
width-parallel instead of loop-carried).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MOD = 65521
# 255 * NMAX * (NMAX+1) / 2 must fit u32  ->  NMAX = 4096 gives 2.14e9. OK.
NMAX = 4096


def _mod_sum(vals: jnp.ndarray) -> jnp.ndarray:
    """Sum of uint32 values, each < MOD, reduced mod MOD without u32 wrap.

    Groups of 4096 values < 65521 sum to < 2^28; re-reducing between levels
    keeps every partial in range for arbitrarily many terms."""
    v = vals
    while v.size > 4096:
        pad = (-v.size) % 4096
        v = jnp.pad(v, (0, pad)).reshape(-1, 4096).sum(axis=1) % MOD
    return v.sum() % MOD


def adler32(block: jnp.ndarray, length: jnp.ndarray) -> jnp.ndarray:
    """Adler-32 of ``block[:length]``; block (N,) u8 zero-padded, length i32.
    Returns scalar uint32."""
    n = block.shape[0]
    length = jnp.asarray(length, jnp.int32)
    data = jnp.where(jnp.arange(n) < length, block.astype(jnp.uint32), 0)
    num_chunks = -(-n // NMAX)
    padded = jnp.zeros(num_chunks * NMAX, dtype=jnp.uint32).at[:n].set(data)
    chunks = padded.reshape(num_chunks, NMAX)

    chunk_sums = chunks.sum(axis=1)                        # <= 255*4096
    # local weighted sum: weights end_c - i run NMAX..1 within the chunk
    local_w = jnp.arange(NMAX, 0, -1, dtype=jnp.uint32)
    local = (chunks * local_w).sum(axis=1) % MOD           # <= 2.14e9 pre-mod

    ends = (jnp.arange(num_chunks, dtype=jnp.int32) + 1) * NMAX
    head = ((length - ends) % MOD).astype(jnp.uint32)      # non-negative mod
    terms = (head * (chunk_sums % MOD)) % MOD              # <= 65520^2 < 2^32

    s1 = (1 + _mod_sum(chunk_sums % MOD)) % MOD
    s2 = ((length % MOD).astype(jnp.uint32) + _mod_sum(terms)
          + _mod_sum(local)) % MOD
    return ((s2 << 16) | s1).astype(jnp.uint32)


def adler32_batch(blocks: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """(B, N) u8 + (B,) i32 -> (B,) u32 — one checksum per block."""
    return jax.vmap(adler32)(blocks, lengths)


# ---------------------------------------------------------------------------
# Host-side STREAMING checksums for the L4 adapters.  The oracle classes
# (oracle.adler.State32, oracle.xxh32.Xxh32State) are the pure-Python
# format ground truth; these wrappers produce identical digests through
# the native runtime's bulk loops (zlib.adler32 / tpz_xxh32_stripes) so a
# frame writer's checksum never bounds its throughput.
# ---------------------------------------------------------------------------


class AdlerStream:
    """Streaming Adler-32 (oracle.adler.State32 interface: feed/result)."""

    def __init__(self) -> None:
        self.value = 1

    def feed(self, data: bytes) -> None:
        import zlib

        self.value = zlib.adler32(bytes(data), self.value)

    def result(self) -> int:
        return self.value


class Xxh32Stream:
    """Streaming xxHash32, digest-identical to oracle.xxh32.Xxh32State;
    complete 16-byte stripes go through the native bulk loop when the
    runtime is built (pure-Python fallback otherwise)."""

    def __init__(self, seed: int = 0) -> None:
        from tpuzip.oracle.xxh32 import Xxh32State

        self._st = Xxh32State(seed)
        try:
            from tpuzip.runtime import native

            self._native = native if native.available() else None
        except Exception:
            self._native = None

    def update(self, data: bytes) -> None:
        st = self._st
        if self._native is None or len(data) < 1024:
            st.update(bytes(data))
            return
        import numpy as np

        buf = st.tail + bytes(data)
        ns = len(buf) // 16
        v = np.array(st.v, np.uint32)
        self._native.xxh32_stripes(v, buf, ns)
        st.v = [int(x) for x in v]
        st.tail = buf[ns * 16:]
        st.total += len(data)

    def digest(self) -> int:
        return self._st.digest()
