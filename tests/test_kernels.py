"""Pallas kernel tests (interpret mode — CPU-hermetic).

The ari encode kernel currently trips a jax interpret-mode lowering bug
(closed_call cache KeyError) on CPU; it is validated bit-exactly against the
oracle on real TPU hardware instead (see commit log / BASELINE.md), and the
XLA-scan ari codec covers the format on CPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpuzip.kernels import mtf_scan
from tpuzip.oracle import mtf as omtf


def test_pallas_mtf_encode_interpret(rng):
    B, N = 5, 512
    blocks = rng.integers(0, 256, (B, N), dtype=np.uint8)
    enc = np.asarray(mtf_scan.mtf_batch(jnp.array(blocks), interpret=True))
    for i in range(B):
        assert enc[i].tobytes() == omtf.encode(blocks[i].tobytes()), i


def test_pallas_mtf_decode_interpret(rng):
    B, N = 3, 256
    blocks = rng.integers(0, 256, (B, N), dtype=np.uint8)
    enc = np.asarray(mtf_scan.mtf_batch(jnp.array(blocks), interpret=True))
    dec = np.asarray(mtf_scan.mtf_batch(jnp.array(enc), decode=True,
                                        interpret=True))
    for i in range(B):
        assert dec[i].tobytes() == blocks[i].tobytes(), i


def test_pallas_mtf_many_lanes(rng):
    # full 128-lane width + text-like data
    B, N = 128, 256
    blocks = np.tile(np.frombuffer(b"abracadabra abba " * 16, np.uint8)[:N],
                     (B, 1)).copy()
    blocks[1::2] = rng.integers(0, 256, ((B + 1) // 2, N), dtype=np.uint8)
    enc = np.asarray(mtf_scan.mtf_batch(jnp.array(blocks), interpret=True))
    for i in (0, 1, 64, 127):
        assert enc[i].tobytes() == omtf.encode(blocks[i].tobytes()), i
