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


def test_pallas_dc_decode_interpret(rng):
    from tpuzip.codecs import dc as jdc
    from tpuzip.oracle import bwt as obwt, dc as odc

    N = 2048
    cases = [
        obwt.encode_block(
            open("/root/repo/SURVEY.md", "rb").read()[:N])[0],  # runs
        bytes(rng.integers(0, 256, N, dtype=np.uint8)),
        b"a" * N,
        (b"ababab" * 400)[:N],
        b"z" * 17,                                              # ragged
    ]
    B = len(cases)
    cap = jdc.encode_cap(N)
    comp = np.zeros((B, cap), np.uint8)
    clens = np.zeros(B, np.int64)
    for i, c in enumerate(cases):
        e = odc.encode(c)
        comp[i, : len(e)] = np.frombuffer(e, np.uint8)
        clens[i] = len(e)
    ms = int(clens.max()) - jdc.HDR
    out, olens, errs = jdc.decode_batch_kernel(
        jnp.array(comp), clens, N, ms, interpret=True)
    out = np.asarray(out)
    for i, c in enumerate(cases):
        assert int(np.asarray(errs)[i]) == 0, i
        assert int(np.asarray(olens)[i]) == len(c), i
        assert out[i, : len(c)].tobytes() == c, i
    # corrupt stream flags its own lane only (case 0 has a real body)
    bad = comp.copy()
    bad[0, jdc.HDR + 2] ^= 0x80
    _, _, err2 = jdc.decode_batch_kernel(jnp.array(bad), clens, N, ms,
                                         interpret=True)
    err2 = np.asarray(err2)
    assert err2[0] == 1 and err2[1] == 0 and err2[2] == 0
