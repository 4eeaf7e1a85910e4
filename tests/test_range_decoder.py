"""Round-2 ari fast-decode machinery: exact division, chunk index, window
prepack, and both decoder formulations vs the oracle (via the XLA
reference path — interpret mode trips a jax lowering bug, so the Pallas
kernels themselves are validated on real TPU by bench/tpu_validate_r2.py;
the step math here is shared verbatim with the kernels)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpuzip.kernels import range_decoder as rd
from tpuzip.oracle import ari as oari


def _encode_with_deltas(data: bytes, n_pad: int,
                        increment=8, threshold=1 << 13):
    model = oari.TableModel(256, increment, threshold)
    enc = oari.RangeEncoder()
    counts = np.zeros(n_pad, np.int32)
    for t, b_ in enumerate(data):
        lo, hi = model.get_range(b_)
        before = len(enc.out)
        enc.encode(lo, hi, model.get_denominator())
        counts[t] = len(enc.out) - before
        model.update(b_)
    stream = enc.finish()
    nc = n_pad // rd.CHUNK_STEPS
    return stream, counts.reshape(nc, rd.CHUNK_STEPS).sum(1)


def test_u32_div_exact(rng):
    num = rng.integers(0, 2 ** 32, 100000, dtype=np.uint64).astype(np.uint32)
    den = rng.integers(1, 2 ** 24, 100000, dtype=np.uint32)
    k = rng.integers(1, 8192, 20000).astype(np.uint32)
    d2 = rng.integers(1, 2 ** 19, 20000).astype(np.uint32)
    num = np.concatenate([num, (k * d2).astype(np.uint32),
                          (k * d2 - 1).astype(np.uint32)])
    den = np.concatenate([den, d2, d2])
    ok = num.astype(np.uint64) // den.astype(np.uint64) < 2 ** 31
    num, den = num[ok], den[ok]
    q, r = rd.u32_div_exact(jnp.array(num), jnp.array(den))
    assert (np.asarray(q) == (num.astype(np.uint64)
                              // den.astype(np.uint64))).all()
    assert (np.asarray(r) == (num.astype(np.uint64)
                              % den.astype(np.uint64))).all()


def test_chunk_index_roundtrip():
    d = np.array([0, 1, 254, 255, 256, 100, 255, 0], np.int32)
    blob = rd.pack_chunk_index(d)
    assert (rd.parse_chunk_index(blob, len(d)) == d).all()
    with pytest.raises(ValueError):
        rd.parse_chunk_index(blob + b"\x01", len(d))
    with pytest.raises(ValueError):
        rd.parse_chunk_index(blob[:-1], len(d))


def test_build_windows(rng):
    CAP, L, NC, W = 600, 128, 5, 16
    comp = rng.integers(0, 256, (CAP, L), dtype=np.uint8)
    starts = np.sort(rng.integers(0, CAP, (NC, L)), axis=0).astype(np.int32)
    win = np.asarray(rd.build_windows(jnp.array(comp), jnp.array(starts), W))
    cpad = np.vstack([comp, np.zeros((8, L), np.uint8)]).astype(np.uint32)
    for k in range(NC):
        for l in (0, 127):
            for j in (0, W - 1):
                p = min(int(starts[k, l]) + 4 * j, CAP)
                exp = ((cpad[p, l] << 24) | (cpad[p + 1, l] << 16)
                       | (cpad[p + 2, l] << 8) | cpad[p + 3, l])
                assert win[k * W + j, l] == exp


@pytest.mark.parametrize("algo", ["cum", "dot"])
def test_decode_reference_vs_oracle(algo, rng):
    N = 2048  # crosses the first model halving (~step 992)
    blocks = [
        open("/root/repo/SURVEY.md", "rb").read()[:N],
        bytes(rng.integers(0, 256, N, dtype=np.uint8)),
        bytes(rng.integers(0, 4, N, dtype=np.uint8)),
        bytes(rng.integers(0, 256, 777, dtype=np.uint8)),
    ]
    lens = np.array([N, N, N, 777], np.int32)
    B = len(blocks)
    cap = 2 * N + 64
    comp = np.zeros((B, cap), np.uint8)
    deltas = np.zeros((B, N // rd.CHUNK_STEPS), np.int32)
    for i in range(B):
        s, d = _encode_with_deltas(blocks[i][: lens[i]], N)
        comp[i, : len(s)] = np.frombuffer(s, np.uint8)
        deltas[i] = d
    out = np.asarray(rd.ari_decode_batch_kernel(
        jnp.array(comp), deltas, jnp.array(lens), N, backend="reference"))
    for i in range(B):
        exp = np.frombuffer(blocks[i][: lens[i]], np.uint8)
        assert (out[i, : lens[i]] == exp).all(), (algo, i)


def test_decode_reference_nondefault_params(rng):
    N = 1024
    data = bytes(rng.integers(0, 200, N, dtype=np.uint8))
    inc, thr = 16, 1 << 12
    s, d = _encode_with_deltas(data, N, inc, thr)
    comp = np.zeros((1, 2 * N + 64), np.uint8)
    comp[0, : len(s)] = np.frombuffer(s, np.uint8)
    out = np.asarray(rd.ari_decode_batch_kernel(
        jnp.array(comp), d[None], jnp.array([N]), N, backend="reference",
        increment=inc, threshold=thr))
    assert out[0].tobytes() == data


def test_encode_indexed_deltas_match_oracle(rng):
    """The XLA encode path's chunk index equals the oracle's renorm
    trace (the TPU kernel path is checked on hardware)."""
    from tpuzip.codecs import ari as jari

    N = 1024
    data = bytes(rng.integers(0, 256, N, dtype=np.uint8))
    _, exp_deltas = _encode_with_deltas(data, N)
    comp, clen, counts = jari.encode_with_counts(
        jnp.array(np.frombuffer(data, np.uint8)), jnp.int32(N))
    got = np.asarray(counts).reshape(-1, rd.CHUNK_STEPS).sum(1)
    assert (got == exp_deltas).all()
