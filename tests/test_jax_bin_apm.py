import numpy as np

import jax.numpy as jnp

from tpuzip.codecs import bin_apm
from tpuzip.oracle import ari as oari

N = 2048


def _pad_bits(bits, n=N):
    arr = np.zeros(n, np.uint8)
    arr[: len(bits)] = bits
    return jnp.array(arr)


def _oracle_bin_encode(bits):
    model = oari.BinaryModel()
    enc = oari.RangeEncoder()
    for b in bits:
        lo, hi = model.get_range(int(b))
        enc.encode(lo, hi, model.get_denominator())
        model.update(int(b))
    return enc.finish()


def _oracle_apm_encode(bits):
    gate = oari.ApmGate()
    model = oari.BinaryModel()
    enc = oari.RangeEncoder()
    for b in bits:
        p0 = gate.pass_through(model.p0)
        lo, hi = (0, p0) if b == 0 else (p0, 1 << oari.ApmBit.BITS)
        enc.encode(lo, hi, 1 << oari.ApmBit.BITS)
        gate.update(int(b), 5)
        model.update(int(b))
    return enc.finish()


def _bitsets(rng):
    yield np.array([], np.uint8)
    yield np.array([1], np.uint8)
    yield rng.integers(0, 2, 500).astype(np.uint8)
    skew = (rng.random(1500) < 0.05).astype(np.uint8)
    yield skew
    yield np.ones(100, np.uint8)


def test_bin_encode_bit_exact(rng):
    for bits in _bitsets(rng):
        comp, clen = bin_apm.encode_bits(_pad_bits(bits), jnp.int32(len(bits)))
        got = np.asarray(comp)[: int(clen)].tobytes()
        assert got == _oracle_bin_encode(bits), f"n={len(bits)}"


def test_bin_decode_roundtrip(rng):
    cap = bin_apm.encode_cap(N)
    for bits in _bitsets(rng):
        comp = _oracle_bin_encode(bits)
        arr = np.zeros(cap, np.uint8)
        arr[: len(comp)] = np.frombuffer(comp, np.uint8)
        out = bin_apm.decode_bits(jnp.array(arr), jnp.int32(len(bits)), N)
        assert np.asarray(out)[: len(bits)].tolist() == bits.tolist()


def test_apm_encode_bit_exact(rng):
    for bits in _bitsets(rng):
        comp, clen = bin_apm.encode_bits(
            _pad_bits(bits), jnp.int32(len(bits)), use_apm=True)
        got = np.asarray(comp)[: int(clen)].tobytes()
        assert got == _oracle_apm_encode(bits), f"n={len(bits)}"


def test_apm_decode_roundtrip(rng):
    cap = bin_apm.encode_cap(N)
    for bits in _bitsets(rng):
        comp = _oracle_apm_encode(bits)
        arr = np.zeros(cap, np.uint8)
        arr[: len(comp)] = np.frombuffer(comp, np.uint8)
        out = bin_apm.decode_bits(jnp.array(arr), jnp.int32(len(bits)), N,
                                  use_apm=True)
        assert np.asarray(out)[: len(bits)].tolist() == bits.tolist()


def test_skewed_bits_compress(rng):
    bits = (rng.random(N) < 0.03).astype(np.uint8)
    comp, clen = bin_apm.encode_bits(jnp.array(bits), jnp.int32(N))
    assert int(clen) < N // 16  # << 1 bit per symbol
