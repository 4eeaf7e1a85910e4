import zlib

import numpy as np

import jax.numpy as jnp

from tpuzip.core import bitio, blocks
from tpuzip.core.checksum import adler32, adler32_batch
from tpuzip.oracle import rle as orle
from tpuzip.codecs import rle as jrle


def test_chunk_roundtrip(samples):
    for s in samples:
        for bs in (256, 1000, 4096):
            b, l = blocks.chunk(s, bs)
            assert blocks.unchunk(b, l) == s


def test_chunk_padded():
    b, l = blocks.chunk_padded(b"x" * 1000, 256, 8)
    assert b.shape[0] % 8 == 0
    assert blocks.unchunk(b, l) == b"x" * 1000


def test_adler32_vs_zlib(samples):
    # single fixed buffer shape -> one XLA compilation for the whole loop
    N = 65536
    for s in samples:
        if len(s) > N:
            continue
        arr = np.zeros(N, np.uint8)
        arr[: len(s)] = np.frombuffer(s, np.uint8)
        got = int(adler32(jnp.array(arr), jnp.int32(len(s))))
        assert got == zlib.adler32(s), f"len={len(s)}"


def test_adler32_batch(rng):
    data = rng.integers(0, 256, (4, 1024), dtype=np.uint8)
    lens = np.array([0, 1, 512, 1024], np.int32)
    got = adler32_batch(jnp.array(data), jnp.array(lens))
    for i in range(4):
        assert int(got[i]) == zlib.adler32(data[i, : lens[i]].tobytes())


def test_pack_bytes_varlen():
    chunks = jnp.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], dtype=jnp.uint8)
    lens = jnp.array([2, 0, 3], jnp.int32)
    out, total = bitio.pack_bytes_varlen(chunks, lens, 16)
    assert int(total) == 5
    assert list(np.asarray(out[:5])) == [1, 2, 7, 8, 9]


def test_pack_bits_lsb_matches_bitwriter():
    from tpuzip.oracle.deflate import BitWriter

    fields = [(0b101, 3), (0b1, 1), (0xFF, 8), (0, 2), (0b1101, 4)]
    bw = BitWriter()
    for v, n in fields:
        bw.bits(v, n)
    expect = bw.finish()
    vals = jnp.array([v for v, _ in fields], jnp.uint32)
    nb = jnp.array([n for _, n in fields], jnp.int32)
    out, total = bitio.pack_bits_lsb(vals, nb, 64, 16)
    assert int(total) == sum(n for _, n in fields)
    nbytes = (int(total) + 7) // 8
    assert bytes(np.asarray(out[:nbytes])) == expect


def test_bit_reverse():
    vals = jnp.array([0b110, 0b1], jnp.uint32)
    nb = jnp.array([3, 2], jnp.int32)
    out = bitio.bit_reverse(vals, nb, 15)
    assert list(np.asarray(out)) == [0b011, 0b10]


def _jax_rle_roundtrip(s: bytes, n: int = 8192):
    # fixed n keeps every call on the same compiled executable
    arr = np.zeros(n, np.uint8)
    arr[: len(s)] = np.frombuffer(s, np.uint8)
    comp, clen = jrle.encode(jnp.array(arr), jnp.int32(len(s)))
    comp_np = np.asarray(comp)[: int(clen)].tobytes()
    # 1) our stream decodes with the oracle
    assert orle.decode(comp_np) == s
    # 2) oracle stream decodes with the JAX decoder
    ocomp = orle.encode(s)
    cap = jrle.encode_cap(n)
    oarr = np.zeros(cap, np.uint8)
    oarr[: len(ocomp)] = np.frombuffer(ocomp, np.uint8)
    out, olen = jrle.decode(jnp.array(oarr), jnp.int32(len(ocomp)), n)
    assert int(olen) == len(s)
    assert np.asarray(out)[: len(s)].tobytes() == s
    # 3) self round-trip
    carr = np.zeros(cap, np.uint8)
    carr[: len(comp_np)] = np.frombuffer(comp_np, np.uint8)
    out2, olen2 = jrle.decode(jnp.array(carr), jnp.int32(len(comp_np)), n)
    assert np.asarray(out2)[: int(olen2)].tobytes() == s


def test_jax_rle_vs_oracle(samples):
    for s in samples:
        if len(s) > 8192:
            continue
        _jax_rle_roundtrip(s)


def test_jax_rle_long_runs():
    for n in (255, 256, 257, 258, 511, 512, 513, 1000):
        _jax_rle_roundtrip(b"z" * n)


def test_pack_bytes_varlen_sorted_matches_scatter(rng):
    """The sort-compaction packer (round 4, DC encode hot path) is a
    drop-in for the scatter packer on fuzzed shapes incl. zero-length
    chunks and tight caps."""
    import numpy as np

    for _ in range(20):
        t = int(rng.integers(1, 40))
        k = int(rng.integers(1, 9))
        chunks = jnp.array(rng.integers(0, 256, (t, k)), jnp.uint8)
        lens = jnp.array(rng.integers(0, k + 1, t), jnp.int32)
        cap = int(lens.sum()) + int(rng.integers(0, 16))
        cap = max(cap, 1)
        a, ta = bitio.pack_bytes_varlen(chunks, lens, cap)
        b, tb = bitio.pack_bytes_varlen_sorted(chunks, lens, cap)
        assert int(ta) == int(tb)
        assert np.asarray(a).tolist() == np.asarray(b).tolist()
