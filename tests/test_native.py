import zlib

import numpy as np
import pytest

from tpuzip.oracle import ari as oari, lz4 as olz4, rle as orle
from tpuzip.oracle.xxh32 import xxh32 as oxxh32
from tpuzip.runtime import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native runtime not built")


def test_native_checksums(samples):
    for s in samples:
        assert native.adler32(s) == zlib.adler32(s)
        assert native.xxh32(s) == oxxh32(s)


def test_native_lz4_bit_exact(samples):
    for s in samples:
        comp = native.lz4_compress(s)
        assert comp == olz4.compress_block(s)  # identical greedy policy
        assert native.lz4_decompress(comp, len(s) + 64) == s


def test_native_rle_bit_exact(samples):
    for s in samples:
        comp = native.rle_encode(s)
        assert comp == orle.encode(s)
        assert native.rle_decode(comp, len(s) + 64) == s


def test_native_ari_bit_exact(samples):
    for s in samples:
        if len(s) > 20000:
            continue
        comp = native.ari_encode(s)
        assert comp == oari.encode_bytes(s)
        assert native.ari_decode(comp, len(s)) == s


def test_native_payload_pack_roundtrip(rng):
    B, CAP = 16, 100
    comp = rng.integers(0, 256, (B, CAP), dtype=np.uint8)
    lens = rng.integers(0, CAP + 1, B).astype(np.int32)
    stream = native.pack_payloads(comp, lens)
    expect = b"".join(comp[i, : lens[i]].tobytes() for i in range(B))
    assert stream == expect
    back = native.unpack_payloads(stream, lens, CAP)
    for i in range(B):
        assert back[i, : lens[i]].tobytes() == comp[i, : lens[i]].tobytes()
