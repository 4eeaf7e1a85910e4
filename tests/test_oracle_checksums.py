import zlib

from tpuzip.oracle.adler import State32, adler32
from tpuzip.oracle.xxh32 import xxh32


def test_adler32_matches_zlib(samples):
    for s in samples:
        assert adler32(s) == zlib.adler32(s)


def test_adler32_incremental(samples):
    for s in samples:
        st = State32()
        third = max(len(s) // 3, 1)
        for i in range(0, len(s), third):
            st.feed(s[i : i + third])
        assert st.result() == zlib.adler32(s)


def test_xxh32_known_vectors():
    # Published xxHash32 test vectors
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"", seed=0x9E3779B1) == 0x36B78AE7
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF
    assert xxh32(b"Hello World") == 0xB1FD16EE


def test_xxh32_lengths(rng):
    # exercise every tail-length path
    import numpy as np
    for n in range(0, 40):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        h = xxh32(data)
        assert 0 <= h <= 0xFFFFFFFF
