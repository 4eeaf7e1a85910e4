import zlib

import numpy as np

from tpuzip.codecs import deflate as jdef
from tpuzip.codecs import zlib_ as jzlib

N = 4096  # one compiled shape


def small(samples):
    return [s for s in samples if len(s) <= N]


def test_deflate_accepted_by_zlib(samples):
    for s in small(samples):
        comp = jdef.deflate(s, n_static=N)
        assert zlib.decompress(comp, wbits=-15) == s, f"len={len(s)}"


def test_deflate_ratio_reasonable():
    text = b"the quick brown fox jumps over the lazy dog " * 80
    comp = jdef.deflate(text, n_static=N)
    ref = zlib.compress(text, 6)[2:-4]
    assert len(comp) < len(text) // 3
    assert len(comp) <= len(ref) * 1.25  # greedy vs zlib's lazy matcher


def test_inflate_zlib_streams(samples):
    for s in small(samples):
        for level in (1, 6, 9):
            raw = zlib.compress(s, level)[2:-4]
            assert jdef.inflate(raw, len(s)) == s, f"len={len(s)} lvl={level}"


def test_inflate_own_streams(samples):
    for s in small(samples):
        comp = jdef.deflate(s, n_static=N)
        assert jdef.inflate(comp, len(s)) == s


def test_inflate_stored_and_fixed():
    from tpuzip.oracle import deflate as od
    s = b"stored block data" * 10
    assert jdef.inflate(od.compress(s, mode="stored"), len(s)) == s
    assert jdef.inflate(od.compress(s, mode="fixed"), len(s)) == s


def test_zlib_container_roundtrip(samples):
    for s in small(samples)[:4]:
        comp = jzlib.compress(s, n_static=N)
        assert zlib.decompress(comp) == s       # stock zlib accepts
        assert jzlib.decompress(comp, len(s)) == s


def test_zlib_container_bad_adler(samples):
    import pytest

    s = small(samples)[-1]
    comp = bytearray(jzlib.compress(s, n_static=N))
    comp[-1] ^= 0xFF
    with pytest.raises(ValueError, match="Adler-32"):
        jzlib.decompress(bytes(comp), len(s))


def test_inflate_corrupt_stream():
    import pytest

    s = b"some text to compress " * 40
    comp = bytearray(jdef.deflate(s, n_static=N))
    comp[10] ^= 0x3C  # clobber header/code area
    try:
        out = jdef.inflate(bytes(comp), len(s))
        assert out != s  # if it decodes, it must not silently match
    except ValueError:
        pass  # expected: flagged corrupt
