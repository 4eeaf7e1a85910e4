import zlib

import pytest

from tpuzip.oracle import deflate
from tpuzip.oracle import zlib_ as ozlib


def test_inflate_vs_stdlib(samples):
    for s in samples:
        for level in (1, 6, 9):
            raw = zlib.compress(s, level)[2:-4]  # strip zlib header/adler
            assert deflate.decompress(raw) == s


def test_deflate_modes_accepted_by_stdlib(samples):
    for s in samples:
        for mode in ("stored", "fixed", "dynamic"):
            comp = deflate.compress(s, mode=mode)
            assert zlib.decompress(comp, wbits=-15) == s


def test_deflate_self_roundtrip(samples):
    for s in samples:
        comp = deflate.compress(s, mode="dynamic")
        assert deflate.decompress(comp) == s


def test_dynamic_beats_stored_on_text():
    text = b"the quick brown fox jumps over the lazy dog " * 500
    dyn = deflate.compress(text, mode="dynamic")
    assert len(dyn) < len(text) // 4


def test_zlib_container_roundtrip(samples):
    for s in samples:
        comp = ozlib.compress(s)
        assert ozlib.decompress(comp) == s
        # interop both ways
        assert zlib.decompress(comp) == s
        assert ozlib.decompress(zlib.compress(s, 6)) == s


def test_zlib_detects_bad_adler(samples):
    comp = bytearray(ozlib.compress(samples[-1]))
    comp[-1] ^= 0xFF
    with pytest.raises(ValueError, match="Adler-32"):
        ozlib.decompress(bytes(comp))


def test_zlib_rejects_bad_header():
    with pytest.raises(ValueError):
        ozlib.decompress(b"\x79\x01" + b"\x00" * 16)  # FCHECK fails


def test_stored_len_nlen_error():
    # valid header bits for a stored block but corrupted NLEN
    comp = bytearray(deflate.compress(b"hello world", mode="stored"))
    comp[2] ^= 0xFF  # NLEN low byte
    with pytest.raises(ValueError, match="LEN/NLEN"):
        deflate.decompress(bytes(comp))


def test_package_merge_kraft():
    freqs = {i: (i + 1) ** 2 for i in range(100)}
    lengths = deflate.package_merge(freqs, 15)
    kraft = sum(2 ** (15 - l) for l in lengths.values())
    assert kraft == 2 ** 15  # complete code
    assert max(lengths.values()) <= 15


def test_package_merge_tight_limit():
    freqs = {i: 2 ** i for i in range(16)}  # would want depth 15+ unlimited
    lengths = deflate.package_merge(freqs, 8)
    assert max(lengths.values()) <= 8
    assert sum(2 ** (8 - l) for l in lengths.values()) <= 2 ** 8
