import pytest

from tpuzip.oracle import liblz4, lz4


def test_block_roundtrip(samples):
    for s in samples:
        comp = lz4.compress_block(s)
        assert lz4.decompress_block(comp) == s


def test_block_vs_liblz4_decode(samples):
    """Our encoder's blocks must decode with the real liblz4."""
    if not liblz4.available():
        pytest.skip("liblz4 not present")
    for s in samples:
        if not s:
            continue  # liblz4 rejects 0-size dst
        comp = lz4.compress_block(s)
        assert liblz4.decompress_block(comp, len(s)) == s


def test_block_decode_of_liblz4_output(samples):
    """Our decoder must decode real liblz4 blocks bit-exactly."""
    if not liblz4.available():
        pytest.skip("liblz4 not present")
    for s in samples:
        if not s:
            continue
        comp = liblz4.compress_block(s)
        assert lz4.decompress_block(comp) == s


def test_frame_roundtrip(samples):
    for s in samples:
        for block_max in (1 << 16, 1 << 20):
            fr = lz4.compress_frame(s, block_max=block_max)
            assert lz4.decompress_frame(fr) == s


def test_frame_detects_corrupt_content_checksum(samples):
    s = samples[-1]
    fr = bytearray(lz4.compress_frame(s, content_checksum=True))
    fr[-1] ^= 0xFF
    with pytest.raises(ValueError, match="content checksum"):
        lz4.decompress_frame(bytes(fr))


def test_frame_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        lz4.decompress_frame(b"\x00\x00\x00\x00\x00\x00\x00\x00")


def test_compression_ratio_on_text():
    text = (b"the quick brown fox jumps over the lazy dog " * 1000)
    comp = lz4.compress_block(text)
    assert len(comp) < len(text) // 5
