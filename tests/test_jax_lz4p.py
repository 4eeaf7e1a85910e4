import numpy as np

import jax.numpy as jnp

from tpuzip.codecs import lz4 as jlz4, lz4p

N = 4096
CAP = lz4p.encode_cap(N)


def _pad(data: bytes, size: int) -> np.ndarray:
    arr = np.zeros(size, np.uint8)
    arr[: len(data)] = np.frombuffer(data, np.uint8)
    return arr


def _roundtrip(s: bytes):
    comp, clen = lz4p.encode(jnp.array(_pad(s, N)), jnp.int32(len(s)))
    carr = np.zeros(CAP, np.uint8)
    carr[: int(clen)] = np.asarray(comp)[: int(clen)]
    out, olen, err = lz4p.decode(jnp.array(carr), clen, N)
    assert int(err) == 0, f"err flagged, len={len(s)}"
    assert int(olen) == len(s)
    assert np.asarray(out)[: len(s)].tobytes() == s
    return int(clen)


def test_lz4p_roundtrip(samples):
    for s in samples:
        if len(s) > N:
            continue
        _roundtrip(s)


def test_lz4p_deep_chains():
    # long chained references: "ab" * 2048 gives matches-of-matches
    s = (b"ab" * (N // 2))[:N]
    _roundtrip(s)
    s2 = bytes(range(64)) * (N // 64)
    _roundtrip(s2)


def test_lz4p_ratio_vs_lz4():
    # columnar overhead is bounded: ~3 extra bytes per sequence
    s = b"the quick brown fox jumps over the lazy dog " * 90
    p_len = _roundtrip(s[:N])
    comp, clen = jlz4.encode(jnp.array(_pad(s[:N], N)), jnp.int32(min(len(s), N)))
    assert p_len < len(s[:N])          # still compresses
    assert p_len < int(clen) * 2       # within 2x of LZ4 proper


def test_lz4p_batch(rng):
    B = 4
    blocks = np.zeros((B, N), np.uint8)
    lens = np.array([0, 100, 2048, 4096], np.int32)
    text = (b"batch parallel decode " * 200)[:N]
    blocks[1, :100] = np.frombuffer(text[:100], np.uint8)
    blocks[2, :2048] = rng.integers(0, 256, 2048, dtype=np.uint8)
    blocks[3] = np.frombuffer(text, np.uint8)
    comp, clens = lz4p.encode_batch(jnp.array(blocks), jnp.array(lens))
    carr = np.zeros((B, CAP), np.uint8)
    cnp = np.asarray(comp)
    carr[:, : cnp.shape[1]] = cnp
    out, olens, errs = lz4p.decode_batch(jnp.array(carr),
                                         jnp.array(np.asarray(clens)), N)
    assert int(np.asarray(errs).sum()) == 0
    for i in range(B):
        assert np.asarray(out)[i, : lens[i]].tobytes() == \
            blocks[i, : lens[i]].tobytes()


def test_lz4p_corrupt_flags():
    s = b"corruptible " * 200
    comp, clen = lz4p.encode(jnp.array(_pad(s[:N], N)), jnp.int32(min(len(s), N)))
    carr = np.asarray(comp).copy()
    carr[4] ^= 0x7F  # clobber orig_len header
    out, olen, err = lz4p.decode(jnp.array(carr), clen, N)
    assert int(err) == 1
