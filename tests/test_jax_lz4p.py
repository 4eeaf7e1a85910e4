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


def test_lz4p_native_host_stage_interchange(rng):
    """Threaded C++ lz4p encode/decode: round-trips, interchanges with the
    device formulation in BOTH directions, and isolates corrupt blocks."""
    import jax
    import jax.numpy as jnp

    from tpuzip.runtime import native

    if not native.available():
        pytest.skip("native runtime not built")
    N = 8192
    text = (open("/root/repo/SURVEY.md", "rb").read() * 2)
    rows = np.zeros((3, N), np.uint8)
    rows[0] = np.frombuffer(text[:N], np.uint8)
    rows[1] = rng.integers(0, 256, N, dtype=np.uint8)
    lens = np.array([N, N, 3000], np.int32)
    rows[2, :3000] = np.frombuffer(text[N : N + 3000], np.uint8)
    comp, cl = native.lz4p_encode_batch(rows, lens)
    out, st = native.lz4p_decode_batch_native(comp, cl.astype(np.int32), N)
    for i in range(3):
        assert st[i] == lens[i]
        assert out[i, : lens[i]].tobytes() == rows[i, : lens[i]].tobytes()
    # native streams decode on the device formulation...
    dout, _, derr = jax.jit(lz4p.decode_batch, static_argnums=2)(
        jnp.array(comp[:, : int(cl.max()) + 8]),
        jnp.array(cl.astype(np.int32)), N)
    assert not np.asarray(derr).any()
    for i in range(3):
        assert np.asarray(dout)[i, : lens[i]].tobytes() == \
            rows[i, : lens[i]].tobytes()
    # ...and device streams decode natively
    denc, dcl = jax.jit(lz4p.encode_batch)(jnp.array(rows), jnp.array(lens))
    out2, st2 = native.lz4p_decode_batch_native(
        np.asarray(denc), np.asarray(dcl, np.int32), N)
    for i in range(3):
        assert st2[i] == lens[i]
        assert out2[i, : lens[i]].tobytes() == rows[i, : lens[i]].tobytes()
    # truncated stream -> negative status for that block only
    bad = cl.astype(np.int32).copy()
    bad[0] = 7
    _, st3 = native.lz4p_decode_batch_native(comp, bad, N)
    assert st3[0] < 0 and st3[1] == lens[1] and st3[2] == lens[2]
