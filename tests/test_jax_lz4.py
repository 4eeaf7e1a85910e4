import numpy as np
import pytest

import jax.numpy as jnp

from tpuzip.codecs import lz4 as jlz4
from tpuzip.oracle import liblz4, lz4 as olz4

N = 4096  # one compiled shape for the whole module
CAP = jlz4.encode_cap(N)


def _pad(data: bytes, size: int) -> np.ndarray:
    arr = np.zeros(size, np.uint8)
    arr[: len(data)] = np.frombuffer(data, np.uint8)
    return arr


def _encode(s: bytes) -> bytes:
    out, total = jlz4.encode(jnp.array(_pad(s, N)), jnp.int32(len(s)))
    return np.asarray(out)[: int(total)].tobytes()


def _decode(comp: bytes, n_hint: int) -> bytes:
    arr = _pad(comp, CAP)
    out, olen, err = jlz4.decode(jnp.array(arr), jnp.int32(len(comp)), N)
    assert int(err) == 0, "decoder flagged error on valid stream"
    return np.asarray(out)[: int(olen)].tobytes()


def test_encode_decodes_with_oracle(samples):
    for s in samples:
        if len(s) > N:
            continue
        comp = _encode(s)
        assert olz4.decompress_block(comp) == s, f"len={len(s)}"


def test_encode_decodes_with_liblz4(samples):
    if not liblz4.available():
        pytest.skip("liblz4 not present")
    for s in samples:
        if not s or len(s) > N:
            continue
        comp = _encode(s)
        assert liblz4.decompress_block(comp, len(s)) == s


def test_decode_oracle_streams(samples):
    for s in samples:
        if len(s) > N:
            continue
        comp = olz4.compress_block(s)
        assert _decode(comp, len(s)) == s


def test_decode_liblz4_streams(samples):
    if not liblz4.available():
        pytest.skip("liblz4 not present")
    for s in samples:
        if not s or len(s) > N:
            continue
        comp = liblz4.compress_block(s)
        assert _decode(comp, len(s)) == s


def test_self_roundtrip(samples):
    for s in samples:
        if len(s) > N:
            continue
        assert _decode(_encode(s), len(s)) == s


def test_ratio_tracks_oracle(samples):
    """Dense candidate table should compress at least as well as the
    reference's greedy single-probe policy (within a small tolerance)."""
    for s in samples:
        if len(s) < 64 or len(s) > N:
            continue
        ours = len(_encode(s))
        ref = len(olz4.compress_block(s))
        assert ours <= ref * 1.02 + 16, f"{ours} vs {ref} (len={len(s)})"


def test_decode_flags_corrupt_offset():
    # crafted stream: token promises a match at offset 0 (invalid)
    bad = bytes([0x14]) + b"AAAA" + bytes([0x00, 0x00])
    arr = _pad(bad, CAP)
    _, _, err = jlz4.decode(jnp.array(arr), jnp.int32(len(bad)), N)
    assert int(err) == 1


def test_batch_roundtrip(rng):
    B = 8
    blocks = np.zeros((B, N), np.uint8)
    lens = np.zeros(B, np.int32)
    text = b"repetitive text block " * 200
    for i in range(B):
        n = int(rng.integers(0, N))
        if i % 2:
            blocks[i, :n] = np.frombuffer(text[:n], np.uint8)
        else:
            blocks[i, :n] = rng.integers(0, 256, n, dtype=np.uint8)
        lens[i] = n
    comp, clens = jlz4.encode_batch(jnp.array(blocks), jnp.array(lens))
    # re-pad compressed into decoder-shaped buffers
    carr = np.zeros((B, CAP), np.uint8)
    carr[:, : comp.shape[1]] = np.asarray(comp)
    out, olens, errs = jlz4.decode_batch(
        jnp.array(carr), jnp.array(clens), N)
    assert int(jnp.sum(errs)) == 0
    for i in range(B):
        assert int(olens[i]) == lens[i]
        assert np.array_equal(np.asarray(out)[i, : lens[i]], blocks[i, : lens[i]])


def test_decode_batch_wplanned8(rng):
    """Dword-plan decode (one gather row per 8 output bytes): bit-exact
    across text/runs/random + ragged lengths; corrupt rows isolate;
    non-8-aligned out_n falls back to the word plan."""
    import numpy as np

    from tpuzip.oracle import lz4 as olz4
    from tpuzip.runtime import native

    if not native.available():
        import pytest

        pytest.skip("native runtime not built")
    N, B = 4096, 6
    comp = np.zeros((B, N + N // 255 + 64), np.uint8)
    clens = np.zeros(B, np.int64)
    srcs = []
    for i in range(B):
        if i % 3 == 0:
            s = (b"the quick brown fox " * 300)[: N - 11 * i]
        elif i % 3 == 1:
            s = (bytes([i]) * 1500 + b"mixed tail " * 100)[: N - 7 * i]
        else:
            s = bytes(rng.integers(0, 256, N - 13 * i, dtype=np.uint8))
        srcs.append(s)
        c = olz4.compress_block(s)
        comp[i, : len(c)] = np.frombuffer(c, np.uint8)
        clens[i] = len(c)
    out, olens, errs = jlz4.decode_batch_wplanned8(comp, clens, N)
    out = np.asarray(out)
    assert not np.asarray(errs).any()
    for i in range(B):
        assert int(olens[i]) == len(srcs[i])
        assert out[i, : len(srcs[i])].tobytes() == srcs[i], i
    bad = comp.copy()
    bad[2, : int(clens[2])] = 0xFF
    _, _, e2 = jlz4.decode_batch_wplanned8(bad, clens, N)
    assert np.asarray(e2)[2] == 1 and not np.asarray(e2)[0]


def test_wplan16_decode_matches_and_isolates(rng):
    """Quad-word plan decode (16 B/gather-row): bit-exact on text/random/
    runs, ragged lengths, and corrupt streams isolate per block."""
    import numpy as np

    from tpuzip.codecs import lz4 as jlz4
    from tpuzip.oracle import lz4 as olz4
    from tpuzip.runtime import native

    if not native.available():
        pytest.skip("native runtime not built")
    N = 4096
    text = (open("/root/repo/SURVEY.md", "rb").read() * 2)
    blocks = [text[:N], rng.integers(0, 256, N, dtype=np.uint8).tobytes(),
              bytes(N), text[N : N + 1777]]
    comp = [olz4.compress_block(bk) for bk in blocks]
    cap = max(len(c) for c in comp) + 8
    rows = np.zeros((4, cap), np.uint8)
    lens = np.zeros(4, np.int32)
    for i, c in enumerate(comp):
        rows[i, : len(c)] = np.frombuffer(c, np.uint8)
        lens[i] = len(c)
    out, olens, errs = jlz4.decode_batch_wplanned16(rows, lens, N)
    assert not np.asarray(errs).any()
    for i, bk in enumerate(blocks):
        got = np.asarray(out)[i, : int(np.asarray(olens)[i])].tobytes()
        assert got == bk, i
    bad_lens = lens.copy()
    bad_lens[2] = max(int(lens[2]) - 3, 1)  # truncated stream must fail
    out, olens, errs = jlz4.decode_batch_wplanned16(rows, bad_lens, N)
    errs = np.asarray(errs)
    assert errs[2] == 1 and errs[[0, 1, 3]].sum() == 0
