import numpy as np

import jax
import jax.numpy as jnp

from tpuzip.codecs import ari as jari, bwt as jbwt, mtf as jmtf
from tpuzip.oracle import ari as oari, bwt as obwt, mtf as omtf

N = 2048  # one compiled shape per module


def _pad(data: bytes, size: int) -> np.ndarray:
    arr = np.zeros(size, np.uint8)
    arr[: len(data)] = np.frombuffer(data, np.uint8)
    return arr


def small(samples):
    return [s for s in samples if len(s) <= N]


# ---------------------------------------------------------------- ari

def test_ari_encode_bit_exact_vs_oracle(samples):
    for s in small(samples):
        comp, clen = jari.encode(jnp.array(_pad(s, N)), jnp.int32(len(s)))
        got = np.asarray(comp)[: int(clen)].tobytes()
        assert got == oari.encode_bytes(s), f"len={len(s)}"


def test_ari_decode_bit_exact_vs_oracle(samples):
    cap = jari.encode_cap(N)
    for s in small(samples):
        comp = oari.encode_bytes(s)
        out = jari.decode(jnp.array(_pad(comp, cap)), jnp.int32(len(s)), N)
        assert np.asarray(out)[: len(s)].tobytes() == s


def test_ari_batch(rng):
    B = 4
    blocks = np.zeros((B, N), np.uint8)
    lens = np.zeros(B, np.int32)
    for i in range(B):
        n = int(rng.integers(1, N))
        blocks[i, :n] = rng.choice([0, 1, 2, 50], size=n).astype(np.uint8)
        lens[i] = n
    comp, clens = jari.encode_batch(jnp.array(blocks), jnp.array(lens))
    for i in range(B):
        got = np.asarray(comp[i])[: int(clens[i])].tobytes()
        expect = oari.encode_bytes(blocks[i, : lens[i]].tobytes())
        assert got == expect


# ---------------------------------------------------------------- mtf

def test_mtf_vs_oracle(samples):
    for s in small(samples):
        enc = jmtf.encode(jnp.array(_pad(s, N)), jnp.int32(len(s)))
        assert np.asarray(enc)[: len(s)].tobytes() == omtf.encode(s)
        oenc = omtf.encode(s)
        dec = jmtf.decode(jnp.array(_pad(oenc, N)), jnp.int32(len(s)))
        assert np.asarray(dec)[: len(s)].tobytes() == s


# ---------------------------------------------------------------- bwt

def test_bwt_forward_vs_oracle(samples):
    for s in small(samples):
        L, origin = jbwt.encode_block(jnp.array(_pad(s, N)), jnp.int32(len(s)))
        oL, oorigin = obwt.encode_block(s)
        assert np.asarray(L)[: len(s)].tobytes() == oL, f"len={len(s)}"
        if len(s):
            assert int(origin) == oorigin


def test_bwt_inverse_vs_oracle(samples):
    for s in small(samples):
        oL, oorigin = obwt.encode_block(s)
        out = jbwt.decode_block(
            jnp.array(_pad(oL, N)), jnp.int32(oorigin), jnp.int32(len(s)))
        assert np.asarray(out)[: len(s)].tobytes() == s


def test_bwt_periodic_inputs():
    # periodic strings leave tied ranks — the stable tie-break must match
    for s in (b"abab" * 64, b"aaaa" * 64, b"xyzxyz" * 50):
        L, origin = jbwt.encode_block(jnp.array(_pad(s, N)), jnp.int32(len(s)))
        oL, oorigin = obwt.encode_block(s)
        assert np.asarray(L)[: len(s)].tobytes() == oL
        assert int(origin) == oorigin
        out = jbwt.decode_block(L, origin, jnp.int32(len(s)))
        assert np.asarray(out)[: len(s)].tobytes() == s


def test_bwt_pipeline_with_mtf_ari(rng):
    # the intended stack: bwt -> mtf -> ari, all on device
    s = (b"abracadabra banana abracadabra " * 40)[: N // 2]
    block = jnp.array(_pad(s, N))
    ln = jnp.int32(len(s))
    L, origin = jbwt.encode_block(block, ln)
    m = jmtf.encode(L, ln)
    comp, clen = jari.encode(m, ln)
    assert int(clen) < len(s)  # compresses
    cap = jari.encode_cap(N)
    m2 = jari.decode(jnp.array(_pad(
        np.asarray(comp)[: int(clen)].tobytes(), cap)), ln, N)
    L2 = jmtf.decode(m2, ln)
    out = jbwt.decode_block(L2, origin, ln)
    assert np.asarray(out)[: len(s)].tobytes() == s


def test_bwt_encode_batch_fast_packed_mode(rng):
    """Round 3: the packed u32 doubling sort (all-full rows, n <= 65536,
    rank pairs in single keys) must produce oracle suffix arrays — incl.
    periodic ties (packed single-key final sort) and the early-exit path."""
    from tpuzip.codecs.bwt import _encode_batch_fast
    from tpuzip.oracle import bwt as obwt

    for n in (256, 1024, 65536):
        text = (open("/root/repo/SURVEY.md", "rb").read() * 3)[:n]
        rows = np.stack([
            np.frombuffer(text, np.uint8),
            rng.integers(0, 256, n, dtype=np.uint8),
            np.frombuffer((b"ab" * (n // 2))[:n], np.uint8),  # periodic
            np.zeros(n, np.uint8),                            # constant
        ])
        lens = np.full(4, n, np.int32)
        orig_way = jbwt.PACKED_WAY
        for way in (4, 8):   # both PACKED_WAY rank-combination widths
            jbwt.PACKED_WAY = way
            try:
                # fresh jit wrapper: PACKED_WAY is read at trace time
                fn = jax.jit(_encode_batch_fast.__wrapped__,
                             static_argnames=("all_full",))
                L, origins = fn(jnp.array(rows), jnp.array(lens),
                                all_full=True)
                for i in range(4):
                    want_L, want_o = obwt.encode_block(rows[i].tobytes())
                    assert np.asarray(L)[i].tobytes() == want_L, (way, n, i)
                    assert int(np.asarray(origins)[i]) == want_o, (way, n, i)
            finally:
                jbwt.PACKED_WAY = orig_way


def test_bwt_encode_batch_fast_large_block_L_carry():
    """n > 64K full rows leave packed mode but keep the L-carry payload
    (unpacked i32 rank keys + prevb payload); both the resolving-sort and
    the periodic-tie exits must match the oracle."""
    from tpuzip.codecs.bwt import _encode_batch_fast
    from tpuzip.oracle import bwt as obwt

    n = 1 << 17
    txt = np.frombuffer((b"the quick brown fox jumps " * n)[:n], np.uint8)
    per = np.tile(np.frombuffer(b"abcd", np.uint8), n // 4)
    rows = np.stack([txt, per])
    L, origins = _encode_batch_fast(jnp.array(rows),
                                    jnp.full(2, n, jnp.int32),
                                    all_full=True)
    for i in range(2):
        want_L, want_o = obwt.encode_block(rows[i].tobytes())
        assert np.asarray(L)[i].tobytes() == want_L, i
        assert int(np.asarray(origins)[i]) == want_o, i
