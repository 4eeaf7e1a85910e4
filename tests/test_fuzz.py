"""Corruption fuzzing: decoders must never crash, hang, or silently return
wrong data as a *valid* result — they either error out or produce output
that fails the container/stream checksum (SURVEY §5 failure detection)."""

import struct

import numpy as np
import pytest

import jax.numpy as jnp

from tpuzip.codecs import dc as jdc, lz4 as jlz4, rle as jrle
from tpuzip.oracle import deflate as odef, dc as odc, lz4 as olz4, rle as orle

ROUNDS = 40


def _mutate(rng, data: bytes) -> bytes:
    buf = bytearray(data)
    if not buf:
        return bytes([rng.integers(0, 256)])
    for _ in range(int(rng.integers(1, 4))):
        op = rng.integers(0, 3)
        pos = int(rng.integers(0, len(buf)))
        if op == 0:
            buf[pos] ^= int(rng.integers(1, 256))
        elif op == 1 and len(buf) > 1:
            del buf[pos]
        else:
            buf.insert(pos, int(rng.integers(0, 256)))
    return bytes(buf)


def test_fuzz_oracle_lz4_block(rng):
    base = olz4.compress_block(b"fuzzable content " * 100)
    for _ in range(ROUNDS):
        bad = _mutate(rng, base)
        try:
            olz4.decompress_block(bad, max_out=1 << 16)
        except (ValueError, IndexError):
            pass  # rejected — fine; silent wrong output caught by checksums


def test_fuzz_oracle_deflate(rng):
    base = odef.compress(b"deflate fuzz target " * 80)
    for _ in range(ROUNDS):
        bad = _mutate(rng, base)
        try:
            odef.decompress(bad)
        except (ValueError, IndexError):
            pass


def test_fuzz_oracle_rle_dc(rng):
    rbase = orle.encode(b"a" * 500 + b"bcd" * 100)
    dbase = odc.encode(b"mississippi" * 50)
    for _ in range(ROUNDS):
        try:
            orle.decode(_mutate(rng, rbase))
        except (ValueError, IndexError):
            pass
        try:
            odc.decode(_mutate(rng, dbase))
        except (ValueError, IndexError, KeyError):
            pass


def test_fuzz_jax_lz4_decode_no_hang(rng):
    """Device decoder: every mutation must terminate and either flag err or
    produce *some* bounded output — never loop or write out of bounds."""
    N = 4096
    src = (b"jax decoder fuzz " * 300)[:N]
    arr = np.zeros(N, np.uint8)
    arr[: len(src)] = np.frombuffer(src, np.uint8)
    comp, clen = jlz4.encode(jnp.array(arr), jnp.int32(len(src)))
    base = np.asarray(comp)[: int(clen)].tobytes()
    cap = jlz4.encode_cap(N)
    for _ in range(10):
        bad = _mutate(rng, base)[: cap - jlz4.SLACK]
        carr = np.zeros(cap, np.uint8)
        carr[: len(bad)] = np.frombuffer(bad, np.uint8)
        out, olen, err = jlz4.decode(jnp.array(carr), jnp.int32(len(bad)), N)
        assert 0 <= int(olen) <= N + jlz4.SLACK
        got = np.asarray(out)[: len(src)].tobytes()
        # either flagged, or differs, or (rarely) mutation was harmless
        assert int(err) in (0, 1)


def test_fuzz_jax_rle_dc_decode(rng):
    N = 2048
    rbase = orle.encode(b"x" * 800 + b"yz" * 200)
    dbase = odc.encode(b"banana" * 60)
    rcap = jrle.encode_cap(N)
    dcap = jdc.encode_cap(N)
    for _ in range(8):
        bad = _mutate(rng, rbase)[:rcap]
        arr = np.zeros(rcap, np.uint8)
        arr[: len(bad)] = np.frombuffer(bad, np.uint8)
        out, olen = jrle.decode(jnp.array(arr), jnp.int32(len(bad)), N)
        assert 0 <= int(olen)
        bad = _mutate(rng, dbase)[:dcap]
        arr = np.zeros(dcap, np.uint8)
        arr[: len(bad)] = np.frombuffer(bad, np.uint8)
        out, olen, err = jdc.decode(jnp.array(arr), jnp.int32(len(bad)), N)
        assert int(err) in (0, 1)


def test_corpus_container_fuzz(rng):
    """Random mutations of the TPZC corpus container must raise a clean
    error or round-trip — never crash, hang, or return wrong bytes
    silently (the corpus Adler-32 inside each superbatch catches payload
    damage)."""
    import tpuzip
    from tpuzip.runtime.errors import TpzError

    data = (b"corpus fuzz body " * 600)
    blob = bytearray(tpuzip.compress_corpus(data, codec="rle",
                                            block_size=2048,
                                            superbatch=4096))
    for _ in range(40):
        bad = bytearray(blob)
        k = int(rng.integers(len(bad)))
        bad[k] ^= int(rng.integers(1, 256))
        try:
            out = tpuzip.decompress_corpus(bytes(bad))
            assert out == data  # mutation landed in dead padding
        except (TpzError, ValueError, OverflowError, struct.error,
                MemoryError):
            pass


def test_fuzz_new_native_decoders_no_crash(rng):
    """Random garbage into the round-3 C++ decoders (lz4 full, lz4p, dc,
    bin/apm, ari) must produce negative statuses or wrong bytes — never
    crashes or out-of-bounds writes (outputs are checked for size)."""
    from tpuzip.runtime import native

    if not native.available():
        pytest.skip("native runtime not built")
    B, cap, out_cap = 16, 600, 2048
    for trial in range(8):
        comp = rng.integers(0, 256, (B, cap), dtype=np.uint8)
        if trial % 2:  # sprinkle plausible structure
            comp[:, 0] = 0x10 * (trial % 16)
        clens = rng.integers(0, cap, B).astype(np.int32)
        olens = rng.integers(0, out_cap, B).astype(np.int32)
        out, st = native.lz4_decompress_batch(comp, clens, out_cap)
        assert out.shape == (B, out_cap)
        out, st = native.lz4p_decode_batch_native(comp, clens, out_cap)
        assert out.shape == (B, out_cap)
        out, st = native.dc_decode_batch(comp, clens, out_cap)
        assert out.shape == (B, out_cap)
        out = native.ari_decode_batch_native(comp, clens, olens, out_cap)
        assert out.shape == (B, out_cap)
        for apm in (False, True):
            out = native.bin_decode_batch_native(comp, clens, olens,
                                                 out_cap, use_apm=apm)
            assert out.shape == (B, out_cap)
        # inflate on garbage must raise its typed error (strict) or emit
        # bounded output — never crash
        try:
            out, g = native.inflate_batch_native(comp, clens, out_cap)
            assert out.shape == (B, out_cap)
        except ValueError:
            pass
