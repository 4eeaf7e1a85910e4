"""Property-based round-trip tests (hypothesis) over the oracle layer —
the formats every device codec is pinned to."""

import zlib

from hypothesis import given, settings, strategies as st

from tpuzip.oracle import ari, bwt, dc, deflate, lz4, mtf, rle

BYTES = st.binary(min_size=0, max_size=2000)
# run-heavy inputs stress RLE/LZ/BWT boundary logic
RUNS = st.lists(
    st.tuples(st.integers(0, 255), st.integers(1, 400)), min_size=0,
    max_size=20).map(lambda rs: b"".join(bytes([v]) * n for v, n in rs))


@settings(max_examples=50, deadline=None)
@given(st.one_of(BYTES, RUNS))
def test_lz4_block_roundtrip(data):
    assert lz4.decompress_block(lz4.compress_block(data)) == data


@settings(max_examples=30, deadline=None)
@given(st.one_of(BYTES, RUNS))
def test_lz4_frame_roundtrip(data):
    assert lz4.decompress_frame(lz4.compress_frame(data, block_max=1 << 16)) == data


@settings(max_examples=30, deadline=None)
@given(st.one_of(BYTES, RUNS))
def test_deflate_accepted_by_zlib(data):
    assert zlib.decompress(deflate.compress(data), wbits=-15) == data


@settings(max_examples=50, deadline=None)
@given(st.one_of(BYTES, RUNS))
def test_rle_roundtrip(data):
    assert rle.decode(rle.encode(data)) == data


@settings(max_examples=30, deadline=None)
@given(st.one_of(BYTES, RUNS))
def test_bwt_mtf_roundtrip(data):
    L, origin = bwt.encode_block(data)
    m = mtf.encode(L)
    assert bwt.decode_block(mtf.decode(m), origin) == data


@settings(max_examples=30, deadline=None)
@given(st.one_of(BYTES, RUNS))
def test_dc_roundtrip(data):
    assert dc.decode(dc.encode(data)) == data


@settings(max_examples=30, deadline=None)
@given(BYTES)
def test_ari_roundtrip(data):
    assert ari.decode_bytes(ari.encode_bytes(data), len(data)) == data


# ---- native threaded batch stages vs the oracle (property level) --------

def _native_or_skip():
    import pytest

    from tpuzip.runtime import native

    if not native.available():
        pytest.skip("native runtime not built")
    return native


@settings(max_examples=25, deadline=None)
@given(st.lists(st.one_of(BYTES, RUNS), min_size=1, max_size=6))
def test_native_batch_stages_roundtrip(blocks):
    """Threaded C++ batch LZ4/RLE/BWT agree with the oracle on arbitrary
    ragged batches (incl. empty rows)."""
    import numpy as np

    native = _native_or_skip()
    cap = max(max((len(b) for b in blocks), default=1), 1)
    B = len(blocks)
    rows = np.zeros((B, cap), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, b in enumerate(blocks):
        lens[i] = len(b)
        rows[i, : len(b)] = np.frombuffer(b, np.uint8)
    # RLE
    comp, clens = native.rle_encode_batch(rows, lens)
    for i, b in enumerate(blocks):
        assert comp[i, : clens[i]].tobytes() == rle.encode(b)
    dec, dl = native.rle_decode_batch(comp, clens.astype(np.int32), cap)
    assert (dl == lens).all()
    # LZ4 (skip zero-length rows: block format emits 1 byte for empty)
    comp2, cl2 = native.lz4_compress_batch(rows, lens)
    for i, b in enumerate(blocks):
        assert comp2[i, : cl2[i]].tobytes() == lz4.compress_block(b)
    # BWT forward+inverse
    L, orgs = native.bwt_forward_batch(rows, lens)
    for i, b in enumerate(blocks):
        eL, eo = bwt.encode_block(b)
        assert L[i, : lens[i]].tobytes() == eL and int(orgs[i]) == eo
    back = native.bwt_inverse_batch(L, lens, orgs)
    for i, b in enumerate(blocks):
        assert back[i, : lens[i]].tobytes() == b


@settings(max_examples=10, deadline=None)
@given(st.one_of(BYTES, RUNS))
def test_corpus_api_roundtrip(data):
    """Pipelined corpus API round-trips arbitrary bytes (tiny
    superbatches force the multi-container path)."""
    import tpuzip

    blob = tpuzip.compress_corpus(data, codec="rle", block_size=512,
                                  superbatch=1024)
    assert tpuzip.decompress_corpus(blob) == data


@settings(max_examples=25, deadline=None)
@given(st.lists(st.one_of(BYTES, RUNS), min_size=1, max_size=5),
       st.booleans())
def test_native_bin_apm_roundtrip(blocks, use_apm):
    """C++ bin/apm batch coder round-trips arbitrary byte blocks and
    matches the oracle bit-model chain driven MSB-first."""
    import numpy as np

    native = _native_or_skip()
    cap = max(max((len(b) for b in blocks), default=1), 1)
    rows = np.zeros((len(blocks), cap), np.uint8)
    lens = np.zeros(len(blocks), np.int32)
    for i, b in enumerate(blocks):
        rows[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    comp, cl = native.bin_encode_batch_native(rows, lens, use_apm=use_apm)
    out = native.bin_decode_batch_native(comp, cl.astype(np.int32), lens,
                                         cap, use_apm=use_apm)
    for i, b in enumerate(blocks):
        assert out[i, : len(b)].tobytes() == b


@settings(max_examples=25, deadline=None)
@given(st.lists(st.one_of(BYTES, RUNS), min_size=1, max_size=5))
def test_native_lz4p_and_dc_roundtrip(blocks):
    import numpy as np

    native = _native_or_skip()
    cap = max(max((len(b) for b in blocks), default=1), 1)
    rows = np.zeros((len(blocks), cap), np.uint8)
    lens = np.zeros(len(blocks), np.int32)
    for i, b in enumerate(blocks):
        rows[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    comp, cl = native.lz4p_encode_batch(rows, lens)
    out, st_ = native.lz4p_decode_batch_native(comp, cl.astype(np.int32),
                                               cap)
    for i, b in enumerate(blocks):
        assert st_[i] == len(b) and out[i, : len(b)].tobytes() == b
    dcomp, dcl = native.dc_encode_batch(rows, lens)
    dout, got = native.dc_decode_batch(dcomp, dcl.astype(np.int32), cap)
    for i, b in enumerate(blocks):
        assert got[i] == len(b) and dout[i, : len(b)].tobytes() == b
        assert dcomp[i, : dcl[i]].tobytes() == dc.encode(b)
