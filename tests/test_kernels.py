"""Pallas kernel tests (interpret mode — CPU-hermetic).

The MTF kernel runs under plain interpret=True.  The ari/bin coder kernels
trip the generic interpreter's lowering ('program_id' MLIR rule missing on
cpu) but run under the TPU-semantics interpreter
(pltpu.InterpretParams, jax >= 0.9) — the real kernel bodies execute on
CPU and are asserted bit-exact vs the oracle streams, so a format-breaking
kernel edit fails CI instead of the next chip run (VERDICT r2 item 8)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpuzip.kernels import mtf_scan
from tpuzip.oracle import mtf as omtf


def test_pallas_mtf_encode_interpret(rng):
    B, N = 5, 512
    blocks = rng.integers(0, 256, (B, N), dtype=np.uint8)
    enc = np.asarray(mtf_scan.mtf_batch(jnp.array(blocks), interpret=True))
    for i in range(B):
        assert enc[i].tobytes() == omtf.encode(blocks[i].tobytes()), i


def test_pallas_mtf_decode_interpret(rng):
    B, N = 3, 256
    blocks = rng.integers(0, 256, (B, N), dtype=np.uint8)
    enc = np.asarray(mtf_scan.mtf_batch(jnp.array(blocks), interpret=True))
    dec = np.asarray(mtf_scan.mtf_batch(jnp.array(enc), decode=True,
                                        interpret=True))
    for i in range(B):
        assert dec[i].tobytes() == blocks[i].tobytes(), i


def test_pallas_mtf_many_lanes(rng):
    # full 128-lane width + text-like data
    B, N = 128, 256
    blocks = np.tile(np.frombuffer(b"abracadabra abba " * 16, np.uint8)[:N],
                     (B, 1)).copy()
    blocks[1::2] = rng.integers(0, 256, ((B + 1) // 2, N), dtype=np.uint8)
    enc = np.asarray(mtf_scan.mtf_batch(jnp.array(blocks), interpret=True))
    for i in (0, 1, 64, 127):
        assert enc[i].tobytes() == omtf.encode(blocks[i].tobytes()), i


def test_pallas_dc_decode_interpret(rng):
    from tpuzip.codecs import dc as jdc
    from tpuzip.oracle import bwt as obwt, dc as odc

    N = 2048
    cases = [
        obwt.encode_block(
            open("/root/repo/SURVEY.md", "rb").read()[:N])[0],  # runs
        bytes(rng.integers(0, 256, N, dtype=np.uint8)),
        b"a" * N,
        (b"ababab" * 400)[:N],
        b"z" * 17,                                              # ragged
    ]
    B = len(cases)
    cap = jdc.encode_cap(N)
    comp = np.zeros((B, cap), np.uint8)
    clens = np.zeros(B, np.int64)
    for i, c in enumerate(cases):
        e = odc.encode(c)
        comp[i, : len(e)] = np.frombuffer(e, np.uint8)
        clens[i] = len(e)
    ms = int(clens.max()) - jdc.HDR
    out, olens, errs = jdc.decode_batch_kernel(
        jnp.array(comp), clens, N, ms, interpret=True)
    out = np.asarray(out)
    for i, c in enumerate(cases):
        assert int(np.asarray(errs)[i]) == 0, i
        assert int(np.asarray(olens)[i]) == len(c), i
        assert out[i, : len(c)].tobytes() == c, i
    # corrupt stream flags its own lane only (case 0 has a real body)
    bad = comp.copy()
    bad[0, jdc.HDR + 2] ^= 0x80
    _, _, err2 = jdc.decode_batch_kernel(jnp.array(bad), clens, N, ms,
                                         interpret=True)
    err2 = np.asarray(err2)
    assert err2[0] == 1 and err2[1] == 0 and err2[2] == 0


# ---------------------------------------------------------------------------
# ari Pallas kernels under the TPU-semantics interpreter (VERDICT r2 item 8:
# a format-breaking edit to range_coder.py/range_decoder.py must fail CI,
# not the next chip run).  jax 0.9's pltpu.InterpretParams executes the real
# kernel body on CPU; plain interpret=True still trips the lowering bug.
# ---------------------------------------------------------------------------

def _interp():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.InterpretParams()


def _oracle_streams(blocks, lens, increment=8, threshold=1 << 13):
    from tpuzip.oracle import ari as oari

    return [oari.encode_bytes(blocks[i, : lens[i]].tobytes(),
                              increment=increment, threshold=threshold)
            for i in range(blocks.shape[0])]


def test_ari_encode_kernel_interpret_bit_exact(rng):
    from tpuzip.kernels import range_coder as rck

    n, b = 256, 6
    blocks = np.zeros((b, n), np.uint8)
    blocks[0] = rng.integers(0, 256, n)
    blocks[1] = rng.integers(0, 4, n)       # skewed
    blocks[2, :] = 7                         # constant
    blocks[3] = np.frombuffer(
        (b"kernel format contract " * 12)[:n], np.uint8)
    blocks[4, :100] = rng.integers(0, 256, 100)  # ragged
    lens = np.array([n, n, n, n, 100, 0], np.int32)
    streams = rck.ari_encode_batch_kernel(
        jnp.array(blocks), jnp.array(lens), interpret=_interp())
    want = _oracle_streams(blocks, lens)
    for i in range(b):
        assert streams[i] == want[i], f"lane {i}"


def test_ari_encode_kernel_interpret_nondefault_knobs(rng):
    from tpuzip.kernels import range_coder as rck

    n, b = 256, 2
    blocks = rng.integers(0, 16, (b, n)).astype(np.uint8)
    lens = np.full(b, n, np.int32)
    width = rck.lane_width(b)
    x = jnp.zeros((n, width), jnp.uint8).at[:, :b].set(
        jnp.transpose(jnp.array(blocks)))
    jl = jnp.zeros(width, jnp.int32).at[:b].set(jnp.array(lens))
    streams, slens = rck.ari_encode_lanes_packed(
        x, jl, increment=16, threshold=1 << 10, interpret=_interp())
    want = _oracle_streams(blocks, lens, increment=16, threshold=1 << 10)
    got = np.asarray(streams)
    for i in range(b):
        assert got[i, : int(slens[i])].tobytes() == want[i]


def test_ari_decode_kernel_interpret_round_trip(rng):
    from tpuzip.kernels import range_coder as rck
    from tpuzip.kernels import range_decoder as rdk

    n, b = 256, 4
    blocks = np.zeros((b, n), np.uint8)
    blocks[0] = rng.integers(0, 256, n)
    blocks[1] = rng.integers(0, 3, n)
    blocks[2, :] = 0
    blocks[3, :128] = np.frombuffer(b"decode contract " * 8, np.uint8)
    lens = np.array([n, n, n, 128], np.int32)
    width = rck.lane_width(b)
    x = jnp.zeros((n, width), jnp.uint8).at[:, :b].set(
        jnp.transpose(jnp.array(blocks)))
    jl = jnp.zeros(width, jnp.int32).at[:b].set(jnp.array(lens))
    streams, slens, deltas = rck.ari_encode_lanes_packed_indexed(
        x, jl, interpret=_interp())
    out = rdk.ari_decode_batch_kernel(
        np.asarray(streams)[:b], np.asarray(deltas).T[:b],
        jnp.array(lens), n, interpret=_interp())
    out_np = np.asarray(out)
    for i in range(b):
        assert out_np[i, : lens[i]].tolist() == \
            blocks[i, : lens[i]].tolist(), f"lane {i}"


def test_bin_coder_kernel_interpret_bit_exact(rng):
    from tpuzip.codecs import bin_apm
    from tpuzip.kernels import bin_coder as kbin
    from tpuzip.oracle import ari as oari

    n, b = 256, 3
    bits = np.zeros((b, n), np.uint8)
    bits[0] = rng.integers(0, 2, n)
    bits[1] = (rng.random(n) < 0.05).astype(np.uint8)
    bits[2, :77] = 1
    lens = np.array([n, n, 77], np.int32)
    for use_apm in (False, True):
        streams = kbin.bin_encode_streams(
            jnp.array(bits), jnp.array(lens), use_apm=use_apm,
            interpret=_interp())
        for i in range(b):
            comp, clen = bin_apm.encode_bits(
                jnp.array(bits[i]), jnp.int32(int(lens[i])),
                use_apm=use_apm)
            want = np.asarray(comp)[: int(clen)].tobytes()
            assert streams[i] == want, (use_apm, i)


def test_dc_scan_kernel_interpret_oracle_parity(rng):
    """The Pallas DC run-walk decode kernel executes on CPU under the TPU
    interpreter and must decode oracle streams bit-exactly (incl. a
    corrupt stream flagging err for its lane only)."""
    from tpuzip.codecs import dc as jdc
    from tpuzip.oracle import dc as odc

    n = 512
    blocks = [
        (b"abracadabra banana " * 40)[:n],
        rng.integers(0, 3, n, dtype=np.uint8).tobytes(),
        bytes(n),
        rng.integers(0, 256, n, dtype=np.uint8).tobytes(),
    ]
    comps = [odc.encode(bk) for bk in blocks]
    cap = max(len(c) for c in comps) + 8
    rows = np.zeros((4, cap), np.uint8)
    lens = np.zeros(4, np.int32)
    for i, c in enumerate(comps):
        rows[i, : len(c)] = np.frombuffer(c, np.uint8)
        lens[i] = len(c)
    out, olens, errs = jdc.decode_batch_kernel(
        jnp.array(rows), jnp.array(lens), n, n, interpret=_interp())
    assert not np.asarray(errs)[:4].any()
    for i, bk in enumerate(blocks):
        assert np.asarray(out)[i, :n].tobytes() == bk, i
    bad = rows.copy()
    bad[2, 4] = 0xFF  # clobber block 2's first-occurrence table
    out, olens, errs = jdc.decode_batch_kernel(
        jnp.array(bad), jnp.array(lens), n, n, interpret=_interp())
    errs = np.asarray(errs)[:4]
    assert errs[2] != 0 and errs[[0, 1, 3]].sum() == 0


def test_ari_decode_packed_vs_cum_reference_with_halving(rng):
    """Round-4 packed decode (u16-pair cum table): both reference algos
    must decode the kernel-format streams bit-exactly across halving
    crossings (threshold 512 -> ~56 downscales over 512 symbols), and the
    packed algo must refuse out-of-range knobs (threshold+inc > 2^15)."""
    import jax
    import pytest

    from tpuzip.codecs import ari as jari
    from tpuzip.kernels import range_decoder as rdk

    n, lanes = 8 * rdk.CHUNK_STEPS, 128
    THR, INC = 512, 8
    X = np.zeros((n, lanes), np.uint8)
    for l in range(lanes):
        X[:, l] = rng.integers(0, 256 if l % 2 else 16, n)
    lens = np.full(lanes, n, np.int32)
    # XLA encode (bit-identical streams + counts; the Pallas encoder
    # needs interpret mode on CPU and is covered by the round-trip test)
    comp, clens, counts = jax.jit(jax.vmap(
        lambda bb, ll: jari.encode_with_counts(
            bb, ll, increment=INC, threshold=THR)))(
        jnp.array(X.T), jnp.array(lens))
    st = np.zeros((lanes, 2 * n + 64), np.uint8)
    got = np.asarray(comp)
    st[:, : got.shape[1]] = got[:, : st.shape[1]]
    cs = rdk.CHUNK_STEPS
    deltas = np.asarray(counts).reshape(lanes, -1, cs).sum(
        axis=2).astype(np.int32)
    dt = jnp.array(deltas.T)
    w = rdk.window_words(max(int(deltas.max()), 1))
    starts = 4 + jnp.cumsum(dt, axis=0) - dt
    wins = rdk.build_windows(jnp.transpose(jnp.array(st)), starts, w)
    cu = st[:, :4].astype(np.uint32)
    code0 = jnp.array((cu[:, 0] << 24) | (cu[:, 1] << 16)
                      | (cu[:, 2] << 8) | cu[:, 3])
    for algo in ("packed", "cum"):
        syms = np.asarray(rdk.ari_decode_reference(
            wins, code0, jnp.array(lens), w=w, algo=algo,
            increment=INC, threshold=THR))
        for l in (0, 1, 63, 127):
            assert syms[:, l].tobytes() == X[:, l].tobytes(), (algo, l)
    with pytest.raises(AssertionError):
        rdk.ari_decode_lanes(wins, code0, jnp.array(lens), w=w,
                             algo="packed", increment=8,
                             threshold=(1 << 15))


def test_bin_decode_reference_round_trip(rng):
    """The bin/apm lane DECODER inverts the encoder bit-exactly through
    the chunk-index window prepack, via ``bin_decode_reference`` — the
    pure-XLA scan replica that shares ``_bin_decode_step`` verbatim with
    the Pallas kernel AND is the production off-TPU to_device path
    (runner.py).  The interpret-mode kernel harness is deliberately NOT
    invoked here: XLA:CPU takes >40 min to compile the interpreted
    decode grid (measured round 5 — LLVM pathology on the unrolled
    step body; the encoder's interpret test compiles in seconds), and
    the kernel wiring it would cover is chip-validated instead
    (bench/bin_decode_r4.py round-trips on real TPU)."""
    from tpuzip.codecs import bin_apm as jbin
    from tpuzip.kernels import bin_coder as kbin
    from tpuzip.kernels import range_decoder as rdk

    NB, lanes = kbin.CHUNK, 128
    bits = np.zeros((NB, lanes), np.uint8)
    lens = np.full(lanes, NB, np.int32)
    for l in range(lanes):
        p = [0.5, 0.05, 0.95][l % 3]
        bits[:, l] = (np.asarray(rng.random(NB)) < p).astype(np.uint8)
    lens[5] = 100  # ragged lane
    bits[100:, 5] = 0
    for use_apm in (True,):  # apm exercises the full model incl. p0/gate
        # (the bin-only model is the apm path minus the gate; one model
        # keeps this interpreter test inside the CI time budget)
        streams, counts = kbin.bin_encode_streams(
            jnp.array(bits.T), jnp.array(lens), use_apm=use_apm,
            interpret=_interp(), with_counts=True)
        nc = NB // kbin.CHUNK
        cap = max(len(s) for s in streams) + 4
        st = np.zeros((lanes, cap), np.uint8)
        for l, s in enumerate(streams):
            st[l, : len(s)] = np.frombuffer(s, np.uint8)
        deltas = counts.reshape(nc, kbin.CHUNK, lanes).sum(1).T
        w = kbin.bin_window_words(int(deltas.max()))
        dt = jnp.array(deltas.T.astype(np.int32))
        starts = 4 + jnp.cumsum(dt, axis=0) - dt
        wins = rdk.build_windows(jnp.transpose(jnp.array(st)), starts, w)
        cu = st[:, :4].astype(np.uint32)
        code0 = jnp.array((cu[:, 0] << 24) | (cu[:, 1] << 16)
                          | (cu[:, 2] << 8) | cu[:, 3])
        out = np.asarray(kbin.bin_decode_reference(
            wins, code0, jnp.array(lens), w=w, use_apm=use_apm))
        for l in (0, 1, 2, 5, 127):
            nb = int(lens[l])
            assert out[:nb, l].tolist() == bits[:nb, l].tolist(), \
                (use_apm, l)
