import numpy as np

from tpuzip.oracle import ari, rle


def test_rle_roundtrip(samples):
    for s in samples:
        assert rle.decode(rle.encode(s)) == s


def test_rle_long_runs():
    for n in (2, 3, 256, 257, 258, 511, 512, 513, 1000):
        s = b"x" * n
        comp = rle.encode(s)
        assert rle.decode(comp) == s
        assert len(comp) <= 2 + (n // 255) + 2


def test_rle_compresses_runs():
    s = b"\x00" * 10000
    assert len(rle.encode(s)) < 50


def test_runs_of():
    vals, lens = rle.runs_of(b"aaabbc")
    assert list(vals) == [ord("a"), ord("b"), ord("c")]
    assert list(lens) == [3, 2, 1]


def test_ari_byte_roundtrip(samples):
    for s in samples:
        comp = ari.encode_bytes(s)
        assert ari.decode_bytes(comp, len(s)) == s


def test_ari_compresses_biased_data(rng):
    s = bytes(rng.choice([65, 66], size=10000, p=[0.95, 0.05]).astype(np.uint8))
    comp = ari.encode_bytes(s)
    # order-0 entropy of this source is ~0.29 bits/byte
    assert len(comp) < len(s) // 2


def test_ari_random_data_near_incompressible(rng):
    s = bytes(rng.integers(0, 256, 4096, dtype=np.uint8))
    comp = ari.encode_bytes(s)
    # adaptive order-0 learning cost is ~(255/2)*log2(n)/n bits/byte on
    # uniform random input; allow 5% + coder tail
    assert len(comp) < len(s) * 1.05 + 64


def test_binary_model_roundtrip(rng):
    bits = [int(b) for b in rng.integers(0, 2, 2000)]
    model = ari.BinaryModel()
    enc = ari.RangeEncoder()
    for b in bits:
        lo, hi = model.get_range(b)
        enc.encode(lo, hi, model.get_denominator())
        model.update(b)
    comp = enc.finish()

    model = ari.BinaryModel()
    dec = ari.RangeDecoder(comp)
    out = []
    for _ in bits:
        off = dec.decode_offset(model.get_denominator())
        bit, lo, hi = model.find_value(off)
        dec.decode_update(lo, hi, model.get_denominator())
        model.update(bit)
        out.append(bit)
    assert out == bits


def test_binary_model_skewed_compresses(rng):
    bits = [0] * 5000 + [1] * 50
    rng.shuffle(bits)
    model = ari.BinaryModel()
    enc = ari.RangeEncoder()
    for b in bits:
        lo, hi = model.get_range(b)
        enc.encode(lo, hi, model.get_denominator())
        model.update(b)
    comp = enc.finish()
    assert len(comp) < len(bits) // 8  # far below 1 bit per symbol


def test_apm_gate_refines(rng):
    # An SSE gate fed a fixed mid probability should learn the true bias.
    gate = ari.ApmGate()
    model = ari.BinaryModel()
    bits = [0] * 900 + [1] * 100
    rng.shuffle(bits)
    enc = ari.RangeEncoder()
    for b in bits:
        p0 = gate.pass_through(model.p0)
        lo, hi = (0, p0) if b == 0 else (p0, 1 << ari.ApmBit.BITS)
        enc.encode(lo, hi, 1 << ari.ApmBit.BITS)
        gate.update(b, 5)
        model.update(b)
    comp = enc.finish()
    assert len(comp) < len(bits) // 8


def test_table_model_downscale():
    m = ari.TableModel(4, increment=100, threshold=1 << 10)
    for _ in range(200):
        m.update(1)
    assert m.total <= 1 << 10
    assert all(f >= 1 for f in m.freq)
    assert m.freq[1] > m.freq[0]
