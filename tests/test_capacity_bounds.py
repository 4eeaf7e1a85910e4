"""Worst-case capacity-bound checks — the prefix-sum packers DROP bytes
beyond the static caps, so every encode_cap() must dominate its codec's
true worst case (silent truncation would corrupt streams)."""

import numpy as np

from tpuzip.codecs import dc as jdc, lz4 as jlz4, rle as jrle
from tpuzip.oracle import ari as oari, dc as odc, lz4 as olz4, rle as orle


def test_ari_cap_adversarial():
    """Anti-adaptive input (always the least-frequent symbol) stays far
    below the 2n+64 cap: the halving downscale keeps frequencies near
    uniform, bounding sustained cost near 8 bits/symbol."""
    m = oari.TableModel(256)
    enc = oari.RangeEncoder()
    n = 5000
    for _ in range(n):
        sym = min(range(256), key=lambda s: m.freq[s])
        lo, hi = m.get_range(sym)
        enc.encode(lo, hi, m.get_denominator())
        m.update(sym)
    out = enc.finish()
    assert len(out) <= 2 * n + 64
    assert len(out) < 1.1 * n + 64  # sustained worst is ~1.05 B/sym


def test_rle_cap_worst_case():
    worst = b"aabb" * 2000  # 3 output bytes per 2 input
    comp = orle.encode(worst)
    assert len(comp) <= jrle.encode_cap(len(worst))


def test_lz4_cap_incompressible(rng):
    data = bytes(rng.integers(0, 256, 8192, dtype=np.uint8))
    comp = olz4.compress_block(data)
    assert len(comp) <= jlz4.encode_cap(len(data))


def test_dc_cap_random(rng):
    data = bytes(rng.integers(0, 256, 8192, dtype=np.uint8))
    comp = odc.encode(data)
    assert len(comp) <= jdc.encode_cap(len(data))


def test_lz4p_cap():
    from tpuzip.codecs import lz4p

    # every-4-bytes-a-sequence worst case: 6 B columns + literals
    n = 4096
    assert lz4p.encode_cap(n) >= 8 + 6 * (n // 4 + 2) + n
