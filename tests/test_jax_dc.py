import numpy as np

import jax.numpy as jnp

from tpuzip.codecs import dc as jdc
from tpuzip.oracle import bwt as obwt, dc as odc

N = 2048


def _pad(data: bytes, size: int) -> np.ndarray:
    arr = np.zeros(size, np.uint8)
    arr[: len(data)] = np.frombuffer(data, np.uint8)
    return arr


def _roundtrip(s: bytes):
    comp, clen = jdc.encode(jnp.array(_pad(s, N)), jnp.int32(len(s)))
    got = np.asarray(comp)[: int(clen)].tobytes()
    # bit-exact vs oracle encode
    assert got == odc.encode(s), f"len={len(s)}"
    # oracle decodes our stream
    assert odc.decode(got) == s
    # we decode oracle streams
    ocomp = odc.encode(s)
    cap = jdc.encode_cap(N)
    out, olen, err = jdc.decode(
        jnp.array(_pad(ocomp, cap)), jnp.int32(len(ocomp)), N)
    assert int(err) == 0
    assert int(olen) == len(s)
    assert np.asarray(out)[: len(s)].tobytes() == s


def test_dc_vs_oracle(samples):
    for s in samples:
        if len(s) > N:
            continue
        _roundtrip(s)


def test_dc_on_bwt_output():
    s = b"abracadabra banana mississippi " * 40
    L, _ = obwt.encode_block(s)
    _roundtrip(L)


def test_dc_corrupt_stream():
    s = b"abcabcabc" * 30
    comp = bytearray(odc.encode(s))
    comp[-1] = 0x7F  # clobber last distance
    cap = jdc.encode_cap(N)
    out, olen, err = jdc.decode(
        jnp.array(_pad(bytes(comp), cap)), jnp.int32(len(comp)), N)
    # either flagged or decodes to something != s (never silent match)
    if int(err) == 0:
        assert np.asarray(out)[: int(olen)].tobytes() != s
