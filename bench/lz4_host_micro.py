"""Host-side LZ4 decode microbench: C++ full decode + wplan8 parse.

Measures the two host stages VERDICT-r3 task 1 targets (>=800 MB/s
host-output decode, parse fast enough for >=300 MB/s combined serving),
plus single-thread rates so per-core efficiency vs liblz4 is visible.
Run on the 4-core host; no TPU needed.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import make_corpus  # noqa: E402
from tpuzip.oracle import liblz4  # noqa: E402
from tpuzip.runtime import native  # noqa: E402


def best_of(fn, iters=3):
    fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    N = 1 << 16
    Bl = 256
    data = make_corpus(Bl * N)
    blocks = np.frombuffer(data, np.uint8).reshape(Bl, N)
    lens = np.full(Bl, N, np.int32)
    comp, cl64 = native.lz4_compress_batch(blocks, lens)
    clens = cl64.astype(np.int32)
    total = Bl * N

    # threaded full decode (4 threads)
    s = best_of(lambda: native.lz4_decompress_batch(comp, clens, N))
    out, st = native.lz4_decompress_batch(comp, clens, N)
    assert (st == N).all() and out[3].tobytes() == blocks[3].tobytes()
    print(f"full_decode_4t      {total / s / 1e6:8.1f} MB/s")

    # single-thread full decode
    s = best_of(lambda: native.lz4_decompress_batch(comp, clens, N,
                                                    nthreads=1))
    print(f"full_decode_1t      {total / s / 1e6:8.1f} MB/s")

    # wplan8 parse (4 threads)
    cpad = comp[:, : (int(clens.max()) + 3) & ~3]
    s = best_of(lambda: native.lz4_decode_wplan8_batch(cpad, clens, N))
    print(f"wplan8_parse_4t     {total / s / 1e6:8.1f} MB/s")
    s = best_of(lambda: native.lz4_decode_wplan8_batch(cpad, clens, N,
                                                       nthreads=1))
    print(f"wplan8_parse_1t     {total / s / 1e6:8.1f} MB/s")

    # liblz4 single-thread reference
    if liblz4.available():
        piece = data
        cc = liblz4.compress_block(piece)
        s = best_of(lambda: liblz4.decompress_block(cc, len(piece)))
        print(f"liblz4_decode_1t    {len(piece) / s / 1e6:8.1f} MB/s")


if __name__ == "__main__":
    main()
