"""Round-5 chip-resident GiB-class DECODE row (completes gib_chip_r4:
that harness recorded 512 MiB sustained ENCODE per staged codec, and only
a one-superbatch serving-decode sample).

512 MiB of device-generated corpus (the gib_chip_r4 seed/byte-roll
scheme) is ari-encoded on device, the chunk-index windows are built ON
DEVICE (rd.build_windows — the same bytes the production C++ prepack
produces), and then the timed region runs the packed decode kernel over
all 8 x 64 MiB superbatches with a per-superbatch symbol-mismatch count
folded into the sync scalar — sustained GiB-class chip decode with zero
host/tunnel traffic in the measured region, every output symbol compared
against the input on device.

(The production serving path overlaps the window build on the host —
bench.py's pipelined measurement; here the windows are prebuilt per
superbatch OUTSIDE the timed loop, so the row isolates the kernel's
sustained decode rate at volume, the decode analogue of
gib_chip_r4's chip_sustained encode rows.)
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from bench import make_corpus
from tpuzip.kernels import range_coder as rc
from tpuzip.kernels import range_decoder as rd

BW, N = 1024, 1 << 16                 # 64 MiB per superbatch
SUPERBATCHES = 8                      # 512 MiB total
CAP = 2 * N + 64

seed_host = np.frombuffer(make_corpus(256 * N), np.uint8).reshape(256, N)
seed = jnp.tile(jnp.array(np.ascontiguousarray(seed_host.T)), (1, BW // 256))
jl = jnp.full(BW, N, jnp.int32)


@jax.jit
def variant(s):
    return jnp.roll(seed, s * 509, axis=0)   # (N, BW), distinct per sb


@jax.jit
def encode_and_windows(x):
    """Device-only: packed encode + chunk-index windows + code0."""
    streams, slens, deltas = rc.ari_encode_lanes_packed_indexed(x, jl)
    comp_d = jnp.transpose(streams[:, :CAP])
    starts = 4 + jnp.cumsum(deltas, axis=0) - deltas
    wins = rd.build_windows(comp_d, starts, W)
    cu = comp_d[:4].astype(jnp.uint32)
    code0 = (cu[0] << 24) | (cu[1] << 16) | (cu[2] << 8) | cu[3]
    return wins, code0, jnp.max(deltas)


def main():
    global W
    # probe one superbatch's deltas to pick the static window bucket
    _, _, deltas0 = rc.ari_encode_lanes_packed_indexed(variant(0), jl)
    W = rd.window_words(int(jnp.max(deltas0)))

    @jax.jit
    def decode_err(wins, code0, x):
        out = rd.ari_decode_lanes(wins, code0, jl, w=W)
        return jnp.sum((out[:N] != x).astype(jnp.int32))

    # prebuild all superbatch windows on device (untimed)
    built = []
    maxd = 0
    for s in range(SUPERBATCHES):
        wins, code0, md = encode_and_windows(variant(s))
        built.append((wins, code0))
        maxd = max(maxd, int(md))
    assert rd.window_words(maxd) <= W, (maxd, W)
    # warm the decode compile
    int(decode_err(built[0][0], built[0][1], variant(0)))

    t0 = time.perf_counter()
    errs = 0
    for s in range(SUPERBATCHES):
        errs += int(decode_err(built[s][0], built[s][1], variant(s)))
    dt = time.perf_counter() - t0
    assert errs == 0, f"{errs} symbol mismatches"
    total = SUPERBATCHES * BW * N
    print(json.dumps({
        "codec": "ari (packed decode kernel)",
        "total_MiB": total >> 20,
        "window_words": W,
        "chip_sustained_decode_MBps": round(total / dt / 1e6, 1),
        "verified": "every output symbol == input, on device",
    }))


if __name__ == "__main__":
    sys.exit(main())
