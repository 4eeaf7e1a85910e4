"""Round-4 chip measure (VERDICT r3 task 3): the packed-u16 cum-table ari
encoder (128 rows, gated halving) at the production 1024-lane width —
bit-exact vs the oracle stream, plus the decode kernel for the combined
headline.  Round-3 encoder baseline: 291 MB/s (BENCH_r03)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from bench import make_corpus, timed
from tpuzip.kernels import range_coder as rc
from tpuzip.kernels import range_decoder as rd
from tpuzip.oracle import ari as oari
from tpuzip.runtime import native

B, N = 128, 1 << 16
data = make_corpus(B * N)
blocks = np.frombuffer(data, np.uint8).reshape(B, N)

BW = 1024
wide = np.tile(blocks, (BW // B, 1))
x = jnp.array(wide.T)
jl = jnp.full(BW, N, jnp.int32)

enc_sync = jax.jit(lambda a, b_: jnp.sum(
    rc.ari_encode_lanes_packed_indexed(a, b_)[1]))
int(enc_sync(x, jl))
enc_s = timed(lambda: int(enc_sync(x, jl)))

streams, slens, deltas = rc.ari_encode_lanes_packed_indexed(x, jl)
slens_np = np.asarray(slens)
d2 = np.empty(deltas.shape[::-1], np.int32)
d2[:] = jax.device_get(deltas).T
st_full = jax.device_get(streams)
cap = 2 * N + 64
st2 = np.empty((BW, cap), np.uint8)
st2[:] = st_full[:, :cap]
del st_full
for lane in (0, 1, BW - 1):
    ref = oari.encode_bytes(wide[lane].tobytes())
    assert st2[lane, : slens_np[lane]].tobytes() == ref, \
        f"lane {lane} encode not bit-exact"

w = rd.window_words(int(d2.max()))
cu = jnp.array(st2[:, :4].astype(np.uint32))
code0 = (cu[:, 0] << 24) | (cu[:, 1] << 16) | (cu[:, 2] << 8) | cu[:, 3]
wins = native.ari_build_windows(st2, d2, w)
wlane = jnp.array(wins)
dec_all = jax.jit(lambda wl, c0, l: jnp.sum(rd.ari_decode_lanes(
    jnp.transpose(wl), c0, l, w=w)[:8, :8].astype(jnp.int32)))
int(dec_all(wlane, code0, jl))
dec_s = timed(lambda: int(dec_all(wlane, code0, jl)))

outw = np.asarray(rd.ari_decode_lanes(jnp.transpose(wlane), code0, jl, w=w))
assert outw[:, 0].tobytes() == blocks[0].tobytes(), "decode not bit-exact"

enc_r = BW * N / enc_s
dec_r = BW * N / dec_s
print(json.dumps({
    "encoder": "packed_u16_cum_r4",
    "encode_MBps": round(enc_r / 1e6, 1),
    "decode_kernel_MBps": round(dec_r / 1e6, 1),
    "combined_GBps": round(2.0 / (1.0 / enc_r + 1.0 / dec_r) / 1e9, 4)}),
    flush=True)
