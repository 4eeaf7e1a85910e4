"""Round-4 chip A/B: packed-u16-pair decode kernel (v3) vs the unpacked
f32 cum table (v2/"cum") at 1024 lanes — the decode side (288.6 MB/s)
binds the combined headline now that the packed encoder runs 450.8."""
import json
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from bench import make_corpus, timed
from tpuzip.kernels import range_coder as rc
from tpuzip.kernels import range_decoder as rd
from tpuzip.runtime import native

B, N = 128, 1 << 16
data = make_corpus(B * N)
blocks = np.frombuffer(data, np.uint8).reshape(B, N)
BW = 1024
wide = np.tile(blocks, (BW // B, 1))
x = jnp.array(wide.T)
jl = jnp.full(BW, N, jnp.int32)

streams, slens, deltas = rc.ari_encode_lanes_packed_indexed(x, jl)
slens_np = np.asarray(slens)
d2 = np.empty(deltas.shape[::-1], np.int32)
d2[:] = jax.device_get(deltas).T
st_full = jax.device_get(streams)
cap = 2 * N + 64
st2 = np.empty((BW, cap), np.uint8)
st2[:] = st_full[:, :cap]
del st_full

w = rd.window_words(int(d2.max()))
cu = jnp.array(st2[:, :4].astype(np.uint32))
code0 = (cu[:, 0] << 24) | (cu[:, 1] << 16) | (cu[:, 2] << 8) | cu[:, 3]
wins = native.ari_build_windows(st2, d2, w)
wlane = jnp.array(wins)

for algo in ("packed", "cum"):
    dec = jax.jit(lambda wl, c0, l, a=algo: jnp.sum(rd.ari_decode_lanes(
        jnp.transpose(wl), c0, l, w=w, algo=a)[:8, :8].astype(jnp.int32)))
    int(dec(wlane, code0, jl))
    dec_s = timed(lambda: int(dec(wlane, code0, jl)))
    outw = np.asarray(rd.ari_decode_lanes(jnp.transpose(wlane), code0, jl,
                                          w=w, algo=algo))
    for lane in (0, 1, BW - 1):
        assert outw[:, lane].tobytes() == wide[lane].tobytes(), \
            f"{algo} lane {lane} not bit-exact"
    print(json.dumps({"algo": algo,
                      "decode_kernel_MBps": round(BW * N / dec_s / 1e6, 1)}),
          flush=True)
