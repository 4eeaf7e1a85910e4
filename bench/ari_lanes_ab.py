"""A/B: ari lane width 1024 (production MAX_LANES) vs 2048.

Lane width amortizes the kernels' fixed per-step cost (measured 142 / 190 /
270 MB/s encode at 128 / 512 / 1024 on v5e); 2048 was never measured.
VMEM at 2048 lanes: encode ~2 MB freq + 2 MB out-slab + double buffering
(~10 MB) — inside the v5e budget on paper.  If 2048 wins >5%, raise
MAX_LANES in kernels/range_coder.py and kernels/range_decoder.py.
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from bench import make_corpus, timed
from tpuzip.kernels import range_coder as rc, range_decoder as rd
from tpuzip.oracle import ari as oari
from tpuzip.runtime import native

B, N = 128, 1 << 16
data = make_corpus(B * N)
blocks = np.frombuffer(data, np.uint8).reshape(B, N)

for BW in (1024, 2048):
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
    assert st2[0, : slens_np[0]].tobytes() == oari.encode_bytes(
        blocks[0].tobytes()), f"lanes={BW} encode not bit-exact"

    w = rd.window_words(int(d2.max()))
    cu = jnp.array(st2[:, :4].astype(np.uint32))
    code0 = (cu[:, 0] << 24) | (cu[:, 1] << 16) | (cu[:, 2] << 8) | cu[:, 3]
    wins = native.ari_build_windows(st2, d2, w)
    wlane = jnp.array(wins)
    dec_all = jax.jit(lambda wl, c0, l: jnp.sum(rd.ari_decode_lanes(
        jnp.transpose(wl), c0, l, w=w)[:8, :8].astype(jnp.int32)))
    int(dec_all(wlane, code0, jl))
    dec_s = timed(lambda: int(dec_all(wlane, code0, jl)))

    outw = np.asarray(rd.ari_decode_lanes(jnp.transpose(wlane), code0, jl,
                                          w=w))
    assert outw[:, 0].tobytes() == blocks[0].tobytes(), \
        f"lanes={BW} decode not bit-exact"

    print(json.dumps({f"lanes{BW}": {
        "encode_MBps": round(BW * N / enc_s / 1e6, 1),
        "decode_kernel_MBps": round(BW * N / dec_s / 1e6, 1)}}), flush=True)
