"""Round-4 chip measure: the chunk-indexed bin/apm lane DECODER — the
bin family's to_device serving path (was the vmapped XLA bit scan).
Windows prepacked by the threaded C++ stage, decode on chip."""
import json
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from bench import make_corpus, timed, timed_host
from tpuzip.kernels import bin_coder as kbin
from tpuzip.runtime import native

B, N = 1024, 1 << 14  # bytes/block -> 128K bits/lane
data = make_corpus(B * N)
blocks = np.frombuffer(data, np.uint8).reshape(B, N)
lens = np.full(B, N, np.int32)

for use_apm in (False, True):
    comp, clens, deltas = native.bin_encode_indexed_batch(
        blocks, lens, use_apm=use_apm)
    nc = (8 * N + kbin.CHUNK - 1) // kbin.CHUNK
    d2 = np.ascontiguousarray(deltas[:, :nc])
    w = kbin.bin_window_words(int(d2.max()))
    cap = int(clens.max()) + 8
    st = np.ascontiguousarray(comp[:, :cap])
    win_s = timed_host(lambda: native.ari_build_windows(st, d2, w))
    wins = native.ari_build_windows(st, d2, w)
    windows = jnp.transpose(jnp.array(wins))
    cu = st[:, :4].astype(np.uint32)
    code0 = jnp.array((cu[:, 0] << 24) | (cu[:, 1] << 16)
                      | (cu[:, 2] << 8) | cu[:, 3])
    jl = jnp.full(B, 8 * N, jnp.int32)
    dec = jax.jit(lambda wl, c0, l, u=use_apm, ww=w: jnp.sum(
        kbin.bin_decode_lanes(wl, c0, l, w=ww, use_apm=u)[:8, :8]
        .astype(jnp.int32)))
    int(dec(windows, code0, jl))
    s = timed(lambda: int(dec(windows, code0, jl)))
    bits_out = np.asarray(kbin.bin_decode_lanes(
        windows, code0, jl, w=w, use_apm=use_apm))
    src_bits = np.unpackbits(blocks[:2], axis=1)
    for l in (0, 1):
        assert bits_out[: 8 * N, l].tolist() == src_bits[l].tolist(), \
            f"apm={use_apm} lane {l} not bit-exact"
    kr = B * N / s
    wr = B * N / win_s
    print(json.dumps({
        "apm": use_apm, "decode_kernel_MBps": round(kr / 1e6, 1),
        "host_windows_MBps": round(wr / 1e6, 1),
        "combined_MBps": round(1.0 / (1.0 / kr + 1.0 / wr) / 1e6, 1)}),
        flush=True)
