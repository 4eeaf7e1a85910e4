"""Round-5 chip A/B: on-device stream compaction in the packed ari encoder.

"scatter" (shipped): 268 M-entry u8 scatter into the zeroed (cap*lanes,)
buffer.  "sort": stable 1-bit-key lane-column sort that compacts valid
bytes to the front in stream order, tail re-zeroed (the repo's
sort-beats-scatter rule, 244 vs 48 M elem/s in the round-2 micros).

Timing is EAGER (every output materialized — the sum-jit DCE hazard of
DESIGN note 27 is exactly what hid this stage for three rounds); outputs
of the two variants are asserted byte-identical on chip.
"""
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

B, N, BW = 128, 1 << 16, 1024
data = make_corpus(B * N)
blocks = np.frombuffer(data, np.uint8).reshape(B, N)
x = jnp.tile(jnp.array(np.ascontiguousarray(blocks.T)), (1, BW // B))
jl = jnp.full(BW, N, jnp.int32)

res = {}
digests = {}
for mode in ("scatter", "sort"):
    rc.COMPACTION = mode
    rc.ari_encode_lanes_packed_indexed.clear_cache()
    sync = lambda: int(jnp.sum(
        rc.ari_encode_lanes_packed_indexed(x, jl)[1]))
    sync()
    res[mode + "_MBps"] = round(BW * N / timed(sync) / 1e6, 1)
    s, sl, d = rc.ari_encode_lanes_packed_indexed(x, jl)
    digests[mode] = (
        int(jnp.sum(sl.astype(jnp.int64))),
        int(jnp.sum(d.astype(jnp.int64))),
        int(jnp.sum(jax.lax.rem(
            jnp.cumsum(s[:, :4096].astype(jnp.int64).reshape(-1)),
            jnp.int64(1000000007))[-1])),
        np.asarray(s[7, :128]).tobytes(),
    )
rc.COMPACTION = "scatter"
res["identical"] = digests["scatter"] == digests["sort"]
print(json.dumps(res))
