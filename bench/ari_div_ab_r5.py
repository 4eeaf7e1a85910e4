"""Round-5 chip A/B: the ari ENCODER's integer divider.

"school" = the shipped 4-stage base-256 schoolbook division (one f32 digit
divide + fixup per byte); "f32x2" = the decode side's two-stage f32
reciprocal divider (u32_div_exact — exact for den < 2^24, quotient < 2^31;
here den = total < 2^15 and q < 2^24, both safely inside).  Same stream
bytes must come out of both (the divider is exact either way) — the A/B is
pure per-step cost.
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

B, N = 128, 1 << 16
BW = 1024
data = make_corpus(B * N)
blocks = np.frombuffer(data, np.uint8).reshape(B, N)
x = jnp.tile(jnp.array(np.ascontiguousarray(blocks.T)), (1, BW // B))
jl = jnp.full(BW, N, jnp.int32)

res = {}
outs = {}
for algo in ("school", "f32x2"):
    f = jax.jit(lambda a, b_, alg=algo: jnp.sum(
        rc.ari_encode_lanes(a, b_, div_algo=alg)[1].astype(jnp.int32)))
    int(f(x, jl))
    s = timed(lambda: int(f(x, jl)))
    res[algo + "_MBps"] = round(BW * N / s / 1e6, 1)
    bytes_, counts, state = rc.ari_encode_lanes(x, jl, div_algo=algo)
    # digest identity: same renorm bytes, counts and final state
    outs[algo] = (int(jnp.sum(counts.astype(jnp.int32))),
                  int(jnp.sum(bytes_.astype(jnp.int32))),
                  np.asarray(state).tobytes())

res["bit_identical"] = bool(
    outs["school"][0] == outs["f32x2"][0]
    and outs["school"][1] == outs["f32x2"][1]
    and outs["school"][2] == outs["f32x2"][2])
print(json.dumps(res))
