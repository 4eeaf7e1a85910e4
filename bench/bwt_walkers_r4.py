"""Round-4 chip A/B (VERDICT r3 weak #7): BWT device inverse walker
count.  K=2^r walkers trade r full-table doubling rounds (to build the
stride-K pointer table) for an n/K-step scan — the round-3 record
(39 MB/s) only ever measured K=1."""
import json
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from bench import make_corpus, timed
from tpuzip.codecs import bwt as jbwt
from tpuzip.oracle import bwt as obwt

B, N = 128, 1 << 16
data = make_corpus(B * N)
blocks = np.frombuffer(data, np.uint8).reshape(B, N)
jb = jnp.array(blocks)
jl = jnp.full(B, N, jnp.int32)
L, orgs = jbwt.encode_batch_fast(jb, jl)

want = obwt.decode_block(
    np.asarray(L)[1].tobytes(), int(np.asarray(orgs)[1]))

for r in (0, 2, 4, 6, 8):
    fn = jax.jit(lambda L_, o, l, r_=r: jnp.sum(
        jbwt.decode_batch_fast(L_, o, l, walkers_log2=r_)[:4, :4]
        .astype(jnp.int32)))
    int(fn(L, orgs, jl))
    s = timed(lambda: int(fn(L, orgs, jl)))
    out = np.asarray(jbwt.decode_batch_fast(L, orgs, jl, walkers_log2=r))
    assert out[1].tobytes() == want, f"walkers 2^{r} not bit-exact"
    print(json.dumps({"walkers_log2": r,
                      "inverse_MBps": round(B * N / s / 1e6, 1)}),
          flush=True)
