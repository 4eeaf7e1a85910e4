"""Round-4 chip A/B: DC device encode after the sort-compaction rewrite
(was 6.8 MB/s sustained inside the bwtdc chain at 1024 blocks,
bench/gib_chip_r4.json — scatter-bound)."""
import json
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from bench import make_corpus, timed
from tpuzip.codecs import bwt as jbwt, dc as jdc
from tpuzip.oracle import dc as odc

B, N = 1024, 1 << 16
data = make_corpus(B * N)
blocks = np.frombuffer(data, np.uint8).reshape(B, N)
jb = jnp.array(blocks)
jl = jnp.full(B, N, jnp.int32)
# DC runs on BWT output in production — measure on that distribution
L, _ = jbwt.encode_batch_fast(jb, jl)

sync = jax.jit(lambda L_, l: jnp.sum(
    jdc.encode_batch(L_, l)[1].astype(jnp.int32)))
int(sync(L, jl))
s = timed(lambda: int(sync(L, jl)))
comp, dlens = jdc.encode_batch(L, jl)
cnp = np.asarray(comp[1])
want = odc.encode(np.asarray(L)[1].tobytes())
assert cnp[: int(np.asarray(dlens)[1])].tobytes() == want, "not bit-exact"
print(json.dumps({"dc_encode_MBps": round(B * N / s / 1e6, 1),
                  "was_MBps": 6.8, "B": B}), flush=True)
