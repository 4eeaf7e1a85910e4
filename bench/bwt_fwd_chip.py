"""Chip timing for the batched BWT forward (packed-u32 doubling sort).

Measures jbwt.encode_batch_fast on (128, 64 KiB) full rows — the config-4
shape — plus a correctness gate vs the oracle.  Used for the round-3
unstable-sort A/B (the doubling rounds never consume within-tie order, so
every sort in the loop drops the stable-iota tiebreak operand).
"""
import sys, time, json
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

Lo, oo = obwt.encode_block(blocks[3].tobytes())
for way in (8,):
    jbwt.PACKED_WAY = way
    jax.clear_caches()
    # _encode_batch_fast is the jitted inner (encode_batch_fast inspects
    # lengths in Python to pick all_full); sync via scalar-reduction fetch
    sync = jax.jit(lambda b_, l: jnp.sum(
        jbwt._encode_batch_fast(b_, l, all_full=True)[0][:8, :8]
        .astype(jnp.int32)))
    int(sync(jb, jl))
    s = timed(lambda: int(sync(jb, jl)))

    L = np.asarray(jbwt._encode_batch_fast(jb, jl, all_full=True)[0])
    assert L[3].tobytes() == Lo, f"way={way} not bit-exact vs oracle"

    print(json.dumps({"packed_way": way,
                      "bwt_forward_MBps": round(B * N / s / 1e6, 1),
                      "B": B, "N": N}), flush=True)
