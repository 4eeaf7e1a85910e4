"""Measured counter-evidence for the Pallas LZ4 decode kernel candidate
(SURVEY stage-3 / VERDICT r3 missing #2; analysis in docs/DESIGN.md
note 22): token-walk a liblz4 block of the bench corpus and print the
run-structure stats that bound ANY run-at-a-time device decoder."""
import json
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from bench import make_corpus
from tpuzip.oracle import liblz4

block = make_corpus(1 << 16)
comp = liblz4.compress_block(block)
i, lits, matches, litbytes, matchbytes = 0, 0, 0, 0, 0
mlens, offs = [], []
while i < len(comp):
    tok = comp[i]
    i += 1
    ll = tok >> 4
    if ll == 15:
        while comp[i] == 255:
            ll += 255
            i += 1
        ll += comp[i]
        i += 1
    if ll:
        lits += 1
        litbytes += ll
    i += ll
    if i >= len(comp):
        break
    off = comp[i] | (comp[i + 1] << 8)
    i += 2
    ml = tok & 15
    if ml == 15:
        while comp[i] == 255:
            ml += 255
            i += 1
        ml += comp[i]
        i += 1
    ml += 4
    matches += 1
    matchbytes += ml
    mlens.append(ml)
    offs.append(off)
mlens = np.array(mlens)
offs = np.array(offs)
runs = lits + matches
print(json.dumps({
    "block_KiB": 64, "comp_bytes": len(comp),
    "runs": runs, "literal_runs": lits, "match_runs": matches,
    "avg_run_bytes": round(65536 / runs, 1),
    "avg_match_bytes": round(float(mlens.mean()), 1),
    "self_overlap_frac": round(float((offs < mlens).mean()), 4),
    "median_offset": int(np.median(offs)),
    "match_byte_frac": round(matchbytes / 65536, 4),
    "dma_per_run_bound_MBps_per_stream": round(
        65536 / (runs * 0.8e-6) / 1e6, 1),
}))
