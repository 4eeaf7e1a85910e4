"""Scale evaluation: a deterministic >=100 MB mixed corpus through every
tpz codec (BASELINE eval configs 2/3/5 stand-ins; no network, so enwik8/9
are replaced by a reproducible mixed corpus).

Processes the corpus in superbatches through runner.compress/decompress,
aggregates RunMetrics phases, verifies bit-exact round-trips, and prints a
JSON row per codec:

  {"codec": ..., "MB": ..., "ratio": ..., "enc_MBps_wall": ...,
   "dec_MBps_wall": ..., "enc_MBps_device": ..., "dec_MBps_device": ...}

Wall numbers include host<->device transfer (the dev tunnel moves ~2 MB/s
up / 24 MB/s down — production PCIe is 3 orders faster); device numbers
are the per-chip phase throughputs the BASELINE metric asks for.
"""

import argparse
import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_mixed_corpus(nbytes: int, seed: int = 2026) -> bytes:
    """text / runs / structured-records / random segments, 1 MiB each."""
    rng = np.random.default_rng(seed)
    words = [b"the", b"compression", b"of", b"data", b"streams", b"on",
             b"tensor", b"processors", b"requires", b"batch", b"parallel",
             b"formulations", b"suffix", b"entropy", b"huffman", b"block"]
    seg = 1 << 20
    out = bytearray()
    kind = 0
    while len(out) < nbytes:
        if kind == 0:          # word salad text
            s = bytearray()
            while len(s) < seg:
                s += words[int(rng.integers(len(words)))] + b" "
            out += s[:seg]
        elif kind == 1:        # long runs
            s = bytearray()
            while len(s) < seg:
                s += bytes([int(rng.integers(8))]) * int(rng.integers(4, 600))
            out += s[:seg]
        elif kind == 2:        # structured little-endian u32 records
            base = rng.integers(0, 1 << 24)
            vals = (base + np.cumsum(rng.integers(0, 64, seg // 4))
                    ).astype(np.uint32)
            out += vals.tobytes()[:seg]
        else:                  # incompressible
            out += rng.integers(0, 256, seg, dtype=np.uint8).tobytes()
        kind = (kind + 1) % 4
    return bytes(out[:nbytes])


def run_codec(codec: str, corpus: bytes, super_mb: int, block_size: int):
    from tpuzip.dist import runner
    from tpuzip.utils.metrics import RunMetrics

    sb = super_mb << 20
    n = len(corpus)
    enc_wall = dec_wall = 0.0
    enc_dev = dec_dev = 0.0
    comp_total = 0
    h_in = hashlib.sha256()
    h_out = hashlib.sha256()
    for off in range(0, n, sb):
        piece = corpus[off : off + sb]
        h_in.update(piece)
        m = RunMetrics()
        t0 = time.perf_counter()
        c = runner.compress(piece, codec=codec, block_size=block_size,
                            metrics=m)
        enc_wall += time.perf_counter() - t0
        enc_dev += m.phases["encode"].seconds
        comp_total += len(c)
        m2 = RunMetrics()
        t0 = time.perf_counter()
        out = runner.decompress(c, metrics=m2)
        dec_wall += time.perf_counter() - t0
        if "decode" in m2.phases:
            dec_dev += m2.phases["decode"].seconds
        else:
            dec_dev += time.perf_counter() - t0
        h_out.update(out)
        if out != piece:
            return {"codec": codec, "ok": False, "off": off}
    mb = n / 1e6
    return {"codec": codec, "MB": round(n / 2**20, 1),
            "ok": h_in.hexdigest() == h_out.hexdigest(),
            "ratio": round(comp_total / n, 4),
            "enc_MBps_wall": round(mb / enc_wall, 2),
            "dec_MBps_wall": round(mb / dec_wall, 2),
            "enc_MBps_device": round(mb / max(enc_dev, 1e-9), 2),
            "dec_MBps_device": round(mb / max(dec_dev, 1e-9), 2)}


def run_codec_pipelined(codec: str, corpus: bytes, super_mb: int,
                        block_size: int):
    """Wall-clock row through the pipelined corpus API (superbatch
    double-buffering overlaps host and device stages)."""
    from tpuzip.dist import runner

    t0 = time.perf_counter()
    blob = runner.compress_corpus(corpus, codec=codec,
                                  block_size=block_size,
                                  superbatch=super_mb << 20)
    enc_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = runner.decompress_corpus(blob)
    dec_wall = time.perf_counter() - t0
    mb = len(corpus) / 1e6
    return {"codec": codec, "MB": round(len(corpus) / 2**20, 1),
            "pipelined": True, "ok": out == corpus,
            "ratio": round(len(blob) / max(len(corpus), 1), 4),
            "enc_MBps_wall": round(mb / enc_wall, 2),
            "dec_MBps_wall": round(mb / dec_wall, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=104)
    ap.add_argument("--super-mb", type=int, default=8,
                    help="superbatch size in MiB")
    ap.add_argument("--codecs", default="lz4,rle,ari,bwt,bwtdc,deflate")
    ap.add_argument("--block-size", type=int, default=1 << 16)
    ap.add_argument("--deflate-mb", type=int, default=16,
                    help="cap deflate corpus (symbol loops are slow)")
    ap.add_argument("--pipelined", action="store_true",
                    help="route through compress_corpus (double-buffered "
                         "superbatches) instead of the serial loop")
    args = ap.parse_args()

    import jax

    from bench import _axon_tunnel_down

    if _axon_tunnel_down():  # dead relay would hang backend init
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    corpus = make_mixed_corpus(args.mb << 20)
    print(json.dumps({"corpus_MB": args.mb,
                      "sha256": hashlib.sha256(corpus).hexdigest()[:16],
                      "platform": jax.devices()[0].platform}), flush=True)
    for codec in args.codecs.split(","):
        piece = corpus[: (args.deflate_mb << 20)] \
            if codec == "deflate" else corpus
        # lz4's device encode graph is compiled at B=32 (2 MiB superbatch);
        # B=128 would pay a fresh multi-10-minute remote compile
        smb = 2 if codec == "lz4" else args.super_mb
        t0 = time.perf_counter()
        if args.pipelined:
            row = run_codec_pipelined(codec, piece, smb, args.block_size)
        else:
            row = run_codec(codec, piece, smb, args.block_size)
        row["total_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    sys.exit(main())
