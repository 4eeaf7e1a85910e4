"""tpz — the framework CLI (reference parity: the demo driver src/main.rs,
grown into a real tool).

  python -m tpuzip.cli.tpz compress   [-c lz4|rle|ari] [-f tpz|lz4f|zlib] [-b BLOCK] IN OUT
  python -m tpuzip.cli.tpz decompress [-f tpz|lz4f|zlib] IN OUT
  python -m tpuzip.cli.tpz roundtrip  [-c CODEC] IN
  python -m tpuzip.cli.tpz info IN

Formats: 'tpz' is the sharded container (device pipeline); 'lz4f' and
'zlib' emit interoperable standard streams (oracle paths).
"""

from __future__ import annotations

import argparse
import sys
import time


def _make_config(args):
    from tpuzip.core.config import Config

    cfg = Config()
    if getattr(args, "ari_increment", None) is not None:
        cfg.codec.ari.increment = args.ari_increment
    if getattr(args, "ari_threshold", None) is not None:
        cfg.codec.ari.threshold = args.ari_threshold
    if getattr(args, "bin_bits", None) is not None:
        cfg.codec.ari.bin_bits = args.bin_bits
    if getattr(args, "bin_rate", None) is not None:
        cfg.codec.ari.bin_rate = args.bin_rate
    if getattr(args, "deflate_mode", None) is not None:
        cfg.codec.deflate.mode = args.deflate_mode
    if getattr(args, "lz4_hash_log", None) is not None:
        cfg.codec.lz4.hash_log = args.lz4_hash_log
    return cfg


def _compress(args) -> int:
    import contextlib

    from tpuzip.utils.metrics import RunMetrics

    data = open(args.infile, "rb").read()
    metrics = RunMetrics()
    trace = contextlib.nullcontext()
    if getattr(args, "trace", None):
        import jax

        trace = jax.profiler.trace(args.trace)  # TensorBoard/Perfetto dir
    t0 = time.perf_counter()
    with trace:
        if args.format == "tpz":
            from tpuzip.dist import runner

            if args.superbatch:
                # pipelined corpus path: superbatches double-buffer so
                # host stages overlap device stages (compress_corpus)
                out = runner.compress_corpus(
                    data, codec=args.codec, block_size=args.block_size,
                    superbatch=args.superbatch << 20,
                    config=_make_config(args))
            else:
                out = runner.compress(data, codec=args.codec,
                                      block_size=args.block_size,
                                      config=_make_config(args),
                                      metrics=metrics)
        elif args.format == "lz4f":
            from tpuzip.codecs import lz4_frame

            out = lz4_frame.compress_frame(data, block_max=1 << 16)
        elif args.format == "zlib":
            from tpuzip.codecs import zlib_ as jzlib

            out = jzlib.compress(data)
        else:
            raise SystemExit(f"unknown format {args.format}")
    dt = time.perf_counter() - t0
    open(args.outfile, "wb").write(out)
    print(f"{len(data)} -> {len(out)} bytes "
          f"({len(out) / max(len(data), 1):.1%}) in {dt:.2f}s "
          f"[{len(data) / dt / 1e6:.1f} MB/s]", file=sys.stderr)
    if args.metrics:
        print(metrics.report())
    return 0


def _decompress(args) -> int:
    from tpuzip.utils.metrics import RunMetrics

    data = open(args.infile, "rb").read()
    metrics = RunMetrics()
    t0 = time.perf_counter()
    if args.format == "tpz":
        from tpuzip.dist import runner

        if data[:4] == runner.MAGIC_CORPUS:
            out = runner.decompress_corpus(data)
        else:
            out = runner.decompress(data, metrics=metrics)
    elif args.format == "lz4f":
        from tpuzip.oracle import lz4

        out = lz4.decompress_frame(data)
    elif args.format == "zlib":
        from tpuzip.oracle import zlib_ as ozlib

        out = ozlib.decompress(data)
    else:
        raise SystemExit(f"unknown format {args.format}")
    dt = time.perf_counter() - t0
    open(args.outfile, "wb").write(out)
    print(f"{len(data)} -> {len(out)} bytes in {dt:.2f}s", file=sys.stderr)
    if args.metrics:
        print(metrics.report())
    return 0


def _roundtrip(args) -> int:
    from tpuzip.dist import runner

    data = open(args.infile, "rb").read()
    container = runner.compress(data, codec=args.codec,
                                block_size=args.block_size)
    out = runner.decompress(container)
    ok = out == data
    print(f"roundtrip {'OK' if ok else 'FAILED'}: {len(data)} -> "
          f"{len(container)} ({len(container) / max(len(data), 1):.1%})",
          file=sys.stderr)
    return 0 if ok else 1


def _info(args) -> int:
    import struct

    from tpuzip.dist.runner import CODEC_IDS, MAGIC, MAGIC_CORPUS

    data = open(args.infile, "rb").read()
    if data[:4] == MAGIC_CORPUS:
        (count,) = struct.unpack_from("<I", data, 4)
        pos, sizes = 8, []
        for _ in range(count):
            (ln,) = struct.unpack_from("<Q", data, pos)
            sizes.append(ln)
            pos += 8 + ln
        print(f"tpz corpus container: {count} superbatches, "
              f"{len(data)} bytes (payloads {sizes[:8]}"
              f"{'...' if count > 8 else ''})")
        return 0
    if data[:4] != MAGIC:
        print("not a tpz container", file=sys.stderr)
        return 1
    codec = CODEC_IDS.get(data[4], "?")
    block_size, nblocks, orig, a32 = struct.unpack_from("<IIQI", data, 6)
    print(f"tpz container: codec={codec} block_size={block_size} "
          f"blocks={nblocks} original={orig} adler32={a32:#010x}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tpz")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, out=True):
        sp.add_argument("-c", "--codec", default="lz4",
                        choices=["lz4", "lz4p", "rle", "ari", "bwt", "bwtdc",
                                 "deflate", "bin", "apm"])
        sp.add_argument("-f", "--format", default="tpz",
                        choices=["tpz", "lz4f", "zlib"])
        sp.add_argument("-b", "--block-size", type=int, default=1 << 16)
        sp.add_argument("--metrics", action="store_true",
                        help="print per-phase metrics JSON to stdout")
        sp.add_argument("--trace", default=None, metavar="DIR",
                        help="capture a jax.profiler trace of the "
                             "compress into DIR (TensorBoard/Perfetto)")
        sp.add_argument("--superbatch", type=int, default=0, metavar="MiB",
                        help="pipelined corpus mode: superbatch size in "
                             "MiB (0 = single container)")
        sp.add_argument("--ari-increment", type=int, default=None,
                        help="ari table-model frequency increment "
                             "(recorded in the container)")
        sp.add_argument("--ari-threshold", type=int, default=None,
                        help="ari downscale-halving threshold")
        sp.add_argument("--bin-bits", type=int, default=None,
                        help="bin/apm model probability precision "
                             "(recorded in the container)")
        sp.add_argument("--bin-rate", type=int, default=None,
                        help="bin/apm model adaptation shift")
        sp.add_argument("--deflate-mode", default=None,
                        choices=["dynamic", "fixed", "stored"],
                        help="deflate block type (RFC 1951 BTYPE)")
        sp.add_argument("--lz4-hash-log", type=int, default=None,
                        help="LZ4 encoder hash table = 2^hash_log slots")
        sp.add_argument("infile")
        if out:
            sp.add_argument("outfile")

    common(sub.add_parser("compress"))
    common(sub.add_parser("decompress"))
    common(sub.add_parser("roundtrip"), out=False)
    sp = sub.add_parser("info")
    sp.add_argument("infile")

    args = p.parse_args(argv)
    return {"compress": _compress, "decompress": _decompress,
            "roundtrip": _roundtrip, "info": _info}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
