"""Sharded corpus compression pipeline + the tpz container format.

The corpus is chunked into independent blocks (core.blocks), sharded over
the mesh dp axis, encoded batch-parallel on device, compacted with the
ordered ragged gather, and framed:

tpz container (defined by this framework):
  magic 'TPZ1' | codec u8 | flags u8 | block_size u32 LE | num_blocks u32 LE
  | orig_len u64 LE | adler32(orig) u32 LE | comp_lens u32[num_blocks] LE
  | [flags&1: block_adler u32[num_blocks] LE — per-block checksums of the
    ORIGINAL block bytes, computed on device]
  | payloads (concatenated, submission order)

Failure detection (SURVEY §5): decode paths return per-block error flags —
a bad block poisons only itself; `verify=True` rechecks the corpus Adler-32.
"""

from __future__ import annotations

import struct

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tpuzip.codecs import (ari as jari, bwt as jbwt, dc as jdc, lz4 as jlz4,
                           mtf as jmtf, rle as jrle)
from tpuzip.core import blocks as blk

from tpuzip.dist import mesh as meshlib
from tpuzip.runtime.errors import (BlockLengthError, ChecksumError,
                                   CorruptStreamError, HeaderError)

MAGIC = b"TPZ1"
# LZ4 planned-decode granularity: "wplan" (4 B/gather-row), "wplan8"
# (8 B/row) or "wplan16" (16 B/row — quarter the rows).  Runtime choice,
# not container format; bench/wplan_ab.py picks on measurement — chip
# A/B 2026-08-18 (B=128×64 KiB text): wplan4 233.6, wplan8 262.9,
# wplan16 215.1 MB/s device gather → wplan8 is production.
LZ4_DECODE_PLAN = "wplan8"
# Bulk-gather batch sweet spot (bench/wplan_width.py chip sweep:
# 265 / 406 / 321 MB/s at B=128/256/512): big to_device batches are
# served in slices of this many blocks.
LZ4_DECODE_SLICE = 256
# to_device serving picks DIRECT (threaded full decode + device put)
# over the copy-plan gather when the probed patch density exceeds this
# fraction — past it the plan transfer exceeds the raw output bytes and
# the ~390 MB/s gather loses to the 3.4 GB/s host decode (round-4 A/B,
# bench/wplan_ab_r4.py: ordinary text measures ~0.999 patched).
LZ4_SERVE_DIRECT_FRAC = 0.5


def _lz4_serve_direct(comp, clens, olens, block_size: int) -> bool:
    """Probe up to 32 blocks' wplan8 patch density (the parse is ~1.3
    GB/s — the probe costs ~1/8 of one slice parse)."""
    from tpuzip.runtime import native

    probe_n = min(comp.shape[0], 32)
    if probe_n == 0:
        return True
    _, _, _, used = native.lz4_decode_wplan8_batch(
        comp[:probe_n], np.asarray(clens[:probe_n], np.int32), block_size,
        strict=False)
    probe_out = max(int(np.asarray(olens[:probe_n]).sum()), 1)
    return float(used.sum()) / probe_out > LZ4_SERVE_DIRECT_FRAC


def corpus_adler32(data: bytes) -> int:
    """Container-level checksum.  Large corpora fan out across threads
    (zlib.adler32 releases the GIL on big buffers) and fold with the
    adler32_combine identity; small inputs take the native/stdlib path."""
    import zlib

    if len(data) >= (8 << 20):
        from concurrent.futures import ThreadPoolExecutor

        from tpuzip.oracle import adler as oadler

        nparts = 4
        step = -(-len(data) // nparts)
        mv = memoryview(data)
        parts = [mv[o : o + step] for o in range(0, len(data), step)]
        with ThreadPoolExecutor(max_workers=len(parts)) as ex:
            sums = list(ex.map(zlib.adler32, parts))
        total = 1
        for s, p in zip(sums, parts):
            total = oadler.combine(total, s, len(p))
        return total
    try:
        from tpuzip.runtime import native

        if native.available():
            return native.adler32(data)
    except Exception:
        pass
    return zlib.adler32(data)
CODECS = {"lz4": 1, "rle": 2, "ari": 3, "bwt": 4, "deflate": 5, "bwtdc": 6,
          "lz4p": 7, "bin": 8, "apm": 9}
CODEC_IDS = {v: k for k, v in CODECS.items()}

def _bwt_pipeline_encode(block, length):
    """Config-4 composite: BWT -> MTF -> adaptive ari, all on device.
    Payload layout: [origin u32 LE][ari stream]."""
    n = block.shape[0]
    L, origin = jbwt.encode_block(block, length)
    m = jmtf.encode(L, length)
    comp, clen = jari.encode(m, length, cap=jari.encode_cap(n) - 4)
    origin_bytes = jnp.stack(
        [(origin >> (8 * k)) & 0xFF for k in range(4)]).astype(jnp.uint8)
    out = jnp.concatenate([origin_bytes, comp])
    return out, clen + 4


def _bwt_pipeline_decode(comp, comp_len, out_n):
    origin = (comp[0].astype(jnp.int32) | (comp[1].astype(jnp.int32) << 8)
              | (comp[2].astype(jnp.int32) << 16)
              | (comp[3].astype(jnp.int32) << 24))
    # the decoded symbol count equals the original block length, carried by
    # the container; comp_len here is (comp_len, orig_len) packed by caller
    orig_len = comp_len[1]
    m = jari.decode(comp[4:], orig_len, out_n)
    L = jmtf.decode(m, orig_len)
    out = jbwt.decode_block(L, origin, orig_len)
    return out, orig_len


_bwt_encode_batch = jax.vmap(_bwt_pipeline_encode, in_axes=(0, 0))
_bwt_decode_batch = jax.vmap(_bwt_pipeline_decode, in_axes=(0, 0, None))


def _bwtdc_pipeline_encode(block, length):
    """Reference's alternative post-BWT path: BWT -> DC -> adaptive ari.
    Payload: [origin u32 LE][dc_len u32 LE][ari stream]."""
    n = block.shape[0]
    L, origin = jbwt.encode_block(block, length)
    dcomp, dlen = jdc.encode(L, length)
    acomp, alen = jari.encode(dcomp, dlen,
                              cap=jari.encode_cap(jdc.encode_cap(n)) - 8)
    hdr = jnp.stack(
        [(origin >> (8 * k)) & 0xFF for k in range(4)]
        + [(dlen >> (8 * k)) & 0xFF for k in range(4)]).astype(jnp.uint8)
    return jnp.concatenate([hdr, acomp]), alen + 8


def _bwtdc_pipeline_decode(comp, pair, out_n):
    c32 = comp.astype(jnp.int32)
    origin = c32[0] | (c32[1] << 8) | (c32[2] << 16) | (c32[3] << 24)
    dlen = c32[4] | (c32[5] << 8) | (c32[6] << 16) | (c32[7] << 24)
    orig_len = pair[1]
    dc_cap = jdc.encode_cap(out_n)
    dstream = jari.decode(comp[8:], dlen, dc_cap)
    L, llen, err = jdc.decode(dstream, dlen, out_n)
    out = jbwt.decode_block(L, origin, orig_len)
    return out, orig_len, err


_bwtdc_encode_batch = jax.vmap(_bwtdc_pipeline_encode, in_axes=(0, 0))
_bwtdc_decode_batch = jax.vmap(_bwtdc_pipeline_decode, in_axes=(0, 0, None))

def _ari_encode_auto(blocks, lengths):
    """Pallas lane-parallel range encoder on TPU (139 MB/s/chip, bit-exact
    oracle streams); XLA scan fallback elsewhere."""
    b, n = blocks.shape
    if (jax.devices()[0].platform == "tpu" and b <= 1024 and n % 256 == 0):
        from tpuzip.kernels.range_coder import (ari_encode_lanes_packed,
                                                lane_width)

        LANES = lane_width(b)
        x = jnp.zeros((n, LANES), jnp.uint8).at[:, :b].set(
            jnp.transpose(blocks))
        lens = jnp.zeros(LANES, jnp.int32).at[:b].set(lengths)
        streams, slens = ari_encode_lanes_packed(x, lens)
        cap = jari.encode_cap(n)
        out = jnp.zeros((b, cap), jnp.uint8)
        w = min(streams.shape[1], cap)
        out = out.at[:, :w].set(streams[:b, :w])
        return out, slens[:b]
    return jax.jit(jari.encode_batch)(blocks, lengths)


def _ari_encode_indexed(blocks, lengths, increment: int = 8,
                        threshold: int = 1 << 13):
    """ari encode + fast-decode chunk index (VERDICT r1 item 1).

    Returns (comp (B, cap) u8, clens (B,) i64-able, deltas (B, NC) i32)
    where NC = ceil-padded chunk count; deltas feed the Pallas lane
    decoder.  Pallas kernel on TPU in lane-width groups (128..1024), XLA
    scan elsewhere (both emit identical oracle streams AND indexes)."""
    from tpuzip.kernels import range_decoder as rdk
    from tpuzip.utils.metrics import log

    b, n = blocks.shape
    cs = rdk.CHUNK_STEPS
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu and n % 256 != 0:
        log.warning(
            "ari: block_size %d not a multiple of 256 — falling back from "
            "the Pallas lane encoder to the XLA scan (~80x slower)", n)
    kernel_model_ok = threshold + increment <= (1 << 15)
    if on_tpu and not kernel_model_ok:
        log.warning(
            "ari: threshold+increment %d > 32768 exceeds the kernel's "
            "u16-packed cum table — using the C++/XLA coder instead",
            threshold + increment)
    if on_tpu and n % 256 == 0 and kernel_model_ok:
        from tpuzip.kernels.range_coder import (
            ari_encode_lanes_packed_indexed, lane_width)

        cap = jari.encode_cap(n)
        comp = np.zeros((b, cap), np.uint8)
        clens = np.zeros(b, np.int64)
        deltas = np.zeros((b, n // cs), np.int32)
        # wide lane groups amortize the kernel's fixed per-step cost
        # (142 -> 270 MB/s at 128 -> 1024 lanes on v5e)
        width = lane_width(b)
        for g in range(0, b, width):
            grp = blocks[g : g + width]
            gb = grp.shape[0]
            x = jnp.zeros((n, width), jnp.uint8).at[:, :gb].set(
                jnp.transpose(grp))
            lens = jnp.zeros(width, jnp.int32).at[:gb].set(
                lengths[g : g + width])
            streams, slens, dts = ari_encode_lanes_packed_indexed(
                x, lens, increment=increment, threshold=threshold)
            slens_np = np.asarray(slens[:gb])
            # download only the used stream prefix (the padded buffer is
            # 2x the input; the tunnel link makes the difference real);
            # power-of-two bucket keeps the slice shapes jit-cacheable
            w = 1 << max(int(slens_np.max(initial=1)) - 1, 7).bit_length()
            w = min(streams.shape[1], cap, w)
            comp[g : g + gb, :w] = np.asarray(streams[:gb, :w])
            clens[g : g + gb] = slens_np
            deltas[g : g + gb] = np.asarray(dts).T[:gb]
        return comp, clens, deltas
    if _native_ok() and not isinstance(blocks, jax.core.Tracer):
        # threaded C++ coder (off-TPU production path; bit-exact streams
        # AND chunk indexes, so containers stay chip-interchangeable)
        from tpuzip.runtime import native

        nc = (n + cs - 1) // cs
        comp, clens, deltas = native.ari_encode_indexed_batch(
            np.asarray(jax.device_get(blocks)),
            np.asarray(jax.device_get(lengths), np.int32), nc,
            increment=increment, threshold=threshold)
        return comp, clens, deltas
    comp, clens, counts = jax.jit(jax.vmap(
        lambda bb, ll: jari.encode_with_counts(
            bb, ll, increment=increment, threshold=threshold)))(
        blocks, lengths)
    counts = np.asarray(counts)
    pad = (-counts.shape[1]) % cs
    if pad:
        counts = np.pad(counts, ((0, 0), (0, pad)))
    deltas = counts.reshape(b, -1, cs).sum(axis=2).astype(np.int32)
    return np.asarray(comp), np.asarray(clens).astype(np.int64), deltas


def native_dc_decode(syms, dlens, block_size):
    from tpuzip.runtime import native

    return native.dc_decode_batch(syms, dlens, block_size)


def _native_ok() -> bool:
    try:
        from tpuzip.runtime import native

        return native.available()
    except Exception:
        return False


def _mtf_encode_auto(L, lengths, decode=False):
    """MTF over a (B, N) batch: 272 MB/s Pallas lane kernel on TPU, XLA
    scan elsewhere.  The kernel has no length masking, but MTF output at
    position t never depends on later inputs, so positions < length match
    the masked scan exactly."""
    if jax.devices()[0].platform == "tpu":
        from tpuzip.kernels import mtf_scan

        return mtf_scan.mtf_batch(L, decode=decode)
    if _native_ok() and not isinstance(L, jax.core.Tracer):
        from tpuzip.runtime import native

        return jnp.asarray(native.mtf_batch(
            np.asarray(jax.device_get(L)),
            np.asarray(jax.device_get(lengths), np.int32), decode=decode))
    fn = jmtf.decode_batch if decode else jmtf.encode_batch
    return jax.jit(fn)(L, lengths)


def _pow2_bucket(m: int, lo: int, hi: int) -> int:
    """Smallest power-of-two multiple of 256 in [lo, hi] covering m (keeps
    the jit cache small when ari symbol counts vary per batch)."""
    b = lo
    while b < m and b < hi:
        b *= 2
    return min(max(b, lo), hi)


SEG_THRESHOLD = 1 << 20  # bwt blocks above this segment the entropy stage


def _seg_geometry(n: int) -> tuple[int, int]:
    """(seg_size, nseg) for a big-block entropy stage: <=128 segments,
    seg_size a multiple of 256 (Pallas lane-kernel requirement)."""
    seg = -(-n // 128)
    seg = -(-seg // 256) * 256
    return seg, -(-n // seg)


def _encode_bwt_segmented(jb, jl, lengths, increment, threshold
                          ) -> list[bytes]:
    """Config-4 path (BASELINE configs[3], 100 MB blocks): the per-block
    post-BWT stream is split into <=128 segments, each MTF+ari coded with
    fresh state, so the lane kernels get full utilization from a SINGLE
    giant block.  Fresh per-segment model state costs ~0.1% ratio on
    multi-MB segments and is recorded as container flag bit 3.

    Per-block payload:
      [u32 origin][u16 nseg][u32 seg_size]
      then nseg x: [u32 seg_olen][u32 idx_len][idx][stream]
    """
    from tpuzip.kernels import range_decoder as rdk

    cs = rdk.CHUNK_STEPS
    B, n = jb.shape
    L, origins = jbwt.encode_batch_fast(jb, jl)
    seg, nseg = _seg_geometry(n)
    pad = seg * nseg - n
    if pad:
        L = jnp.pad(L, ((0, 0), (0, pad)))
    Lseg = L.reshape(B * nseg, seg)
    lens_np = np.asarray(lengths).astype(np.int64)
    seg_lens = np.clip(lens_np[:, None] - seg * np.arange(nseg)[None, :],
                       0, seg).astype(np.int32).reshape(-1)
    jsl = jnp.array(seg_lens)
    syms = _mtf_encode_auto(Lseg, jsl)
    comp_np, slens_np, deltas = _ari_encode_indexed(
        syms, jsl, increment=increment, threshold=threshold)
    origins_np = np.asarray(origins)
    blobs = []
    for i in range(B):
        parts = [struct.pack("<IHI", int(origins_np[i]), nseg, seg)]
        for s in range(nseg):
            k = i * nseg + s
            nci = (int(seg_lens[k]) + cs - 1) // cs
            idx = rdk.pack_chunk_index(deltas[k, :nci])
            parts.append(struct.pack("<II", int(seg_lens[k]), len(idx)))
            parts.append(idx)
            parts.append(comp_np[k, : slens_np[k]].tobytes())
        blobs.append(b"".join(parts))
    return blobs


def _decode_bwt_segmented(comp: np.ndarray, clens: np.ndarray,
                          olens: np.ndarray, block_size: int, B: int,
                          increment, threshold,
                          use_extra_memory: bool = True) -> np.ndarray:
    from tpuzip.kernels import range_decoder as rdk

    cs = rdk.CHUNK_STEPS
    seg, nseg = _seg_geometry(block_size)
    cap_s = jari.encode_cap(seg)
    nc_full = (seg + cs - 1) // cs
    Bp = comp.shape[0]
    streams = np.zeros((Bp * nseg, cap_s), np.uint8)
    deltas = np.zeros((Bp * nseg, nc_full), np.int32)
    seg_lens = np.zeros(Bp * nseg, np.int32)
    origins = np.zeros(Bp, np.int32)
    for i in range(B):
        if clens[i] == 0:
            continue
        blob = comp[i, : int(clens[i])].tobytes()
        origins[i], ns, sg = struct.unpack_from("<IHI", blob, 0)
        if ns != nseg or sg != seg:
            raise CorruptStreamError([i])
        pos = 10
        for s in range(nseg):
            k = i * nseg + s
            sl, idxlen = struct.unpack_from("<II", blob, pos)
            pos += 8
            if sl > seg:
                raise CorruptStreamError([i])
            nci = (int(sl) + cs - 1) // cs
            try:
                deltas[k, :nci] = rdk.parse_chunk_index(
                    blob[pos : pos + idxlen], nci)
            except ValueError as e:
                raise CorruptStreamError([i]) from e
            pos += idxlen
            # stream length = 4 initial code bytes + total renorm pulls
            # (empty segments still carry the 4 finish bytes); corrupt
            # deltas can push slen past the stream cap or the blob end —
            # both must surface as CorruptStreamError, not shape errors
            slen = int(deltas[k].sum()) + 4
            try:
                streams[k, :slen] = np.frombuffer(blob, np.uint8, slen, pos)
            except ValueError as e:
                raise CorruptStreamError([i]) from e
            pos += slen
            seg_lens[k] = sl
        if pos != len(blob):
            raise BlockLengthError(f"bwt block {i}: trailing payload bytes")
    if jax.devices()[0].platform == "tpu":
        from tpuzip.kernels.range_coder import lane_width

        syms = np.zeros((Bp * nseg, seg), np.uint8)
        L = lane_width(Bp * nseg)
        for g in range(0, Bp * nseg, L):
            gb = min(L, Bp * nseg - g)
            syms[g : g + gb] = np.asarray(rdk.ari_decode_batch_kernel(
                streams[g : g + gb], deltas[g : g + gb],
                jnp.array(seg_lens[g : g + gb]), seg,
                increment=increment, threshold=threshold))
    elif _native_ok():
        from tpuzip.runtime import native

        syms = native.ari_decode_batch_native(
            streams, np.full(Bp * nseg, streams.shape[1], np.int32),
            seg_lens, seg, increment=increment, threshold=threshold)
    else:
        syms = np.asarray(jax.jit(jax.vmap(
            lambda c, l: jari.decode(c, l, seg, increment=increment,
                                     threshold=threshold)))(
            jnp.array(streams), jnp.array(seg_lens)))
    Lseg = _mtf_encode_auto(jnp.array(syms), jnp.array(seg_lens),
                            decode=True)
    Lfull = jnp.reshape(Lseg, (Bp, nseg * seg))[:, :block_size]
    out = jbwt.decode_batch_auto(Lfull, jnp.array(origins),
                                 jnp.array(olens.astype(np.int32)),
                                 use_extra_memory=use_extra_memory)
    return np.asarray(out)


def _encode_ari_family(codec: str, jb, jl, lengths, increment: int = 8,
                       threshold: int = 1 << 13) -> list[bytes]:
    """Staged batch pipeline for the ari-backed codecs (VERDICT r1 items
    1+2): BWT (batched XLA sort) -> MTF/DC -> Pallas ari encoder, with the
    fast-decode chunk index.  Per-block payloads:

      ari:   [u32 idx_len][chunk index][ari stream]
      bwt:   [u32 origin][u32 idx_len][idx][stream]   (stream = ari(mtf(L)))
      bwtdc: [u32 origin][u32 dc_len][u32 idx_len][idx][stream]
    """
    from tpuzip.kernels import range_decoder as rdk

    cs = rdk.CHUNK_STEPS
    B, n = jb.shape
    if codec == "ari":
        syms, sym_lens = jb, jl
        heads = [b""] * B
    elif codec == "bwt":
        if n > SEG_THRESHOLD:
            return _encode_bwt_segmented(jb, jl, lengths, increment,
                                         threshold)
        L, origins = jbwt.encode_batch_fast(jb, jl)
        syms = _mtf_encode_auto(L, jl)
        sym_lens = jl
        origins_np = np.asarray(origins)
        heads = [struct.pack("<I", int(origins_np[i])) for i in range(B)]
    elif codec == "bwtdc":
        L, origins = jbwt.encode_batch_fast(jb, jl)
        if jax.devices()[0].platform != "tpu" and _native_ok():
            from tpuzip.runtime import native

            dcomp, dl64 = native.dc_encode_batch(
                np.asarray(jax.device_get(L)),
                np.asarray(jax.device_get(jl), np.int32))
            dlens = dl64
        else:
            dcomp, dlens = jax.jit(jdc.encode_batch)(L, jl)
        dlens_np = np.asarray(dlens).astype(np.int64)
        # bucket the ari width so the kernel does ~max(dlen) work, not the
        # 5x worst-case dc cap
        width = _pow2_bucket(int(dlens_np.max(initial=1)), 256,
                             dcomp.shape[1])
        syms = dcomp[:, :width]
        sym_lens = dlens
        origins_np = np.asarray(origins)
        heads = [struct.pack("<II", int(origins_np[i]), int(dlens_np[i]))
                 for i in range(B)]
    else:
        raise ValueError(codec)
    comp_np, slens_np, deltas = _ari_encode_indexed(
        syms, sym_lens, increment=increment, threshold=threshold)
    sym_lens_np = np.asarray(sym_lens).astype(np.int64)
    blobs = []
    for i in range(B):
        nci = (int(sym_lens_np[i]) + cs - 1) // cs
        idx = rdk.pack_chunk_index(deltas[i, :nci])
        blobs.append(heads[i] + struct.pack("<I", len(idx)) + idx
                     + comp_np[i, : slens_np[i]].tobytes())
    return blobs


def _decode_ari_family(codec: str, comp: np.ndarray, clens: np.ndarray,
                       olens: np.ndarray, block_size: int, B: int,
                       increment: int = 8, threshold: int = 1 << 13,
                       use_extra_memory: bool = True) -> np.ndarray:
    """Decode the flag-bit-1 staged payloads: Pallas ari decoder (TPU) or
    XLA scan, then MTF/DC + inverse BWT."""
    from tpuzip.kernels import range_decoder as rdk

    head = {"ari": 0, "bwt": 4, "bwtdc": 8}[codec]
    Bp = comp.shape[0]
    origins = np.zeros(Bp, np.int32)
    dlens = np.zeros(Bp, np.int64)
    for i in range(B):
        if clens[i] == 0:
            continue
        if clens[i] < head + 4:
            raise BlockLengthError(f"{codec} block {i} shorter than header")
        if codec == "bwt":
            (origins[i],) = struct.unpack_from(
                "<I", comp[i, :head].tobytes(), 0)
        elif codec == "bwtdc":
            origins[i], dlens[i] = struct.unpack_from(
                "<II", comp[i, :head].tobytes(), 0)
            if dlens[i] > jdc.encode_cap(block_size):
                raise CorruptStreamError([i])
    if codec == "bwtdc":
        sym_lens = dlens
        width = _pow2_bucket(int(dlens.max(initial=1)), 256,
                             jdc.encode_cap(block_size))
    else:
        sym_lens = olens
        width = block_size
    syms = _ari_decode_indexed(comp[:, head:], np.maximum(clens - head, 0),
                               sym_lens, width,
                               (width + rdk.CHUNK_STEPS - 1)
                               // rdk.CHUNK_STEPS, B,
                               increment=increment, threshold=threshold)
    if codec == "ari":
        return syms
    jsyms = jnp.array(syms)
    if codec == "bwt":
        jl = jnp.array(olens.astype(np.int32))
        L = _mtf_encode_auto(jsyms, jl, decode=True)
        out = jbwt.decode_batch_auto(L, jnp.array(origins),
                                     jl.astype(jnp.int32),
                                     use_extra_memory=use_extra_memory)
        return np.asarray(out)
    # bwtdc
    jdl = jnp.array(dlens.astype(np.int32))
    jl = jnp.array(olens.astype(np.int32))
    # every DC run consumes >= 1 distance byte, so the run scan is bounded
    # by the largest DC body in the batch (pow2-bucketed for cache reuse)
    ms = _pow2_bucket(max(int(dlens.max(initial=1)) - jdc.HDR, 1), 256,
                      block_size)
    if jax.devices()[0].platform == "tpu":
        # lane-parallel Pallas run walk (kernels/dc_scan)
        L, _, errs = jdc.decode_batch_kernel(jsyms, jdl, block_size, ms)
    elif _native_ok():
        Lnp, got = native_dc_decode(np.asarray(jax.device_get(jsyms)),
                                    dlens.astype(np.int32), block_size)
        L, errs = jnp.asarray(Lnp), (got < 0).astype(np.int32)
    else:
        L, _, errs = jax.jit(jdc.decode_batch, static_argnums=(2, 3))(
            jsyms, jdl, block_size, ms)
    if np.asarray(errs)[:B].any():
        raise CorruptStreamError(np.nonzero(np.asarray(errs)[:B])[0])
    out = jbwt.decode_batch_auto(L, jnp.array(origins), jl,
                                 use_extra_memory=use_extra_memory)
    return np.asarray(out)


def _ari_decode_indexed(comp: np.ndarray, clens: np.ndarray,
                        olens: np.ndarray, block_size: int, nc_full: int,
                        B: int, increment: int = 8,
                        threshold: int = 1 << 13) -> np.ndarray:
    """Decode flag-bit-1 ari payloads ([u32 idx_len][chunk index][stream]).

    TPU: Pallas lane decoder in 128-block groups (kernels/range_decoder);
    elsewhere: the XLA scan decoder on the extracted streams."""
    from tpuzip.kernels import range_decoder as rdk

    Bp = comp.shape[0]
    cap_s = jari.encode_cap(block_size)
    streams = np.zeros((Bp, cap_s), np.uint8)
    deltas = np.zeros((Bp, nc_full), np.int32)
    for i in range(B):
        if clens[i] < 4:
            if clens[i] != 0:
                raise BlockLengthError(f"ari block {i} shorter than header")
            continue
        (idxlen,) = struct.unpack_from("<I", comp[i, :4].tobytes())
        if 4 + idxlen > clens[i]:
            raise BlockLengthError(f"ari block {i}: index overruns payload")
        nci = (int(olens[i]) + rdk.CHUNK_STEPS - 1) // rdk.CHUNK_STEPS
        try:
            deltas[i, :nci] = rdk.parse_chunk_index(
                comp[i, 4 : 4 + idxlen].tobytes(), nci)
        except ValueError as e:
            raise CorruptStreamError([i]) from e
        slen = int(clens[i]) - 4 - idxlen
        try:
            streams[i, :slen] = comp[i, 4 + idxlen : int(clens[i])]
        except ValueError as e:  # corrupt sizes past the stream cap
            raise CorruptStreamError([i]) from e
    if jax.devices()[0].platform == "tpu":
        from tpuzip.kernels.range_coder import lane_width

        out = np.zeros((Bp, block_size), np.uint8)
        L = lane_width(B)  # wide groups amortize fixed per-step cost
        # upload only the used stream prefix (tunnel link is 2 MB/s);
        # power-of-two bucket so jit shapes stay cacheable
        wmax = 1 << max(int(clens[:B].max(initial=1)) - 1, 7).bit_length()
        wmax = min(wmax, streams.shape[1])
        for g in range(0, B, L):
            gb = min(L, B - g)
            # streams stay host-side: the batch kernel's prepack builds
            # windows in threaded C++ and uploads those instead
            out[g : g + gb] = np.asarray(rdk.ari_decode_batch_kernel(
                streams[g : g + gb, :wmax],
                deltas[g : g + gb],
                jnp.array(olens[g : g + gb].astype(np.int32)), block_size,
                increment=increment, threshold=threshold))
        return out
    if _native_ok():
        from tpuzip.runtime import native

        # the sequential C++ decoder stops after num_syms symbols; the row
        # width is a safe byte bound (it zero-fills reads past the stream,
        # which a valid stream never reaches)
        slens = np.full(Bp, streams.shape[1], np.int32)
        return native.ari_decode_batch_native(
            streams, slens, np.asarray(olens, np.int32), block_size,
            increment=increment, threshold=threshold)
    return np.asarray(jax.jit(jax.vmap(
        lambda c, l: jari.decode(c, l, block_size, increment=increment,
                                 threshold=threshold)))(
        jnp.array(streams), jnp.array(olens.astype(np.int32))))


def _deflate_cap(n):
    return 2 * n + 2048


def _deflate_encode_batch(blocks, lengths):
    from tpuzip.codecs import deflate as jdef

    return jdef.deflate_batch(blocks, lengths)


_ENCODERS = {
    "lz4": (jlz4.encode_batch, jlz4.encode_cap),
    "rle": (jrle.encode_batch, jrle.encode_cap),
    "ari": (_ari_encode_auto, jari.encode_cap),
    "bwt": (_bwt_encode_batch, jari.encode_cap),
    "bwtdc": (_bwtdc_encode_batch,
              lambda n: jari.encode_cap(jdc.encode_cap(n))),
    "deflate": (_deflate_encode_batch, _deflate_cap),
    "lz4p": (None, None),  # filled below (late import avoids a cycle)
    "bin": (None, None),
    "apm": (None, None),
}


def _init_lz4p():
    from tpuzip.codecs import lz4p as jlz4p

    _ENCODERS["lz4p"] = (jlz4p.encode_batch, jlz4p.encode_cap)


def _init_bin():
    import functools

    from tpuzip.codecs import bin_apm as jbin

    cap = lambda n: jbin.encode_cap(8 * n)  # noqa: E731
    _ENCODERS["bin"] = (jbin.encode_batch, cap)
    _ENCODERS["apm"] = (functools.partial(jbin.encode_batch, use_apm=True),
                        cap)


_init_lz4p()
_init_bin()


def _bin_encode_auto(blocks, lengths, model_bits: int, rate: int,
                     use_apm: bool):
    """Binary/APM byte coder: lane-parallel Pallas kernel on TPU (the
    lightest entropy kernel in the framework — no one-hot table scans),
    threaded C++ / vmapped XLA scan elsewhere.  Returns (comp (B, cap)
    np, clens np, deltas (B, NC) i32) — deltas are the per-256-bit-chunk
    consumed bytes feeding the lane decoder's window prepack (round 4:
    the bin family joins ari's chunk-indexed fast-decode design).  All
    three paths emit identical streams AND identical indexes."""
    from tpuzip.codecs import bin_apm as jbin
    from tpuzip.kernels import bin_coder as kbin

    b, n = blocks.shape
    cap = jbin.encode_cap(8 * n)
    nc = max((8 * n + kbin.CHUNK - 1) // kbin.CHUNK, 1)
    if jax.devices()[0].platform == "tpu":
        from tpuzip.kernels.range_coder import lane_width

        bits = jbin.bytes_to_bits(jnp.asarray(blocks))
        comp_np = np.zeros((b, cap), np.uint8)
        clens = np.zeros(b, np.int64)
        deltas = np.zeros((b, nc), np.int32)
        lens8 = jnp.asarray(lengths, jnp.int32) * 8
        width = lane_width(b)  # wide groups amortize per-step fixed cost
        for g in range(0, b, width):
            gb = min(width, b - g)
            streams, counts = kbin.bin_encode_streams(
                bits[g : g + gb], lens8[g : g + gb],
                use_apm=use_apm, model_bits=model_bits, rate=rate,
                with_counts=True)
            for k, s in enumerate(streams):
                clens[g + k] = len(s)
                comp_np[g + k, : len(s)] = np.frombuffer(s, np.uint8)
            npad = counts.shape[0]
            deltas[g : g + gb] = counts.reshape(
                npad // kbin.CHUNK, kbin.CHUNK, -1).sum(1).T[:gb, :nc]
        return comp_np, clens, deltas
    if _native_ok():
        from tpuzip.runtime import native

        return native.bin_encode_indexed_batch(
            np.asarray(jax.device_get(blocks)),
            np.asarray(jax.device_get(lengths), np.int32),
            bits=model_bits, rate=rate, use_apm=use_apm)
    comp, clens, counts = jax.jit(jax.vmap(
        lambda bb, ll: jbin.encode_bits(
            jbin.bytes_to_bits(bb[None])[0], 8 * ll,
            model_bits=model_bits, rate=rate, use_apm=use_apm,
            with_counts=True)))(
        jnp.asarray(blocks), jnp.asarray(lengths, jnp.int32))
    counts = np.asarray(counts)
    pad = (-counts.shape[1]) % kbin.CHUNK
    if pad:
        counts = np.pad(counts, ((0, 0), (0, pad)))
    deltas = counts.reshape(b, -1, kbin.CHUNK).sum(2).astype(np.int32)
    return (np.asarray(comp), np.asarray(clens).astype(np.int64),
            deltas[:, :nc])


def _bin_decode_indexed(scomp, sclens, deltas, olens, block_size: int,
                        bits: int, rate: int, use_apm: bool):
    """Chunk-indexed bin/apm decode through the lane decoder: window
    prepack (threaded C++ when available, XLA otherwise) + the Pallas
    kernel on TPU / its XLA reference replica elsewhere.  Returns a
    (B, block_size) u8 jnp array."""
    from tpuzip.codecs import bin_apm as jbin
    from tpuzip.kernels import bin_coder as kbin
    from tpuzip.kernels import range_decoder as rdk
    from tpuzip.kernels.range_coder import lane_width

    b = scomp.shape[0]
    nc = deltas.shape[1]
    nbits = (np.asarray(olens) * 8).astype(np.int32)
    on_tpu = jax.devices()[0].platform == "tpu"
    width = lane_width(b)
    outs = []
    for g in range(0, b, width):
        gb = min(width, b - g)
        d2 = np.ascontiguousarray(deltas[g : g + gb])
        w = kbin.bin_window_words(max(int(d2.max(initial=1)), 1))
        st = np.ascontiguousarray(scomp[g : g + gb])
        if _native_ok():
            from tpuzip.runtime import native

            wins = native.ari_build_windows(st, d2, w)
            wlane = jnp.zeros((width, nc * w), jnp.uint32).at[:gb].set(
                wins)
            windows = jnp.transpose(wlane)
        else:
            compT = jnp.zeros((st.shape[1], width), jnp.uint8)
            compT = compT.at[:, :gb].set(jnp.transpose(jnp.array(st)))
            dT = jnp.zeros((nc, width), jnp.int32).at[:, :gb].set(
                jnp.transpose(jnp.array(d2)))
            starts = 4 + jnp.cumsum(dT, axis=0) - dT
            windows = rdk.build_windows(compT, starts, w)
        cu = st[:, :4].astype(np.uint32)
        code0 = jnp.zeros(width, jnp.uint32).at[:gb].set(
            jnp.array((cu[:, 0] << 24) | (cu[:, 1] << 16)
                      | (cu[:, 2] << 8) | cu[:, 3]))
        lens_g = jnp.zeros(width, jnp.int32).at[:gb].set(
            jnp.array(nbits[g : g + gb]))
        if on_tpu:
            bits_tm = kbin.bin_decode_lanes(
                windows, code0, lens_g, w=w, model_bits=bits, rate=rate,
                use_apm=use_apm)
        else:
            bits_tm = kbin.bin_decode_reference(
                windows, code0, lens_g, w=w, model_bits=bits, rate=rate,
                use_apm=use_apm)
        bits_bm = jnp.transpose(bits_tm[: 8 * block_size, :gb])
        outs.append(jbin.bits_to_bytes(bits_bm))
    return jnp.concatenate(outs, axis=0)


def _decode_batch(codec: str, comp, lens, out_n):
    if codec == "lz4":
        out, olens, errs = jlz4.decode_batch(comp, lens, out_n)
        return out[:, :out_n], olens, errs
    if codec == "lz4p":
        from tpuzip.codecs import lz4p as jlz4p

        return jlz4p.decode_batch(comp, lens, out_n)
    if codec == "rle":
        out, olens = jrle.decode_batch(comp, lens, out_n)
        return out, olens, jnp.zeros_like(olens)
    raise ValueError(codec)


def compress(data: bytes, codec: str = "lz4", block_size: int | None = None,
             mesh: Mesh | None = None, block_checksums: bool = False,
             config=None, metrics=None) -> bytes:
    """Compress a corpus with the sharded batch pipeline.

    block_checksums=True adds a device-computed Adler-32 per block so a
    corrupt payload poisons (and identifies) only its own block.
    `config` (core.config.Config) supplies the codec knobs — ari
    increment/threshold change the emitted streams and are recorded in the
    container (flag bit 2).  `metrics` (utils.metrics.RunMetrics) collects
    per-phase timings."""
    from tpuzip.core.config import Config
    from tpuzip.utils.metrics import RunMetrics

    config = config or Config()
    metrics = metrics if metrics is not None else RunMetrics()
    if block_size is None:
        block_size = (config.codec.bwt.block_size
                      if codec in ("bwt", "bwtdc")
                      else config.mesh.block_size)
    if codec in ("bin", "apm"):
        # the flag-4 trailer carries (model_bits, rate) for the binary
        # models, reusing the <HI> ari (increment, threshold) slots
        inc, thr = config.codec.ari.bin_bits, config.codec.ari.bin_rate
        knob_defaults = (12, 5)
    else:
        inc = config.codec.ari.increment
        thr = config.codec.ari.threshold
        knob_defaults = (8, 1 << 13)
    if config.log_level != "info":
        from tpuzip.utils.metrics import setup_logging

        setup_logging(config.log_level)
    mesh = mesh or meshlib.make_mesh(config.mesh.chips_per_host or None)
    ndp = mesh.shape["dp"]
    with metrics.phase("chunk", bytes_in=len(data)):
        blocks, lengths = blk.chunk_padded(data, block_size, ndp)
        B = blocks.shape[0]
        sharding = meshlib.block_sharding(mesh)
        lsharding = meshlib.length_sharding(mesh)

    # upload lazily: the threaded-C++ encode paths never touch the device
    # batch, and the sharded upload is real time (and, on the chip, real
    # tunnel traffic) at GiB scale
    _ub = [None]

    def jbf():
        if _ub[0] is None:
            _ub[0] = jax.device_put(jnp.array(blocks), sharding)
        return _ub[0]

    _ul = [None]

    def jlf():
        if _ul[0] is None:
            _ul[0] = jax.device_put(jnp.array(lengths), lsharding)
        return _ul[0]

    enc, cap_fn = _ENCODERS[codec]
    flags = 1 if block_checksums else 0
    if (inc, thr) != knob_defaults:
        flags |= 4
    if codec in ("ari", "bwt", "bwtdc"):
        # staged pipeline with the fast-decode chunk index (flag bit 1)
        with metrics.phase("encode", bytes_in=len(data), blocks=B):
            blobs = _encode_ari_family(codec, jbf(), jlf(), lengths,
                                       increment=inc, threshold=thr)
        with metrics.phase("assemble"):
            clens_np = np.array([len(p) for p in blobs], np.int64)
            payload = b"".join(blobs)
        flags |= 2
        if codec == "bwt" and block_size > SEG_THRESHOLD:
            flags |= 8  # segmented entropy stage (config-4 big blocks)
    elif codec == "deflate":
        native_ok = _native_ok()
        mode = config.codec.deflate.mode
        if mode not in ("dynamic", "fixed", "stored"):
            raise ValueError(f"deflate.mode {mode!r}")
        with metrics.phase("encode", bytes_in=len(data), blocks=B):
            if native_ok:
                from tpuzip.runtime import native
                # production host encoder (C++, zlib-accepted, threaded
                # across cores); deflate_batch is the device formulation
                # + cross-check
                mc = config.codec.deflate.max_chain
                comp_np, cl64 = native.deflate_batch_native(
                    blocks, lengths, max_chain=mc, mode=mode)
                clens_np = cl64.astype(np.int64)
                payload = native.pack_payloads(
                    comp_np, clens_np.astype(np.int32))
            elif mode != "dynamic":
                # the device bulk encoder emits dynamic blocks only; the
                # fixed/stored block types fall back to the RFC oracle
                from tpuzip.oracle import deflate as odef

                blobs = [odef.compress(
                    blocks[i, : lengths[i]].tobytes(), mode=mode,
                    max_chain=config.codec.deflate.max_chain)
                    for i in range(B)]
                clens_np = np.array([len(p) for p in blobs], np.int64)
                payload = b"".join(blobs)
            else:
                comp, clens = enc(jbf(), jlf())
                clens_np = np.asarray(clens).astype(np.int64)
                comp_np = np.asarray(comp)
                payload = b"".join(
                    comp_np[i, : clens_np[i]].tobytes() for i in range(B))
    elif codec in ("bin", "apm"):
        # binary adaptive model / APM-SSE gate over byte blocks (MSB-first
        # bits), one model per block — the reference's bin.rs/apm.rs model
        # pick wired to the same container.  Flag 2 (staged): each block's
        # payload is [u32 idx_len][256-bit-chunk index][stream] so the
        # Pallas lane decoder can decode straight into device memory
        # (round 4 — the same fast-decode index design as ari; host C++
        # and device kernels emit identical streams AND indexes)
        from tpuzip.kernels import bin_coder as kbin
        from tpuzip.kernels import range_decoder as rdk

        with metrics.phase("encode", bytes_in=len(data), blocks=B):
            comp_np, clens_np, deltas = _bin_encode_auto(
                blocks, lengths, model_bits=inc, rate=thr,
                use_apm=(codec == "apm"))
        with metrics.phase("assemble"):
            parts = []
            for i in range(B):
                nci = (8 * int(lengths[i]) + kbin.CHUNK - 1) // kbin.CHUNK
                idx = rdk.pack_chunk_index(deltas[i, :nci])
                parts.append(struct.pack("<I", len(idx)) + idx
                             + comp_np[i, : clens_np[i]].tobytes())
            clens_np = np.array([len(p) for p in parts], np.int64)
            payload = b"".join(parts)
        flags |= 2
    elif codec == "lz4p" and _native_ok() \
            and not config.codec.lz4.device_encode:
        # threaded columnar-LZ host encoder (same greedy single-probe
        # parse family as the device formulation; format-interchangeable)
        from tpuzip.runtime import native

        with metrics.phase("encode", bytes_in=len(data), blocks=B):
            comp_np, cl64 = native.lz4p_encode_batch(
                blocks, lengths, hash_log=config.codec.lz4.hash_log)
        with metrics.phase("assemble"):
            clens_np = cl64.astype(np.int64)
            payload = native.pack_payloads(
                comp_np, clens_np.astype(np.int32))
    elif codec == "rle" and _native_ok():
        # threaded host encoder (RLE byte loops are the host's home turf;
        # the XLA segment encoder stays the device formulation/cross-check)
        from tpuzip.runtime import native

        with metrics.phase("encode", bytes_in=len(data), blocks=B):
            comp_np, cl64 = native.rle_encode_batch(blocks, lengths)
        with metrics.phase("assemble"):
            clens_np = cl64.astype(np.int64)
            payload = native.pack_payloads(
                comp_np, clens_np.astype(np.int32))
    elif codec == "lz4" and _native_ok() \
            and not config.codec.lz4.device_encode:
        # production host encoder (same greedy single-probe policy and
        # byte format as the oracle/device paths, ~350 MB/s); the XLA
        # batch encoder remains the TPU formulation + cross-check
        from tpuzip.runtime import native

        with metrics.phase("encode", bytes_in=len(data), blocks=B):
            comp_np, cl64 = native.lz4_compress_batch(
                blocks, lengths, max_chain=config.codec.lz4.max_chain,
                hash_log=config.codec.lz4.hash_log)
        with metrics.phase("assemble"):
            clens_np = cl64.astype(np.int64)
            payload = native.pack_payloads(
                comp_np, clens_np.astype(np.int32))
    else:
        with metrics.phase("encode", bytes_in=len(data), blocks=B):
            if codec == "lz4":
                # device encoder path (device_encode=True or no native lib):
                # honor the hash_log knob (static -> separate jit cache key)
                comp, clens = jax.jit(jlz4.encode_batch, static_argnums=2)(
                    jbf(), jlf(), config.codec.lz4.hash_log)
            else:
                comp, clens = jax.jit(enc)(jbf(), jlf())
            clens_np = np.asarray(clens).astype(np.int64)
        with metrics.phase("assemble"):
            payload = _assemble_payload(mesh, comp, clens, clens_np, B)
    with metrics.phase("checksum", bytes_in=len(data)):
        a32 = corpus_adler32(data)

    hdr = bytearray(MAGIC)
    hdr.append(CODECS[codec])
    hdr.append(flags)
    hdr += struct.pack("<IIQI", block_size, B, len(data), a32)
    hdr += clens_np[:B].astype("<u4").tobytes()
    if block_checksums:
        from tpuzip.core.checksum import adler32_batch

        bsums = np.asarray(jax.jit(adler32_batch)(jbf(), jlf()))
        hdr += bsums[:B].astype("<u4").tobytes()
    if flags & 4:
        hdr += struct.pack("<HI", inc, thr)
    # per-block original lengths are implied by block_size + orig_len,
    # EXCEPT for ari which decodes by symbol count — same implication works.
    return bytes(hdr) + payload


def _assemble_payload(mesh, comp, clens, clens_np: np.ndarray,
                      B: int) -> bytes:
    """Payload assembly through the ordered ragged gather collective: the
    per-device prefix-sum pack + psum union runs on the mesh (ICI when
    multi-chip), and the host downloads ONE compacted stream instead of
    per-block slices (VERDICT r1: make the collectives load-bearing)."""
    from tpuzip.dist.collectives import ragged_ordered_gather

    total = int(clens_np[:B].sum())
    b_all, cap = comp.shape
    cap_total = max(int(b_all) * int(cap), 1)
    # padding blocks (batch rounded to the mesh width) contribute 0 bytes
    lens_masked = jnp.where(jnp.arange(b_all) < B,
                            jnp.asarray(clens, jnp.int32), 0)
    try:
        stream, _ = jax.jit(
            lambda c, l: ragged_ordered_gather(mesh, c, l, cap_total))(
            comp, lens_masked)
        return np.asarray(stream)[:total].tobytes()
    except Exception:
        # mesh shapes the gather cannot handle (e.g. zero blocks) fall back
        # to host slicing
        comp_np = np.asarray(comp)
        return b"".join(
            comp_np[i, : clens_np[i]].tobytes() for i in range(B))


def decompress(container: bytes, mesh: Mesh | None = None,
               metrics=None, to_device: bool = False, config=None):
    """Decode a tpz container.

    to_device=False (default): return the original bytes (host), with the
    corpus Adler-32 verified.  to_device=True: return
    ``(blocks (B, block_size) u8 jax.Array, olens (B,) np.int64,
    orig_len)`` WITHOUT the device->host assembly — the decompress-into-
    device-memory path for TPU input pipelines (per-block checksums are
    still verified when the container carries them; the corpus checksum
    needs the assembled bytes and is skipped)."""
    from tpuzip.utils.metrics import RunMetrics

    metrics = metrics if metrics is not None else RunMetrics()
    uxm = True if config is None else config.codec.bwt.use_extra_memory
    if container[:4] != MAGIC:
        raise HeaderError("bad tpz magic")
    if container[4] not in CODEC_IDS:
        raise HeaderError(f"unknown codec id {container[4]}")
    codec = CODEC_IDS[container[4]]
    flags = container[5]
    try:
        block_size, B, orig_len, a32 = struct.unpack_from("<IIQI", container, 6)
    except struct.error as e:
        raise HeaderError(f"truncated tpz header: {e}") from None
    if len(container) < 26 + 4 * B:
        raise BlockLengthError("container truncated in length table")
    off = 6 + 4 + 4 + 8 + 4
    clens = np.frombuffer(container, np.uint32, B, off).astype(np.int64)
    off += 4 * B
    block_sums = None
    if flags & 1:
        if len(container) < off + 4 * B:
            raise BlockLengthError("container truncated in checksum table")
        block_sums = np.frombuffer(container, np.uint32, B, off)
        off += 4 * B
    inc, thr = (12, 5) if codec in ("bin", "apm") else (8, 1 << 13)
    if flags & 4:
        if len(container) < off + 6:
            raise BlockLengthError("container truncated in codec params")
        inc, thr = struct.unpack_from("<HI", container, off)
        off += 6
    # original per-block lengths implied by chunking
    olens = np.clip(orig_len - np.arange(B, dtype=np.int64) * block_size,
                    0, block_size)

    mesh = mesh or meshlib.make_mesh()
    # pad the batch to the mesh dp width (containers merged from multi-host
    # runs carry the true block count, which need not divide the mesh)
    ndp = mesh.shape["dp"]
    Bp = blk.pad_to_multiple(B, ndp)
    if Bp != B:
        clens = np.concatenate([clens, np.zeros(Bp - B, np.int64)])
        olens = np.concatenate([olens, np.zeros(Bp - B, np.int64)])
    if codec == "bwt" and flags & 8:
        from tpuzip.kernels import range_decoder as rdk

        seg, nseg = _seg_geometry(block_size)
        nc_seg = (seg + rdk.CHUNK_STEPS - 1) // rdk.CHUNK_STEPS
        cap = 10 + nseg * (8 + 3 * nc_seg + jari.encode_cap(seg))
    elif codec in ("ari", "bwt", "bwtdc") and flags & 2:
        from tpuzip.kernels import range_decoder as rdk

        head = {"ari": 0, "bwt": 4, "bwtdc": 8}[codec]
        width = block_size if codec != "bwtdc" \
            else jdc.encode_cap(block_size)
        nc_full = (width + rdk.CHUNK_STEPS - 1) // rdk.CHUNK_STEPS
        cap = head + 4 + 3 * nc_full + jari.encode_cap(width)
    elif codec in ("ari", "bwt"):
        cap = jari.encode_cap(block_size)
    elif codec == "bwtdc":
        cap = jari.encode_cap(jdc.encode_cap(block_size))
    elif codec == "deflate":
        cap = _deflate_cap(block_size)
    elif codec == "rle":
        cap = jrle.encode_cap(block_size)
    elif codec == "lz4p":
        from tpuzip.codecs import lz4p as jlz4p

        cap = jlz4p.encode_cap(block_size)
    elif codec in ("bin", "apm"):
        from tpuzip.codecs import bin_apm as jbin

        cap = jbin.encode_cap(8 * block_size)
        if flags & 2:  # + [u32 idx_len][256-bit-chunk index] head
            from tpuzip.kernels import bin_coder as kbin

            cap += 4 + 3 * ((8 * block_size + kbin.CHUNK - 1)
                            // kbin.CHUNK)
    else:
        cap = jlz4.encode_cap(block_size)
    if off + int(clens.sum()) != len(container):
        raise BlockLengthError(
            "container payload length disagrees with the length table"
            if off + int(clens.sum()) < len(container) else
            "container truncated: payload shorter than length table claims")
    if (clens > cap).any():
        raise BlockLengthError("declared block length exceeds codec bound")
    if _native_ok():
        from tpuzip.runtime import native

        comp = native.unpack_payloads(
            container[off : off + int(clens[:B].sum())],
            clens.astype(np.int32), cap)
    else:
        comp = np.zeros((Bp, cap), np.uint8)
        pos = 0
        for i in range(B):
            n = int(clens[i])
            comp[i, :n] = np.frombuffer(container, np.uint8, n, off + pos)
            pos += n

    sharding = meshlib.block_sharding(mesh)
    lsharding = meshlib.length_sharding(mesh)

    # upload the payload batch lazily: the threaded-C++ host decode paths
    # never touch it, and the device_put copy is real time at GiB scale
    class _Lazy:
        _v = None

        def __init__(self, fn):
            self._fn = fn

        def get(self):
            if self._v is None:
                self._v = self._fn()
            return self._v

    _jc = _Lazy(lambda: jax.device_put(jnp.array(comp), sharding))
    _jl = _Lazy(lambda: jax.device_put(jnp.array(clens.astype(np.int32)),
                                       lsharding))
    out = None  # device-path branches set this; host paths set out_np only
    if codec == "bwt" and flags & 8:
        with metrics.phase("decode", bytes_out=orig_len, blocks=B):
            out_np = _decode_bwt_segmented(comp, clens, olens, block_size,
                                           B, inc, thr,
                                           use_extra_memory=uxm)
        errs = np.zeros(B)
    elif codec in ("ari", "bwt", "bwtdc") and flags & 2:
        with metrics.phase("decode", bytes_out=orig_len, blocks=B):
            out_np = _decode_ari_family(codec, comp, clens, olens,
                                        block_size, B, increment=inc,
                                        threshold=thr,
                                        use_extra_memory=uxm)
        errs = np.zeros(B)
    elif codec == "ari":
        out = jax.jit(jari.decode_batch, static_argnums=2)(
            _jc.get(),
            jax.device_put(jnp.array(olens.astype(np.int32)), lsharding),
            block_size)
        out_np = np.asarray(out)
        errs = np.zeros(B)
    elif codec in ("bin", "apm"):
        from tpuzip.codecs import bin_apm as jbin

        with metrics.phase("decode", bytes_out=orig_len, blocks=B):
            use_apm = codec == "apm"
            scomp, sclens, deltas = comp, clens, None
            if flags & 2:
                # strip the per-block [u32 idx_len][chunk index] head
                from tpuzip.kernels import bin_coder as kbin
                from tpuzip.kernels import range_decoder as rdk

                nc_full = (8 * block_size + kbin.CHUNK - 1) // kbin.CHUNK
                scomp = np.zeros((comp.shape[0],
                                  jbin.encode_cap(8 * block_size)),
                                 np.uint8)
                sclens = np.zeros_like(clens)
                deltas = np.zeros((comp.shape[0], nc_full), np.int32)
                for i in range(B):
                    if clens[i] == 0:
                        continue
                    ilen = int.from_bytes(comp[i, :4].tobytes(),
                                          "little")
                    if 4 + ilen > clens[i]:
                        raise CorruptStreamError(
                            f"block {i}: bin chunk index overruns payload")
                    nci = (8 * int(olens[i]) + kbin.CHUNK - 1) \
                        // kbin.CHUNK
                    deltas[i, :nci] = rdk.parse_chunk_index(
                        comp[i, 4 : 4 + ilen].tobytes(), nci,
                        max_delta=4 * kbin.CHUNK + 4)
                    sclens[i] = clens[i] - 4 - ilen
                    scomp[i, : sclens[i]] = comp[i, 4 + ilen : clens[i]]
            if not to_device and _native_ok():
                # host-output decode: threaded C++ coder on EVERY platform
                # (the same migration rule as lz4/rle/bwt-inverse: the
                # bytes land on the host anyway)
                from tpuzip.runtime import native

                out_np = native.bin_decode_batch_native(
                    scomp, sclens.astype(np.int32),
                    olens.astype(np.int32), block_size, bits=inc,
                    rate=thr, use_apm=use_apm)
                out = out_np
            elif deltas is not None:
                # to_device serving (or no native lib): the chunk-indexed
                # lane decoder — Pallas kernel on TPU, its XLA reference
                # replica elsewhere (identical step math)
                out = _bin_decode_indexed(scomp, sclens, deltas, olens,
                                          block_size, inc, thr, use_apm)
                # to_device serving keeps the result chip-resident; the
                # host path downloads once for the verify/join tail
                out_np = None if to_device else np.asarray(out)
            else:
                # foreign/old container without the index: XLA bit scan
                out = jax.jit(jbin.decode_batch,
                              static_argnums=(2, 3, 4, 5))(
                    jnp.array(scomp),
                    jax.device_put(jnp.array(olens.astype(np.int32)),
                                   lsharding),
                    block_size, inc, thr, use_apm)
                out_np = np.asarray(out)
        errs = np.zeros(B)
    elif codec == "deflate":
        from tpuzip.codecs import deflate as jdef

        use_plan = False
        try:
            from tpuzip.runtime import native

            use_plan = native.available()
        except Exception:
            pass
        with metrics.phase("decode", bytes_out=orig_len, blocks=B):
            if use_plan:
                # threaded C++ inflate (1000 MB/s at 4 threads, zero
                # transfers — the output lands on the host anyway);
                # inflate_batch_planned remains the device-gather
                # formulation, inflate_batch the on-device cross-check
                out_np, g64 = native.inflate_batch_native(
                    comp, clens.astype(np.int32), block_size)
                got = g64.astype(np.int32)
            else:
                out_np, got = jdef.inflate_batch(_jc.get(), _jl.get(),
                                                 block_size)
        errs = np.zeros(B)
        bad = (got[:B].astype(np.int64) != olens[:B]) & (clens[:B] > 0)
        if bad.any():
            raise ValueError(
                f"deflate length mismatch at {np.nonzero(bad)[0][:8]}")
    elif codec == "bwt":
        pair = np.stack([clens.astype(np.int32), olens.astype(np.int32)],
                        axis=1)
        jp = jax.device_put(jnp.array(pair),
                            meshlib.block_sharding(mesh))
        out, _ = jax.jit(_bwt_decode_batch, static_argnums=2)(
            _jc.get(), jp, block_size)
        out_np = np.asarray(out)
        errs = np.zeros(B)
    elif codec == "bwtdc":
        pair = np.stack([clens.astype(np.int32), olens.astype(np.int32)],
                        axis=1)
        jp = jax.device_put(jnp.array(pair),
                            meshlib.block_sharding(mesh))
        out, _, errs = jax.jit(_bwtdc_decode_batch, static_argnums=2)(
            _jc.get(), jp, block_size)
        out_np = np.asarray(out)
        errs = np.asarray(errs)
    else:
        from tpuzip.runtime import native

        planned = codec == "lz4" and _native_ok()
        rle_native = codec == "rle" and _native_ok()
        with metrics.phase("decode", bytes_out=orig_len, blocks=B):
            if rle_native:
                # threaded host decode (byte loops are the host's home
                # turf; per-block status keeps corruption isolation)
                out_np, st = native.rle_decode_batch(
                    comp, clens.astype(np.int32), block_size)
                errs = (st < 0).astype(np.int32)
                olens_dev = np.where(st > 0, st, 0)
                out = out_np
            elif codec == "lz4p" and not to_device and _native_ok():
                out_np, st = native.lz4p_decode_batch_native(
                    comp, clens.astype(np.int32), block_size)
                errs = (st < 0).astype(np.int32)
                olens_dev = np.where(st > 0, st, 0)
                out = out_np
            elif planned and not to_device:
                # the output lands on the host: threaded full C++ decode
                # (same migration rule as rle/deflate/bwt-inverse — on this
                # corpus the copy plans materialize 50-99% of bytes as
                # host-built patches anyway).  The device copy-plan path
                # below stays the decode-into-device-memory serving path.
                out_np, st = native.lz4_decompress_batch(
                    comp, clens.astype(np.int32), block_size)
                errs = (st < 0).astype(np.int32)
                olens_dev = np.where(st > 0, st, 0)
                out = out_np
            elif planned and _lz4_serve_direct(comp, clens, olens,
                                               block_size):
                # to_device serving, DIRECT mode: the run-based parse
                # showed copy plans patch ~100% of output bytes on
                # ordinary corpora (DESIGN note 14 extended) — there the
                # plan transfer (comp + wplan/8 + patches ~ 1.9 bytes per
                # output byte) and the ~390 MB/s gather both lose to the
                # 3.4 GB/s threaded full decode + a plain device put of
                # 1.0 bytes/byte.  A 32-block probe measures the patch
                # density and picks this path when plans degenerate.
                out_np, st = native.lz4_decompress_batch(
                    comp, clens.astype(np.int32), block_size)
                errs = (st < 0).astype(np.int32)
                olens_dev = np.where(st > 0, st, 0)
                out = jnp.asarray(out_np)
            elif planned:
                # host-parse/device-copy-plan path: C++ token parse, bulk
                # device gathers (VERDICT r1 item 3) — production for
                # high-contiguity corpora (long literal runs / dedup-style
                # long matches) where the plan is genuinely smaller than
                # the output.  LZ4_DECODE_PLAN picks the granularity:
                # "wplan8" (one gather row per 8 output bytes) won the
                # 3-way chip A/B (bench/wplan_ab.py)
                fn = {"wplan8": jlz4.decode_batch_wplanned8,
                      "wplan16": jlz4.decode_batch_wplanned16,
                      }.get(LZ4_DECODE_PLAN, jlz4.decode_batch_wplanned)
                nb = comp.shape[0]
                if nb > LZ4_DECODE_SLICE + LZ4_DECODE_SLICE // 2:
                    # the bulk gather peaks at ~256 blocks (chip sweep
                    # bench/wplan_width.py: 265/406/321 MB/s at B=128/
                    # 256/512) — serve big batches in 256-row slices.
                    # The ragged tail is padded to a full slice with
                    # zero-clen rows (they decode to empty, error-free)
                    # so ONE compiled 256-row executable serves every
                    # slice instead of each novel tail size paying a
                    # fresh XLA compile of the gather graph.
                    tail = (-nb) % LZ4_DECODE_SLICE
                    if tail:
                        comp_p = np.concatenate(
                            [comp, np.zeros((tail, comp.shape[1]),
                                            comp.dtype)])
                        clens_p = np.concatenate(
                            [clens, np.zeros(tail, clens.dtype)])
                    else:
                        comp_p, clens_p = comp, clens
                    parts = [fn(comp_p[i : i + LZ4_DECODE_SLICE],
                                clens_p[i : i + LZ4_DECODE_SLICE],
                                block_size)
                             for i in range(0, nb + tail,
                                            LZ4_DECODE_SLICE)]
                    out = jnp.concatenate([p[0] for p in parts])[:nb]
                    olens_dev = np.concatenate(
                        [np.asarray(p[1]) for p in parts])[:nb]
                    errs = np.concatenate(
                        [np.asarray(p[2]) for p in parts])[:nb]
                else:
                    out, olens_dev, errs = fn(comp, clens, block_size)
            else:
                out, olens_dev, errs = jax.jit(
                    lambda c, l: _decode_batch(codec, c, l, block_size))(
                    _jc.get(), _jl.get())
            out_np = np.asarray(out)
        errs = np.asarray(errs)
        got = np.asarray(olens_dev).astype(np.int64)
        # errored blocks surface as CorruptStreamError below, not as a
        # length mismatch (their olens are zeroed)
        bad = (got[:B] != olens[:B]) & (clens[:B] > 0) & (errs[:B] == 0)
        if bad.any() and codec in ("lz4", "lz4p", "rle"):
            raise ValueError(f"block length mismatch at {np.nonzero(bad)[0][:8]}")
    # only real blocks can be corrupt — rows beyond B are mesh padding
    if np.asarray(errs)[:B].any():
        raise CorruptStreamError(np.nonzero(np.asarray(errs)[:B])[0])
    if block_sums is not None:
        from tpuzip.core.checksum import adler32_batch

        got_sums = np.asarray(jax.jit(adler32_batch)(
            jnp.array(out_np[:, :block_size]),
            jnp.array(olens.astype(np.int32))))
        bad = np.nonzero(got_sums[:B] != block_sums)[0]
        if bad.size:
            raise CorruptStreamError(bad)
    if to_device:
        # device-path branches keep `out` resident on chip — return it
        # without the download/upload round-trip; host-path branches
        # (staged ari family, native rle/deflate) upload once here
        src = out if isinstance(out, jax.Array) else out_np  # noqa: F821
        return jnp.asarray(src)[:B, :block_size], olens[:B], orig_len
    with metrics.phase("verify", bytes_out=orig_len):
        if out_np.shape[1] == block_size:
            # full blocks everywhere except the tail (chunking invariant):
            # one contiguous reshape instead of B per-row joins
            data = out_np[:B].reshape(-1)[:orig_len].tobytes()
        else:
            data = b"".join(
                out_np[i, : olens[i]].tobytes() for i in range(B))
            data = data[:orig_len]
        if a32 and corpus_adler32(data) != a32:
            raise ChecksumError(
                f"corpus Adler-32 mismatch: "
                f"{corpus_adler32(data):#x} != {a32:#x}")
    return data


def compress_from_device(blocks, lengths, codec: str = "lz4",
                         mesh: Mesh | None = None,
                         block_checksums: bool = False, config=None,
                         metrics=None) -> bytes:
    """Compress DEVICE-RESIDENT blocks into a standard tpz container — the
    other half of the serving story (`decompress(to_device=True)` is the
    inbound half): chip-resident data (activations, checkpoints, decoded
    batches) leaves the chip as compressed payloads, never as raw bytes.

    blocks: (B, n) u8 jax.Array; lengths: (B,) valid bytes per block —
    every block except the last must be full (the container implies
    per-block lengths from orig_len + block_size, exactly like
    `compress`'s chunking).  Device encoders only; the corpus Adler-32 is
    combined on the host from per-block device checksums
    (oracle.adler.combine == zlib.adler32_combine)."""
    from tpuzip.core.checksum import adler32_batch
    from tpuzip.core.config import Config
    from tpuzip.oracle import adler as oadler
    from tpuzip.utils.metrics import RunMetrics

    metrics = metrics if metrics is not None else RunMetrics()
    config = config or Config()
    mesh = mesh or meshlib.make_mesh()
    blocks = jnp.asarray(blocks, jnp.uint8)
    B, n = blocks.shape
    if B == 0:
        raise ValueError("compress_from_device needs at least one block")
    lengths_np = np.asarray(jax.device_get(lengths)).astype(np.int64)
    if (lengths_np[:-1] != n).any() or not 0 <= lengths_np[-1] <= n:
        raise ValueError(
            "compress_from_device requires full blocks except the last "
            "(the container implies block lengths from orig_len)")
    orig_len = int(lengths_np.sum())
    inc, thr = config.codec.ari.increment, config.codec.ari.threshold

    # B below is the PADDED count, matching compress()'s container
    # convention (padding blocks are zero-length: empty payload, olens 0)
    ndp = mesh.shape["dp"]
    Bp = blk.pad_to_multiple(B, ndp)
    if Bp != B:
        blocks = jnp.pad(blocks, ((0, Bp - B), (0, 0)))
        lengths_np = np.concatenate([lengths_np, np.zeros(Bp - B, np.int64)])
        B = Bp
    jb = jax.device_put(blocks, meshlib.block_sharding(mesh))
    jl = jax.device_put(jnp.asarray(lengths_np, jnp.int32),
                        meshlib.length_sharding(mesh))

    # per-block checksums on device; corpus checksum by combination
    with metrics.phase("checksum", bytes_in=orig_len):
        bsums = np.asarray(jax.jit(adler32_batch)(jb, jl))
        a32 = 1
        for i in range(B):
            a32 = oadler.combine(a32, int(bsums[i]), int(lengths_np[i]))

    flags = 1 if block_checksums else 0
    if (inc, thr) != (8, 1 << 13):
        flags |= 4
    if codec in ("ari", "bwt", "bwtdc"):
        with metrics.phase("encode", bytes_in=orig_len, blocks=B):
            blobs = _encode_ari_family(codec, jb, jl, lengths_np,
                                       increment=inc, threshold=thr)
        clens_np = np.array([len(p) for p in blobs], np.int64)
        payload = b"".join(blobs)
        flags |= 2
        if codec == "bwt" and n > SEG_THRESHOLD:
            flags |= 8
    else:
        if codec == "lz4p":
            _init_lz4p()
        enc, _cap = _ENCODERS[codec]
        with metrics.phase("encode", bytes_in=orig_len, blocks=B):
            if codec == "deflate":  # device stages + host table build
                comp, clens = enc(jb, jl)
            else:
                comp, clens = jax.jit(enc)(jb, jl)
            clens_np = np.asarray(clens).astype(np.int64)
        with metrics.phase("assemble"):
            payload = _assemble_payload(mesh, comp, clens, clens_np, B)

    hdr = bytearray(MAGIC)
    hdr.append(CODECS[codec])
    hdr.append(flags)
    hdr += struct.pack("<IIQI", n, B, orig_len, a32)
    for i in range(B):
        hdr += struct.pack("<I", int(clens_np[i]))
    if block_checksums:
        for i in range(B):
            hdr += struct.pack("<I", int(bsums[i]))
    if flags & 4:
        hdr += struct.pack("<HI", inc, thr)
    return bytes(hdr) + payload


# ---------------------------------------------------------------------------
# Pipelined corpus API: superbatch double-buffering
# ---------------------------------------------------------------------------

MAGIC_CORPUS = b"TPZC"


def compress_corpus(data: bytes, codec: str = "lz4",
                    block_size: int = 1 << 16,
                    superbatch: int | None = 8 << 20,
                    mesh: Mesh | None = None,
                    pipeline: int = 2, block_checksums: bool = False,
                    config=None) -> bytes:
    """Compress a large corpus as a sequence of superbatch containers with
    a `pipeline`-deep worker pool, so one superbatch's host stages (C++
    threaded encode/parse, container assembly) overlap the next one's
    device stages (JAX dispatch is async; the chip works while the host
    packs).  Each superbatch is an independent `compress()` container, so
    failures isolate and decode can stream.

    Layout: ``TPZC [u32 count]`` then per superbatch ``[u64 len][tpz
    container]``.
    """
    import struct as _struct
    from concurrent.futures import ThreadPoolExecutor

    if superbatch is None:
        # mesh.blocks_per_chip sizes the superbatch: one batch step keeps
        # every dp shard fed with that many blocks
        from tpuzip.core.config import Config

        cfg = config or Config()
        ndp = (mesh or meshlib.make_mesh(
            cfg.mesh.chips_per_host or None)).shape["dp"]
        superbatch = cfg.mesh.blocks_per_chip * ndp * block_size
    pieces = [data[o : o + superbatch]
              for o in range(0, max(len(data), 1), superbatch)]
    out = [MAGIC_CORPUS, _struct.pack("<I", len(pieces))]
    with ThreadPoolExecutor(max_workers=max(pipeline, 1)) as ex:
        for blob in ex.map(
                lambda p: compress(p, codec=codec, block_size=block_size,
                                   mesh=mesh,
                                   block_checksums=block_checksums,
                                   config=config), pieces):
            out.append(_struct.pack("<Q", len(blob)))
            out.append(blob)
    return b"".join(out)


def decompress_corpus(blob: bytes, mesh: Mesh | None = None,
                      pipeline: int = 2) -> bytes:
    """Inverse of compress_corpus, with the same pipelined overlap."""
    import struct as _struct
    from concurrent.futures import ThreadPoolExecutor

    if blob[:4] != MAGIC_CORPUS:
        raise ValueError("not a tpz corpus container")
    (count,) = _struct.unpack_from("<I", blob, 4)
    pos = 8
    parts = []
    for _ in range(count):
        if pos + 8 > len(blob):
            raise ValueError("corpus container truncated")
        (ln,) = _struct.unpack_from("<Q", blob, pos)
        pos += 8
        if pos + ln > len(blob):
            raise ValueError("corpus container truncated")
        parts.append(blob[pos : pos + ln])
        pos += ln
    if pos != len(blob):
        raise ValueError("trailing bytes after corpus container")
    with ThreadPoolExecutor(max_workers=max(pipeline, 1)) as ex:
        return b"".join(ex.map(lambda c: decompress(c, mesh=mesh), parts))
