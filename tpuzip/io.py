"""Streaming file-like adapters — the reference's L4 API surface.

rust-compress exposes every codec as ``Encoder<W: Write>`` / ``Decoder<R:
Read>`` newtypes that nest over inner streams.  The Python-native analogue:
writer/reader objects with ``write()/read()/close()`` that wrap any binary
file object, buffering block_max bytes and pushing complete blocks through
the device codec.  Composition = nesting, exactly like the reference:

    with Lz4FrameWriter(open(p, "wb")) as w:
        w.write(chunk)            # buffered; full blocks hit the device

Formats: LZ4 frames (liblz4-interoperable, written incrementally with a
streaming xxh32 content checksum) and zlib (streamed as successive BFINAL=0
dynamic blocks + a final empty stored block, accepted by stock zlib).
"""

from __future__ import annotations

import struct

from tpuzip.core.checksum import AdlerStream, Xxh32Stream
from tpuzip.oracle.xxh32 import xxh32

__all__ = ["Lz4FrameWriter", "Lz4FrameReader", "ZlibWriter", "ZlibReader",
           "CodecWriter", "CodecReader", "STREAM_CODECS"]


class _WriterBase:
    def __init__(self, inner):
        self.inner = inner
        self.closed = False

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def writable(self) -> bool:
        return True


class Lz4FrameWriter(_WriterBase):
    """Incremental LZ4 frame writer.

    Buffers up to ``batch_blocks`` full blocks and compresses them through
    the threaded C++ batch stage (the tpz runner's production encode,
    liblz4 bit-interoperable) — the frame format is unchanged and each
    block still falls back to stored when compression does not help.
    Without the native runtime, blocks go one at a time through the device
    codec (use_device=True) or the oracle."""

    def __init__(self, inner, block_max: int = 1 << 16,
                 content_checksum: bool = True, use_device: bool = True,
                 batch_blocks: int | None = None):
        super().__init__(inner)
        from tpuzip.oracle.lz4 import _BD_MAX_SIZES

        self.block_max = block_max
        self.content_checksum = content_checksum
        self.use_device = use_device
        self.batch_blocks = (ADAPTER_BATCH if batch_blocks is None
                             else max(1, batch_blocks))
        self.buf = bytearray()
        self.xxh = Xxh32Stream()
        bd_id = {v: k for k, v in _BD_MAX_SIZES.items()}[block_max]
        flg = (1 << 6) | (1 << 5) | (int(content_checksum) << 2)
        descriptor = bytes([flg, bd_id << 4])
        from tpuzip.oracle.lz4 import MAGIC

        inner.write(struct.pack("<I", MAGIC))
        inner.write(descriptor + bytes([(xxh32(descriptor) >> 8) & 0xFF]))

    def write(self, data: bytes) -> int:
        self.buf += data
        if self.content_checksum:
            self.xxh.update(bytes(data))
        hi = self.batch_blocks * self.block_max
        while len(self.buf) >= hi:
            self._emit_batch([bytes(self.buf[k : k + self.block_max])
                              for k in range(0, hi, self.block_max)])
            del self.buf[:hi]
        return len(data)

    def _emit_batch(self, chunks) -> None:
        native = _native_mod()
        if native is None or len(chunks) == 1:
            for chunk in chunks:
                self._emit(chunk)
            return
        rows, lens = _pack_rows(chunks)
        comp, clens = native.lz4_compress_batch(rows, lens)
        for i, chunk in enumerate(chunks):
            self._write_block(chunk, comp[i, : int(clens[i])].tobytes())

    def _write_block(self, chunk: bytes, comp: bytes) -> None:
        if len(comp) < len(chunk):
            self.inner.write(struct.pack("<I", len(comp)) + comp)
        else:
            self.inner.write(struct.pack("<I", len(chunk) | 0x80000000)
                             + chunk)

    def _emit(self, chunk: bytes) -> None:
        self._write_block(chunk, self._compress(chunk))

    def _compress(self, chunk: bytes) -> bytes:
        native = _native_mod()
        if native is not None:
            return native.lz4_compress(chunk)
        if self.use_device:
            import numpy as np

            import jax
            import jax.numpy as jnp

            from tpuzip.codecs import lz4 as jlz4

            arr = np.zeros(self.block_max, np.uint8)
            arr[: len(chunk)] = np.frombuffer(chunk, np.uint8)
            comp, clen = jax.jit(jlz4.encode, static_argnums=())(
                jnp.array(arr), jnp.int32(len(chunk)))
            return np.asarray(comp)[: int(clen)].tobytes()
        from tpuzip.oracle.lz4 import compress_block

        return compress_block(chunk)

    def close(self) -> None:
        if self.closed:
            return
        if self.buf:
            self._emit_batch(
                [bytes(self.buf[k : k + self.block_max])
                 for k in range(0, len(self.buf), self.block_max)])
            self.buf.clear()
        self.inner.write(struct.pack("<I", 0))
        if self.content_checksum:
            self.inner.write(struct.pack("<I", self.xxh.digest()))
        self.closed = True


class Lz4FrameReader:
    """Incremental LZ4 frame reader (block at a time)."""

    def __init__(self, inner):
        from tpuzip.oracle.lz4 import MAGIC, _BD_MAX_SIZES

        self.inner = inner
        # field-by-field header parse (spec order: magic, FLG, BD,
        # [content size if FLG bit3], [dictID if FLG bit0], HC)
        hdr = inner.read(6)
        (magic,) = struct.unpack_from("<I", hdr, 0)
        if magic != MAGIC:
            raise ValueError("bad LZ4 frame magic")
        flg, bd = hdr[4], hdr[5]
        if flg >> 6 != 1:
            raise ValueError("unsupported frame version")
        self.content_checksum = bool((flg >> 2) & 1)
        if (flg >> 3) & 1:
            inner.read(8)  # content size (informational)
        if flg & 1:
            inner.read(4)  # dictID — external dictionaries unsupported
        inner.read(1)  # header checksum byte
        self.block_max = _BD_MAX_SIZES[(bd >> 4) & 7]
        self.pending = bytearray()
        self.done = False
        self.xxh = Xxh32Stream()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        pass

    def read(self, n: int = -1) -> bytes:
        while not self.done and (n < 0 or len(self.pending) < n):
            self._pull()
        if n < 0:
            out = bytes(self.pending)
            self.pending.clear()
        else:
            out = bytes(self.pending[:n])
            del self.pending[:n]
        return out

    def _pull(self) -> None:
        raw = self.inner.read(4)
        if len(raw) < 4:
            raise ValueError("truncated frame")
        (blen,) = struct.unpack("<I", raw)
        if blen == 0:
            if self.content_checksum:
                (cc,) = struct.unpack("<I", self.inner.read(4))
                if cc != self.xxh.digest():
                    raise ValueError("LZ4 content checksum mismatch")
            self.done = True
            return
        stored = bool(blen & 0x80000000)
        blen &= 0x7FFFFFFF
        payload = self.inner.read(blen)
        if stored:
            dec = payload
        else:
            native = _native_mod()
            if native is not None:  # C++ shortcut decoder (production)
                dec = native.lz4_decompress(payload, self.block_max)
            else:
                from tpuzip.oracle.lz4 import decompress_block

                dec = decompress_block(payload, max_out=self.block_max)
        self.pending += dec
        self.xxh.update(bytes(dec))


class ZlibWriter(_WriterBase):
    """Streaming zlib: successive BFINAL=0 deflate blocks, final empty
    stored block, trailing Adler-32.  Accepted by stock zlib.

    With the native runtime, buffered blocks are deflated in threaded-C++
    batches as byte-aligned non-final FRAGMENTS (each ends with an empty
    stored block — Z_SYNC_FLUSH — so independent fragments splice into one
    stream); without it, the pure-Python per-block encoder with carried
    bit state remains the fallback/format cross-check."""

    def __init__(self, inner, block_size: int = 1 << 16,
                 batch_blocks: int | None = None):
        super().__init__(inner)
        self.block_size = block_size
        self.batch_blocks = (ADAPTER_BATCH if batch_blocks is None
                             else max(1, batch_blocks))
        # pick the mode once: fragments need byte alignment throughout,
        # the fallback carries sub-byte bit state between blocks
        self.native = _native_mod() if self.batch_blocks > 1 else None
        self.buf = bytearray()
        self.adler = AdlerStream()
        self.bitbuf = 0
        self.bitcnt = 0
        cmf, flg = 0x78, 0
        rem = (cmf * 256 + flg) % 31
        if rem:
            flg += 31 - rem
        inner.write(bytes([cmf, flg]))

    def write(self, data: bytes) -> int:
        self.buf += data
        self.adler.feed(bytes(data))
        if self.native is not None:
            hi = self.batch_blocks * self.block_size
            while len(self.buf) >= hi:
                self._emit_batch([bytes(self.buf[k : k + self.block_size])
                                  for k in range(0, hi, self.block_size)])
                del self.buf[:hi]
            return len(data)
        while len(self.buf) >= self.block_size:
            self._emit(bytes(self.buf[: self.block_size]), final=False)
            del self.buf[: self.block_size]
        return len(data)

    def _emit_batch(self, chunks) -> None:
        rows, lens = _pack_rows(chunks)
        comp, clens = self.native.deflate_fragment_batch(rows, lens)
        for i in range(len(chunks)):
            self.inner.write(comp[i, : int(clens[i])].tobytes())

    def _emit(self, chunk: bytes, final: bool) -> None:
        from tpuzip.oracle import deflate as od

        tokens = od.lz77_parse(chunk, max_chain=64)
        bw = od.BitWriter()
        bw.bitbuf, bw.bitcnt = self.bitbuf, self.bitcnt
        bw.bits(1 if final else 0, 1)
        bw.bits(2, 2)
        lit_lengths, dist_lengths = od._dynamic_lengths(tokens)
        od._write_dynamic_header(bw, lit_lengths, dist_lengths)
        lit_codes = od.canonical_codes(lit_lengths)
        dist_codes = od.canonical_codes(dist_lengths)
        for is_lit, length, value in tokens:
            if is_lit:
                bw.huff(lit_codes[value], lit_lengths[value])
            else:
                sym, eb, ev = od.length_to_code(length)
                bw.huff(lit_codes[sym], lit_lengths[sym])
                if eb:
                    bw.bits(ev, eb)
                dsym, deb, dev = od.dist_to_code(value)
                bw.huff(dist_codes[dsym], dist_lengths[dsym])
                if deb:
                    bw.bits(dev, deb)
        bw.huff(lit_codes[256], lit_lengths[256])
        # keep sub-byte bit state for the next block (blocks are contiguous)
        self.inner.write(bytes(bw.out))
        self.bitbuf, self.bitcnt = bw.bitbuf, bw.bitcnt

    def close(self) -> None:
        if self.closed:
            return
        if self.buf and self.native is not None:
            self._emit_batch(
                [bytes(self.buf[k : k + self.block_size])
                 for k in range(0, len(self.buf), self.block_size)])
            self.buf.clear()
        elif self.buf:
            self._emit(bytes(self.buf), final=False)
            self.buf.clear()
        # final empty stored block flushes bit alignment deterministically
        bw_bits = (1, 1), (0, 2)
        bitbuf, bitcnt = self.bitbuf, self.bitcnt
        out = bytearray()
        for v, nb in bw_bits:
            bitbuf |= v << bitcnt
            bitcnt += nb
        while bitcnt >= 8:  # pending bits can exceed one byte
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8
        if bitcnt:
            out.append(bitbuf & 0xFF)  # align to byte boundary
        out += b"\x00\x00\xff\xff"  # LEN=0 NLEN=0xFFFF
        self.inner.write(bytes(out))
        self.inner.write(struct.pack(">I", self.adler.result()))
        self.closed = True


# ---------------------------------------------------------------------------
# Generic framed block-codec adapters — the rest of the reference's L4
# surface (ari ByteEncoder/ByteDecoder, bwt/rle/mtf/dc Encoder<W>/Decoder<R>,
# SURVEY.md §1 L4).  The reference nests readers/writers per codec; these
# adapters do the same over any binary stream, with a framework-defined block
# framing (the upstream per-codec stream formats are unverifiable — mount
# empty, SURVEY.md provenance note):
#
#   per block:  [comp_len u32 LE][orig_len u32 LE][payload]
#   end mark:   comp_len == 0
#
# Payloads are the bit-exact oracle formats: ari = oracle.ari.encode_bytes,
# bwt = origin u32 LE + last column, rle/mtf/dc = the oracle streams.
# Composition = nesting, e.g. CodecWriter(CodecWriter(f, "bwt"), "ari").
# ---------------------------------------------------------------------------


def _ari_enc(chunk: bytes) -> bytes:
    from tpuzip.oracle import ari as oari

    return oari.encode_bytes(chunk)


def _ari_dec(payload: bytes, orig_len: int) -> bytes:
    from tpuzip.oracle import ari as oari

    return oari.decode_bytes(payload, orig_len)


def _bwt_enc(chunk: bytes) -> bytes:
    from tpuzip.oracle import bwt as obwt

    last, origin = obwt.encode_block(chunk)
    return struct.pack("<I", origin) + last


def _bwt_dec(payload: bytes, orig_len: int) -> bytes:
    from tpuzip.oracle import bwt as obwt

    (origin,) = struct.unpack_from("<I", payload, 0)
    return obwt.decode_block_fast(payload[4:], origin)


def _rle_enc(chunk: bytes) -> bytes:
    from tpuzip.oracle import rle as orle

    return orle.encode(chunk)


def _rle_dec(payload: bytes, orig_len: int) -> bytes:
    from tpuzip.oracle import rle as orle

    return orle.decode(payload)


def _mtf_enc(chunk: bytes) -> bytes:
    from tpuzip.oracle import mtf as omtf

    return omtf.encode(chunk)


def _mtf_dec(payload: bytes, orig_len: int) -> bytes:
    from tpuzip.oracle import mtf as omtf

    return omtf.decode(payload)


def _dc_enc(chunk: bytes) -> bytes:
    from tpuzip.oracle import dc as odc

    return odc.encode(chunk)


def _dc_dec(payload: bytes, orig_len: int) -> bytes:
    from tpuzip.oracle import dc as odc

    return odc.decode(payload)


STREAM_CODECS = {
    "ari": (_ari_enc, _ari_dec),
    "bwt": (_bwt_enc, _bwt_dec),
    "rle": (_rle_enc, _rle_dec),
    "mtf": (_mtf_enc, _mtf_dec),
    "dc": (_dc_enc, _dc_dec),
}

# Adapter batch width: the writer/reader buffer this many blocks and push
# them through the SAME threaded-C++/device batch stages the tpz runner
# uses (VERDICT r2 item 5 — the oracle table above remains the format
# definition and the per-block fallback).
ADAPTER_BATCH = 64


def _native_mod():
    try:
        from tpuzip.runtime import native

        if native.available():
            return native
    except Exception:
        pass
    return None


def _pack_rows(chunks):
    import numpy as np

    b = len(chunks)
    # power-of-two row width keeps jit cache keys stable across batches
    n = max(len(c) for c in chunks)
    n = max(1 << (n - 1).bit_length() if n > 1 else 1, 256)
    rows = np.zeros((b, n), np.uint8)
    lens = np.zeros(b, np.int32)
    for i, c in enumerate(chunks):
        rows[i, : len(c)] = np.frombuffer(c, np.uint8)
        lens[i] = len(c)
    return rows, lens


def _batch_encode(codec: str, chunks) -> list:
    """Encode a list of byte blocks through the production batch stages —
    identical per-block payloads to the oracle table (bit-exactness is the
    framework's cross-implementation contract)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    native = _native_mod()
    rows, lens = _pack_rows(chunks)
    b = len(chunks)
    if codec == "rle":
        if native is not None:
            comp, cl = native.rle_encode_batch(rows, lens)
        else:
            from tpuzip.codecs import rle as jrle

            comp_j, cl_j = jax.jit(jrle.encode_batch)(
                jnp.asarray(rows), jnp.asarray(lens))
            comp, cl = np.asarray(comp_j), np.asarray(cl_j)
        return [comp[i, : int(cl[i])].tobytes() for i in range(b)]
    if codec == "bwt":
        if native is not None:
            L, origins = native.bwt_forward_batch(rows, lens)
        else:
            from tpuzip.codecs import bwt as jbwt

            L_j, o_j = jax.jit(jbwt.encode_batch_fast)(
                jnp.asarray(rows), jnp.asarray(lens))
            L, origins = np.asarray(L_j), np.asarray(o_j)
        return [struct.pack("<I", int(origins[i]))
                + L[i, : int(lens[i])].tobytes() for i in range(b)]
    if codec == "ari":
        if native is not None:
            return [native.ari_encode(c) for c in chunks]
        from tpuzip.codecs import ari as jari

        comp_j, cl_j = jax.jit(jari.encode_batch)(
            jnp.asarray(rows), jnp.asarray(lens))
        comp, cl = np.asarray(comp_j), np.asarray(cl_j)
        return [comp[i, : int(cl[i])].tobytes() for i in range(b)]
    if codec == "mtf":
        if native is not None:
            out = native.mtf_batch(rows, lens)
        else:
            from tpuzip.codecs import mtf as jmtf

            out = np.asarray(jax.jit(jmtf.encode_batch)(
                jnp.asarray(rows), jnp.asarray(lens)))
        return [out[i, : int(lens[i])].tobytes() for i in range(b)]
    if codec == "dc":
        if native is not None:
            comp, cl = native.dc_encode_batch(rows, lens)
        else:
            from tpuzip.codecs import dc as jdc

            comp_j, cl_j = jax.jit(jdc.encode_batch)(
                jnp.asarray(rows), jnp.asarray(lens))
            comp, cl = np.asarray(comp_j), np.asarray(cl_j)
        return [comp[i, : int(cl[i])].tobytes() for i in range(b)]
    raise ValueError(codec)


def _batch_decode(codec: str, payloads, olens) -> list:
    import numpy as np

    import jax
    import jax.numpy as jnp

    native = _native_mod()
    b = len(payloads)
    out_n = max(max(olens), 1)
    out_n = max(1 << (out_n - 1).bit_length() if out_n > 1 else 1, 256)
    if codec == "bwt":
        Ls = [p[4:] for p in payloads]
        origins = np.array([struct.unpack_from("<I", p, 0)[0]
                            for p in payloads], np.int32)
        rows, lens = _pack_rows(Ls)
        from tpuzip.codecs import bwt as jbwt

        out = np.asarray(jbwt.decode_batch_auto(
            jnp.asarray(rows), jnp.asarray(origins), jnp.asarray(lens)))
        return [out[i, : int(lens[i])].tobytes() for i in range(b)]
    if codec == "rle":
        rows, lens = _pack_rows(payloads)
        if native is not None:
            out, st = native.rle_decode_batch(rows, lens, out_n)
            if (st < 0).any():
                raise ValueError("rle stream corrupt in adapter batch")
            got = st
        else:
            from tpuzip.codecs import rle as jrle

            out_j, got_j = jax.jit(jrle.decode_batch, static_argnums=2)(
                jnp.asarray(rows), jnp.asarray(lens), out_n)
            out, got = np.asarray(out_j), np.asarray(got_j)
        return [out[i, : int(got[i])].tobytes() for i in range(b)]
    if codec == "ari":
        if native is not None:
            return [native.ari_decode(payloads[i], olens[i])
                    for i in range(b)]
        rows, _ = _pack_rows(payloads)
        from tpuzip.codecs import ari as jari

        out = np.asarray(jax.jit(jari.decode_batch, static_argnums=2)(
            jnp.asarray(rows), jnp.asarray(np.array(olens, np.int32)),
            out_n))
        return [out[i, : olens[i]].tobytes() for i in range(b)]
    if codec == "mtf":
        rows, lens = _pack_rows(payloads)
        if native is not None:
            out = native.mtf_batch(rows, lens, decode=True)
        else:
            from tpuzip.codecs import mtf as jmtf

            out = np.asarray(jax.jit(jmtf.decode_batch)(
                jnp.asarray(rows), jnp.asarray(lens)))
        return [out[i, : int(lens[i])].tobytes() for i in range(b)]
    if codec == "dc":
        rows, lens = _pack_rows(payloads)
        if native is not None:
            out, got = native.dc_decode_batch(rows, lens, out_n)
            if (got < 0).any():
                raise ValueError("dc stream corrupt in adapter batch")
        else:
            from tpuzip.codecs import dc as jdc

            out_j, got_j, err_j = jax.jit(
                jdc.decode_batch, static_argnums=2)(
                jnp.asarray(rows), jnp.asarray(lens), out_n)
            err = np.asarray(err_j)
            if err.any():
                raise ValueError("dc stream corrupt in adapter batch")
            out, got = np.asarray(out_j), np.asarray(got_j)
        return [out[i, : int(got[i])].tobytes() for i in range(b)]
    raise ValueError(codec)


class CodecWriter(_WriterBase):
    """Framed streaming encoder for any block codec (L4 Encoder<W> parity).

    Buffers up to ADAPTER_BATCH blocks and encodes them through the same
    threaded-C++/device batch stages as the tpz runner; frame format and
    payload bytes are unchanged (bit-exact vs the per-block oracle path,
    selectable with batch_blocks=1 for cross-checks)."""

    def __init__(self, inner, codec: str, block_size: int = 1 << 16,
                 batch_blocks: int = ADAPTER_BATCH):
        super().__init__(inner)
        if codec not in STREAM_CODECS:
            raise ValueError(f"unknown streaming codec {codec!r}")
        self.codec = codec
        self.block_size = block_size
        self.batch_blocks = max(1, batch_blocks)
        self.buf = bytearray()

    def write(self, data: bytes) -> int:
        self.buf += data
        hi = self.batch_blocks * self.block_size
        while len(self.buf) >= hi:
            self._emit_batch([bytes(self.buf[k : k + self.block_size])
                              for k in range(0, hi, self.block_size)])
            del self.buf[:hi]
        return len(data)

    def _emit_batch(self, chunks) -> None:
        if len(chunks) == 1 and self.batch_blocks == 1:
            payloads = [STREAM_CODECS[self.codec][0](chunks[0])]
        else:
            payloads = _batch_encode(self.codec, chunks)
        for chunk, payload in zip(chunks, payloads):
            self.inner.write(struct.pack("<II", len(payload), len(chunk)))
            self.inner.write(payload)

    def flush(self) -> None:
        if self.buf:
            chunks = [bytes(self.buf[k : k + self.block_size])
                      for k in range(0, len(self.buf), self.block_size)]
            self._emit_batch(chunks)
            self.buf.clear()

    def close(self) -> None:
        if self.closed:
            return
        self.flush()
        # end mark only; the inner stream stays open (parity with the
        # reference's finish() returning the inner writer)
        self.inner.write(struct.pack("<I", 0))
        self.closed = True


class CodecReader:
    """Framed streaming decoder (L4 Decoder<R> parity).

    Pulls up to ADAPTER_BATCH frames at a time and decodes them through
    the production batch stages (threaded C++ inverse BWT / RLE, batched
    XLA elsewhere); batch_blocks=1 selects the per-block oracle path."""

    def __init__(self, inner, codec: str,
                 batch_blocks: int = ADAPTER_BATCH):
        if codec not in STREAM_CODECS:
            raise ValueError(f"unknown streaming codec {codec!r}")
        self.inner = inner
        self.codec = codec
        self.batch_blocks = max(1, batch_blocks)
        self.pending = bytearray()
        self.done = False

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        pass

    def readable(self) -> bool:
        return True

    def read(self, n: int = -1) -> bytes:
        while not self.done and (n < 0 or len(self.pending) < n):
            self._pull()
        if n < 0:
            out = bytes(self.pending)
            self.pending.clear()
        else:
            out = bytes(self.pending[:n])
            del self.pending[:n]
        return out

    def _read_frame(self):
        """One frame (payload, olen) or None at the end mark."""
        hdr = self.inner.read(4)
        if len(hdr) < 4:
            raise ValueError("truncated codec stream")
        (clen,) = struct.unpack("<I", hdr)
        if clen == 0:
            self.done = True
            return None
        hdr2 = self.inner.read(4)
        if len(hdr2) < 4:
            raise ValueError("truncated codec stream header")
        (olen,) = struct.unpack("<I", hdr2)
        payload = self.inner.read(clen)
        if len(payload) < clen:
            raise ValueError("truncated codec stream payload")
        return payload, olen

    def _pull(self) -> None:
        payloads, olens = [], []
        while len(payloads) < self.batch_blocks:
            frame = self._read_frame()
            if frame is None:
                break
            payloads.append(frame[0])
            olens.append(frame[1])
        if not payloads:
            return
        if len(payloads) == 1 and self.batch_blocks == 1:
            outs = [STREAM_CODECS[self.codec][1](payloads[0], olens[0])]
        else:
            outs = _batch_decode(self.codec, payloads, olens)
        for out, olen in zip(outs, olens):
            if len(out) != olen:
                raise ValueError(
                    f"{self.codec} block decoded to {len(out)} bytes, "
                    f"header says {olen}")
            self.pending += out


class ZlibReader:
    """zlib reader (buffers the inner stream; incremental serve)."""

    def __init__(self, inner):
        self.data = inner.read()
        self.pos = 0
        self._out: bytes | None = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        pass

    def read(self, n: int = -1) -> bytes:
        if self._out is None:
            from tpuzip.oracle import zlib_ as ozlib

            self._out = ozlib.decompress(self.data)
        if n < 0:
            out, self._out = self._out[self.pos:], b""
            self.pos = 0
            return out
        out = self._out[self.pos : self.pos + n]
        self.pos += n
        return out
