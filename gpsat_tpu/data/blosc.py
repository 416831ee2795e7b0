"""Blosc v1 frame codec — decoder for reference-era zarr chunks, plus a
fixture encoder so tests can build real blosc-layout stores without the
blosc package.

zarr-python's default compressor is ``Blosc(cname='lz4', clevel=5,
shuffle=SHUFFLE)``, so virtually every zarr store the reference ever
wrote (ref: GPSat/dataloader.py:60-66 engine map, :1239-1254 zarr write)
carries blosc frames. Neither blosc nor numcodecs is in this image; the
v1 frame format is simple and documented (c-blosc README_HEADER.rst):

  16-byte header:
    byte 0   version          byte 1   versionlz
    byte 2   flags            byte 3   typesize
    4:8  nbytes (u32 LE)      8:12 blocksize     12:16 cbytes
  flags: bit0 byte-shuffle, bit1 memcpyed, bit2 bit-shuffle,
         bit4 dont-split, bits5-7 codec (0 blosclz, 1 lz4, 2 snappy,
         3 zlib, 4 zstd)
  then (unless memcpyed) u32 LE bstarts[nblocks] — absolute offsets of
  each block — and the blocks themselves. A block holds `nsplits`
  streams (typesize streams when typesize <= 16, not dont-split, and not
  the ragged final block; else one), each `[u32 LE csize | payload]`
  where csize == stream size marks a stored-raw stream. Shuffle filters
  apply per block, before splitting.

The hot inner loops (lz4 block decode, byte unshuffle) run in the C++
native library (native/src/gpsat_native.cpp) with pure-Python fallbacks
here. Supported codecs: lz4 (in C++), blosclz, zlib (stdlib), snappy
(decode-only), zstd (zstandard module). Both shuffle filters decode:
byte-shuffle and bit-shuffle (``Blosc(shuffle=BITSHUFFLE)``, common in
real CryoSat/S3 satellite zarr archives). The bit transform is c-blosc's
``bshuf_trans_bit_elem``: view the block as a (nelem, 8*typesize) LSB-
first bit matrix, transpose, pack; elements beyond the largest multiple
of 8 are memcpy'd (derived empirically against libblosc.so.1 and pinned
by byte-for-byte fixture tests, tests/fixtures/blosc/). numpy
unpackbits/packbits runs it at C speed, so it has no C++ twin. The
encoder mirrors c-blosc's layout (split rules, stored-raw fallback,
memcpy frames) so fixtures exercise the exact on-disk shapes the real
library produces; encode codecs: lz4/zlib/zstd (blosclz and snappy are
decode-only — the write path always emits lz4, zarr's default).
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional

_MAX_SPLITS = 16  # c-blosc MAX_SPLITS: blocks split into <=16 streams
_MIN_BUFFERSIZE = 128  # c-blosc MIN_BUFFERSIZE: no split below this ratio
_HDR = 16  # BLOSC_MAX_OVERHEAD

_CODEC_IDS = {"blosclz": 0, "lz4": 1, "snappy": 2, "zlib": 3, "zstd": 4}
_CODEC_NAMES = {v: k for k, v in _CODEC_IDS.items()}


# --------------------------------------------------------------------------
# lz4 block codec (pure-Python reference; production path is the C++ one)
# --------------------------------------------------------------------------

def _lz4_decompress_py(buf: bytes, dst_len: int) -> bytes:
    """Pure-Python LZ4 block decode, mirroring gpsat_lz4_decompress."""
    ip, iend = 0, len(buf)
    out = bytearray()
    while ip < iend:
        token = buf[ip]
        ip += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if ip >= iend:
                    raise ValueError("corrupt lz4 block: truncated literal length")
                b = buf[ip]
                ip += 1
                lit += b
                if b != 255:
                    break
        if ip + lit > iend or len(out) + lit > dst_len:
            raise ValueError("corrupt lz4 block: literal overrun")
        out += buf[ip : ip + lit]
        ip += lit
        if ip >= iend:
            break  # final sequence: literals only
        if ip + 2 > iend:
            raise ValueError("corrupt lz4 block: truncated offset")
        offset = buf[ip] | (buf[ip + 1] << 8)
        ip += 2
        if offset == 0 or offset > len(out):
            raise ValueError("corrupt lz4 block: bad match offset")
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                if ip >= iend:
                    raise ValueError("corrupt lz4 block: truncated match length")
                b = buf[ip]
                ip += 1
                mlen += b
                if b != 255:
                    break
        if len(out) + mlen > dst_len:
            raise ValueError("corrupt lz4 block: match overrun")
        start = len(out) - offset
        for i in range(mlen):  # overlap-legal byte copy
            out.append(out[start + i])
    if len(out) != dst_len:
        raise ValueError(f"corrupt lz4 block: decoded {len(out)} of {dst_len} bytes")
    return bytes(out)


def lz4_compress(data: bytes) -> bytes:
    """Greedy hash-table LZ4 block encoder (spec-conformant output).

    Fixture/writer path only — decode speed is what matters in
    production. Follows the block-format end rules (last match starts
    >= 12 bytes before end; final 5+ bytes are literals) so any
    conformant decoder, not just ours, accepts the output.
    """
    n = len(data)
    if n == 0:
        return b""
    out = bytearray()
    table: dict = {}
    anchor = 0
    i = 0
    limit = n - 12  # no match may start beyond here
    while i <= limit:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is None or i - cand > 65535 or data[cand : cand + 4] != key:
            i += 1
            continue
        # extend the match, keeping the final 5 bytes literal
        mmax = n - 5 - i
        mlen = 4
        while mlen < mmax and data[cand + mlen] == data[i + mlen]:
            mlen += 1
        lit = data[anchor:i]
        _emit_sequence(out, lit, i - cand, mlen)
        i += mlen
        anchor = i
    _emit_sequence(out, data[anchor:], None, 0)
    return bytes(out)


def _emit_sequence(out: bytearray, literals: bytes, offset: Optional[int], mlen: int):
    lit = len(literals)
    ml = 0 if offset is None else mlen - 4
    token = (min(lit, 15) << 4) | min(ml, 15)
    out.append(token)
    if lit >= 15:
        rest = lit - 15
        while rest >= 255:
            out.append(255)
            rest -= 255
        out.append(rest)
    out += literals
    if offset is None:
        return
    out += struct.pack("<H", offset)
    if ml >= 15:
        rest = ml - 15
        while rest >= 255:
            out.append(255)
            rest -= 255
        out.append(rest)


def _lz4_decompress(buf: bytes, dst_len: int) -> bytes:
    from gpsat_tpu import native

    return native.lz4_decompress(buf, dst_len)


def _blosclz_decompress_py(buf: bytes, dst_len: int) -> bytes:
    """Pure-Python blosclz decode (c-blosc 1.21 / blosclz 2.x stream format).

    FastLZ-derived: a 5-bit-masked initial literal token, then tokens
    whose top 3 bits are a match length (7 = extended, +bytes while 255)
    and low 5 bits the offset high byte; code==255 with ofs==31<<8 marks
    a far match with an explicit big-endian 16-bit distance beyond
    MAX_DISTANCE. ref==op (distance 0) is an RLE run of the previous
    byte. Mirrors gpsat_blosclz_decompress in the C++ library.
    """
    MAX_DISTANCE = 8191
    ip, iend = 0, len(buf)
    out = bytearray()
    if iend == 0:
        return b""
    ctrl = buf[ip] & 31
    ip += 1
    while True:
        if ctrl >= 32:
            length = (ctrl >> 5) - 1
            ofs = (ctrl & 31) << 8
            if length == 6:  # 7 - 1: extended length
                while True:
                    if ip >= iend:
                        raise ValueError("corrupt blosclz: truncated match length")
                    code = buf[ip]
                    ip += 1
                    length += code
                    if code != 255:
                        break
            if ip >= iend:
                raise ValueError("corrupt blosclz: truncated match offset")
            code = buf[ip]
            ip += 1
            length += 3
            ref = len(out) - ofs - code
            if code == 255 and ofs == (31 << 8):  # far match
                if ip + 1 >= iend:
                    raise ValueError("corrupt blosclz: truncated far offset")
                ofs = (buf[ip] << 8) | buf[ip + 1]
                ip += 2
                ref = len(out) - ofs - MAX_DISTANCE
            if len(out) + length > dst_len:
                raise ValueError("corrupt blosclz: match overrun")
            if ref - 1 < 0:
                raise ValueError("corrupt blosclz: match before start")
            if ip < iend:
                ctrl = buf[ip]
                ip += 1
            else:
                ctrl = None
            if ref == len(out):  # RLE run of the previous byte
                out += bytes([out[ref - 1]]) * length
            else:
                ref -= 1
                for i in range(length):  # overlap-legal byte copy
                    out.append(out[ref + i])
            if ctrl is None:
                break
        else:
            ctrl += 1
            if len(out) + ctrl > dst_len or ip + ctrl > iend:
                raise ValueError("corrupt blosclz: literal overrun")
            out += buf[ip : ip + ctrl]
            ip += ctrl
            if ip < iend:
                ctrl = buf[ip]
                ip += 1
            else:
                break
    if len(out) != dst_len:
        raise ValueError(f"corrupt blosclz: decoded {len(out)} of {dst_len} bytes")
    return bytes(out)


def _blosclz_decompress(buf: bytes, dst_len: int) -> bytes:
    from gpsat_tpu import native

    if native.HAS_NATIVE and hasattr(native, "blosclz_decompress"):
        return native.blosclz_decompress(buf, dst_len)
    return _blosclz_decompress_py(buf, dst_len)


def _snappy_decompress_py(buf: bytes, dst_len: int) -> bytes:
    """Pure-Python snappy raw-format decode (decode-only; snappy is a
    legal blosc codec but no zarr writer's default, so speed is moot)."""
    ip, iend = 0, len(buf)
    # preamble: uncompressed length as LE base-128 varint
    ulen, shift = 0, 0
    while True:
        if ip >= iend:
            raise ValueError("corrupt snappy: truncated preamble")
        b = buf[ip]
        ip += 1
        ulen |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            break
    if ulen != dst_len:
        raise ValueError(f"corrupt snappy: preamble {ulen} != expected {dst_len}")
    out = bytearray()
    while ip < iend:
        tag = buf[ip]
        ip += 1
        kind = tag & 3
        if kind == 0:  # literal
            length = tag >> 2
            if length >= 60:  # 60..63: that many extra LE length bytes
                nb = length - 59
                length = int.from_bytes(buf[ip : ip + nb], "little")
                ip += nb
            length += 1
            if ip + length > iend:
                raise ValueError("corrupt snappy: literal overrun")
            out += buf[ip : ip + length]
            ip += length
            continue
        if kind == 1:  # copy, 1-byte offset
            length = ((tag >> 2) & 0x7) + 4
            offset = ((tag >> 5) << 8) | buf[ip]
            ip += 1
        elif kind == 2:  # copy, 2-byte LE offset
            length = (tag >> 2) + 1
            offset = int.from_bytes(buf[ip : ip + 2], "little")
            ip += 2
        else:  # copy, 4-byte LE offset
            length = (tag >> 2) + 1
            offset = int.from_bytes(buf[ip : ip + 4], "little")
            ip += 4
        if offset == 0 or offset > len(out):
            raise ValueError("corrupt snappy: bad copy offset")
        if len(out) + length > dst_len:
            raise ValueError("corrupt snappy: copy overrun")
        start = len(out) - offset
        for i in range(length):  # overlap-legal
            out.append(out[start + i])
    if len(out) != dst_len:
        raise ValueError(f"corrupt snappy: decoded {len(out)} of {dst_len} bytes")
    return bytes(out)


# --------------------------------------------------------------------------
# stream codecs inside a frame
# --------------------------------------------------------------------------

def _stream_decode(codec: int, payload: bytes, raw_len: int) -> bytes:
    if codec == 1:  # lz4 / lz4hc share a format
        return _lz4_decompress(payload, raw_len)
    if codec == 0:
        return _blosclz_decompress(payload, raw_len)
    if codec == 2:
        return _snappy_decompress_py(payload, raw_len)
    if codec == 3:
        out = zlib.decompress(payload)
    elif codec == 4:
        import zstandard

        out = zstandard.ZstdDecompressor().decompressobj().decompress(payload)
    else:
        raise NotImplementedError(
            f"blosc codec id {codec} not supported "
            "(supported: blosclz, lz4, snappy, zlib, zstd)"
        )
    if len(out) != raw_len:
        raise ValueError(f"corrupt blosc stream: {len(out)} != {raw_len} bytes")
    return out


def _stream_encode(codec: int, raw: bytes) -> bytes:
    if codec == 1:
        return lz4_compress(raw)
    if codec == 3:
        return zlib.compress(raw, 5)
    if codec == 4:
        import zstandard

        return zstandard.ZstdCompressor(level=1).compress(raw)
    raise NotImplementedError(f"blosc encoder codec {codec}")


def _unshuffle(block: bytes, typesize: int) -> bytes:
    from gpsat_tpu import native

    return native.byte_unshuffle(block, typesize)


def _bit_unshuffle(block: bytes, typesize: int) -> bytes:
    """Inverse of c-blosc's per-block bitshuffle (bshuf_trans_bit_elem).

    Forward transform: iff the block's element count is a multiple of 8,
    the elements are viewed as an (nelem, 8*typesize) bit matrix with
    LSB-first bit order, transposed, and packed; any sub-element byte
    tail is memcpy'd. When nelem is NOT a multiple of 8 the WHOLE block
    passes through unshuffled — the frame still carries the bit-shuffle
    flag (c-blosc 1.21 shuffle.c bitshuffle() falls back to memcpy, not
    a prefix transpose; pinned empirically against libblosc.so.1 1.21.3
    and by byte-for-byte fixture tests).
    """
    import numpy as np

    nelem = len(block) // max(typesize, 1)
    if typesize < 1 or nelem == 0 or nelem % 8 != 0:
        return block
    m = nelem * typesize
    planes = np.frombuffer(block[:m], dtype=np.uint8)
    # planes rows: 8*typesize bit-planes of nelem bits each
    bits = np.unpackbits(planes, bitorder="little").reshape(8 * typesize, nelem)
    out = np.packbits(bits.T.reshape(-1), bitorder="little")
    return out.tobytes() + block[m:]


def _bit_shuffle(block: bytes, typesize: int) -> bytes:
    """Forward bitshuffle (encoder/fixture path), see _bit_unshuffle."""
    import numpy as np

    nelem = len(block) // max(typesize, 1)
    if typesize < 1 or nelem == 0 or nelem % 8 != 0:
        return block
    m = nelem * typesize
    src = np.frombuffer(block[:m], dtype=np.uint8).reshape(nelem, typesize)
    bits = np.unpackbits(src, axis=1, bitorder="little")  # (nelem, 8T)
    out = np.packbits(bits.T.reshape(-1), bitorder="little")
    return out.tobytes() + block[m:]


def _shuffle(block: bytes, typesize: int) -> bytes:
    """Forward byte-shuffle (encoder only): stream j = byte j of each
    element; trailing len % typesize bytes pass through unchanged."""
    if typesize <= 1:
        return block
    import numpy as np

    src = np.frombuffer(block, dtype=np.uint8)
    n = len(src) // typesize
    m = n * typesize
    out = np.empty_like(src)
    out[:m] = src[:m].reshape(n, typesize).T.reshape(-1)
    out[m:] = src[m:]
    return out.tobytes()


# --------------------------------------------------------------------------
# frame decode / encode
# --------------------------------------------------------------------------

def blosc_decode(buf: bytes) -> bytes:
    """One blosc v1 frame -> raw bytes (mirrors c-blosc blosc_d)."""
    if len(buf) < _HDR:
        raise ValueError(f"blosc frame shorter than the 16-byte header: {len(buf)}")
    version, _versionlz, flags, typesize = buf[0], buf[1], buf[2], buf[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<III", buf, 4)
    if version < 1 or version > 2:
        raise ValueError(f"unsupported blosc format version {version}")
    if len(buf) < cbytes:
        raise ValueError(f"truncated blosc frame: {len(buf)} < {cbytes} bytes")
    if nbytes == 0:
        return b""
    if flags & 0x02:  # memcpyed: header + raw payload
        if len(buf) < _HDR + nbytes:
            raise ValueError(
                f"truncated memcpyed blosc frame: {len(buf)} < {_HDR + nbytes} bytes"
            )
        return bytes(buf[_HDR : _HDR + nbytes])
    if blocksize == 0:
        raise ValueError("corrupt blosc header: blocksize 0 with nbytes > 0")
    codec = (flags >> 5) & 0x7
    dont_split = bool(flags & 0x10)
    byte_shuffled = bool(flags & 0x01) and typesize > 1
    bit_shuffled = bool(flags & 0x04) and typesize >= 1

    nblocks = -(-nbytes // blocksize)
    bstarts = struct.unpack_from(f"<{nblocks}I", buf, _HDR)
    out = bytearray()
    for j in range(nblocks):
        bsize = min(blocksize, nbytes - j * blocksize)
        leftover = bsize != blocksize
        # mirror c-blosc blosc_d: the MIN_BUFFERSIZE clause matters only
        # for pre-1.11 frames (modern compressors set dont_split instead)
        nsplits = (
            typesize
            if (
                typesize <= _MAX_SPLITS
                and blocksize // typesize >= _MIN_BUFFERSIZE
                and not dont_split
                and not leftover
            )
            else 1
        )
        neblock = bsize // nsplits
        pos = bstarts[j]
        block = bytearray()
        for _ in range(nsplits):
            (csize,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            payload = bytes(buf[pos : pos + csize])
            if len(payload) != csize:
                raise ValueError("truncated blosc block stream")
            pos += csize
            if csize == neblock:  # stored raw (compression didn't pay)
                block += payload
            else:
                block += _stream_decode(codec, payload, neblock)
        # c-blosc blosc_d checks byte-shuffle first; the flags are
        # mutually exclusive in practice but mirror its precedence
        if byte_shuffled:
            block = _unshuffle(bytes(block), typesize)
        elif bit_shuffled:
            block = _bit_unshuffle(bytes(block), typesize)
        out += block
    if len(out) != nbytes:
        raise ValueError(f"corrupt blosc frame: decoded {len(out)} of {nbytes} bytes")
    return bytes(out)


def blosc_encode(
    data: bytes,
    typesize: int,
    cname: str = "lz4",
    shuffle: int = 1,
    blocksize: int = 0,
) -> bytes:
    """Encode one blosc v1 frame with c-blosc's on-disk layout.

    shuffle: 0 none, 1 byte-shuffle, 2 bit-shuffle. blocksize 0 = auto
    (2**16 rounded to a typesize multiple). Splits blocks into typesize
    streams exactly when c-blosc would (lz4/blosclz, typesize <= 16), and
    falls back to a memcpy frame when compression doesn't pay — so
    fixtures hit every branch of the decoder.
    """
    assert shuffle in (0, 1, 2), "shuffle must be 0 (none), 1 (byte), 2 (bit)"
    codec = _CODEC_IDS[cname]
    typesize = max(1, int(typesize))
    if typesize > 255:
        typesize = 1  # c-blosc stores typesize in one byte; oversize -> 1
    nbytes = len(data)
    if blocksize <= 0:
        blocksize = 1 << 16
    if nbytes:
        # c-blosc clamps blocksize to nbytes (its header reader rejects
        # blocksize > nbytes), so small buffers become one exact block
        blocksize = min(blocksize, nbytes)
    blocksize = max(typesize, blocksize - blocksize % typesize)
    # c-blosc split_block(): codec is lz4/blosclz, typesize splittable,
    # blocks big enough per stream
    split = (
        cname in ("lz4", "blosclz")
        and typesize <= _MAX_SPLITS
        and blocksize // typesize >= _MIN_BUFFERSIZE
    )
    flags = (codec << 5) | (0 if split else 0x10)
    if shuffle == 1 and typesize > 1:
        flags |= 0x01
    elif shuffle == 2:
        flags |= 0x04

    nblocks = -(-nbytes // blocksize) if nbytes else 0
    blobs = []
    for j in range(nblocks):
        raw = data[j * blocksize : (j + 1) * blocksize]
        bsize = len(raw)
        leftover = bsize != blocksize
        if shuffle == 1 and typesize > 1:
            raw = _shuffle(raw, typesize)
        elif shuffle == 2:
            raw = _bit_shuffle(raw, typesize)
        nsplits = typesize if (split and not leftover) else 1
        neblock = bsize // nsplits
        blob = bytearray()
        for s in range(nsplits):
            stream = raw[s * neblock : (s + 1) * neblock] if nsplits > 1 else raw
            comp = _stream_encode(codec, stream)
            if len(comp) >= len(stream):  # stored raw, flagged by csize == neblock
                comp = stream
            blob += struct.pack("<I", len(comp)) + comp
        blobs.append(bytes(blob))

    total = _HDR + 4 * nblocks + sum(len(b) for b in blobs)
    if total >= _HDR + nbytes:  # compression didn't pay: memcpy frame
        # c-blosc requires blocksize == nbytes on memcpyed frames
        header = bytes([2, 1, 0x02 | (codec << 5), typesize]) + struct.pack(
            "<III", nbytes, max(nbytes, 1), _HDR + nbytes
        )
        return header + data

    header = bytes([2, 1, flags, typesize]) + struct.pack("<III", nbytes, blocksize, total)
    bstarts = []
    pos = _HDR + 4 * nblocks
    for b in blobs:
        bstarts.append(pos)
        pos += len(b)
    return header + struct.pack(f"<{nblocks}I", *bstarts) + b"".join(blobs)
