"""Blosc v1 frame codec + LZ4 block codec (data/blosc.py, native lz4).

Covers VERDICT item: reference-era zarr stores carry zarr's DEFAULT
compressor Blosc(cname='lz4', clevel=5, shuffle=SHUFFLE)
(ref: GPSat/dataloader.py:60-66); the built-in reader must open them.
Fixtures are built with the in-repo encoder, which mirrors c-blosc's
on-disk layout (header flags, bstarts, split streams, stored-raw and
memcpy fallbacks) — the same hand-built-format approach as the PyTables
fixtures.
"""

import os
import struct

import numpy as np
import pytest

from gpsat_tpu import native
from gpsat_tpu.data.blosc import (
    _lz4_decompress_py,
    blosc_decode,
    blosc_encode,
    lz4_compress,
)


# --------------------------------------------------------------------------
# LZ4 block codec
# --------------------------------------------------------------------------

def test_lz4_known_answer():
    # hand-assembled block: seq1 = 4 literals "abcd" + match(offset 4,
    # len 8); seq2 (final) = 5 literals. Validates the exact wire format
    # independently of our own encoder.
    block = bytes([0x44]) + b"abcd" + bytes([0x04, 0x00]) + bytes([0x50]) + b"XYZTW"
    expect = b"abcdabcdabcdXYZTW"
    assert _lz4_decompress_py(block, len(expect)) == expect
    assert native.lz4_decompress(block, len(expect)) == expect


def test_lz4_rle_overlap():
    # offset < match length: the RLE trick (copy must be byte-serial)
    block = bytes([0x1B]) + b"Q" + bytes([0x01, 0x00]) + bytes([0x50]) + b"ABCDE"
    expect = b"Q" * 16 + b"ABCDE"
    assert _lz4_decompress_py(block, len(expect)) == expect
    assert native.lz4_decompress(block, len(expect)) == expect


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"short",
        b"abcd" * 100,  # long matches -> extended match length bytes
        bytes(range(256)) * 20,  # structured
        np.random.default_rng(0).integers(0, 4, 5000, dtype=np.uint8).tobytes(),
        np.random.default_rng(1).integers(0, 256, 3000, dtype=np.uint8).tobytes(),  # incompressible
        b"A" * 15 + b"unique-tail-12345",  # literal run of exactly 15
        np.sin(np.arange(4096) * 0.01).astype(np.float64).tobytes(),
    ],
    ids=["empty", "short", "repeat4", "cycle256", "lowent", "random", "lit15", "f64wave"],
)
def test_lz4_round_trip(data):
    comp = lz4_compress(data)
    assert _lz4_decompress_py(comp, len(data)) == data
    assert native.lz4_decompress(comp, len(data)) == data


def test_lz4_native_matches_python_on_corrupt():
    comp = bytearray(lz4_compress(b"abcd" * 50))
    comp[0] = 0xFF  # bogus token -> overrun
    with pytest.raises(ValueError):
        _lz4_decompress_py(bytes(comp), 200)
    with pytest.raises(ValueError):
        native.lz4_decompress(bytes(comp), 200)


# --------------------------------------------------------------------------
# byte shuffle filter
# --------------------------------------------------------------------------

@pytest.mark.parametrize("typesize,n", [(8, 64), (4, 33), (2, 7), (8, 5)])
def test_byte_unshuffle_inverts_shuffle(typesize, n):
    from gpsat_tpu.data.blosc import _shuffle

    rng = np.random.default_rng(typesize * 100 + n)
    raw = rng.integers(0, 256, typesize * n + (3 if n == 33 else 0), dtype=np.uint8).tobytes()
    shuf = _shuffle(raw, typesize)
    assert native.byte_unshuffle(shuf, typesize) == raw
    # leftover bytes (len % typesize) pass through unchanged
    if len(raw) % typesize:
        assert shuf[-(len(raw) % typesize):] == raw[-(len(raw) % typesize):]


# --------------------------------------------------------------------------
# blosc frames
# --------------------------------------------------------------------------

def _cases():
    rng = np.random.default_rng(7)
    wave = np.sin(np.arange(20_000) * 0.001).astype(np.float64).tobytes()
    return [
        # (data, typesize, cname, shuffle, blocksize) across decoder branches
        (wave, 8, "lz4", 1, 0),  # the zarr default: lz4 + byte shuffle + split
        (wave, 8, "lz4", 0, 0),
        (wave, 8, "zlib", 1, 0),  # dont_split codec
        (wave, 8, "zstd", 1, 0),
        (wave[:999], 8, "lz4", 1, 0),  # single ragged (leftover) block
        (wave, 8, "lz4", 1, 4096),  # many blocks + ragged tail
        (wave, 4, "lz4", 1, 0),
        (b"tiny", 1, "lz4", 0, 0),  # memcpy frame (compression can't pay)
        (rng.integers(0, 256, 10_000, dtype=np.uint8).tobytes(), 8, "lz4", 1, 0),  # raw streams
        (b"", 8, "lz4", 1, 0),
        (np.arange(5000, dtype=np.int32).tobytes(), 4, "lz4", 1, 1024),
        (wave, 32, "lz4", 1, 0),  # typesize > MAX_SPLITS -> no split
    ]


@pytest.mark.parametrize("i", range(len(_cases())))
def test_blosc_round_trip(i):
    data, typesize, cname, shuffle, blocksize = _cases()[i]
    frame = blosc_encode(data, typesize, cname=cname, shuffle=shuffle, blocksize=blocksize)
    assert blosc_decode(frame) == data
    # header sanity: cbytes field covers the whole frame
    nbytes, _bs, cbytes = struct.unpack_from("<III", frame, 4)
    assert nbytes == len(data) and cbytes == len(frame)


def test_blosc_shuffle_helps_compression():
    # byte-shuffle exists to make slowly-varying f64 streams compressible;
    # verify our encoder actually exploits it (i.e. the filter is really
    # applied before compression, not just flagged)
    data = (np.sin(np.arange(30_000) * 1e-4) * 1e6).astype(np.float64).tobytes()
    with_shuf = blosc_encode(data, 8, shuffle=1)
    without = blosc_encode(data, 8, shuffle=0)
    assert len(with_shuf) < len(without)


def test_blosc_hand_built_header_fields():
    # decode a frame we assemble fully by hand (memcpy mode): proves the
    # decoder honors the documented header layout, not just our encoder's
    data = b"0123456789ABCDEF"
    header = bytes([2, 1, 0x02 | (1 << 5), 4]) + struct.pack("<III", len(data), 16, 16 + len(data))
    assert blosc_decode(header + data) == data


def test_blosc_unsupported_paths_raise():
    data = b"x" * 64
    # codec ids 5-7 are unassigned in the v1 format
    hdr = bytes([2, 1, (5 << 5) | 0x10, 1]) + struct.pack("<III", 8, 8, 16 + 4 + 4 + 6)
    bad = hdr + struct.pack("<I", 20) + struct.pack("<I", 6) + b"zzzzzz"
    with pytest.raises(NotImplementedError, match="codec id 5"):
        blosc_decode(bad)
    with pytest.raises(ValueError, match="header"):
        blosc_decode(data[:8])


# --------------------------------------------------------------------------
# bit-shuffle filter + blosclz/snappy codecs (VERDICT r4 item 4)
# --------------------------------------------------------------------------

_FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "blosc")


def _fixture_names():
    return sorted(
        f[: -len(".frame")] for f in os.listdir(_FIXDIR) if f.endswith(".frame")
    )


@pytest.mark.parametrize("name", _fixture_names())
def test_fixture_frames_decode(name):
    """Byte-for-byte decode of GENUINE c-blosc 1.21.3 frames (committed
    fixtures from tools/gen_blosc_fixtures.py): bitshuffle across lz4/
    lz4hc/zlib/blosclz incl. ragged (unshuffled-block) and multi-block
    shapes, blosclz byte-shuffle, snappy, and a memcpyed frame that
    still carries the bit-shuffle flag."""
    with open(os.path.join(_FIXDIR, name + ".frame"), "rb") as f:
        frame = f.read()
    with open(os.path.join(_FIXDIR, name + ".raw"), "rb") as f:
        raw = f.read()
    assert blosc_decode(frame) == raw


@pytest.mark.parametrize("typesize,n", [(2, 160), (4, 1024), (8, 800), (4, 1027)])
def test_bit_shuffle_round_trip(typesize, n):
    from gpsat_tpu.data.blosc import _bit_shuffle, _bit_unshuffle

    rng = np.random.default_rng(n)
    block = rng.integers(0, 256, n * typesize + 3, dtype=np.uint8).tobytes()
    assert _bit_unshuffle(_bit_shuffle(block, typesize), typesize) == block
    if n % 8:  # c-blosc convention: non-multiple-of-8 elements pass through
        assert _bit_shuffle(block, typesize) == block


def test_bitshuffle_encode_round_trip():
    data = (np.sin(np.arange(5000) * 0.01) * 100).astype(np.float32).tobytes()
    frame = blosc_encode(data, 4, cname="lz4", shuffle=2)
    assert frame[2] & 0x04
    assert blosc_decode(frame) == data
    # bitshuffle makes slowly-varying float streams far more compressible
    # than no filter — proof it is really applied, not just flagged
    assert len(frame) < 0.8 * len(blosc_encode(data, 4, cname="lz4", shuffle=0))


def test_blosclz_python_decoder_cases():
    from gpsat_tpu.data.blosc import _blosclz_decompress_py

    # hand-built stream: 3-byte literal run + RLE run of the last byte
    # token 0x02 = literal run of 3; match token: len=(ctrl>>5)-1+3, ofs
    # bits zero + code 0 -> ref == op -> RLE of previous byte, len 4
    stream = bytes([0x02, ord("a"), ord("b"), ord("c"), (2 << 5), 0])
    assert _blosclz_decompress_py(stream, 7) == b"abccccc"
    with pytest.raises(ValueError, match="truncated match"):
        _blosclz_decompress_py(bytes([0x02, 97, 98, 99, (7 << 5)]), 64)


def test_snappy_python_decoder_cases():
    from gpsat_tpu.data.blosc import _snappy_decompress_py

    # preamble varint 9, literal "ab" (tag len-1=1 -> 0x04), copy1
    # len 7 offset 2 -> tag kind 1: ((7-4)&7)<<2 | 1 = 0x0D, offset byte 2
    stream = bytes([9, 0x04, ord("a"), ord("b"), 0x0D, 2])
    assert _snappy_decompress_py(stream, 9) == b"ababababa"
    with pytest.raises(ValueError, match="preamble"):
        _snappy_decompress_py(bytes([5, 0x00, ord("x")]), 2)


def test_blosc_truncated_frame_raises():
    frame = blosc_encode(np.arange(4000.0).tobytes(), 8)
    with pytest.raises(ValueError):
        blosc_decode(frame[: len(frame) // 2])


# --------------------------------------------------------------------------
# zarr integration: the reference-default store layout opens end-to-end
# --------------------------------------------------------------------------

def test_zarr_blosc_store_round_trip(tmp_path):
    from gpsat_tpu.data.zarr_reader import read_zarr, write_zarr

    rng = np.random.default_rng(3)
    lon = np.linspace(-30.0, 30.0, 6)
    lat = np.linspace(60.0, 80.0, 5)
    z = rng.normal(size=(5, 6))
    write_zarr(
        str(tmp_path / "obs.zarr"),
        data_vars={"z": (("lat", "lon"), z)},
        coords={"lon": lon, "lat": lat},
        compress="blosc",
    )
    # .zarray advertises the numcodecs-style blosc config
    import json
    import os

    meta = json.load(open(os.path.join(tmp_path, "obs.zarr", "z", ".zarray")))
    assert meta["compressor"]["id"] == "blosc"
    assert meta["compressor"]["cname"] == "lz4"
    df = read_zarr(str(tmp_path / "obs.zarr"))
    np.testing.assert_array_equal(df["z"].values.reshape(5, 6), z)


def test_zarr_bitshuffle_store_reads(tmp_path):
    """A zarr store whose chunks are Blosc(shuffle=BITSHUFFLE) frames —
    the real CryoSat/S3 archive layout — opens through read_zarr."""
    import json

    from gpsat_tpu.data.zarr_reader import read_zarr, write_zarr

    rng = np.random.default_rng(5)
    lon = np.linspace(-30.0, 30.0, 8)
    lat = np.linspace(60.0, 80.0, 4)
    z = rng.normal(size=(4, 8))
    store = tmp_path / "bitshuf.zarr"
    write_zarr(
        str(store),
        data_vars={"z": (("lat", "lon"), z)},
        coords={"lon": lon, "lat": lat},
        compress="blosc",
    )
    # re-encode every chunk of every array with the bit-shuffle filter
    # and advertise shuffle=2 in .zarray, mimicking numcodecs output
    for sub in os.listdir(store):
        adir = store / sub
        zpath = adir / ".zarray"
        if not zpath.exists():
            continue
        meta = json.load(open(zpath))
        itemsize = np.dtype(meta["dtype"]).itemsize
        for chunk in os.listdir(adir):
            if chunk.startswith("."):
                continue
            raw = blosc_decode(open(adir / chunk, "rb").read())
            with open(adir / chunk, "wb") as f:
                f.write(blosc_encode(raw, itemsize, cname="lz4", shuffle=2))
        meta["compressor"]["shuffle"] = 2
        json.dump(meta, open(zpath, "w"))
    df = read_zarr(str(store))
    np.testing.assert_array_equal(df["z"].values.reshape(4, 8), z)


@pytest.mark.skipif(
    not os.path.exists("/lib/x86_64-linux-gnu/libblosc.so.1"),
    reason="system libblosc not present",
)
def test_blosc_live_oracle_round_trip():
    """When the real c-blosc is present, cross-check both directions on
    fresh data (the committed fixtures cover the no-libblosc case)."""
    import ctypes

    lib = ctypes.CDLL("libblosc.so.1")
    lib.blosc_compress_ctx.restype = ctypes.c_int
    lib.blosc_compress_ctx.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_size_t, ctypes.c_size_t,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
    ]
    lib.blosc_decompress_ctx.restype = ctypes.c_int
    lib.blosc_decompress_ctx.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int,
    ]
    data = (np.sin(np.arange(3000) * 0.004) * 40).astype(np.float64).tobytes()
    for cname in (b"blosclz", b"lz4", b"snappy", b"zlib", b"zstd"):
        for shuffle in (0, 1, 2):
            src = ctypes.create_string_buffer(data, len(data))
            dst = ctypes.create_string_buffer(len(data) + 64)
            n = lib.blosc_compress_ctx(
                5, shuffle, 8, len(data), src, dst, len(data) + 64, cname, 0, 1
            )
            assert n > 0
            assert blosc_decode(dst.raw[:n]) == data
    for cname in ("lz4", "zlib", "zstd"):
        for shuffle in (0, 1, 2):
            frame = blosc_encode(data, 8, cname=cname, shuffle=shuffle)
            fbuf = ctypes.create_string_buffer(frame, len(frame))
            obuf = ctypes.create_string_buffer(len(data))
            n = lib.blosc_decompress_ctx(fbuf, obuf, len(data), 1)
            assert n == len(data) and obuf.raw[: len(data)] == data


def test_zarr_blosc_through_dataloader(tmp_path):
    from gpsat_tpu.data import dataloader as DL
    from gpsat_tpu.data.zarr_reader import write_zarr

    rng = np.random.default_rng(4)
    x = np.arange(8.0)
    write_zarr(
        str(tmp_path / "obs.zarr"),
        data_vars={"obs": (("x",), rng.normal(size=8))},
        coords={"x": x},
        compress="blosc",
    )
    df = DL.load(str(tmp_path / "obs.zarr"), where=[{"col": "x", "comp": ">=", "val": 4.0}])
    assert len(df) == 4 and (df["x"] >= 4.0).all()
