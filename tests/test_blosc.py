"""Blosc v1 frame codec + LZ4 block codec (data/blosc.py, native lz4).

Covers VERDICT item: reference-era zarr stores carry zarr's DEFAULT
compressor Blosc(cname='lz4', clevel=5, shuffle=SHUFFLE)
(ref: GPSat/dataloader.py:60-66); the built-in reader must open them.
Fixtures are built with the in-repo encoder, which mirrors c-blosc's
on-disk layout (header flags, bstarts, split streams, stored-raw and
memcpy fallbacks) — the same hand-built-format approach as the PyTables
fixtures.
"""

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
    frame = bytearray(blosc_encode(np.arange(400.0).tobytes(), 8, shuffle=1))
    frame[2] |= 0x04  # claim bit-shuffle
    with pytest.raises(NotImplementedError, match="bit-shuffle"):
        blosc_decode(bytes(frame))
    # snappy codec id in a hand-built non-memcpy frame
    hdr = bytes([2, 1, (2 << 5) | 0x10, 1]) + struct.pack("<III", 8, 8, 16 + 4 + 4 + 6)
    bad = hdr + struct.pack("<I", 20) + struct.pack("<I", 6) + b"snappy"
    with pytest.raises(NotImplementedError, match="snappy"):
        blosc_decode(bad)
    with pytest.raises(ValueError, match="header"):
        blosc_decode(data[:8])


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
