"""Real image decode (functions/multimodal.py): the pure-numpy
PPM/PGM/BMP decoders must reproduce independently serialized pixel
arrays bit-for-bit, compressed formats must fail loudly without a
codec, and the distributed decode→featurize path (image_stats,
mapInPandas) must agree with local numpy over a mixed-format corpus.

The serializers here are written from the format specs independently
of the decoder (netpbm header grammar; BITMAPINFOHEADER layout with
4-byte row padding and bottom-up row order) so a shared
misunderstanding can't cancel out.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flink_hiveorc_spark.functions.multimodal import decode_image, image_stats


def _rng(seed):
    return np.random.default_rng(seed)


def _ppm_bytes(arr: np.ndarray, comment: bool = False) -> bytes:
    h, w, c = arr.shape
    assert c == 3
    head = b"P6\n"
    if comment:
        head += b"# synthetic test image\n"
    head += f"{w} {h}\n255\n".encode()
    return head + arr.tobytes()


def _pgm_bytes(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    assert c == 1
    return f"P5\n{w} {h}\n255\n".encode() + arr.tobytes()


def _bmp_bytes(arr: np.ndarray, top_down: bool = False) -> bytes:
    """Uncompressed BMP: 24-bit for 3-channel input, 32-bit for
    4-channel; RGB(A) input stored as BGR(A) rows padded to 4 bytes,
    bottom-up unless top_down."""
    h, w, c = arr.shape
    nch = c
    bgr = arr[:, :, [2, 1, 0]] if c == 3 else arr[:, :, [2, 1, 0, 3]]
    rows = bgr if top_down else bgr[::-1]
    stride = (w * nch + 3) & ~3
    body = b"".join(
        rows[r].tobytes() + b"\x00" * (stride - w * nch) for r in range(h)
    )
    pix_off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", pix_off + len(body), 0, 0, pix_off)
    info = struct.pack(
        "<IiiHHIIiiII",
        40,
        w,
        -h if top_down else h,
        1,
        nch * 8,
        0,  # BI_RGB
        len(body),
        2835,
        2835,
        0,
        0,
    )
    return header + info + body


def test_ppm_roundtrip_with_header_comment():
    arr = _rng(1).integers(0, 256, size=(13, 7, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(_ppm_bytes(arr, comment=True)), arr)


def test_pgm_roundtrip_single_channel():
    arr = _rng(2).integers(0, 256, size=(5, 9, 1), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(_pgm_bytes(arr)), arr)


def test_bmp24_bottom_up_with_row_padding():
    # width 3 -> 9-byte rows pad to 12: exercises the stride math
    arr = _rng(3).integers(0, 256, size=(4, 3, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(_bmp_bytes(arr)), arr)


def test_bmp32_top_down():
    arr = _rng(4).integers(0, 256, size=(6, 5, 4), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(_bmp_bytes(arr, top_down=True)), arr)


def test_compressed_without_codec_raises_not_implemented():
    png_magic = b"\x89PNG\r\n\x1a\n" + b"\x00" * 32
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present on this host; gate untestable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image(png_magic)


def test_rle_bmp_rejected_not_garbled():
    arr = _rng(5).integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    data = bytearray(_bmp_bytes(arr))
    struct.pack_into("<I", data, 30, 1)  # compression = BI_RLE8
    with pytest.raises(NotImplementedError):
        decode_image(bytes(data))


def test_image_stats_distributed_matches_numpy(spark):
    """Mixed-format corpus through the Spark mapInPandas path: shapes
    and exact mean bytes equal local numpy on the same arrays."""
    arrays = {
        100: _rng(10).integers(0, 256, size=(16, 11, 3), dtype=np.uint8),
        101: _rng(11).integers(0, 256, size=(3, 30, 1), dtype=np.uint8),
        102: _rng(12).integers(0, 256, size=(7, 5, 3), dtype=np.uint8),
        103: _rng(13).integers(0, 256, size=(2, 2, 4), dtype=np.uint8),
    }
    payloads = {
        100: _ppm_bytes(arrays[100], comment=True),
        101: _pgm_bytes(arrays[101]),
        102: _bmp_bytes(arrays[102]),
        103: _bmp_bytes(arrays[103], top_down=True),
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in image_stats(df).collect()}
    assert set(got) == set(arrays)
    for doc_id, arr in arrays.items():
        r = got[doc_id]
        assert (r["height"], r["width"], r["channels"]) == arr.shape
        assert r["mean_byte"] == int(arr.sum(dtype="int64")) / arr.size
