"""Native GIF decode (functions/multimodal.py::_decode_gif).

Two independent test encoders, written from the GIF spec's
COMPRESSION side (the decoder implements the decompression side, so a
shared misunderstanding can't cancel):

- `_lzw_encode_unclear`: the classic "uncompressed GIF" trick — emit
  a CLEAR code before every literal so the dictionary never grows and
  the code width never changes. Correct by construction from the spec
  alone; isolates bit-packing and framing from dictionary logic.
- `_lzw_encode`: a real LZW encoder (dictionary growth, late width
  change at next_code == 2^width + 1, table freeze at 4096) that
  exercises the decoder's KwKwK case and width-growth schedule.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flink_hiveorc_spark.functions.multimodal import decode_image

from test_image_decode import _rng


class _BitWriter:
    """LSB-first bit packer (GIF appendix F byte order)."""

    def __init__(self):
        self.buf = 0
        self.nbits = 0
        self.out = bytearray()

    def write(self, code: int, width: int) -> None:
        self.buf |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.buf & 0xFF)
            self.buf = self.nbits = 0
        return bytes(self.out)


def _lzw_encode_unclear(indices, min_code_size: int) -> bytes:
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    bw = _BitWriter()
    width = min_code_size + 1
    for px in indices:
        bw.write(clear, width)
        bw.write(int(px), width)
    bw.write(end, width)
    return bw.flush()


def _lzw_encode(indices, min_code_size: int) -> bytes:
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    bw = _BitWriter()
    width = min_code_size + 1
    bw.write(clear, width)
    d = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    seq = b""
    for px in indices:
        cand = seq + bytes([int(px)])
        if cand in d:
            seq = cand
            continue
        bw.write(d[seq], width)
        if next_code < 4096:
            d[cand] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1  # late change, the GIF (non-TIFF) convention
        seq = bytes([int(px)])
    if seq:
        bw.write(d[seq], width)
    bw.write(end, width)
    return bw.flush()


def _sub_blocks(data: bytes, block: int = 200) -> bytes:
    out = bytearray()
    for i in range(0, len(data), block):
        chunk = data[i : i + block]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_bytes(
    idx: np.ndarray,
    palette: list,
    min_code_size: int = None,
    encoder=_lzw_encode,
    interlace: bool = False,
    transparent: int = None,
    local_palette: bool = False,
    extra_frame: bool = False,
) -> bytes:
    """Full GIF89a stream: header, logical screen descriptor, global
    (or local) color table, optional GCE transparency, image
    descriptor, LZW data in sub-blocks, trailer."""
    h, w = idx.shape
    nbits = max(1, (len(palette) - 1).bit_length())
    pal_bytes = bytes(v for rgb in palette for v in rgb)
    pal_bytes += b"\x00" * (3 * (1 << nbits) - len(pal_bytes))  # pad to 2^n
    if min_code_size is None:
        min_code_size = max(2, nbits)
    out = bytearray(b"GIF89a")
    gflag = 0 if local_palette else 0x80 | (nbits - 1)
    out += struct.pack("<HHBBB", w, h, gflag, 0, 0)
    if not local_palette:
        out += pal_bytes
    if transparent is not None:
        out += b"\x21\xf9\x04" + bytes([0x01, 0, 0, transparent]) + b"\x00"
    rows = idx
    if interlace:
        order = np.concatenate([np.arange(o, h, s) for o, s in _GIF_PASSES])
        rows = idx[order]  # serialize rows in pass order
    iflag = (0x80 | (nbits - 1) if local_palette else 0) | (0x40 if interlace else 0)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflag)
    if local_palette:
        out += pal_bytes
    out += bytes([min_code_size])
    out += _sub_blocks(encoder(rows.ravel(), min_code_size))
    if extra_frame:  # animated: a second frame the decoder must ignore
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([min_code_size])
        out += _sub_blocks(_lzw_encode_unclear(rows.ravel()[::-1], min_code_size))
    out += b"\x3b"
    return bytes(out)


_PAL8 = [(10 * i % 256, (7 * i + 3) % 256, (13 * i + 1) % 256) for i in range(8)]


def test_gif_unclear_trick_roundtrip():
    """The clear-before-every-literal encoding is valid GIF by spec
    reading alone — the framing/bit-order baseline."""
    idx = _rng(100).integers(0, 8, size=(9, 7), dtype=np.uint8)
    got = decode_image(_gif_bytes(idx, _PAL8, encoder=_lzw_encode_unclear))
    np.testing.assert_array_equal(got, np.array(_PAL8, dtype=np.uint8)[idx])


def test_gif_real_lzw_roundtrip_with_width_growth():
    """600 pixels with an 8-entry palette crosses the 5→6→7-bit code
    width boundaries; dictionary growth must stay in lockstep."""
    idx = _rng(101).integers(0, 8, size=(20, 30), dtype=np.uint8)
    got = decode_image(_gif_bytes(idx, _PAL8))
    np.testing.assert_array_equal(got, np.array(_PAL8, dtype=np.uint8)[idx])


def test_gif_kwkwk_run():
    """A constant run triggers the KwKwK case (decoder receives a code
    equal to its table size) immediately and repeatedly."""
    idx = np.zeros((5, 40), dtype=np.uint8)
    idx[2, 5] = 3  # one non-constant pixel keeps the run non-trivial
    got = decode_image(_gif_bytes(idx, _PAL8))
    np.testing.assert_array_equal(got, np.array(_PAL8, dtype=np.uint8)[idx])


def test_gif_interlaced():
    idx = _rng(102).integers(0, 8, size=(13, 6), dtype=np.uint8)
    got = decode_image(_gif_bytes(idx, _PAL8, interlace=True))
    np.testing.assert_array_equal(got, np.array(_PAL8, dtype=np.uint8)[idx])


def test_gif_transparency_gives_rgba():
    idx = _rng(103).integers(0, 8, size=(4, 4), dtype=np.uint8)
    got = decode_image(_gif_bytes(idx, _PAL8, transparent=3))
    pal = np.array(_PAL8, dtype=np.uint8)
    alpha = np.where(idx == 3, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, np.dstack([pal[idx], alpha[:, :, None]]))


def test_gif_local_palette_and_animated_first_frame():
    idx = _rng(104).integers(0, 8, size=(6, 5), dtype=np.uint8)
    got = decode_image(_gif_bytes(idx, _PAL8, local_palette=True, extra_frame=True))
    np.testing.assert_array_equal(got, np.array(_PAL8, dtype=np.uint8)[idx])


def test_gif_large_palette_256():
    pal = [(i, 255 - i, i ^ 0x55) for i in range(256)]
    idx = _rng(105).integers(0, 256, size=(25, 25), dtype=np.uint8)
    got = decode_image(_gif_bytes(idx, pal))
    np.testing.assert_array_equal(got, np.array(pal, dtype=np.uint8)[idx])


def test_gif_malformed_rejected():
    idx = _rng(106).integers(0, 8, size=(4, 4), dtype=np.uint8)
    ok = _gif_bytes(idx, _PAL8)
    with pytest.raises(ValueError):  # truncated mid-stream
        decode_image(ok[: len(ok) // 2])
    with pytest.raises(ValueError):  # trailer with no image descriptor
        decode_image(b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0, 0, 0) + b"\x3b")


def test_gif_bad_lzw_code_rejected():
    """A code pointing past the table (not the KwKwK slot) is
    malformed."""
    bw = _BitWriter()
    bw.write(4, 3)  # clear (min_code_size 2)
    bw.write(1, 3)  # literal: table len 6, next valid add slot = 6
    bw.write(7, 3)  # 7 > len(table)=6 → KwKwK slot is 6; 7 is invalid
    stream = bw.flush()
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 1, 0x80 | 1, 0, 0)
    out += bytes(v for rgb in _PAL8[:4] for v in rgb)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 1, 0)
    out += bytes([2])
    out += bytes([len(stream)]) + stream + b"\x00"
    out += b"\x3b"
    with pytest.raises(ValueError):
        decode_image(bytes(out))


def test_gif_pixel_count_mismatch_rejected():
    """Fewer LZW pixels than w*h is malformed, not silently short."""
    idx = _rng(107).integers(0, 8, size=(4, 4), dtype=np.uint8)
    stream = _lzw_encode(idx.ravel()[:10], 3)  # only 10 of 16 pixels
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x80 | 2, 0, 0)
    out += bytes(v for rgb in _PAL8 for v in rgb)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0)
    out += bytes([3])
    out += _sub_blocks(stream)
    out += b"\x3b"
    with pytest.raises(ValueError):
        decode_image(bytes(out))


def test_gif_bomb_dimensions_rejected():
    """IHDR-equivalent guard: frame dimensions past MAX_IMAGE_PIXELS
    raise before any LZW work."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 50000, 50000, 0x80 | 2, 0, 0)
    out += bytes(v for rgb in _PAL8 for v in rgb)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 50000, 50000, 0)
    out += bytes([3, 1, 0x00, 0])  # one tiny sub-block, terminator
    out += b"\x3b"
    with pytest.raises(ValueError, match="MAX_IMAGE_PIXELS"):
        decode_image(bytes(out))


def test_gif_property_random_images():
    """Randomized sweep: palette sizes, shapes, both encoders,
    interlace on/off — all must round-trip exactly."""
    rng = _rng(108)
    for trial in range(15):
        ncol = int(rng.integers(2, 65))
        h = int(rng.integers(1, 15))
        w = int(rng.integers(1, 15))
        pal = [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(ncol)]
        idx = rng.integers(0, ncol, size=(h, w), dtype=np.uint8)
        enc = _lzw_encode if trial % 2 else _lzw_encode_unclear
        gif = _gif_bytes(idx, pal, encoder=enc, interlace=bool(trial % 3 == 0))
        got = decode_image(gif)
        np.testing.assert_array_equal(
            got, np.array(pal, dtype=np.uint8)[idx], err_msg=f"trial {trial}"
        )


# ----------------------------------------------- animation (r9)


def _gif_anim_bytes(screen, frames, palette) -> bytes:
    """Animated GIF89a: logical screen + global color table, then per
    frame an optional GCE (disposal bits 2-4, transparency bit 0,
    little-endian centisecond delay) and an image block at
    (left, top), optionally with a local palette or interlacing."""
    W, H = screen
    nbits = max(1, (len(palette) - 1).bit_length())
    pal_bytes = bytes(v for rgb in palette for v in rgb)
    pal_bytes += b"\x00" * (3 * (1 << nbits) - len(pal_bytes))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", W, H, 0x80 | (nbits - 1), 0, 0)
    out += pal_bytes
    for f in frames:
        idx = f["idx"]
        h, w = idx.shape
        disposal = f.get("disposal", 0)
        transparent = f.get("transparent")
        delay = f.get("delay", 0)
        flags = (disposal << 2) | (1 if transparent is not None else 0)
        out += b"\x21\xf9\x04" + bytes(
            [flags, delay & 0xFF, delay >> 8, transparent or 0]
        ) + b"\x00"
        local = f.get("palette")
        lbits = nbits
        if local is not None:
            lbits = max(1, (len(local) - 1).bit_length())
            lpal = bytes(v for rgb in local for v in rgb)
            lpal += b"\x00" * (3 * (1 << lbits) - len(lpal))
        interlace = f.get("interlace", False)
        rows = idx
        if interlace:
            order = np.concatenate([np.arange(o, h, s) for o, s in _GIF_PASSES])
            rows = idx[order]
        iflag = (0x80 | (lbits - 1) if local is not None else 0) | (
            0x40 if interlace else 0
        )
        out += b"\x2c" + struct.pack(
            "<HHHHB", f.get("left", 0), f.get("top", 0), w, h, iflag
        )
        if local is not None:
            out += lpal
        mcs = max(2, lbits)
        out += bytes([mcs])
        out += _sub_blocks(_lzw_encode(rows.ravel(), mcs))
    out += b"\x3b"
    return bytes(out)


def _rgba(pal, idx):
    """Opaque RGBA of palette[idx]."""
    pal = np.asarray(pal, dtype=np.uint8)
    return np.dstack(
        [pal[idx], np.full(idx.shape + (1,), 255, dtype=np.uint8)]
    )


def test_gif_frames_full_opaque_and_delays():
    from flink_hiveorc_spark.functions.multimodal import decode_gif_frames

    rng = np.random.default_rng(80)
    idxs = [rng.integers(0, 8, size=(4, 6), dtype=np.uint8) for _ in range(3)]
    payload = _gif_anim_bytes(
        (6, 4),
        [{"idx": i, "delay": 7 + k} for k, i in enumerate(idxs)],
        _PAL8,
    )
    frames, delays = decode_gif_frames(payload)
    assert frames.shape == (3, 4, 6, 4) and delays == [7, 8, 9]
    for k in range(3):
        np.testing.assert_array_equal(frames[k], _rgba(_PAL8, idxs[k]))


def test_gif_frames_subrect_transparency_and_disposals():
    """The compositing matrix in one stream: frame2 is a sub-rect
    with a transparent index (canvas shows through), disposal 3 on
    frame2 restores frame1's canvas for frame3, and disposal 2 on
    frame3 clears its rect before frame4."""
    from flink_hiveorc_spark.functions.multimodal import decode_gif_frames

    rng = np.random.default_rng(81)
    base = rng.integers(0, 8, size=(5, 7), dtype=np.uint8)
    patch = rng.integers(0, 8, size=(2, 3), dtype=np.uint8)
    patch[0, 1] = 7  # the transparent index
    f3 = rng.integers(0, 7, size=(3, 3), dtype=np.uint8)
    f4 = rng.integers(0, 7, size=(1, 2), dtype=np.uint8)
    payload = _gif_anim_bytes(
        (7, 5),
        [
            {"idx": base},
            {"idx": patch, "left": 2, "top": 1, "transparent": 7, "disposal": 3},
            {"idx": f3, "left": 4, "top": 2, "disposal": 2},
            {"idx": f4, "left": 0, "top": 0},
        ],
        _PAL8,
    )
    frames, _ = decode_gif_frames(payload)
    e1 = _rgba(_PAL8, base)
    np.testing.assert_array_equal(frames[0], e1)
    # frame 2: patch over base, transparent pixel keeps base
    e2 = e1.copy()
    sub = _rgba(_PAL8, patch)
    m = patch != 7
    e2[1:3, 2:5][m] = sub[m]
    np.testing.assert_array_equal(frames[1], e2)
    # frame 3: disposal 3 restored frame1's canvas, then f3 draws
    e3 = e1.copy()
    e3[2:5, 4:7] = _rgba(_PAL8, f3)
    np.testing.assert_array_equal(frames[2], e3)
    # frame 4: disposal 2 cleared f3's rect to transparent black
    e4 = e1.copy()
    e4[2:5, 4:7] = 0
    e4[0:1, 0:2] = _rgba(_PAL8, f4)
    np.testing.assert_array_equal(frames[3], e4)


def test_gif_frames_local_palette_and_interlace():
    from flink_hiveorc_spark.functions.multimodal import decode_gif_frames

    rng = np.random.default_rng(82)
    base = rng.integers(0, 8, size=(9, 5), dtype=np.uint8)
    local = [(i * 17 % 256, i * 29 % 256, i * 41 % 256) for i in range(4)]
    patch = rng.integers(0, 4, size=(9, 5), dtype=np.uint8)
    payload = _gif_anim_bytes(
        (5, 9),
        [{"idx": base, "interlace": True}, {"idx": patch, "palette": local}],
        _PAL8,
    )
    frames, _ = decode_gif_frames(payload)
    np.testing.assert_array_equal(frames[0], _rgba(_PAL8, base))
    np.testing.assert_array_equal(frames[1], _rgba(local, patch))


def test_gif_frames_single_frame_matches_first_frame_decoder():
    from flink_hiveorc_spark.functions.multimodal import (
        decode_gif_frames,
        decode_image,
    )

    rng = np.random.default_rng(83)
    idx = rng.integers(0, 8, size=(6, 6), dtype=np.uint8)
    payload = _gif_bytes(idx, _PAL8)
    frames, delays = decode_gif_frames(payload)
    assert frames.shape[0] == 1 and delays == [0]
    np.testing.assert_array_equal(frames[0, :, :, :3], decode_image(payload))
    assert (frames[0, :, :, 3] == 255).all()


def test_gif_frames_rect_outside_screen_malformed():
    import pytest

    from flink_hiveorc_spark.functions.multimodal import decode_gif_frames

    idx = np.zeros((3, 3), dtype=np.uint8)
    payload = _gif_anim_bytes((4, 4), [{"idx": idx, "left": 2, "top": 2}], _PAL8)
    with pytest.raises(ValueError, match="logical screen"):
        decode_gif_frames(payload)


def test_gif_frame_sample_composes_with_image_stats(spark):
    """Animated GIF → composited frames → P6 payloads the IMAGE
    featurizer consumes; per-frame means must equal numpy on the
    composited canvases. Quarantine classifies non-GIF payloads."""
    from pyspark.sql import functions as F

    from flink_hiveorc_spark.functions.multimodal import (
        decode_gif_frames,
        gif_frame_sample,
        image_stats,
    )

    rng = np.random.default_rng(84)
    idxs = [rng.integers(0, 8, size=(4, 5), dtype=np.uint8) for _ in range(5)]
    payload = _gif_anim_bytes((5, 4), [{"idx": i} for i in idxs], _PAL8)
    expect, _ = decode_gif_frames(payload)
    df = spark.createDataFrame(
        [
            (600, bytearray(payload)),
            # WebP routes through the sampler since r12: a corrupt
            # RIFF shell is now MALFORMED, not unsupported; a plain
            # non-animation container stays unsupported
            (601, bytearray(b"FORM\x00\x00\x00\x00AIFFnotagif")),
            (602, bytearray(payload[:30])),
        ],
        "doc_id long, payload binary",
    )
    rows = gif_frame_sample(df, every_n=2, quarantine=True).collect()
    good = {r["frame_idx"]: r for r in rows if r["doc_id"] == 600}
    assert sorted(good) == [0, 2, 4]
    assert all(r["error"] is None for r in good.values())
    assert {r["doc_id"]: r["error"][:12] for r in rows if r["doc_id"] != 600} == {
        601: "unsupported:",
        602: "malformed: t",
    }
    feats = {
        r["doc_id"]: r
        for r in image_stats(
            spark.createDataFrame(
                [(i, bytearray(bytes(good[i]["payload"]))) for i in good],
                "doc_id long, payload binary",
            )
        ).collect()
    }
    for i in (0, 2, 4):
        rgb = expect[i][:, :, :3]
        assert (feats[i]["height"], feats[i]["width"], feats[i]["channels"]) == (4, 5, 3)
        assert feats[i]["mean_byte"] == int(rgb.sum(dtype="int64")) / rgb.size

    import pytest

    with pytest.raises(ValueError, match="every_n"):
        gif_frame_sample(df, every_n=0)


def test_gif_frames_total_output_bomb_guard(monkeypatch):
    """Frame-count amplification guard: each composited frame is a
    full logical-screen RGBA copy, so a tiny payload with many 1x1
    frame rects amplifies to n_frames x screen pixels. With the guard
    shrunk to 4 canvases' worth, the 5th frame must raise the
    quarantine-catchable ValueError (not MemoryError)."""
    import flink_hiveorc_spark.functions.multimodal as mm

    rng = np.random.default_rng(83)
    screen = (6, 4)  # 24 px canvas
    tiny = [{"idx": rng.integers(0, 8, size=(1, 1), dtype=np.uint8)}
            for _ in range(8)]
    payload = _gif_anim_bytes(screen, tiny, _PAL8)
    monkeypatch.setattr(mm, "MAX_GIF_TOTAL_PIXELS", 4 * 24)
    with pytest.raises(ValueError, match="MAX_GIF_TOTAL_PIXELS"):
        mm.decode_gif_frames(payload)
    # exactly at the cap decodes fine
    ok = _gif_anim_bytes(screen, tiny[:4], _PAL8)
    frames, _ = mm.decode_gif_frames(ok)
    assert frames.shape == (4, 4, 6, 4)


def test_gif_frames_absolute_frame_count_guard(monkeypatch):
    """A 1x1 logical screen never trips the pixel-product guard (the
    product grows by one pixel per frame), but each frame still costs
    a full numpy canvas object — MAX_GIF_FRAMES caps the count
    absolutely, independent of screen area."""
    import flink_hiveorc_spark.functions.multimodal as mm

    tiny = [{"idx": np.zeros((1, 1), dtype=np.uint8)} for _ in range(6)]
    payload = _gif_anim_bytes((1, 1), tiny, _PAL8)
    monkeypatch.setattr(mm, "MAX_GIF_FRAMES", 5)
    with pytest.raises(ValueError, match="MAX_GIF_FRAMES"):
        mm.decode_gif_frames(payload)
    # exactly at the cap decodes fine
    frames, _ = mm.decode_gif_frames(_gif_anim_bytes((1, 1), tiny[:5], _PAL8))
    assert frames.shape == (5, 1, 1, 4)


def test_gif_frames_checked_shim_converts_foreign_exceptions(monkeypatch):
    """_gif_frames_checked keeps the decode contract: non-GIF magic is
    NotImplementedError, contract errors pass through, and any
    exception class the parser might leak becomes ValueError (so the
    quarantine catch in gif_frame_sample can never be bypassed)."""
    import flink_hiveorc_spark.functions.multimodal as mm

    with pytest.raises(NotImplementedError, match="requires a GIF"):
        mm._gif_frames_checked(b"not a gif at all")
    with pytest.raises(ValueError, match="truncated GIF header"):
        mm._gif_frames_checked(b"GIF89a\x01\x00")
    monkeypatch.setattr(
        mm, "decode_gif_frames",
        lambda raw: (_ for _ in ()).throw(RuntimeError("parser leak")),
    )
    with pytest.raises(ValueError, match="malformed GIF payload: parser leak"):
        mm._gif_frames_checked(b"GIF89a" + b"\x00" * 16)
