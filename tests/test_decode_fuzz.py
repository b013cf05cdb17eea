"""Decode-contract fuzz: every decoder, fed random garbage and
bit-flipped valid payloads, must return a decoded result or raise
exactly NotImplementedError/ValueError — never a raw struct.error /
IndexError / ZeroDivisionError (which would escape quarantine mode
and kill a Spark task) and never hang. This is the property the
streaming DLQ promise rests on; deterministic rng, no hypothesis
overhead."""

from __future__ import annotations

import numpy as np
import pytest

from flink_hiveorc_spark.functions.multimodal import (
    decode_audio,
    decode_gif_frames,
    decode_image,
    decode_video,
)
from flink_hiveorc_spark.functions.office import (
    build_docx,
    build_epub,
    build_xlsx,
    parse_epub,
    parse_office,
)
from flink_hiveorc_spark.functions.cfb import (
    build_doc,
    build_ppt,
    build_xls,
    parse_legacy_office,
)
from flink_hiveorc_spark.functions.rtf import build_rtf, parse_rtf
from flink_hiveorc_spark.functions.pdf import (
    _build_classic_filtered,
    _build_pdf15,
    _lzw_encode,
    _rle_encode,
    parse_pdf,
)
from flink_hiveorc_spark.functions.probe import probe_media

from test_gif_decode import _PAL8, _gif_anim_bytes, _gif_bytes
from test_image_decode import _bmp_bytes, _pgm_bytes, _ppm_bytes, _rng, _wav_bytes
from test_png_g711_decode import ALL_FILTERS, _png_bytes, _png_from_array
from test_aiff_au_decode import _aiff_bytes, _au_bytes
from test_farbfeld_caf_decode import _caf_bytes, _farbfeld_bytes
from test_qoi_tga_pnm_decode import _qoi_bytes, _tga_bytes
from test_adpcm_decode import _ima4_bytes, _ima_wav_bytes, _ms_wav_bytes, _smooth
from test_avi_decode import _BI_RGB, _avi_bytes, _rgb_frame, _yuv420_frame
from test_bmp_extended_decode import (
    _bmp_container,
    _pal_blob,
    _paletted_bmp,
    _rle8_encode,
)
from test_flac_decode import (
    _frame as _flac_frame,
    _streaminfo as _flac_streaminfo,
    _sub_fixed as _flac_sub_fixed,
    _sub_verbatim as _flac_sub_verbatim,
)
from test_ico_decode import _and_mask, _dib_entry, _ico
from test_jpeg_decode import _safe_random_blocks, encode_jpeg
from test_jpeg_progressive import _full_script as _jpeg_script
from test_jpeg_progressive import encode_progressive
from test_media_probe import (
    _adts_frame,
    _flac_mapping_packet,
    _mkv,
    _mp3_bytes,
    _mp4,
    _ogg_page,
    _opus_head,
    _trak,
)
from test_tiff_decode import _tiff_bytes, _tiff_tiled_bytes
from test_raster_decode import (
    _dds_header,
    _pcx,
    _sgi,
    _sun,
    _sun_rle,
)
from test_webp_decode import encode_vp8l
from test_y4m_decode import _y4m_bytes

_CONTRACT = (NotImplementedError, ValueError)


def _assert_contract(decode, payload: bytes, ctx: str) -> None:
    try:
        decode(payload)
    except _CONTRACT:
        pass
    except Exception as e:  # noqa: BLE001 — the point of the test
        pytest.fail(f"{ctx}: {type(e).__name__} escaped the contract: {e!r}")


def _valid_payloads():
    rng = _rng(600)
    img3 = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    img1 = rng.integers(0, 256, size=(4, 7, 1), dtype=np.uint8)
    gif_idx = rng.integers(0, 8, size=(5, 6), dtype=np.uint8)
    wav = rng.integers(-1000, 1000, size=(40, 2)).astype("<i2")
    lumas = rng.integers(0, 256, size=(2, 4, 4), dtype=np.uint8)
    import struct

    return [
        (decode_image, "ppm", _ppm_bytes(img3)),
        (decode_image, "pgm", _pgm_bytes(img1)),
        (decode_image, "bmp", _bmp_bytes(img3)),
        (
            decode_image,
            "bmp_pal4",
            _paletted_bmp(
                rng.integers(0, 16, size=(5, 9), dtype=np.uint8),
                rng.integers(0, 256, size=(16, 3), dtype=np.uint8),
                4,
            ),
        ),
        (
            decode_image,
            "bmp_rle8",
            _bmp_container(
                8, 6, 8, 1,
                _rle8_encode(rng.integers(0, 4, size=(6, 8), dtype=np.uint8)),
                pal_blob=_pal_blob(
                    rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
                ),
            ),
        ),
        (decode_image, "png", _png_from_array(img3, ALL_FILTERS)),
        # type-0 tRNS: the r8 gray/RGB transparency-key branch joins
        # the corpus so its length/shape checks get fuzzed too
        (
            decode_image,
            "png_trns",
            _png_bytes(
                [img1[y, :, 0].tobytes() for y in range(4)], 7, 4, 8, 0,
                [0, 2], trns=struct.pack(">H", int(img1[0, 0, 0])),
            ),
        ),
        (decode_image, "gif", _gif_bytes(gif_idx, _PAL8)),
        (
            decode_gif_frames,
            "gif_anim",
            _gif_anim_bytes(
                (6, 5),
                [
                    {"idx": gif_idx, "delay": 5},
                    {
                        "idx": gif_idx[:3, :4],
                        "left": 1,
                        "top": 1,
                        "transparent": 3,
                        "disposal": 2,
                    },
                ],
                _PAL8,
            ),
        ),
        (decode_image, "qoi", _qoi_bytes(img3)),
        (decode_image, "tga_rle", _tga_bytes(img3, rle=True)),
        (
            decode_image,
            "pbm_p4",
            b"P4\n7 4\n" + np.packbits(img1[:, :, 0] > 127, axis=1).tobytes(),
        ),
        (decode_image, "tiff", _tiff_bytes(img3, lzw=True, predictor=2)),
        # padded uncompressed strips: the r8 trim branch under fuzz
        (
            decode_image,
            "tiff_padded",
            _tiff_bytes(img3, rows_per_strip=2, strip_pad=2),
        ),
        (
            decode_image,
            "tiff_tiled",
            _tiff_tiled_bytes(
                rng.integers(0, 256, size=(18, 20, 3), dtype=np.uint8),
                16, 16, lzw=True, predictor=2,
            ),
        ),
        (decode_audio, "wav", _wav_bytes(wav, 16000)),
        (decode_audio, "aiff", _aiff_bytes(wav.astype(">i2"), 16000)),
        (decode_audio, "aifc_sowt", _aiff_bytes(wav, 16000, comp=b"sowt")),
        (decode_audio, "au", _au_bytes(wav.astype(">i2"), 16000, encoding=3)),
        (decode_audio, "caf", _caf_bytes(wav.astype(">i2"), 16000.0)),
        (decode_audio, "wav_ima_adpcm", _ima_wav_bytes(_smooth(610, 70, 2), 16000)[0]),
        (decode_audio, "wav_ms_adpcm", _ms_wav_bytes(_smooth(611, 70, 1), 16000)[0]),
        (decode_audio, "aifc_ima4", _ima4_bytes(_smooth(612, 70, 2), 16000)[0]),
        (
            decode_image,
            "farbfeld",
            _farbfeld_bytes((img3.astype(np.uint16) * 257)[:, :, [0, 1, 2, 0]]),
        ),
        (decode_video, "y4m", _y4m_bytes(lumas)),
        (
            decode_video,
            "avi_rgb",
            _avi_bytes(
                [_rgb_frame(f, 24, False) for f in lumas[..., None].repeat(3, -1)],
                4, 4, 24, _BI_RGB, rec_groups=True, audio_chunks=True,
            ),
        ),
        (
            decode_video,
            "avi_i420",
            _avi_bytes([_yuv420_frame(f) for f in lumas], 4, 4, 12, b"I420"),
        ),
        # --- r11 formats ---
        (
            decode_image,
            "jpeg",
            encode_jpeg(
                16, 16,
                [{"id": 1, "hv": 0x11, "tq": 0,
                  "blocks": _safe_random_blocks(_rng(613), 4)}],
                {0: list(_rng(614).integers(1, 16, 64))},
            ),
        ),
        (
            decode_image,
            "jpeg_progressive",
            encode_progressive(
                16, 16,
                (lambda c: c)([{"id": 1, "hv": 0x11, "tq": 0,
                                "blocks": _safe_random_blocks(_rng(615), 4)}]),
                {0: [2] * 64},
                _jpeg_script([{"id": 1, "hv": 0x11, "tq": 0,
                               "blocks": _safe_random_blocks(_rng(615), 4)}]),
            ),
        ),
        (
            decode_audio,
            "flac",
            _flac_streaminfo(8000, 1, 16, 192)
            + _flac_frame(
                [np.asarray(_smooth(616, 192, 1), dtype=np.int64).reshape(-1)[:192]],
                4, 16, 4, 0, 0,
                [lambda b, s: _flac_sub_fixed(b, s, 16, 2, (0, 1, [9, 11]))],
            ),
        ),
        (
            decode_image,
            "ico",
            _ico([(4, 4, 32,
                   _dib_entry(4, 4, 32,
                              _rng(617).integers(0, 255, (4, 4, 4),
                                                 dtype=np.uint8).tobytes(),
                              np.zeros((4, 4), np.uint8)))]),
        ),
        (probe_media, "mp4", _mp4([_trak(b"vide", 64, 48)], dur=7000)),
        (probe_media, "webm", _mkv(320, 200)),
        (
            probe_media,
            "ogg_opus",
            _ogg_page(2, 0, 6, 0, [_opus_head()])
            + _ogg_page(4, 312 + 4800, 6, 1, [b"\x00" * 16]),
        ),
        (probe_media, "mp3", _mp3_bytes(25, n_frames=4)),
        # --- r12 formats ---
        (probe_media, "adts_aac", _adts_frame() * 3),
        (
            probe_media,
            "ogg_flac",
            _ogg_page(2, 0, 11, 0, [_flac_mapping_packet()])
            + _ogg_page(4, 32000 * 2, 11, 1, [b"\xffdata"]),
        ),
        (
            decode_image,
            "pcx",
            _pcx(
                6, 6,
                [[bytes(_rng(620).integers(0, 256, 6, dtype=np.uint8))
                  for _ in range(6)]],
                8, 1,
                palette256=_rng(621).integers(
                    0, 256, (256, 3), dtype=np.uint8
                ),
            ),
        ),
        (
            decode_image,
            "sun_raster",
            _sun(
                6, 6, 8,
                _sun_rle(bytes(_rng(622).integers(0, 256, 36,
                                                  dtype=np.uint8))),
                2,
                _rng(623).integers(0, 256, (256, 3), dtype=np.uint8),
            ),
        ),
        (
            decode_image,
            "sgi_rle",
            _sgi(_rng(624).integers(0, 256, (5, 7, 3),
                                    dtype=np.uint8), True),
        ),
        (
            decode_image,
            "dds_dxt5",
            _dds_header(8, 8, b"DXT5")
            + bytes(_rng(625).integers(0, 256, 64, dtype=np.uint8)),
        ),
        (
            decode_image,
            "xbm",
            b"#define f_width 8\n#define f_height 2\n"
            b"static char f_bits[] = {0x12, 0x34};",
        ),
        (decode_image, "wbmp", b"\x00\x00\x08\x02\xa5\x5a"),
        (
            decode_image,
            "webp_vp8l",
            encode_vp8l(
                _rng(618).integers(0, 256, (6, 7, 3)).astype(np.uint8),
                transforms=[("subtract_green",)],
                cache_bits=2,
                use_lz77=True,
            ),
        ),
        # r14 formats: OOXML / EPUB zips, the modern xref-stream PDF
        (
            parse_office,
            "docx",
            build_docx([["fuzz title"], ["body ", "runs"]]),
        ),
        (
            parse_office,
            "xlsx",
            build_xlsx(["s0", "s1"], [[("s", "0"), ("n", "7")],
                                      [("inlineStr", "inline"), ("s", "1")]]),
        ),
        (
            parse_epub,
            "epub",
            build_epub("F", [("a.xhtml", "<p>one</p>"),
                             ("b.xhtml", "<p>two</p>")]),
        ),
        (
            parse_pdf,
            "pdf_xref_stream",
            _build_pdf15(b"BT (modern fuzz) Tj ET"),
        ),
        # r15 formats: the OLE2/CFB legacy Office trio and the
        # filtered-chain PDF legs
        (
            parse_legacy_office,
            "cfb_doc",
            build_doc([("fuzz piece one ", True), ("two", False)]),
        ),
        (
            parse_legacy_office,
            "cfb_xls",
            build_xls(["alpha", "beta gamma"], split_in=1),
        ),
        (
            parse_legacy_office,
            "cfb_ppt",
            build_ppt([["fuzz slide", "atom"], ["second"]]),
        ),
        (
            parse_rtf,
            "rtf",
            build_rtf(["fuzz rtf café", "second 中 paragraph"]),
        ),
        (
            parse_pdf,
            "pdf_filter_chain",
            _build_classic_filtered(
                _rle_encode(_lzw_encode(b"BT (chain fuzz) Tj ET"))
                .hex().upper().encode() + b">",
                b"[/ASCIIHexDecode /RunLengthDecode /LZWDecode]",
            ),
        ),
    ]


def test_fuzz_mutated_valid_payloads():
    """300 single/multi-byte corruptions of each valid payload: every
    one must decode or raise a contract error."""
    rng = _rng(601)
    for decode, name, payload in _valid_payloads():
        base = bytearray(payload)
        for trial in range(300):
            data = bytearray(base)
            for _ in range(int(rng.integers(1, 4))):
                pos = int(rng.integers(0, len(data)))
                data[pos] = int(rng.integers(0, 256))
            _assert_contract(decode, bytes(data), f"{name} mutation {trial}")


def test_fuzz_truncations():
    """Every prefix-truncation point of each valid payload."""
    for decode, name, payload in _valid_payloads():
        step = max(1, len(payload) // 120)
        for cut in range(0, len(payload), step):
            _assert_contract(decode, payload[:cut], f"{name} truncated@{cut}")


def test_fuzz_random_bytes_with_magic_prefixes():
    """Random tails behind every magic the dispatchers route on."""
    rng = _rng(602)
    magics = [
        b"P5\n", b"P6\n", b"BM", b"\x89PNG\r\n\x1a\n", b"GIF89a", b"GIF87a",
        b"II\x2a\x00", b"MM\x00\x2a", b"RIFF", b"YUV4MPEG2", b"",
        b"FORM", b".snd", b"qoif", b"P1\n", b"P3\n", b"P4\n",
        b"caff", b"farbfeld", b"RIFF\x00\x00\x00\x00AVI ",
        b"RIFF\xff\xff\xff\xffAVI LIST",
        b"RIFF\x20\x00\x00\x00WEBPVP8L",
        b"RIFF\xff\xff\xff\xffWEBP",
        b"\x59\xa6\x6a\x95", b"\x01\xda", b"DDS ",
        b"\x0a\x05\x01\x08", b"#define ",
    ]
    for magic in magics:
        for trial in range(40):
            tail = bytes(rng.integers(0, 256, size=int(rng.integers(0, 200)), dtype=np.uint8))
            payload = magic + tail
            _assert_contract(decode_image, payload, f"image magic {magic!r} {trial}")
            _assert_contract(decode_audio, payload, f"audio magic {magic!r} {trial}")
            _assert_contract(decode_video, payload, f"video magic {magic!r} {trial}")
