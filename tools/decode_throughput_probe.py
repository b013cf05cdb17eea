"""Distributed decode-throughput probe: generate a mixed-format blob
corpus (PNG all-filters / GIF / TIFF-LZW / PGM / paletted-BMP /
RLE8-BMP images; PCM + G.711 + IMA/MS-ADPCM WAV + AIFC-ima4 audio;
Y4M + I420/RGB-AVI video; animated GIFs through the frame sampler),
run the REAL image/audio/video_stats + gif_frame_sample mapInPandas
paths on local[N], and report rows/s and MB/s at 1x and 8x scale —
the scaling evidence for the decode stack (map-only plans: the ratio
should track corpus size, not blow up).

Reuses the pytest serializers (written independently of the
decoders) so the probe corpus is the same spec-grounded bytes the
round-trip tests verify. Usage:

    python tools/decode_throughput_probe.py [n_blobs_per_format]

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from test_adpcm_decode import (  # noqa: E402
    _ima4_bytes,
    _ima_wav_bytes,
    _ms_wav_bytes,
    _smooth,
)
from test_avi_decode import (  # noqa: E402
    _BI_RGB,
    _avi_bytes,
    _rgb_frame,
    _yuv420_frame,
)
from test_bmp_extended_decode import (  # noqa: E402
    _bmp_container,
    _pal_blob,
    _paletted_bmp,
    _rle8_encode,
)
from test_gif_decode import _PAL8, _gif_anim_bytes, _gif_bytes  # noqa: E402
from test_image_decode import _pgm_bytes, _wav_bytes  # noqa: E402
from test_flac_decode import (  # noqa: E402
    _frame as _flac_frame,
    _streaminfo as _flac_streaminfo,
    _sub_fixed as _flac_sub_fixed,
)
from test_jpeg_decode import _safe_random_blocks, encode_jpeg  # noqa: E402
from flink_hiveorc_spark.functions.cfb import (  # noqa: E402
    build_doc,
    build_ppt,
    build_xls,
)
from flink_hiveorc_spark.functions.office import (  # noqa: E402
    build_docx,
    build_epub,
    build_xlsx,
)
from flink_hiveorc_spark.functions.pdf import _build_pdf15  # noqa: E402
from test_jpeg_progressive import (  # noqa: E402
    _full_script as _jpeg_script,
    encode_progressive,
)
from test_media_probe import (  # noqa: E402
    _mkv,
    _mp3_bytes,
    _mp4,
    _ogg_page,
    _opus_head,
    _trak,
)
from test_web_archive import _warc_record  # noqa: E402
from test_webp_decode import encode_vp8l  # noqa: E402
from test_y4m_decode import _y4m_bytes  # noqa: E402
from test_png_g711_decode import ALL_FILTERS, _png_from_array  # noqa: E402
from test_tiff_decode import _tiff_bytes  # noqa: E402

from flink_hiveorc_spark.functions.multimodal import (  # noqa: E402
    audio_stats,
    decompress_stats,
    gif_frame_sample,
    image_stats,
    media_probe,
    video_stats,
)
from flink_hiveorc_spark.session import get_spark  # noqa: E402


def _corpus(n_per_format: int):
    rng = np.random.default_rng(7)
    images, audio, video, anim, probes = [], [], [], [], []
    blobs, envelopes, archives, mails = [], [], [], []
    crawltexts, offices, epubs, pdfs = [], [], [], []
    legacy = []
    for i in range(n_per_format):
        img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
        images.append(_png_from_array(img, ALL_FILTERS))
        idx = rng.integers(0, 8, size=(64, 64), dtype=np.uint8)
        images.append(_gif_bytes(idx, _PAL8))
        images.append(_tiff_bytes(img, lzw=True, predictor=2))
        images.append(_pgm_bytes(img[:, :, :1]))
        pcm = rng.integers(-32768, 32768, size=(8000, 1)).astype("<i2")
        audio.append(_wav_bytes(pcm, 16000))
        codes = rng.integers(0, 256, size=(8000, 1)).astype(np.uint8)
        audio.append(_wav_bytes(codes, 8000, fmt_tag=7))
        # r9 formats
        pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
        pidx = rng.integers(0, 8, size=(64, 64), dtype=np.uint8)
        images.append(_paletted_bmp(pidx, pal, 8))
        images.append(
            _bmp_container(64, 64, 8, 1, _rle8_encode(pidx), pal_blob=_pal_blob(pal))
        )
        wave = _smooth(1000 + i, 8000, 1)
        audio.append(_ima_wav_bytes(wave, 8000)[0])
        audio.append(_ms_wav_bytes(wave, 8000)[0])
        audio.append(_ima4_bytes(wave, 8000)[0])
        lumas = rng.integers(0, 256, size=(8, 48, 64), dtype=np.uint8)
        video.append(_y4m_bytes(lumas))
        video.append(
            _avi_bytes([_yuv420_frame(f) for f in lumas], 64, 48, 12, b"I420")
        )
        rgb = rng.integers(0, 256, size=(4, 32, 32, 3), dtype=np.uint8)
        video.append(
            _avi_bytes([_rgb_frame(f, 24, False) for f in rgb], 32, 32, 24, _BI_RGB)
        )
        anim.append(
            _gif_anim_bytes(
                (64, 48),
                [
                    {"idx": rng.integers(0, 8, size=(48, 64), dtype=np.uint8)}
                    for _ in range(4)
                ],
                _PAL8,
            )
        )
        # r11 formats: real baseline + progressive JPEG, FLAC, probes
        jb = _safe_random_blocks(rng, 64, spread=120, density=12)
        comps = [{"id": 1, "hv": 0x11, "tq": 0, "blocks": jb}]
        qts = {0: list(rng.integers(1, 20, 64))}
        images.append(encode_jpeg(64, 64, comps, qts))
        images.append(encode_progressive(64, 64, comps, qts, _jpeg_script(comps)))
        wave = np.asarray(_smooth(2000 + i, 4096, 1), dtype=np.int64).reshape(-1)[:1024]
        plan = (0, 2, [9, 10, 11, 12])
        fl = _flac_streaminfo(16000, 1, 16, 1024)
        fl += _flac_frame([wave], 0, 16, 4, 0, 0,
                          [lambda b, s: _flac_sub_fixed(b, s, 16, 2, plan)])
        audio.append(fl)
        probes.append(_mp4([_trak(b"vide", 640, 480)], dur=120000))
        probes.append(_mkv(1920, 1080))
        probes.append(
            _ogg_page(2, 0, 11, 0, [_opus_head()])
            + _ogg_page(4, 312 + 48000 * 30, 11, 1, [b"\x00" * 64])
        )
        probes.append(_mp3_bytes(40, n_frames=20))
        # r12 formats: VP8L lossless WebP + compressed blobs
        wimg = rng.integers(0, 256, size=(48, 48, 3)).astype(np.uint8)
        images.append(encode_vp8l(wimg, transforms=[("subtract_green",)]))
        images.append(encode_vp8l(wimg, cache_bits=4, use_lz77=True))
        import bz2 as _bz2
        import gzip as _gzip
        import lzma as _lzma
        import zlib as _zlib
        text = rng.integers(32, 127, size=32768, dtype=np.uint8).tobytes()
        blobs.append(_gzip.compress(text, 6))
        blobs.append(_zlib.compress(text, 6))
        blobs.append(_bz2.compress(text, 1))
        blobs.append(_lzma.compress(text, preset=0))
        # r13 envelopes: WARC (plain + per-record gzip), zip/tar.gz, mbox
        import io as _io
        import tarfile as _tarfile
        import zipfile as _zipfile

        page = b"<html><body>" + text[:8192] + b"</body></html>"
        w = _warc_record("request", f"https://p.test/{i}", b"GET /")
        w += _warc_record("response", f"https://p.test/{i}", page)
        envelopes.append(w)
        envelopes.append(
            _gzip.compress(
                _warc_record("response", f"https://p.test/gz{i}", page), 6
            )
        )
        zbuf = _io.BytesIO()
        with _zipfile.ZipFile(zbuf, "w") as zf:
            zf.writestr("a.txt", text[:8192], _zipfile.ZIP_DEFLATED)
            zf.writestr("b.txt", text[8192:16384], _zipfile.ZIP_DEFLATED)
        archives.append(zbuf.getvalue())
        tbuf = _io.BytesIO()
        with _tarfile.open(fileobj=tbuf, mode="w:gz") as tf:
            ti = _tarfile.TarInfo("m.txt")
            ti.size = 8192
            tf.addfile(ti, _io.BytesIO(text[:8192]))
        archives.append(tbuf.getvalue())
        import base64 as _b64

        mails.append(
            (
                "From a@b Mon Jan  1 00:00:00 2024\n"
                f"Subject: probe {i}\nContent-Type: text/plain\n\n"
            ).encode()
            + text[:4096]
            + (
                "\nFrom c@d Mon Jan  1 00:00:01 2024\n"
                "Subject: att\nMIME-Version: 1.0\n"
                'Content-Type: multipart/mixed; boundary="XB"\n\n'
                "--XB\nContent-Type: application/octet-stream\n"
                "Content-Transfer-Encoding: base64\n\n"
            ).encode()
            + _b64.encodebytes(text[:4096])
            + b"--XB--\n"
        )
        # r14 lanes: charset-aware crawl text (multi-charset pages in
        # WARC frames incl. an HTTP envelope with gzip content-coding),
        # OOXML, EPUB, and the modern xref-stream PDF shape
        jp = ("<p>" + "\u78ba\u7387\u30c6\u30ad\u30b9\u30c8" * 300 + "</p>").encode("cp932")
        crawl = _warc_record_ct(
            "response", f"https://c.test/{i}/jp",
            "text/html; charset=shift_jis", jp,
        )
        latin = ("<p>" + "r\u00e9sum\u00e9 na\u00efve " * 400 + "</p>").encode("cp1252")
        crawl += _warc_record_ct(
            "response", f"https://c.test/{i}/lat",
            "text/html; charset=iso-8859-1", latin,
        )
        http_block = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            b"Content-Encoding: gzip\r\n\r\n"
            + _gzip.compress(page, 6)
        )
        crawl += _warc_record_ct(
            "response", f"https://c.test/{i}/http",
            "application/http; msgtype=response", http_block,
        )
        crawltexts.append(crawl)
        safe = (
            text.decode("ascii")
            .replace("<", " ").replace(">", " ").replace("&", " ")
        )
        offices.append(build_docx([[f"Probe {i}"], [safe[:2048]]]))
        offices.append(build_xlsx(
            ["alpha", "beta"],
            [[("s", "0"), ("n", str(i))],
             [("inlineStr", safe[2048:3072]), ("s", "1")]],
        ))
        epubs.append(build_epub(
            f"Book {i}",
            [("c1.xhtml", "<p>" + safe[:2048] + "</p>"),
             ("c2.xhtml", "<p>" + safe[2048:4096] + "</p>")],
        ))
        pdfs.append(_build_pdf15(
            b"BT /F1 12 Tf (" + text[:512].replace(b"(", b" ").replace(
                b")", b" ").replace(b"\\", b" ") + b") Tj ET"
        ))
        # r15 lane: legacy binary Office through the full CFB walk
        legacy.append(build_doc(
            [(f"Probe {i} ", True), (safe[:2048], False)]
        ))
        legacy.append(build_xls(
            ["alpha", safe[2048:3072] or "beta", str(i)], split_in=1,
            cells=[0, 1, 2, 1],
        ))
        legacy.append(build_ppt([[f"Deck {i}", safe[:1024]],
                                 [safe[1024:2048]]]))
    return (images, audio, video, anim, probes, blobs, envelopes,
            archives, mails, crawltexts, offices, epubs, pdfs, legacy)


def _warc_record_ct(rec_type: str, uri: str, ctype: str, block: bytes) -> bytes:
    return (
        (
            f"WARC/1.0\r\nWARC-Type: {rec_type}\r\n"
            "WARC-Record-ID: <urn:uuid:00000000-0000-4000-8000-0000000000pp>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {len(block)}\r\n\r\n"
        ).encode()
        + block
        + b"\r\n\r\n"
    )


def _time(df_builder, frame):
    t = time.perf_counter()
    n = df_builder(frame).count()
    return n, time.perf_counter() - t


def main() -> None:
    n_per = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    spark = get_spark("decode-probe", cpus=32, shuffle_partitions=32)
    corpora = _corpus(n_per)
    from flink_hiveorc_spark.functions.archive import (
        archive_member_stats,
        web_archive_stats,
    )
    from flink_hiveorc_spark.functions.mail import mail_part_stats
    from flink_hiveorc_spark.functions.charset import (
        web_archive_text_records,
    )
    from flink_hiveorc_spark.functions.office import epub_stats, office_stats
    from flink_hiveorc_spark.functions.pdf import pdf_stats
    from flink_hiveorc_spark.functions.cfb import legacy_office_stats

    lanes = [
        ("image", corpora[0], image_stats),
        ("audio", corpora[1], audio_stats),
        ("video", corpora[2], video_stats),
        ("gif_anim_frames", corpora[3], lambda df: gif_frame_sample(df, every_n=2)),
        ("probe", corpora[4], media_probe),
        ("decompress", corpora[5], decompress_stats),
        # r13 envelope lanes
        ("warc", corpora[6], web_archive_stats),
        ("archive", corpora[7], archive_member_stats),
        ("mail", corpora[8], mail_part_stats),
        # r14 lanes
        ("crawltext", corpora[9], web_archive_text_records),
        ("office", corpora[10], office_stats),
        ("epub", corpora[11], epub_stats),
        ("pdf", corpora[12], pdf_stats),
        # r15 lane
        ("legacy_office", corpora[13], legacy_office_stats),
    ]
    out = {"n_per_format": n_per, "scales": {}}
    for scale in (1, 8):
        stats = {}
        for name, payloads, featurize in lanes:
            rows = [(i, bytearray(p)) for i in range(scale) for p in payloads]
            df = spark.createDataFrame(
                rows, "doc_id long, payload binary"
            ).repartition(64).cache()
            df.count()  # materialize cache out of the timer
            mb = sum(len(p) for p in payloads) * scale / 1e6
            n, t = _time(featurize, df)
            stats[name] = {
                "rows": n,
                "sec": round(t, 2),
                "rows_per_s": round(n / t),
                "mb_per_s": round(mb / t, 1),
            }
            df.unpersist()
        out["scales"][f"{scale}x"] = stats
    s1 = out["scales"]["1x"]
    s8 = out["scales"]["8x"]
    out["scale_ratio"] = {
        name: round(s8[name]["sec"] / s1[name]["sec"], 2) for name, _, _ in lanes
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
