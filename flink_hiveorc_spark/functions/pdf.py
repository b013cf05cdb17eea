"""PDF structural probe + simple-text extraction — after HTML, the
highest-frequency document format an LLM curation pipeline ingests
(academic papers, reports). Scope is stated honestly:

- STRUCTURE (always): header version, xref walk with per-entry
  offset VERIFICATION (every in-use entry must point at its
  `N G obj` header — a corrupted or lying xref classifies as
  malformed, never a silent partial parse), trailer /Size /Root,
  object/stream/page counts. BOTH cross-reference flavors are real:
  the classic `xref` table (PDF 1.0-1.4) AND the PDF 1.5+
  cross-reference STREAM (ISO 32000-1 §7.5.8: /W-array column
  widths, big-endian fields, /Index subsections, PNG Up/Sub/…
  row predictors reused from the PNG engine's unfilter, /Prev
  chains) with OBJECT STREAMS (§7.5.7: /N member pairs + /First,
  members verified against the header's object numbers) — the
  majority shape of real-world PDFs (Chrome/Word/LaTeX output).
- TEXT (the simple-text subset): content streams that are plain or
  compressed with any chain of the transform filters — FlateDecode
  (stdlib zlib), ASCIIHexDecode, ASCII85Decode, RunLengthDecode,
  LZWDecode (§7.4: own MSB-first dictionary coder with the
  /EarlyChange width schedule) — all output-capped, with literal
  `(...) Tj` / `[(..) ..] TJ` show operators inside BT/ET, PDF
  string escapes (\\( \\) \\\\ \\n \\r \\t \\ddd octal), and HEX
  strings `<48656C6C6F>` (§7.3.4.3: whitespace skipped, odd digit
  count padded with a trailing 0 — pure framing, no font machinery)
  shown the same way. Image-codec filters (DCTDecode/JPX/CCITT/
  JBIG2) mark image XObjects: counted as streams, skipped as
  opaque — never a document failure. Encrypted PDFs (/Encrypt in
  the trailer) classify as unsupported ("encrypted"), not
  malformed. Indirect ``/Length N 0 R`` on content streams (what
  most real writers emit) resolves through the referenced integer
  object wherever it lies in the file. Anything beyond — CID/Type0
  composite fonts, per-glyph encodings — raises NotImplementedError:
  decoding those without the font machinery silently yields
  mojibake, the failure class the decode contract forbids (same
  policy as the MP3 analysis, SURVEY.md r12).

Reference repo has no document surface (SURVEY.md §0); need comes
from BASELINE.json's LLM-curation envelope.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_hiveorc_spark.catalog import load_table, parallelize_small_scan
from flink_hiveorc_spark.registry import query

MAX_PDF_STREAM_BYTES = 1 << 26  # shared budget (== MAX_DECOMPRESSED_BYTES)

_OBJ_RE = re.compile(rb"(\d+) 0 obj")
_XREF_ENTRY_RE = re.compile(rb"^(\d{10}) (\d{5}) ([nf])\s*$")
_STRING_ESCAPES = {
    ord("n"): b"\n",
    ord("r"): b"\r",
    ord("t"): b"\t",
    ord("b"): b"\b",
    ord("f"): b"\f",
    ord("("): b"(",
    ord(")"): b")",
    ord("\\"): b"\\",
}


def _pdf_string(body: bytes, pos: int) -> tuple[bytes, int]:
    """Parse a literal PDF string starting at the '(' at `pos`;
    returns (decoded bytes, index past the closing ')'). Balanced
    unescaped parens nest per spec."""
    out = bytearray()
    depth = 1
    i = pos + 1
    while i < len(body):
        c = body[i]
        if c == 0x5C:  # backslash
            if i + 1 >= len(body):
                raise ValueError("PDF string ends inside an escape")
            nxt = body[i + 1]
            if nxt in _STRING_ESCAPES:
                out += _STRING_ESCAPES[nxt]
                i += 2
            elif 0x30 <= nxt <= 0x37:  # octal, up to 3 digits
                j = i + 1
                oct_digits = b""
                while j < len(body) and len(oct_digits) < 3 and 0x30 <= body[j] <= 0x37:
                    oct_digits += bytes([body[j]])
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
            else:  # backslash before anything else: drop the backslash
                out.append(nxt)
                i += 2
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    raise ValueError("unterminated PDF string")


_HEX_DIGITS = frozenset(b"0123456789abcdefABCDEF")


def _pdf_hex_string(body: bytes, pos: int) -> tuple[bytes, int]:
    """Parse a hex string starting at the '<' at `pos` → (decoded
    bytes, index past '>'). Whitespace inside is skipped; an odd
    digit count pads a trailing 0 (ISO 32000-1 §7.3.4.3); any other
    byte is malformed."""
    digits = bytearray()
    i = pos + 1
    while i < len(body):
        c = body[i]
        if c == 0x3E:  # >
            if len(digits) % 2:
                digits.append(0x30)
            return bytes.fromhex(digits.decode("ascii")), i + 1
        if c in _HEX_DIGITS:
            digits.append(c)
        elif c not in b"\x00\t\n\x0c\r ":
            raise ValueError(
                f"non-hex byte {bytes([c])!r} inside a PDF hex string"
            )
        i += 1
    raise ValueError("unterminated PDF hex string")


def _skip_pdf_dict(content: bytes, i: int) -> int:
    """Skip a balanced ``<< ... >>`` dictionary starting at `i`.
    Nested dicts, literal strings, and hex strings inside are skipped
    atomically (a '>' inside a string must not close the dict).
    → index just past the closing ``>>``."""
    depth = 0
    while i < len(content):
        two = content[i : i + 2]
        if two == b"<<":
            depth += 1
            i += 2
            continue
        if two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return i
            continue
        c = content[i]
        if c == 0x28:  # literal string
            _, i = _pdf_string(content, i)
            continue
        if c == 0x3C:  # lone '<' inside the dict → hex string
            _, i = _pdf_hex_string(content, i)
            continue
        i += 1
    raise ValueError("unterminated PDF dictionary")


def _extract_text(content: bytes) -> list[bytes]:
    """Literal strings shown via Tj / TJ inside BT..ET blocks, in
    stream order. The ET terminator is scanned with string literals
    SKIPPED — shown text containing the bytes 'ET' (or 'Tj') must
    not truncate the block / flush operators (a real corpus hit:
    any string with consecutive capitals E,T misclassified the PDF
    as malformed before r14)."""
    shown: list[bytes] = []
    pos = 0
    while True:
        bt = content.find(b"BT", pos)
        if bt < 0:
            break
        i = bt + 2
        pending: list[bytes] = []
        closed = False
        while i < len(content):
            if content[i] == 0x28:  # string literal — skip atomically
                s, i = _pdf_string(content, i)
                pending.append(s)
                continue
            if content[i] == 0x3C:
                if content[i : i + 2] == b"<<":
                    # marked-content property dict — tagged PDFs emit
                    # '/P <</MCID 0>> BDC' inside BT; it is an operand,
                    # not shown text, and its bytes must not be read
                    # as a hex string
                    i = _skip_pdf_dict(content, i)
                    continue
                s, i = _pdf_hex_string(content, i)  # hex string — shown
                pending.append(s)
                continue
            two = content[i : i + 2]
            if two in (b"Tj", b"TJ"):
                if pending:
                    shown.extend(pending)
                    pending = []
                i += 2
                continue
            if two == b"ET":
                closed = True
                i += 2
                break
            i += 1
        if not closed:
            raise ValueError("BT without matching ET in content stream")
        pos = i
    return shown


# ---------------------------------------------- PDF object syntax

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


def _skip_ws(src: bytes, i: int) -> int:
    while i < len(src) and src[i : i + 1] in (
        b"\x00", b"\t", b"\n", b"\x0c", b"\r", b" "
    ):
        i += 1
    return i


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_REF_RE = re.compile(rb"\s+(\d+)\s+R(?![A-Za-z0-9])")


def _parse_pdf_value(src: bytes, i: int):
    """Minimal PDF object parser for the dictionary subset xref/ObjStm
    machinery needs: dicts, arrays, names, numbers, indirect refs,
    booleans/null. → (value, next index). Refs become ('ref', num,
    gen) tuples; names become strings without the slash."""
    i = _skip_ws(src, i)
    if src[i : i + 2] == b"<<":
        d: dict = {}
        i += 2
        while True:
            i = _skip_ws(src, i)
            if src[i : i + 2] == b">>":
                return d, i + 2
            if src[i : i + 1] != b"/":
                raise ValueError(
                    f"PDF dict key is not a name at offset {i}"
                )
            key, i = _parse_pdf_value(src, i)
            val, i = _parse_pdf_value(src, i)
            d[key] = val
    if src[i : i + 1] == b"[":
        arr: list = []
        i += 1
        while True:
            i = _skip_ws(src, i)
            if src[i : i + 1] == b"]":
                return arr, i + 1
            v, i = _parse_pdf_value(src, i)
            arr.append(v)
    if src[i : i + 1] == b"/":
        j = i + 1
        while j < len(src) and src[j] not in _WS and src[j] not in _DELIM:
            j += 1
        return src[i + 1 : j].decode("ascii", "replace"), j
    if src[i : i + 4] == b"true":
        return True, i + 4
    if src[i : i + 5] == b"false":
        return False, i + 5
    if src[i : i + 4] == b"null":
        return None, i + 4
    nm = _NUM_RE.match(src, i)
    if nm:
        tok = nm.group(0)
        j = nm.end()
        if b"." not in tok:
            rm = _REF_RE.match(src, j)
            if rm:
                return ("ref", int(tok), int(rm.group(1))), rm.end()
            return int(tok), j
        return float(tok), j
    raise ValueError(f"unparseable PDF value at offset {i}: {src[i:i+16]!r}")


def _apply_predictor(
    data: bytes, predictor: int, columns: int, colors: int, bpc: int
) -> bytes:
    """Reverse the /DecodeParms row predictor on decoded stream data
    (ISO 32000-1 §7.4.4.4). Predictor 1 = none; 2 = TIFF horizontal
    differencing (8-bit only); 10-15 = the PNG filters with a
    per-row filter-type byte — reversed by the PNG engine's
    _png_unfilter (the same Up/Sub/Average/Paeth code paths PNG
    decode already pins)."""
    import numpy as np

    if predictor == 1:
        return data
    bpp = max(1, (colors * bpc) // 8)
    row_bytes = (columns * colors * bpc + 7) // 8
    if predictor == 2:
        if bpc != 8:
            raise NotImplementedError(
                "TIFF predictor with BitsPerComponent != 8"
            )
        if len(data) % row_bytes:
            raise ValueError("predictor data is not a whole row multiple")
        arr = np.frombuffer(data, dtype=np.uint8).reshape(-1, row_bytes)
        out = arr.astype(np.int64)
        for lane in range(bpp):
            out[:, lane::bpp] = np.cumsum(out[:, lane::bpp], axis=1) % 256
        return out.astype(np.uint8).tobytes()
    if 10 <= predictor <= 15:
        from flink_hiveorc_spark.functions.multimodal import _png_unfilter

        stride = row_bytes
        if len(data) % (stride + 1):
            raise ValueError(
                "PNG-predictor data is not a whole (1+row) multiple"
            )
        rows = np.frombuffer(data, dtype=np.uint8).reshape(-1, stride + 1)
        return _png_unfilter(rows, stride, bpp).tobytes()
    raise NotImplementedError(f"/Predictor {predictor}")


# --------------------------------------------- stream filter codecs
#
# ISO 32000-1 §7.4. FlateDecode plus the four "trivial transform"
# filters a text pipeline actually meets outside image XObjects:
# ASCIIHex/ASCII85 (transport armor), RunLength, and LZW (the same
# dictionary coder as TIFF §13 — MSB-first, clear=256/EOD=257, with
# the /EarlyChange width schedule). Image-codec filters (DCTDecode
# JPEG, JPXDecode, CCITTFax, JBIG2) mark IMAGE streams — those are
# counted but never text, so the scan skips them as opaque instead
# of failing the whole document; genuinely unknown names still gate.

_IMAGE_FILTERS = {"DCTDecode", "DCT", "JPXDecode", "CCITTFaxDecode",
                  "CCF", "JBIG2Decode"}
_HEX_DIGITS = b"0123456789abcdefABCDEF"
_PDF_WS = b"\x00\t\n\x0c\r "


def _ascii_hex_decode(body: bytes) -> bytes:
    """§7.4.2: hex pairs, whitespace ignored, `>` is EOD, an odd
    trailing digit acts as if followed by 0."""
    digits = bytearray()
    for b in body:
        if b == 0x3E:  # '>'
            break
        if b in _PDF_WS:
            continue
        if b not in _HEX_DIGITS:
            raise ValueError(f"ASCIIHexDecode: non-hex byte {b:#x}")
    else:
        raise ValueError("ASCIIHexDecode stream lacks the > EOD")
    for b in body[: body.index(b">")]:
        if b not in _PDF_WS:
            digits.append(b)
    if len(digits) % 2:
        digits.append(ord("0"))
    return bytes.fromhex(digits.decode("ascii"))


def _ascii85_decode(body: bytes) -> bytes:
    """§7.4.3: 5 chars '!'..'u' encode 4 bytes base-85 big-endian,
    `z` is the all-zero group shorthand (only between groups), `~>`
    is EOD, whitespace ignored; a trailing partial group of n chars
    yields n-1 bytes (decoded high-first)."""
    out = bytearray()
    group: list[int] = []
    i, n = 0, len(body)
    while True:
        if i >= n:
            raise ValueError("ASCII85Decode stream lacks the ~> EOD")
        b = body[i]
        if b == 0x7E:  # '~'
            if body[i : i + 2] != b"~>":
                raise ValueError("ASCII85Decode: bare ~ without >")
            break
        i += 1
        if b in _PDF_WS:
            continue
        if b == 0x7A:  # 'z'
            if group:
                raise ValueError("ASCII85Decode: z inside a group")
            out += b"\x00\x00\x00\x00"
            continue
        if not 0x21 <= b <= 0x75:  # '!'..'u'
            raise ValueError(f"ASCII85Decode: byte {b:#x} out of range")
        group.append(b - 0x21)
        if len(group) == 5:
            acc = 0
            for d in group:
                acc = acc * 85 + d
            if acc > 0xFFFFFFFF:
                raise ValueError("ASCII85Decode: group overflows 2^32")
            out += acc.to_bytes(4, "big")
            group = []
    if group:
        if len(group) == 1:
            raise ValueError("ASCII85Decode: lone trailing digit")
        k = len(group)
        acc = 0
        for d in group + [84] * (5 - k):  # pad with 'u' per spec
            acc = acc * 85 + d
        if acc > 0xFFFFFFFF:
            raise ValueError("ASCII85Decode: group overflows 2^32")
        out += acc.to_bytes(4, "big")[: k - 1]
    return bytes(out)


def _run_length_decode(body: bytes) -> bytes:
    """§7.4.5: length byte L — 0..127 copies the next L+1 bytes
    literally, 129..255 repeats the next byte 257-L times, 128 is
    EOD. Output is budget-capped (a 2-byte record expands ≤128×, so
    the cap also bounds work)."""
    out = bytearray()
    i, n = 0, len(body)
    while True:
        if i >= n:
            raise ValueError("RunLengthDecode stream lacks the 128 EOD")
        L = body[i]
        i += 1
        if L == 128:
            return bytes(out)
        if L < 128:
            chunk = body[i : i + L + 1]
            if len(chunk) != L + 1:
                raise ValueError("RunLengthDecode literal run truncated")
            out += chunk
            i += L + 1
        else:
            if i >= n:
                raise ValueError("RunLengthDecode repeat run truncated")
            out += bytes([body[i]]) * (257 - L)
            i += 1
        if len(out) > MAX_PDF_STREAM_BYTES:
            raise ValueError("RunLengthDecode output exceeds the budget")


def _lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """§7.4.4: the TIFF-variant LZW dictionary coder — 8-bit codes,
    MSB-first packing, clear=256/EOD=257, width grows at table size
    2^width − EarlyChange (default 1, the same early schedule as
    TIFF §13; EarlyChange=0 grows a code later). Output capped at
    the shared stream budget (bomb guard). Independent of the
    TIFF engine because PDF has no expected-size side channel."""
    clear, end = 256, 257
    base: list = [bytes([i]) for i in range(256)] + [b"", b""]
    table = base.copy()
    width = 9
    out = bytearray()
    buf = nbits = pos = 0
    prev = None
    while True:
        while nbits < width and pos < len(data):
            buf = (buf << 8) | data[pos]
            nbits += 8
            pos += 1
        if nbits < width:
            break
        code = (buf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        buf &= (1 << nbits) - 1
        if code == clear:
            table = base.copy()
            width = 9
            prev = None
            continue
        if code == end:
            return bytes(out)
        if code < len(table) and (code < 256 or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(
                f"bad PDF-LZW code {code} (table size {len(table)})"
            )
        out += entry
        if len(out) > MAX_PDF_STREAM_BYTES:
            raise ValueError("LZWDecode output exceeds the budget")
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        if len(table) == (1 << width) - early_change and width < 12:
            width += 1
        prev = entry
    raise ValueError("LZWDecode stream lacks the EOD code")


def _flate_decode(body: bytes) -> bytes:
    import zlib

    try:
        dec = zlib.decompressobj()
        out = dec.decompress(body, MAX_PDF_STREAM_BYTES)
        if dec.unconsumed_tail:
            raise ValueError("PDF Flate stream exceeds the budget")
    except zlib.error as e:
        raise ValueError(f"malformed Flate stream: {e}") from e
    return out


def _apply_filters(
    body: bytes, filters: list[str], parms_list: list[dict | None]
) -> bytes:
    """Run a /Filter chain left-to-right (§7.4: the writing order,
    so decoding applies first-listed first), each filter's
    /DecodeParms predictor reversed right after it."""
    for name, parms in zip(filters, parms_list):
        if name in ("FlateDecode", "Fl"):
            body = _flate_decode(body)
        elif name in ("ASCIIHexDecode", "AHx"):
            body = _ascii_hex_decode(body)
        elif name in ("ASCII85Decode", "A85"):
            body = _ascii85_decode(body)
        elif name in ("RunLengthDecode", "RL"):
            body = _run_length_decode(body)
        elif name in ("LZWDecode", "LZW"):
            ec = 1
            if isinstance(parms, dict):
                ec = int(parms.get("EarlyChange", 1))
            if ec not in (0, 1):
                raise ValueError(f"LZWDecode /EarlyChange {ec}")
            body = _lzw_decode(body, early_change=ec)
        else:
            raise NotImplementedError(
                f"PDF stream filter {name} (needs codec)"
            )
        if isinstance(parms, dict) and "Predictor" in parms:
            body = _apply_predictor(
                body,
                int(parms["Predictor"]),
                int(parms.get("Columns", 1)),
                int(parms.get("Colors", 1)),
                int(parms.get("BitsPerComponent", 8)),
            )
    return body


def _read_stream_object(payload: bytes, off: int) -> tuple[int, int, dict, bytes]:
    """Parse `N G obj << dict >> stream ... endstream` at `off` →
    (objnum, gen, dict, DECODED stream bytes: the /Filter chain
    applied under the budget, predictors reversed). Used for xref
    streams and object streams, where /Length is literal by
    construction of the writers that emit them (and gated honestly
    when indirect)."""
    hm = re.match(rb"(\d+)\s+(\d+)\s+obj\b", payload[off : off + 48])
    if not hm:
        raise ValueError(f"offset {off} is not an object header")
    objnum, gen = int(hm.group(1)), int(hm.group(2))
    d, j = _parse_pdf_value(payload, off + hm.end())
    if not isinstance(d, dict):
        raise ValueError(f"object {objnum} is not a dictionary")
    j = _skip_ws(payload, j)
    if payload[j : j + 6] != b"stream":
        raise ValueError(f"object {objnum} lacks a stream keyword")
    j += 6
    if payload[j : j + 2] == b"\r\n":
        j += 2
    elif payload[j : j + 1] == b"\n":
        j += 1
    n = d.get("Length")
    if not isinstance(n, int):
        raise NotImplementedError(
            f"object {objnum} has a non-literal /Length (indirect "
            "lengths need full object resolution)"
        )
    if n > MAX_PDF_STREAM_BYTES:
        raise ValueError(
            f"PDF stream declares {n} bytes > {MAX_PDF_STREAM_BYTES} "
            "(bomb guard)"
        )
    body = payload[j : j + n]
    if len(body) != n:
        raise ValueError("PDF stream overruns the payload")
    filt = d.get("Filter")
    parms = d.get("DecodeParms") or d.get("DP")
    if filt is not None:
        filters = filt if isinstance(filt, list) else [filt]
        parms_list = (
            parms
            if isinstance(parms, list)
            else [parms] * len(filters)
        )
        if len(parms_list) != len(filters):
            raise ValueError(
                "/DecodeParms array length does not match /Filter"
            )
        body = _apply_filters(body, filters, parms_list)
    elif isinstance(parms, dict) and "Predictor" in parms:
        body = _apply_predictor(
            body,
            int(parms["Predictor"]),
            int(parms.get("Columns", 1)),
            int(parms.get("Colors", 1)),
            int(parms.get("BitsPerComponent", 8)),
        )
    return objnum, gen, d, body


_MAX_XREF_SECTIONS = 64


def _parse_xref_stream_chain(
    payload: bytes, xref_off: int
) -> tuple[dict[int, tuple], dict]:
    """Walk the /Prev chain of cross-reference streams starting at
    `xref_off` → ({objnum: (type, field2, field3)}, the FIRST
    section's dict — which doubles as the trailer per §7.5.8).
    Newer sections win on objnum collisions (incremental updates);
    the chain is loop-guarded."""
    entries: dict[int, tuple] = {}
    trailer: dict | None = None
    seen: set[int] = set()
    off = xref_off
    while off is not None:
        if off in seen or len(seen) >= _MAX_XREF_SECTIONS:
            raise ValueError("xref /Prev chain loops or is too deep")
        seen.add(off)
        objnum, _gen, d, data = _read_stream_object(payload, off)
        if d.get("Type") != "XRef":
            raise ValueError(
                f"object {objnum} at startxref is not /Type /XRef"
            )
        w = d.get("W")
        if (
            not isinstance(w, list)
            or len(w) != 3
            or not all(isinstance(x, int) and 0 <= x <= 8 for x in w)
        ):
            raise ValueError(f"bad xref stream /W {w!r}")
        # §7.5.8.2: zero-width fields take their default — field 1
        # defaults to type 1, field 3 to 0 — but field 2 (the offset /
        # ObjStm number) has no default; a zero width there makes
        # every entry meaningless.
        if w[1] == 0:
            raise ValueError("xref stream /W field 2 has zero width")
        size = d.get("Size")
        if not isinstance(size, int):
            raise ValueError("xref stream lacks /Size")
        index = d.get("Index", [0, size])
        if not isinstance(index, list) or len(index) % 2:
            raise ValueError(f"bad xref stream /Index {index!r}")
        row = sum(w)
        if row == 0 or len(data) % row:
            raise ValueError(
                f"xref stream data ({len(data)} bytes) is not a "
                f"multiple of the /W row width ({row})"
            )
        n_rows = len(data) // row
        if n_rows != sum(index[i + 1] for i in range(0, len(index), 2)):
            raise ValueError("xref stream /Index disagrees with data size")
        pos = 0
        for i in range(0, len(index), 2):
            start, count = index[i], index[i + 1]
            for k in range(count):
                fields = []
                for width in w:
                    fields.append(
                        int.from_bytes(data[pos : pos + width], "big")
                        if width
                        else 0
                    )
                    pos += width
                # a zero-width type field defaults to type 1 (§7.5.8.3)
                etype = fields[0] if w[0] else 1
                objnum_k = start + k
                if objnum_k not in entries:  # newer sections win
                    entries[objnum_k] = (etype, fields[1], fields[2])
        if trailer is None:
            trailer = d
        off = d.get("Prev")
        if off is not None and not isinstance(off, int):
            raise ValueError("xref stream /Prev is not an offset")
    assert trailer is not None
    return entries, trailer


def _parse_objstm(payload: bytes, off: int, expected_num: int) -> list[tuple[int, bytes]]:
    """Parse the object stream at `off` → [(objnum, body bytes)] per
    §7.5.7: the decoded stream is /N (objnum, offset) integer pairs
    followed by the member objects at /First + offset."""
    objnum, _gen, d, data = _read_stream_object(payload, off)
    if objnum != expected_num:
        raise ValueError(
            f"xref entry says object stream {expected_num} lives at "
            f"offset {off}, but that is object {objnum}"
        )
    if d.get("Type") != "ObjStm":
        raise ValueError(f"object {objnum} is not /Type /ObjStm")
    n, first = d.get("N"), d.get("First")
    if not isinstance(n, int) or not isinstance(first, int):
        raise ValueError("ObjStm lacks integer /N or /First")
    header = data[:first]
    pairs = header.split()
    if len(pairs) < 2 * n:
        raise ValueError("ObjStm header has fewer pairs than /N")
    nums = [int(pairs[2 * i]) for i in range(n)]
    offs = [int(pairs[2 * i + 1]) for i in range(n)]
    if offs != sorted(offs):
        raise ValueError("ObjStm member offsets are not ascending")
    members = []
    for i in range(n):
        lo = first + offs[i]
        hi = first + offs[i + 1] if i + 1 < n else len(data)
        if hi > len(data):
            raise ValueError("ObjStm member overruns the stream")
        members.append((nums[i], data[lo:hi]))
    return members


def parse_pdf(payload: bytes) -> dict:
    """Structural parse + simple-text extraction (see module doc)."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload (missing %PDF- header)")
    if b"%%EOF" not in payload[-64:]:
        raise ValueError("PDF lacks the %%EOF trailer")
    sx = payload.rfind(b"startxref")
    if sx < 0:
        raise ValueError("PDF lacks startxref")
    m = re.search(rb"startxref\s+(\d+)", payload[sx:])
    if not m:
        raise ValueError("malformed startxref")
    xref_off = int(m.group(1))
    n_objects = 0
    objstm_pages = 0
    if payload[xref_off : xref_off + 4] == b"xref":
        # classic xref subsections
        lines = payload[xref_off:].split(b"\n")
        li = 1
        while li < len(lines):
            header = lines[li].strip()
            if header.startswith(b"trailer") or not header:
                break
            hm = re.match(rb"^(\d+) (\d+)$", header)
            if not hm:
                raise ValueError(
                    f"malformed xref subsection header {header!r}"
                )
            start, count = int(hm.group(1)), int(hm.group(2))
            li += 1
            for k in range(count):
                em = _XREF_ENTRY_RE.match(lines[li].strip())
                if not em:
                    raise ValueError(f"malformed xref entry {lines[li]!r}")
                off, _gen, kind = int(em.group(1)), em.group(2), em.group(3)
                if kind == b"n":
                    want = f"{start + k} 0 obj".encode()
                    if payload[off : off + len(want)] != want:
                        raise ValueError(
                            f"xref entry for object {start + k} points at "
                            f"offset {off}, which is not its header"
                        )
                    n_objects += 1
                li += 1
        tm = re.search(rb"trailer\s*<<(.*?)>>", payload[xref_off:], re.S)
        if not tm or b"/Root" not in tm.group(1):
            raise ValueError("PDF trailer lacks /Root")
        if b"/Encrypt" in tm.group(1):
            # classify BEFORE the stream scan: encrypted stream
            # bodies are ciphertext and would misreport as malformed
            raise NotImplementedError(
                "encrypted PDF (/Encrypt in trailer — needs the "
                "standard security handler)"
            )
    elif _OBJ_RE.match(payload[xref_off:]):
        # PDF 1.5+ cross-reference stream (+ object streams)
        entries, trailer = _parse_xref_stream_chain(payload, xref_off)
        if "Root" not in trailer:
            raise ValueError("xref stream trailer lacks /Root")
        if "Encrypt" in trailer:
            raise NotImplementedError(
                "encrypted PDF (/Encrypt in trailer — needs the "
                "standard security handler)"
            )
        # verify type-1 entries against the headers they point at,
        # and group type-2 entries per object stream
        by_objstm: dict[int, list[tuple[int, int]]] = {}
        for num, (etype, f2, f3) in sorted(entries.items()):
            if etype == 0:
                continue  # free
            if etype == 1:
                gen = f3 if f3 is not None else 0
                want = f"{num} {gen} obj".encode()
                if payload[f2 : f2 + len(want)] != want:
                    raise ValueError(
                        f"xref entry for object {num} points at offset "
                        f"{f2}, which is not its header"
                    )
                n_objects += 1
            elif etype == 2:
                by_objstm.setdefault(f2, []).append((f3, num))
            else:
                raise ValueError(f"xref entry type {etype} is unknown")
        for stm_num, want_members in by_objstm.items():
            se = entries.get(stm_num)
            if se is None or se[0] != 1:
                raise ValueError(
                    f"object stream {stm_num} has no in-use type-1 "
                    "xref entry"
                )
            members = _parse_objstm(payload, se[1], stm_num)
            for idx, num in want_members:
                if idx is None or idx >= len(members) or members[idx][0] != num:
                    raise ValueError(
                        f"xref says object {num} is member {idx} of "
                        f"object stream {stm_num}, but the ObjStm header "
                        "disagrees"
                    )
                n_objects += 1
                objstm_pages += len(
                    re.findall(rb"/Type\s*/Page[^s]", members[idx][1])
                )
    else:
        raise ValueError("startxref does not point at an xref table")
    # streams: << dict >> stream\n ... endstream, /Length mandatory.
    # Scanned by locating each `stream` keyword and looking BACK a
    # bounded window for its dict — a single lazy `<<(.*?)>>\s*stream`
    # regex over the whole payload backtracks quadratically on
    # adversarial `<<<<...` input (CPU-exhaustion class); this walk is
    # linear. 4 KB bounds any realistic stream dict.
    n_streams = 0
    texts: list[bytes] = []
    spos = 0
    while True:
        sk = payload.find(b"stream", spos)
        if sk < 0:
            break
        spos = sk + 6
        body_start = sk + 6
        if payload[body_start : body_start + 2] == b"\r\n":
            body_start += 2
        elif payload[body_start : body_start + 1] == b"\n":
            body_start += 1
        else:
            continue  # 'endstream', '/XRefStm', ... — not the keyword
        window = payload[max(0, sk - 4096) : sk]
        dc = window.rfind(b">>")
        if dc < 0 or window[dc + 2 :].strip():
            continue  # no adjacent dict: not a stream object
        # walk BACKWARD to the matching `<<` counting nesting depth —
        # a plain rfind(b"<<") lands on the innermost nested dict
        # (/DecodeParms << ... >>, /Resources << /Font << ... >> >>)
        # and truncates the stream dict
        depth, j, do = 1, dc - 1, -1
        while j >= 0:
            pair = window[j : j + 2]
            if pair == b">>":
                depth += 1
                j -= 2
            elif pair == b"<<":
                depth -= 1
                if depth == 0:
                    do = j
                    break
                j -= 2
            else:
                j -= 1
        if do < 0:
            continue  # unbalanced: not a stream object dict
        d = window[do + 2 : dc]
        im = re.search(rb"/Length\s+(\d+)\s+(\d+)\s+R(?![A-Za-z0-9])", d)
        if im:
            # indirect /Length — what most real writers emit (the
            # length is unknown until the stream is serialized, so
            # it lands in a separate integer object, often AFTER the
            # stream). Resolve it: find `N G obj` anywhere in the
            # payload (digit-boundary-guarded) whose body is a plain
            # integer.
            num, gen = int(im.group(1)), int(im.group(2))
            n = None
            for om in re.finditer(
                rb"(?<![0-9])%d %d obj\b" % (num, gen), payload
            ):
                vm = re.match(
                    rb"\s*(\d+)\s*endobj", payload[om.end() : om.end() + 64]
                )
                if vm:
                    n = int(vm.group(1))
                    break
            if n is None:
                raise ValueError(
                    f"indirect /Length {num} {gen} R does not resolve "
                    "to an integer object"
                )
        else:
            lm = re.search(rb"/Length\s+(\d+)", d)
            if not lm:
                raise ValueError("content stream lacks a literal /Length")
            n = int(lm.group(1))
        if n > MAX_PDF_STREAM_BYTES:
            raise ValueError(
                f"PDF stream declares {n} bytes > {MAX_PDF_STREAM_BYTES} "
                "(bomb guard)"
            )
        body = payload[body_start : body_start + n]
        if len(body) != n:
            raise ValueError("PDF stream overruns the payload")
        # jump past the body AND its endstream keyword: Flate bytes
        # inside the body can contain '<<..>>' + 'stream\n' lookalikes
        # that would inflate n_streams or raise a spurious /Length
        # error if the scan re-entered them
        end_kw = payload.find(b"endstream", body_start + n)
        spos = end_kw + 9 if end_kw >= 0 else body_start + n
        n_streams += 1
        if re.search(rb"/Type\s*/(XRef|ObjStm)\b", d):
            # xref/object stream data is binary/packed (and carries
            # /Predictor DecodeParms): decoded + verified by the
            # xref-stream walk above, never text — skip here
            continue
        if b"/Filter" in d:
            fm = re.search(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)", d)
            if not fm:
                raise ValueError("unparseable /Filter entry")
            names = [
                n.decode("ascii")
                for n in re.findall(rb"/([A-Za-z0-9]+)", fm.group(1))
            ]
            if any(n in _IMAGE_FILTERS for n in names):
                # image XObject (JPEG/JPX/fax/JBIG2 payload): counted
                # as a stream, never text — skip as opaque rather
                # than failing the document
                continue
            ec = 1
            em = re.search(rb"/EarlyChange\s+(\d+)", d)
            if em:
                ec = int(em.group(1))
            if re.search(rb"/Predictor\s+(?!1\b)\d+", d):
                # content streams don't carry predictors in practice;
                # decoding one without reversing it would extract
                # garbage, so gate honestly
                raise NotImplementedError(
                    "content stream with a /Predictor DecodeParms"
                )
            body = _apply_filters(
                body, names, [{"EarlyChange": ec}] * len(names)
            )
        if b"BT" in body:
            texts.extend(_extract_text(body))
    n_pages = objstm_pages + len(re.findall(rb"/Type\s*/Page[^s]", payload))
    return {
        "n_objects": n_objects,
        "n_pages": n_pages,
        "n_streams": n_streams,
        "pdf_text": b" ".join(texts).decode("latin-1"),
    }


_PDF_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_objects", T.LongType()),
        T.StructField("n_pages", T.LongType()),
        T.StructField("n_streams", T.LongType()),
        T.StructField("pdf_text", T.StringType()),
    ]
)


def pdf_stats(payloads: DataFrame, quarantine: bool = False) -> DataFrame:
    """(doc_id, payload) PDF blobs → structure + extracted simple
    text through the shared featurize-with-DLQ path."""
    from flink_hiveorc_spark.functions.multimodal import _stats_df

    def featurize(payload: bytes) -> dict:
        return parse_pdf(payload)

    return _stats_df(payloads, _PDF_STATS_SCHEMA, featurize, quarantine)


def _build_pdf15(
    content: bytes, predictor: int = 12, prev_of: bytes | None = None
) -> bytes:
    """Independent ENCODER twin for the modern-PDF shape: a PDF 1.5
    file whose catalog/pages/page/font objects live in an ObjStm and
    whose cross-reference is a /W [1 4 2] XRef STREAM (FlateDecode,
    PNG-Up /Predictor 12 by default). Byte offsets are computed from
    the variable `content`, so every fixture is data-dependent. The
    builder composes bytes from the spec top-down and shares no code
    with parse_pdf (the usual twin discipline)."""
    import zlib

    head = b"%PDF-1.5\n"
    o4 = (
        b"4 0 obj\n<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
    )
    members = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (
            3,
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        ),
        (5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ]
    offs, body = [], b""
    for _num, src in members:
        offs.append(len(body))
        body += src + b"\n"
    header = " ".join(
        f"{num} {off}" for (num, _), off in zip(members, offs)
    ).encode() + b"\n"
    stm_data = header + body
    stm_z = zlib.compress(stm_data, 6)
    o6 = (
        b"6 0 obj\n<< /Type /ObjStm /N 4 /First " + str(len(header)).encode()
        + b" /Length " + str(len(stm_z)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + stm_z
        + b"\nendstream\nendobj\n"
    )
    off4 = len(head)
    off6 = off4 + len(o4)
    off7 = off6 + len(o6)
    rows = [
        (0, 0, 65535),  # free head
        (2, 6, 0), (2, 6, 1), (2, 6, 2),   # 1..3 in ObjStm 6
        (1, off4, 0),
        (2, 6, 3),                          # 5 in ObjStm 6
        (1, off6, 0), (1, off7, 0),
    ]
    raw = b"".join(
        t.to_bytes(1, "big") + a.to_bytes(4, "big") + b.to_bytes(2, "big")
        for t, a, b in rows
    )
    cols = 7
    if predictor == 1:
        xdata, parms = raw, b""
    elif predictor == 12:
        prev = bytes(cols)
        filtered = b""
        for i in range(0, len(raw), cols):
            row = raw[i : i + cols]
            filtered += b"\x02" + bytes(
                (c - p) % 256 for c, p in zip(row, prev)
            )
            prev = row
        xdata = filtered
        parms = b" /DecodeParms << /Predictor 12 /Columns 7 >>"
    else:
        raise ValueError(f"builder predictor {predictor}")
    xz = zlib.compress(xdata, 6)
    o7 = (
        b"7 0 obj\n<< /Type /XRef /Size 8 /W [1 4 2] /Root 1 0 R"
        + (b" /Prev " + prev_of if prev_of is not None else b"")
        + b" /Length " + str(len(xz)).encode()
        + b" /Filter /FlateDecode" + parms
        + b" >>\nstream\n" + xz + b"\nendstream\nendobj\n"
    )
    return (
        head + o4 + o6 + o7
        + b"startxref\n" + str(off7).encode() + b"\n%%EOF\n"
    )


_PDF_FLATE_TEXT = "flate constant leg: pdf_stats external oracle"


def _pdf_flate_stream() -> bytes:
    import zlib

    return zlib.compress(
        f"BT /F1 12 Tf 72 720 Td ({_PDF_FLATE_TEXT}) Tj ET".encode(), 6
    )


def _rle_encode(data: bytes) -> bytes:
    """RunLengthDecode ENCODER twin (§7.4.5, written from the encode
    side): repeat records for runs ≥2 (length byte 257-n), literal
    records otherwise, 128 EOD. Shares nothing with
    _run_length_decode."""
    out = bytearray()
    i = 0
    while i < len(data):
        j = i
        while j < len(data) and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 2:
            out += bytes([257 - (j - i), data[i]])
            i = j
            continue
        k = i
        while k < len(data) and k - i < 128:
            if k + 2 < len(data) and data[k] == data[k + 1] == data[k + 2]:
                break
            k += 1
        out += bytes([k - i - 1]) + data[i:k]
        i = k
    out.append(128)
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """LZWDecode ENCODER twin (§7.4.4 / TIFF §13, EarlyChange=1,
    written from the encode side): greedy longest-match dictionary,
    MSB-first bit packing, leading clear code, width grows one code
    early. Shares nothing with _lzw_decode."""
    table = {bytes([i]): i for i in range(256)}
    nxt, width = 258, 9
    bits: list[str] = []

    def emit(code: int) -> None:
        bits.append(format(code, f"0{width}b"))

    emit(256)  # clear
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        emit(table[w])
        if nxt < 4096:
            table[w + c] = nxt
            nxt += 1
        if nxt == (1 << width) and width < 12:  # early: next code needs it
            width += 1
        w = c
    if w:
        emit(table[w])
        # the DECODER conjectures one more entry after this final
        # data code and may widen before reading EOD — mirror that
        # phantom entry or the EOD lands one bit narrow exactly when
        # the table size hits 2^width - 1 (found by the sf0.1
        # cross-scale oracle: 4/1000 corpus docs hit the boundary)
        if nxt < 4096:
            nxt += 1
        if nxt == (1 << width) and width < 12:
            width += 1
    emit(257)  # EOD
    s = "".join(bits)
    s += "0" * (-len(s) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _build_classic_filtered(
    body: bytes,
    filter_clause: bytes,
    indirect_length: bool = False,
) -> bytes:
    """Classic-xref PDF whose object-4 content stream arrives
    PRE-ENCODED by the caller (`body`) with its /Filter clause — the
    filtered-leg twin: offsets/xref/startxref recomputed from the
    variable bytes, mirroring the JVM classic builder. With
    ``indirect_length`` the stream dict says ``/Length 6 0 R`` and
    the integer lands in object 6 AFTER the stream — the real-writer
    shape."""
    head = b"%PDF-1.4\n"
    o1 = b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    o2 = b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
    o3 = (
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>\n"
        b"endobj\n"
    )
    length_tok = (
        b"6 0 R" if indirect_length else str(len(body)).encode()
    )
    o4 = (
        b"4 0 obj\n<< /Length " + length_tok
        + b" /Filter " + filter_clause + b" >>\nstream\n"
        + body + b"\nendstream\nendobj\n"
    )
    o5 = (
        b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b">>\nendobj\n"
    )
    objs = [o1, o2, o3, o4, o5]
    if indirect_length:
        objs.append(
            b"6 0 obj\n" + str(len(body)).encode() + b"\nendobj\n"
        )
    offs = []
    acc = len(head)
    for o in objs:
        offs.append(acc)
        acc += len(o)
    n_ent = len(objs) + 1
    xref = (
        b"xref\n0 " + str(n_ent).encode()
        + b"\n0000000000 65535 f \n"
        + b"".join(
            f"{off:010d}".encode() + b" 00000 n \n" for off in offs
        )
    )
    return (
        head + b"".join(objs) + xref
        + b"trailer\n<< /Size " + str(n_ent).encode()
        + b" /Root 1 0 R >>\nstartxref\n"
        + str(acc).encode() + b"\n%%EOF\n"
    )


@query(
    "multimodal_pdf_stats",
    oracle=f"""
    SELECT doc_id,
           CASE doc_id % 5 WHEN 2 THEN CAST(7 AS BIGINT)
                WHEN 3 THEN CAST(6 AS BIGINT)
                ELSE CAST(5 AS BIGINT) END AS n_objects,
           CAST(1 AS BIGINT) AS n_pages,
           CASE doc_id % 5 WHEN 2 THEN CAST(3 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS n_streams,
           CASE doc_id % 5
                WHEN 0 THEN 'Doc ' || doc_id || ' ' || source || ' ' || text
                            || ' ' || source
                WHEN 1 THEN '{_PDF_FLATE_TEXT}'
                WHEN 2 THEN 'Doc ' || doc_id || ' modern ' || source
                            || ' ' || text
                WHEN 3 THEN 'Doc ' || doc_id || ' a85 ' || source
                            || ' ' || text
                ELSE 'Doc ' || doc_id || ' lzw ' || source || ' ' || text
                END AS pdf_text
    FROM documents
    """,
)
def multimodal_pdf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF probing under a GROUND-TRUTH oracle with DATA-DEPENDENT
    byte offsets, five legs by doc_id % 5:
    0: a complete classic-xref PDF whose content stream carries the
       doc's text in two Tj strings — the /Length value, object-5
       offset, xref offset, and startxref are all octet_length
       arithmetic over the variable content, and the parser VERIFIES
       every xref entry against the object header it points at, so
       one byte of drift anywhere kills the row;
    1: a constant FlateDecode content stream (the bz2-leg precedent),
       pinning the zlib routing;
    2: the MODERN shape (PDF 1.5+): catalog/pages/page/font packed in
       a FlateDecode ObjStm, cross-reference as a /W [1 4 2] XRef
       STREAM under PNG-Up /Predictor 12 — built by the independent
       encoder twin with offsets derived from the variable content,
       so the /W column decode, predictor reversal, ObjStm member
       slicing, AND per-entry offset/membership verification all have
       to agree for the hash to match (7 objects, 3 streams);
    3: a /Filter [/ASCII85Decode /FlateDecode] chain over the
       data-dependent content (encoded stdlib a85 over zlib — the
       decode applies first-listed first: §7.4) with an INDIRECT
       ``/Length 6 0 R`` resolved through the integer object placed
       after the stream (the real-writer shape; 6 objects);
    4: a /Filter [/ASCIIHexDecode /RunLengthDecode /LZWDecode]
       3-deep chain, each stage produced by its independent encoder
       twin over the variable content — hex framing, RLE records,
       and the MSB-first EarlyChange LZW coder all have to agree.
    DuckDB recomputes the expected text by plain concat
    (documents.text is verified free of parens/backslashes at all
    SFs). Scale: map-only, zero exchanges."""
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    head = "%PDF-1.4\n"
    o1 = "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    o2 = "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
    o3 = (
        "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>\n"
        "endobj\n"
    )
    o5 = (
        "5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n"
        "endobj\n"
    )
    off1 = len(head)
    off2 = off1 + len(o1)
    off3 = off2 + len(o2)
    off4 = off3 + len(o3)
    stream_plain = F.concat(
        F.lit("BT /F1 12 Tf 72 720 Td (Doc "),
        did,
        F.lit(") Tj 0 -14 Td ("),
        F.col("source"),
        F.lit(" "),
        F.col("text"),
        # a data-dependent HEX string shown after the literals — the
        # §7.3.4.3 path has to hex-decode the source bytes exactly
        F.lit(") Tj 0 -14 Td <"),
        F.hex(F.encode(F.col("source"), "utf-8")),
        F.lit("> Tj ET"),
    )
    flate = _pdf_flate_stream()
    stream_body = F.when(
        F.col("doc_id") % 5 == 0, F.encode(stream_plain, "utf-8")
    ).otherwise(F.lit(flate))
    filter_part = F.when(
        F.col("doc_id") % 5 == 0, F.lit("")
    ).otherwise(F.lit(" /Filter /FlateDecode"))
    o4 = F.concat(
        F.encode(
            F.concat(
                F.lit("4 0 obj\n<< /Length "),
                F.octet_length(stream_body).cast("string"),
                filter_part,
                F.lit(" >>\nstream\n"),
            ),
            "utf-8",
        ),
        stream_body,
        F.lit(b"\nendstream\nendobj\n"),
    )
    off5 = F.lit(off4) + F.octet_length(o4)
    xref_off = off5 + len(o5)

    def entry(off_col):
        return F.concat(
            F.lpad(off_col.cast("string"), 10, "0"), F.lit(" 00000 n \n")
        )

    xref = F.concat(
        F.lit(
            "xref\n0 6\n0000000000 65535 f \n"
            + f"{off1:010d} 00000 n \n{off2:010d} 00000 n \n"
            + f"{off3:010d} 00000 n \n{off4:010d} 00000 n \n"
        ),
        entry(off5),
    )
    trailer = F.concat(
        F.lit("trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n"),
        xref_off.cast("string"),
        F.lit("\n%%EOF\n"),
    )
    payload_classic = F.concat(
        F.lit((head + o1 + o2 + o3).encode()),
        o4,
        F.lit(o5.encode()),
        F.encode(F.concat(xref, trailer), "utf-8"),
    )

    # leg 2 (the modern xref-stream/ObjStm shape) needs binary
    # big-endian /W columns + PNG-predictor filtering + Flate over
    # data-dependent offsets — built by the Python encoder twin; the
    # classic legs pass through untouched
    src_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def build_modern(batches):
        import base64
        import zlib

        for pdf in batches:
            payloads = []
            for doc_id, classic, source, text in zip(
                pdf["doc_id"], pdf["payload"], pdf["source"], pdf["text"]
            ):
                leg = int(doc_id) % 5
                if leg in (0, 1):
                    payloads.append(classic)
                    continue
                if leg == 2:
                    content = (
                        f"BT /F1 12 Tf 72 720 Td (Doc {doc_id} modern) Tj "
                        f"0 -14 Td ({source} {text}) Tj ET"
                    ).encode()
                    payloads.append(_build_pdf15(content))
                    continue
                if leg == 3:
                    content = (
                        f"BT /F1 12 Tf 72 720 Td (Doc {doc_id} a85) Tj "
                        f"0 -14 Td ({source} {text}) Tj ET"
                    ).encode()
                    # decode order AHx-less chain: ASCII85 then Flate
                    body = base64.a85encode(zlib.compress(content, 6))
                    payloads.append(
                        _build_classic_filtered(
                            body + b"~>",
                            b"[/ASCII85Decode /FlateDecode]",
                            indirect_length=True,
                        )
                    )
                    continue
                content = (
                    f"BT /F1 12 Tf 72 720 Td (Doc {doc_id} lzw) Tj "
                    f"0 -14 Td ({source} {text}) Tj ET"
                ).encode()
                body = _rle_encode(_lzw_encode(content))
                body = body.hex().upper().encode("ascii") + b">"
                payloads.append(
                    _build_classic_filtered(
                        body,
                        b"[/ASCIIHexDecode /RunLengthDecode /LZWDecode]",
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    blobs = (
        parallelize_small_scan(d.select("doc_id", "source", "text"))
        .select("doc_id", payload_classic.alias("payload"), "source", "text")
        .mapInPandas(build_modern, src_schema)
    )
    return pdf_stats(blobs)
