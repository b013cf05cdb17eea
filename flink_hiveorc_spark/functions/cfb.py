"""Legacy binary Office (pre-2007) extraction: the MS-CFB/OLE2
compound-file container plus the two text-bearing formats old crawls
and institutional corpora actually ship — .doc (MS-DOC piece-table
text from the WordDocument stream) and .xls (MS-XLS BIFF8
shared-string table). This is pure STRUCTURE, no entropy tables:

- **MS-CFB** ([MS-CFB]): 512/4096-byte sectors, header DIFAT + DIFAT
  sector chains, FAT chains, the directory tree (walked linearly —
  every valid file's entries are enumerable without the red-black
  order), the root entry's MINI stream with its own 64-byte miniFAT
  chains, and the 4096-byte mini-stream cutoff. All chains are
  loop-guarded and size-bounded by the payload.
- **.doc** ([MS-DOC]): FIB (wIdent 0xA5EC) → fWhichTblStm picks
  0Table/1Table → Clx at fcClx (Prc blocks skipped) → Pcdt's PlcPcd
  piece table → each PCD's fc with the fCompressed bit choosing
  cp1252 bytes at fc/2 vs UTF-16LE at fc, character counts from the
  CP array. fEncrypted gates as unsupported ("encrypted"), complex
  fast-saves parse through the same piece table (that is what the
  piece table IS).
- **.xls** ([MS-XLS]): BIFF8 record walk (BOF 0x0809 verifies vers
  0x0600; BIFF5's 'Book' stream and any FilePass encryption gate
  honestly), SST record 0x00FC with its Continue (0x003C) records —
  strings may split mid-character-data at a Continue boundary where
  a fresh option-flags byte re-declares the width of the remainder
  (§2.5.293 XLUnicodeRichExtendedString), rich-run and ExtRst
  payloads skipped by size.

- **.ppt** ([MS-PPT]): the record forest in the 'PowerPoint
  Document' stream (recVer/recInstance + recType + recLen framing,
  containers recursed), text collected from TextCharsAtom (UTF-16LE)
  and TextBytesAtom (low-byte) leaves in stream order, Slide
  containers counted. Incrementally-saved decks (>1 UserEditAtom)
  gate honestly — a linear walk would resurface stale text from
  superseded edits.

The encoder twins (build_cfb/build_doc/build_xls) write the
container and both formats from the spec's ENCODE side for the
ground-truth oracle and tests — the usual twin discipline: they
share no code with the parsers.

Spark-side: bytes→text in Arrow mapInPandas through the shared
featurize-with-DLQ path (map-only, zero shuffle, parallelism = file
count). Reference repo has no document surface (SURVEY.md §0); need
comes from BASELINE.json's LLM-curation envelope (office.py covers
the 2007+ XML generations; this module covers their predecessors).
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.registry import query

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC
_MAXREG = 0xFFFFFFFA
_NOSTREAM = 0xFFFFFFFF

_CFB_SIG = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


def _u16(b: bytes, off: int) -> int:
    return struct.unpack_from("<H", b, off)[0]


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


def _chain(fat: list[int], start: int, what: str) -> list[int]:
    """Follow a FAT/miniFAT chain from `start` → sector list.
    Loop-guarded: a chain can't be longer than the table."""
    out: list[int] = []
    seen: set[int] = set()
    s = start
    while s != _ENDOFCHAIN:
        if s > _MAXREG or s >= len(fat):
            raise ValueError(f"{what} chain hits invalid sector {s:#x}")
        if s in seen:
            raise ValueError(f"{what} chain loops at sector {s}")
        seen.add(s)
        out.append(s)
        s = fat[s]
    return out


def cfb_streams(payload: bytes) -> dict[str, bytes]:
    """MS-CFB compound file → {stream name: bytes} for every type-2
    (stream) directory entry, mini/regular routing by the 4096-byte
    cutoff. Storage nesting is flattened (names are unique enough in
    every real office file; first entry wins on a collision)."""
    if payload[:8] != _CFB_SIG:
        raise ValueError("not an OLE2/CFB compound file (bad signature)")
    if len(payload) < 512:
        raise ValueError("CFB payload shorter than its header")
    major = _u16(payload, 26)
    if major not in (3, 4):
        raise ValueError(f"CFB major version {major} unknown")
    ssz = 1 << _u16(payload, 30)
    if (major == 3 and ssz != 512) or (major == 4 and ssz != 4096):
        raise ValueError(f"CFB sector size {ssz} contradicts version {major}")
    mssz = 1 << _u16(payload, 32)
    n_fat = _u32(payload, 44)
    first_dir = _u32(payload, 48)
    cutoff = _u32(payload, 56)
    first_minifat = _u32(payload, 60)
    n_minifat = _u32(payload, 64)
    first_difat = _u32(payload, 68)
    n_difat = _u32(payload, 72)

    n_sectors = max(0, (len(payload) - ssz) // ssz)

    def sector(i: int) -> bytes:
        if i > _MAXREG or i >= n_sectors:
            raise ValueError(f"sector {i:#x} out of range ({n_sectors})")
        return payload[(i + 1) * ssz : (i + 2) * ssz]

    # DIFAT: 109 header entries, then the DIFAT sector chain (each
    # holds ssz/4 - 1 FAT locations + a next pointer)
    difat = [
        _u32(payload, 76 + 4 * k)
        for k in range(109)
    ]
    s = first_difat
    hops = 0
    while s != _ENDOFCHAIN and s != _FREESECT:
        if hops > n_difat or hops > n_sectors:
            raise ValueError("DIFAT chain longer than declared")
        raw = sector(s)
        per = ssz // 4 - 1
        difat.extend(
            struct.unpack_from(f"<{per}I", raw, 0)
        )
        s = _u32(raw, ssz - 4)
        hops += 1
    fat_sectors = [x for x in difat if x <= _MAXREG][:n_fat]
    if len(fat_sectors) < n_fat:
        raise ValueError("DIFAT lists fewer FAT sectors than declared")
    fat: list[int] = []
    for fs in fat_sectors:
        fat.extend(struct.unpack_from(f"<{ssz // 4}I", sector(fs), 0))

    dir_raw = b"".join(sector(s) for s in _chain(fat, first_dir, "directory"))
    entries = []
    for off in range(0, len(dir_raw) - 127, 128):
        e = dir_raw[off : off + 128]
        etype = e[66]
        if etype not in (1, 2, 5):
            continue
        nlen = _u16(e, 64)
        if nlen < 2 or nlen > 64:
            raise ValueError(f"directory entry name length {nlen} invalid")
        name = e[: nlen - 2].decode("utf-16-le")
        start = _u32(e, 116)
        size = struct.unpack_from("<Q", e, 120)[0]
        if major == 3:
            size &= 0xFFFFFFFF
        entries.append((name, etype, start, size))
    if not entries or entries[0][1] != 5:
        raise ValueError("CFB directory lacks the root entry")

    _, _, mini_start, mini_size = entries[0]
    ministream = b""
    if mini_size and mini_start <= _MAXREG:
        ministream = b"".join(
            sector(s) for s in _chain(fat, mini_start, "mini stream")
        )[:mini_size]
    minifat: list[int] = []
    if n_minifat and first_minifat <= _MAXREG:
        for s in _chain(fat, first_minifat, "miniFAT"):
            minifat.extend(struct.unpack_from(f"<{ssz // 4}I", sector(s), 0))

    out: dict[str, bytes] = {}
    for name, etype, start, size in entries[1:]:
        if etype != 2:
            continue
        if size > len(payload) * 8:
            raise ValueError(f"stream {name!r} declares impossible size")
        if size == 0:
            data = b""
        elif size < cutoff:
            chunks = []
            for ms in _chain(minifat, start, f"mini chain of {name!r}"):
                lo = ms * mssz
                if lo >= len(ministream):
                    raise ValueError(
                        f"mini sector {ms} beyond the mini stream"
                    )
                chunks.append(ministream[lo : lo + mssz])
            data = b"".join(chunks)[:size]
        else:
            data = b"".join(
                sector(s) for s in _chain(fat, start, f"chain of {name!r}")
            )[:size]
        if len(data) < size:
            raise ValueError(f"stream {name!r} truncated ({len(data)}/{size})")
        out.setdefault(name, data)
    return out


# ---------------------------------------------------------- MS-DOC

_FC_COMPRESSED = 0x40000000
_FIB_FLAGS_OFF = 0x0A
_F_ENCRYPTED = 0x0100
_F_WHICH_TBL = 0x0200
_FC_CLX_OFF = 0x01A2  # FibBase(32)+csw(2)+fibRgW(28)+cslw(2)+fibRgLw(88)+cb(2) + 33*8


def doc_text(streams: dict[str, bytes]) -> tuple[str, int]:
    """MS-DOC → (text, n_pieces) via the piece table (module doc).
    Word's \\r paragraph marks normalize to \\n; cell/row marks
    (0x07) and field separators (0x13-0x15) drop."""
    ws = streams.get("WordDocument")
    if ws is None:
        raise ValueError("CFB file has no WordDocument stream")
    if len(ws) < 0x200:
        raise ValueError("WordDocument stream shorter than a FIB")
    if _u16(ws, 0) != 0xA5EC:
        raise ValueError(f"FIB wIdent {_u16(ws, 0):#x} is not a Word binary")
    flags = _u16(ws, _FIB_FLAGS_OFF)
    if flags & _F_ENCRYPTED:
        raise NotImplementedError(
            "encrypted .doc (fEncrypted — needs the security handler)"
        )
    table_name = "1Table" if flags & _F_WHICH_TBL else "0Table"
    table = streams.get(table_name)
    if table is None:
        raise ValueError(f".doc lacks its {table_name} stream")
    if len(ws) < _FC_CLX_OFF + 8:
        raise ValueError("FIB too short for fcClx/lcbClx")
    fc_clx = _u32(ws, _FC_CLX_OFF)
    lcb_clx = _u32(ws, _FC_CLX_OFF + 4)
    if lcb_clx == 0:
        raise NotImplementedError(
            ".doc with no Clx piece table (pre-Word-97 nFib)"
        )
    clx = table[fc_clx : fc_clx + lcb_clx]
    if len(clx) != lcb_clx:
        raise ValueError("Clx overruns the table stream")
    i = 0
    while i < len(clx) and clx[i] == 0x01:  # Prc formatting block
        if i + 3 > len(clx):
            raise ValueError("truncated Prc in Clx")
        i += 3 + _u16(clx, i + 1)
    if i >= len(clx) or clx[i] != 0x02:
        raise ValueError("Clx lacks its Pcdt")
    if i + 5 > len(clx):
        raise ValueError("truncated Pcdt header")
    lcb = _u32(clx, i + 1)
    plc = clx[i + 5 : i + 5 + lcb]
    if len(plc) != lcb:
        raise ValueError("PlcPcd overruns the Clx")
    n, rem = divmod(lcb - 4, 12)
    if rem or n < 0:
        raise ValueError(f"PlcPcd size {lcb} is not 4(n+1)+8n")
    cps = [_u32(plc, 4 * k) for k in range(n + 1)]
    pieces: list[str] = []
    for k in range(n):
        nchars = cps[k + 1] - cps[k]
        if nchars < 0:
            raise ValueError("PlcPcd CPs are not ascending")
        fc = _u32(plc, 4 * (n + 1) + 8 * k + 2)
        if fc & _FC_COMPRESSED:
            off = (fc & 0x3FFFFFFF) // 2
            raw = ws[off : off + nchars]
            if len(raw) != nchars:
                raise ValueError("compressed piece overruns WordDocument")
            pieces.append(raw.decode("cp1252"))
        else:
            off = fc & 0x3FFFFFFF
            raw = ws[off : off + 2 * nchars]
            if len(raw) != 2 * nchars:
                raise ValueError("unicode piece overruns WordDocument")
            pieces.append(raw.decode("utf-16-le"))
    text = "".join(pieces).replace("\r", "\n")
    text = text.translate({0x07: None, 0x13: None, 0x14: None, 0x15: None})
    return text, n


# ---------------------------------------------------------- MS-PPT

_PPT_TEXTCHARS = 0x0FA0   # UTF-16LE text atom
_PPT_TEXTBYTES = 0x0FA8   # 8-bit (low-byte UTF-16) text atom
_PPT_USEREDIT = 0x0FF5
_PPT_SLIDE = 0x03EE


def ppt_text(streams: dict[str, bytes]) -> tuple[str, int]:
    """Binary .ppt → (text, n_slides) from the 'PowerPoint Document'
    record forest ([MS-PPT] §2.3: every record is recVer/recInstance
    (2) + recType (2) + recLen (4), containers recVer=0xF). Text
    lives in TextCharsAtom (UTF-16LE) / TextBytesAtom (low bytes of
    UTF-16) leaves, collected in stream order. Incrementally-saved
    decks (more than one UserEditAtom) gate honestly: a linear walk
    over a fast-save chain would resurface STALE text from
    superseded edits — the silent-garbage class the decode contract
    forbids."""
    doc = streams.get("PowerPoint Document")
    if doc is None:
        raise ValueError("CFB file has no PowerPoint Document stream")
    texts: list[str] = []
    n_slides = 0
    n_edits = 0

    def walk(data: bytes, base: int, end: int, depth: int) -> None:
        nonlocal n_slides, n_edits
        if depth > 32:
            raise ValueError("PPT record nesting deeper than 32")
        pos = base
        while pos + 8 <= end:
            verinst = _u16(data, pos)
            rectype = _u16(data, pos + 2)
            reclen = _u32(data, pos + 4)
            body_start = pos + 8
            if body_start + reclen > end:
                raise ValueError(
                    f"PPT record {rectype:#x} overruns its container"
                )
            if rectype == _PPT_USEREDIT:
                n_edits += 1
            elif rectype == _PPT_TEXTCHARS:
                if reclen % 2:
                    raise ValueError("TextCharsAtom with odd length")
                texts.append(
                    data[body_start : body_start + reclen].decode(
                        "utf-16-le"
                    )
                )
            elif rectype == _PPT_TEXTBYTES:
                texts.append(
                    data[body_start : body_start + reclen].decode(
                        "latin-1"
                    )
                )
            else:
                if rectype == _PPT_SLIDE:
                    n_slides += 1
                if verinst & 0x000F == 0x000F:
                    # container: recurse into the child records
                    walk(data, body_start, body_start + reclen, depth + 1)
            pos = body_start + reclen
        if pos != end:
            raise ValueError("PPT container has trailing partial record")

    walk(doc, 0, len(doc), 0)
    if n_edits > 1:
        raise NotImplementedError(
            f"incrementally-saved .ppt ({n_edits} UserEditAtoms — the "
            "persist directory walk is needed to skip stale edits)"
        )
    text = "\n".join(t.replace("\r", "\n") for t in texts)
    return text, n_slides


# ---------------------------------------------------------- MS-XLS

_R_BOF = 0x0809
_R_EOF = 0x000A
_R_SST = 0x00FC
_R_CONTINUE = 0x003C
_R_FILEPASS = 0x002F
_R_LABELSST = 0x00FD


def _biff_records(wb: bytes):
    pos = 0
    while pos + 4 <= len(wb):
        op = _u16(wb, pos)
        size = _u16(wb, pos + 2)
        data = wb[pos + 4 : pos + 4 + size]
        if len(data) != size:
            raise ValueError("BIFF record overruns the Workbook stream")
        yield op, data
        if op == _R_EOF:
            return
        pos += 4 + size
    raise ValueError("Workbook stream ends without an EOF record")


class _SstReader:
    """Cursor over the SST record + its Continue fragments. Fixed
    fields may not span fragments ([MS-XLS] §2.4.265 splits only at
    string boundaries or inside character data); character reads
    crossing into a Continue consume its fresh option-flags byte."""

    def __init__(self, frags: list[bytes]):
        self.frags = frags
        self.fi = 0
        self.off = 0

    def _need(self, n: int) -> bytes:
        if self.fi >= len(self.frags):
            raise ValueError("SST runs past its last fragment")
        f = self.frags[self.fi]
        if self.off + n > len(f):
            raise ValueError("SST field spans a Continue boundary")
        out = f[self.off : self.off + n]
        self.off += n
        return out

    def _advance(self) -> None:
        while self.fi < len(self.frags) and self.off >= len(self.frags[self.fi]):
            self.fi += 1
            self.off = 0

    def at_end(self) -> bool:
        self._advance()
        return self.fi >= len(self.frags)

    def u8(self) -> int:
        self._advance()
        return self._need(1)[0]

    def u16(self) -> int:
        self._advance()
        return struct.unpack("<H", self._need(2))[0]

    def u32(self) -> int:
        self._advance()
        return struct.unpack("<I", self._need(4))[0]

    def chars(self, cch: int, high: bool) -> str:
        out: list[str] = []
        remaining = cch
        while remaining:
            self._advance()
            if self.fi >= len(self.frags):
                raise ValueError("SST string truncated across fragments")
            if self.off == 0 and out:
                # continuation fragment: fresh option flags for the
                # remainder of THIS string
                high = bool(self._need(1)[0] & 0x01)
            avail = len(self.frags[self.fi]) - self.off
            width = 2 if high else 1
            take = min(remaining, avail // width)
            if take == 0:
                raise ValueError(
                    "Continue fragment too small for one character"
                )
            raw = self._need(take * width)
            out.append(raw.decode("utf-16-le" if high else "latin-1"))
            remaining -= take
        return "".join(out)

    def skip(self, n: int) -> None:
        while n:
            self._advance()
            if self.fi >= len(self.frags):
                raise ValueError("SST skip runs past the fragments")
            avail = len(self.frags[self.fi]) - self.off
            take = min(n, avail)
            self._need(take)
            n -= take


def xls_sst(streams: dict[str, bytes]) -> tuple[list[str], int]:
    """MS-XLS Workbook stream → (shared strings in table order,
    cstUnique)."""
    wb = streams.get("Workbook")
    if wb is None:
        if "Book" in streams:
            raise NotImplementedError(
                "BIFF5 .xls ('Book' stream — pre-97 record layout)"
            )
        raise ValueError("CFB file has no Workbook stream")
    it = _biff_records(wb)
    try:
        op, data = next(it)
    except StopIteration:
        raise ValueError("empty Workbook stream") from None
    if op != _R_BOF or len(data) < 4:
        raise ValueError("Workbook stream does not start with BOF")
    vers = _u16(data, 0)
    if vers != 0x0600:
        raise NotImplementedError(f"BIFF version {vers:#x} (not BIFF8)")
    frags: list[bytes] = []
    for op, data in it:
        if op == _R_FILEPASS:
            raise NotImplementedError(
                "encrypted .xls (FilePass — needs the security handler)"
            )
        if op == _R_SST:
            frags = [data]
            for op2, data2 in it:
                if op2 != _R_CONTINUE:
                    break
                frags.append(data2)
            break
    if not frags:
        return [], 0
    r = _SstReader(frags)
    r.u32()  # cstTotal
    cst_unique = r.u32()
    strings: list[str] = []
    for _ in range(cst_unique):
        cch = r.u16()
        grbit = r.u8()
        if grbit & 0xF2:
            raise ValueError(f"SST string option flags {grbit:#x} invalid")
        c_run = r.u16() if grbit & 0x08 else 0
        cb_ext = r.u32() if grbit & 0x04 else 0
        strings.append(r.chars(cch, bool(grbit & 0x01)))
        r.skip(4 * c_run + cb_ext)
    return strings, cst_unique


def xls_text(streams: dict[str, bytes]) -> tuple[str, int]:
    """MS-XLS → (text in CELL order, n_cells): LabelSst records
    ([MS-XLS] §2.4.149: rw, col, ixfe, isst) resolve into the shared
    string table in record order — the DOCUMENT's order, which is
    not the SST's (real sheets dedup repeated strings into one SST
    entry many cells reference). A workbook with an SST but no
    LabelSst cells (strings-only export) falls back to SST order."""
    strings, n_unique = xls_sst(streams)
    wb = streams.get("Workbook")
    cells: list[str] = []
    if wb is not None:
        for op, data in _biff_records(wb):
            if op != _R_LABELSST:
                continue
            if len(data) < 10:
                raise ValueError("LabelSst record shorter than 10 bytes")
            isst = _u32(data, 6)
            if isst >= len(strings):
                raise ValueError(
                    f"LabelSst references SST entry {isst} of "
                    f"{len(strings)}"
                )
            cells.append(strings[isst])
    if cells:
        return "\n".join(cells), len(cells)
    return "\n".join(strings), n_unique


# ------------------------------------------------- Spark operators

_LEGACY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_units", T.LongType()),
        T.StructField("office_text", T.StringType()),
    ]
)


def parse_legacy_office(payload: bytes) -> dict:
    """OLE2 blob → {kind doc|xls|ppt, n_units (pieces | SST strings
    | slides), office_text}."""
    streams = cfb_streams(payload)
    if "WordDocument" in streams:
        text, n_pieces = doc_text(streams)
        return {"kind": "doc", "n_units": n_pieces, "office_text": text}
    if "Workbook" in streams or "Book" in streams:
        text, n = xls_text(streams)
        return {"kind": "xls", "n_units": n, "office_text": text}
    if "PowerPoint Document" in streams:
        text, n_slides = ppt_text(streams)
        return {"kind": "ppt", "n_units": n_slides,
                "office_text": text}
    raise ValueError(
        "OLE2 file has no WordDocument/Workbook/PowerPoint stream "
        "(not a legacy office document)"
    )


def legacy_office_stats(
    payloads: DataFrame, quarantine: bool = False
) -> DataFrame:
    """(doc_id, payload) OLE2 blobs → kind + extracted text through
    the shared featurize-with-DLQ path."""
    from flink_hiveorc_spark.functions.multimodal import _stats_df

    return _stats_df(
        payloads, _LEGACY_SCHEMA, parse_legacy_office, quarantine
    )


# ------------------------------------------------- encoder twins

def build_cfb(streams: dict[str, bytes], version: int = 3) -> bytes:
    """MS-CFB ENCODER twin: version-3 container (512-byte sectors,
    64-byte mini sectors) or version-4 (4096-byte sectors — the
    header stays 512 bytes, the remainder of its sector zero-pads),
    streams under the 4096 cutoff in the mini stream, larger ones in
    regular chains; single-level directory with a degenerate
    right-spine tree (spec-valid; readers that walk entries find
    everything). Written from the spec's encode side; shares nothing
    with cfb_streams."""
    if version not in (3, 4):
        raise ValueError(f"CFB version {version}")
    ssz, mssz = (512, 64) if version == 3 else (4096, 64)

    def pad(b: bytes, align: int) -> bytes:
        return b + b"\x00" * (-len(b) % align)

    mini_parts: list[bytes] = []
    minifat: list[int] = []
    big_parts: list[bytes] = []
    placements: dict[str, tuple[int, int]] = {}  # name -> (start, size)
    big_lengths: list[tuple[str, int]] = []
    for name, data in streams.items():
        if len(data) < 4096:
            if not data:
                placements[name] = (_ENDOFCHAIN, 0)
                continue
            start = len(minifat)
            nsec = (len(data) + mssz - 1) // mssz
            minifat.extend(range(start + 1, start + nsec))
            minifat.append(_ENDOFCHAIN)
            mini_parts.append(pad(data, mssz))
            placements[name] = (start, len(data))
        else:
            big_parts.append(pad(data, ssz))
            big_lengths.append((name, len(data)))
    ministream = pad(b"".join(mini_parts), ssz)
    n_mini_sectors = len(ministream) // ssz
    minifat_bytes = pad(
        b"".join(struct.pack("<I", x) for x in minifat), ssz
    ) if minifat else b""
    n_minifat_sectors = len(minifat_bytes) // ssz

    n_entries = 1 + len(streams)
    n_dir_sectors = (n_entries * 128 + ssz - 1) // ssz

    big_sector_counts = [len(p) // ssz for p in big_parts]
    total_big = sum(big_sector_counts)

    # capacity iteration: FAT sectors must cover every sector incl.
    # themselves AND any DIFAT sectors (needed once n_fat > 109 —
    # the header's inline DIFAT runs out; real .doc/.ppt with
    # embedded media cross this at ~7 MB for v3)
    per_difat = ssz // 4 - 1
    n_fat = 1
    while True:
        n_difat = (
            0 if n_fat <= 109
            else (n_fat - 109 + per_difat - 1) // per_difat
        )
        n_other = (
            n_difat + n_dir_sectors + n_minifat_sectors
            + n_mini_sectors + total_big
        )
        if (n_fat + n_other) <= n_fat * (ssz // 4):
            break
        n_fat += 1
    n_difat = (
        0 if n_fat <= 109
        else (n_fat - 109 + per_difat - 1) // per_difat
    )

    fat_base = n_difat  # DIFAT sectors first, then FAT sectors
    first_dir = fat_base + n_fat
    first_minifat = first_dir + n_dir_sectors if n_minifat_sectors else _ENDOFCHAIN
    mini_base = fat_base + n_fat + n_dir_sectors + n_minifat_sectors
    big_base = mini_base + n_mini_sectors

    # assign big-stream starts
    big_starts: dict[str, int] = {}
    cursor = big_base
    for (name, size), cnt in zip(big_lengths, big_sector_counts):
        big_starts[name] = cursor
        cursor += cnt
    total_sectors = cursor

    fat = [_FREESECT] * (n_fat * (ssz // 4))
    for k in range(n_difat):
        fat[k] = _DIFSECT
    for k in range(n_fat):
        fat[fat_base + k] = _FATSECT

    def chain_into(start: int, count: int) -> None:
        for k in range(count - 1):
            fat[start + k] = start + k + 1
        if count:
            fat[start + count - 1] = _ENDOFCHAIN

    chain_into(first_dir, n_dir_sectors)
    if n_minifat_sectors:
        chain_into(first_minifat, n_minifat_sectors)
    chain_into(mini_base, n_mini_sectors)
    for (name, size), cnt in zip(big_lengths, big_sector_counts):
        chain_into(big_starts[name], cnt)

    def dirent(
        name: str, etype: int, start: int, size: int,
        left: int = _NOSTREAM, right: int = _NOSTREAM, child: int = _NOSTREAM,
    ) -> bytes:
        nm = name.encode("utf-16-le")
        if len(nm) > 62:
            raise ValueError(f"CFB name {name!r} too long")
        e = bytearray(128)
        e[: len(nm)] = nm
        struct.pack_into("<H", e, 64, len(nm) + 2)
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<I", e, 68, left)
        struct.pack_into("<I", e, 72, right)
        struct.pack_into("<I", e, 76, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    names = list(streams)
    ents = [
        dirent(
            "Root Entry", 5,
            mini_base if n_mini_sectors else _ENDOFCHAIN,
            len(ministream) if n_mini_sectors else 0,
            child=1 if names else _NOSTREAM,
        )
    ]
    for i, name in enumerate(names):
        data = streams[name]
        start, size = (
            (big_starts[name], len(data))
            if len(data) >= 4096
            else placements[name]
        )
        ents.append(
            dirent(
                name, 2, start, size,
                right=(i + 2) if i + 1 < len(names) else _NOSTREAM,
            )
        )
    dir_bytes = pad(b"".join(ents), ssz)

    header = bytearray(512)
    header[:8] = _CFB_SIG
    struct.pack_into("<H", header, 24, 0x003E)   # minor
    struct.pack_into("<H", header, 26, version)  # major
    struct.pack_into("<H", header, 28, 0xFFFE)   # byte order
    struct.pack_into("<H", header, 30, 9 if version == 3 else 12)
    struct.pack_into("<H", header, 32, 6)        # mini shift
    if version == 4:
        struct.pack_into("<I", header, 40, n_dir_sectors)
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<I", header, 48, first_dir)
    struct.pack_into("<I", header, 56, 4096)
    struct.pack_into(
        "<I", header, 60,
        first_minifat if n_minifat_sectors else _ENDOFCHAIN,
    )
    struct.pack_into("<I", header, 64, n_minifat_sectors)
    struct.pack_into(
        "<I", header, 68, 0 if n_difat else _ENDOFCHAIN
    )
    struct.pack_into("<I", header, 72, n_difat)
    for k in range(109):
        struct.pack_into(
            "<I", header, 76 + 4 * k,
            fat_base + k if k < n_fat else _FREESECT,
        )

    difat_bytes = b""
    for d in range(n_difat):
        ids = [
            fat_base + 109 + d * per_difat + j
            for j in range(per_difat)
            if 109 + d * per_difat + j < n_fat
        ]
        ids += [_FREESECT] * (per_difat - len(ids))
        nxt = d + 1 if d + 1 < n_difat else _ENDOFCHAIN
        difat_bytes += b"".join(
            struct.pack("<I", x) for x in ids + [nxt]
        )

    fat_bytes = b"".join(struct.pack("<I", x) for x in fat)
    body = (
        pad(bytes(header), ssz) + difat_bytes + fat_bytes + dir_bytes
        + minifat_bytes + ministream + b"".join(big_parts)
    )
    assert len(body) == (total_sectors + 1) * ssz
    return body


def build_doc(pieces: list[tuple[str, bool]]) -> bytes:
    """MS-DOC ENCODER twin: WordDocument FIB (nFib 0x00C1,
    fWhichTblStm set) + piece data from offset 0x600, 1Table holding
    the Clx/Pcdt piece table. `pieces` = (text, compressed?) — a
    compressed piece stores cp1252 bytes at fc/2, a unicode piece
    UTF-16LE at fc."""
    fib = bytearray(0x600)
    struct.pack_into("<H", fib, 0, 0xA5EC)
    struct.pack_into("<H", fib, 2, 0x00C1)
    struct.pack_into("<H", fib, _FIB_FLAGS_OFF, _F_WHICH_TBL)
    struct.pack_into("<H", fib, 32, 0x000E)   # csw
    struct.pack_into("<H", fib, 62, 0x0016)   # cslw
    struct.pack_into("<H", fib, 152, 0x005D)  # cbRgFcLcb (93 pairs)
    total_chars = sum(len(t) for t, _ in pieces)
    struct.pack_into("<i", fib, 64 + 12, total_chars)  # ccpText
    word = bytearray(fib)
    pcds: list[bytes] = []
    cps = [0]
    for text, compressed in pieces:
        off = len(word)
        if compressed:
            word += text.encode("cp1252")
            fc = (off * 2) | _FC_COMPRESSED
        else:
            word += text.encode("utf-16-le")
            fc = off
        cps.append(cps[-1] + len(text))
        pcds.append(struct.pack("<HIH", 0, fc, 0))
    plc = b"".join(struct.pack("<I", c) for c in cps) + b"".join(pcds)
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    struct.pack_into("<I", word, _FC_CLX_OFF, 0)
    struct.pack_into("<I", word, _FC_CLX_OFF + 4, len(clx))
    return build_cfb({"WordDocument": bytes(word), "1Table": clx})


def _biff_rec(op: int, data: bytes) -> bytes:
    return struct.pack("<HH", op, len(data)) + data


def _ppt_rec(verinst: int, rectype: int, body: bytes) -> bytes:
    return struct.pack("<HHI", verinst, rectype, len(body)) + body


def build_ppt(slides: list[list[str]]) -> bytes:
    """MS-PPT ENCODER twin: a Document container (0x03E8) of Slide
    containers (0x03EE) holding one text atom per string —
    TextBytesAtom when the string fits in low bytes, TextCharsAtom
    otherwise — plus a single trailing UserEditAtom. Written from
    the record grammar's encode side; shares nothing with
    ppt_text."""
    slide_blobs = b""
    for slide in slides:
        atoms = b""
        for t in slide:
            if all(ord(c) <= 0xFF for c in t):
                atoms += _ppt_rec(0x0000, _PPT_TEXTBYTES,
                                  t.encode("latin-1"))
            else:
                atoms += _ppt_rec(0x0000, _PPT_TEXTCHARS,
                                  t.encode("utf-16-le"))
        slide_blobs += _ppt_rec(0x000F, _PPT_SLIDE, atoms)
    doc = (
        _ppt_rec(0x000F, 0x03E8, slide_blobs)
        + _ppt_rec(0x0000, _PPT_USEREDIT, b"\x00" * 28)
    )
    return build_cfb({"PowerPoint Document": doc})


def build_xls(
    strings: list[str],
    split_in: int | None = None,
    cells: list[int] | None = None,
) -> bytes:
    """MS-XLS BIFF8 ENCODER twin: BOF + SST (+ optional Continue
    split INSIDE string `split_in`'s character data, re-emitting the
    option-flags byte, per §2.5.293) + optional LabelSst cell
    records referencing SST entries in `cells` order + EOF, in a
    Workbook stream. Width per string: compressed unless it needs
    high bytes."""
    payload = bytearray()
    payload += struct.pack("<II", len(strings), len(strings))
    split_at: int | None = None
    for idx, s in enumerate(strings):
        high = any(ord(c) > 0xFF for c in s)
        grbit = 0x01 if high else 0x00
        payload += struct.pack("<HB", len(s), grbit)
        if idx == split_in and len(s) >= 2:
            # split roughly mid-string, at a character boundary
            half = len(s) // 2
            payload += s[:half].encode(
                "utf-16-le" if high else "latin-1"
            )
            split_at = len(payload)
            # remainder goes to the Continue with a fresh grbit
            payload += struct.pack("<B", grbit)
            payload += s[half:].encode(
                "utf-16-le" if high else "latin-1"
            )
        else:
            payload += s.encode("utf-16-le" if high else "latin-1")
    bof = struct.pack("<HHHHII", 0x0600, 0x0005, 0x3515, 0x0745, 1, 0x0600)
    wb = bytearray(_biff_rec(_R_BOF, bof))
    if split_at is None:
        wb += _biff_rec(_R_SST, bytes(payload))
    else:
        wb += _biff_rec(_R_SST, bytes(payload[:split_at]))
        wb += _biff_rec(_R_CONTINUE, bytes(payload[split_at:]))
    for i, isst in enumerate(cells or []):
        wb += _biff_rec(
            _R_LABELSST, struct.pack("<HHHI", i, 0, 15, isst)
        )
    wb += _biff_rec(_R_EOF, b"")
    return build_cfb({"Workbook": bytes(wb)})


@query(
    "text_legacy_office_extract",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'doc' WHEN 1 THEN 'xls'
                ELSE 'ppt' END AS kind,
           CAST(CASE doc_id % 3 WHEN 0 THEN 2 WHEN 1 THEN 4
                ELSE 2 END AS BIGINT) AS n_units,
           CASE doc_id % 3
                WHEN 0 THEN 'Doc ' || doc_id || ' legacy ' || source
                            || ' ' || text
                WHEN 1 THEN 'Cells ' || doc_id || chr(10) || source
                            || chr(10) || text || chr(10) || source
                ELSE 'Slide ' || doc_id || chr(10) || source
                     || chr(10) || text
                END AS office_text
    FROM documents
    """,
)
def text_legacy_office_extract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Legacy binary Office extraction under a GROUND-TRUTH oracle,
    doc_id % 3: a .doc whose text arrives in TWO pieces — a cp1252
    fCompressed piece ('Doc N legacy ') and a UTF-16LE piece
    (source + text), so the piece-table walk, both fc encodings, and
    CP-count slicing all have to agree; a .xls whose SST holds
    three strings with a Continue-record split placed INSIDE the
    second (data-dependent) string's character data AND four
    LabelSst cells referencing entries [0,1,2,1] — the source string
    must appear TWICE in cell order, so the SST-index cell mapping
    is value-pinned too; and a .ppt whose two Slide
    containers carry a TextBytesAtom title + source/text atoms —
    the record-forest walk and both atom widths pinned. All three
    ride the full MS-CFB container (mini stream + miniFAT) from the
    encoder twins; DuckDB recomputes expected text by plain concat.
    Scale: ONE fused map-only Python pass (encode → parse composed
    per row, r16; see _encoded_stats_df), zero exchanges."""
    from flink_hiveorc_spark.functions.multimodal import _encoded_stats_df

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )

    def payload_of(doc_id, source, text) -> bytes:
        leg = int(doc_id) % 3
        if leg == 0:
            return build_doc(
                [
                    (f"Doc {doc_id} legacy ", True),
                    (f"{source} {text}", False),
                ]
            )
        if leg == 1:
            return build_xls(
                [f"Cells {doc_id}", str(source), str(text)],
                split_in=1,
                cells=[0, 1, 2, 1],
            )
        return build_ppt(
            [[f"Slide {doc_id}", str(source)], [str(text)]]
        )

    return _encoded_stats_df(
        d, payload_of, _LEGACY_SCHEMA, parse_legacy_office
    )
