"""Canon CRW (CIFF) container support for browsing.

The reference ingests CRW via LibRaw (reference:
src/raw2film/raw_conversion.py:36-48; extension list
src/raw2film/data.py:87-102). CRW is Canon's pre-CR2 CIFF container
(1996-2004 bodies): a 26-byte header (byte order, heap start, ``HEAPCCDR``
magic) followed by a heap whose directory sits at the END — the last 4
bytes of the heap give the directory offset, then u16 record count and
10-byte records (type u16, length u32, offset u32, heap-relative).

Record semantics (CIFF spec): the type's high bits select storage —
``& 0x4000`` means the 8 length/offset bytes ARE the value; type-class
``0x28xx``/``0x30xx`` records are nested sub-heaps. Tags used here:
``0x2007`` embedded JPEG thumbnail, ``0x080a`` make+model strings
(NUL-separated), ``0x080b`` firmware, ``0x0810`` owner, ``0x180e``
capture time (u32 unix), ``0x1810`` image width/height.

The compressed raw payload (tag 0x2005, the old 10-bit Canon Huffman
codec) is NOT decoded — viewers get thumbnails + identification, and
``read_raw`` raises the documented clear error pointing at DNG
conversion. This mirrors the CR3/CRX treatment (io/cr3.py).
"""

from __future__ import annotations

import struct

_HEAP_MAGIC = b"HEAPCCDR"


def is_crw(buf: bytes) -> bool:
    return len(buf) >= 14 and buf[6:14] == _HEAP_MAGIC and buf[:2] in (b"II", b"MM")


def _walk_heap(buf: bytes, start: int, end: int, endian: str, out: dict, depth: int = 0):
    """Yield (type, payload) for every record, recursing into sub-heaps."""
    if depth > 4 or end - start < 4 or end > len(buf):
        return
    (dir_off,) = struct.unpack_from(endian + "I", buf, end - 4)
    pos = start + dir_off
    if not start <= pos <= end - 2:
        return
    (nrecs,) = struct.unpack_from(endian + "H", buf, pos)
    pos += 2
    for _ in range(min(nrecs, 256)):
        if pos + 10 > end:
            return
        typ, length, off = struct.unpack_from(endian + "HII", buf, pos)
        if typ & 0x4000:  # value stored in the 8 record bytes themselves
            payload = buf[pos + 2 : pos + 10]
        else:
            a0 = start + off
            if a0 < start or a0 + length > end:
                pos += 10
                continue
            payload = buf[a0 : a0 + length]
            if (typ >> 8) in (0x28, 0x30):  # nested sub-heap
                _walk_heap(buf, a0, a0 + length, endian, out, depth + 1)
                pos += 10
                continue
        out.setdefault(typ & 0x3FFF, payload)
        pos += 10


def _records(buf: bytes) -> tuple[dict, str]:
    endian = "<" if buf[:2] == b"II" else ">"
    (heap_start,) = struct.unpack_from(endian + "I", buf, 2)
    out: dict = {}
    if 14 <= heap_start < len(buf):
        _walk_heap(buf, heap_start, len(buf), endian, out)
    return out, endian


def extract_preview(buf: bytes) -> bytes | None:
    """Embedded JPEG thumbnail (CIFF tag 0x2007)."""
    if not is_crw(buf):
        return None
    recs, _ = _records(buf)
    jpg = recs.get(0x2007)
    if jpg and jpg[:2] == b"\xff\xd8":
        return bytes(jpg)
    return None


def extract_metadata(buf: bytes) -> dict:
    """Make/Model (+ capture time) from the CIFF heap."""
    if not is_crw(buf):
        return {}
    recs, endian = _records(buf)
    meta: dict = {}
    mm = recs.get(0x080A)
    if mm:
        parts = [p.decode("ascii", "replace") for p in bytes(mm).split(b"\0") if p]
        if parts:
            meta["EXIF:Make"] = parts[0].strip()
        if len(parts) > 1:
            meta["EXIF:Model"] = parts[1].strip()
    ts = recs.get(0x180E)
    if ts and len(ts) >= 4:
        (t,) = struct.unpack_from(endian + "I", ts, 0)
        if t:
            import datetime

            dt = datetime.datetime.fromtimestamp(t, datetime.timezone.utc)
            meta["EXIF:DateTimeOriginal"] = dt.strftime("%Y:%m:%d %H:%M:%S")
    return meta
