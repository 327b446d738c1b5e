"""Synthetic RAW fixture writers for the vendor TIFF dialects.

Each writer emits the structural skeleton a real camera file has (magic,
IFD layout, tag dialect, bit packing), so the parser's format handling is
exercised without camera files (mirroring how the reference's test_gui.py
fakes its generators).
"""

from __future__ import annotations

import struct

import numpy as np


def _pack12(vals: np.ndarray) -> bytes:
    v = vals.astype(np.uint16).ravel()
    if v.size % 2:
        v = np.append(v, 0)
    v = v.reshape(-1, 2)
    out = np.empty((v.shape[0], 3), np.uint8)
    out[:, 0] = v[:, 0] >> 4
    out[:, 1] = ((v[:, 0] & 0x0F) << 4) | (v[:, 1] >> 8)
    out[:, 2] = v[:, 1] & 0xFF
    return out.tobytes()


def _pack14(vals: np.ndarray) -> bytes:
    v = vals.astype(np.uint16).ravel()
    pad = (-v.size) % 4
    if pad:
        v = np.append(v, np.zeros(pad, np.uint16))
    v = v.reshape(-1, 4)
    out = np.empty((v.shape[0], 7), np.uint8)
    out[:, 0] = v[:, 0] >> 6
    out[:, 1] = ((v[:, 0] & 0x3F) << 2) | (v[:, 1] >> 12)
    out[:, 2] = (v[:, 1] >> 4) & 0xFF
    out[:, 3] = ((v[:, 1] & 0x0F) << 4) | (v[:, 2] >> 10)
    out[:, 4] = (v[:, 2] >> 2) & 0xFF
    out[:, 5] = ((v[:, 2] & 0x03) << 6) | (v[:, 3] >> 8)
    out[:, 6] = v[:, 3] & 0xFF
    return out.tobytes()


class _Ifd:
    """Minimal TIFF IFD builder with a shared out-of-line heap."""

    def __init__(self):
        self.entries: list[tuple[int, int, list]] = []

    def add(self, tag: int, typ: int, values):
        self.entries.append((tag, typ, values))

    def size(self) -> int:
        return 2 + 12 * len(self.entries) + 4


def _serialize(
    ifds: list[_Ifd],
    data_blobs: list[bytes],
    next_links=None,
    header: int = 8,
    magic: int = 42,
    endian: str = "<",
) -> bytes:
    """Layout: header, IFDs in order, heap, data blobs. Placeholder tag
    values of the form ("blob", i) / ("ifd", i) resolve to offsets."""
    offsets = []
    pos = header
    for ifd in ifds:
        offsets.append(pos)
        pos += ifd.size()
    heap = bytearray()
    heap_base = pos

    def entry_bytes(tag, typ, values, heap_pos):
        if typ == 2:
            raw = values.encode("ascii") + b"\0"
            n = len(raw)
        elif typ in (5, 10):
            fmt = "II" if typ == 5 else "ii"
            raw = b"".join(struct.pack(endian + fmt, *v) for v in values)
            n = len(values)
        elif typ == 7:
            raw = bytes(values)
            n = len(raw)
        else:
            fmt = {1: "B", 3: "H", 4: "I"}[typ]
            raw = struct.pack(endian + fmt * len(values), *values)
            n = len(values)
        if len(raw) <= 4:
            return struct.pack(endian + "HHI", tag, typ, n) + raw + b"\0" * (4 - len(raw)), None
        return struct.pack(endian + "HHI", tag, typ, n) + struct.pack(endian + "I", heap_pos), raw

    # Two passes: first compute heap size with placeholders resolved late.
    # Simpler: resolve placeholders now (blob offsets depend on heap size,
    # so compute heap first with dummy zeros, then patch).
    serialized = []
    blob_refs = []  # (ifd_idx, entry_idx) needing blob offset patch
    multi_refs = []  # (heap_pos, [blob indices]) for offset ARRAYS
    heap_cursor = heap_base
    for i, ifd in enumerate(ifds):
        ents = []
        for j, (tag, typ, values) in enumerate(ifd.entries):
            vals = values
            if isinstance(values, tuple) and values and values[0] == "blobs" and len(values[1]) == 1:
                values = ("blob", values[1][0])  # count-1 arrays are inline
            if isinstance(values, tuple) and values and values[0] in ("blob", "blob7"):
                blob_refs.append((i, j, values[1], 7 if values[0] == "blob7" else 4))
                vals = [0]
                typ = 4
            elif isinstance(values, tuple) and values and values[0] == "blobs":
                # Offset ARRAY (e.g. TileOffsets): reserve heap space now,
                # patch the offsets once the data base is known.
                idxs = list(values[1])
                multi_refs.append((heap_cursor, idxs))
                eb = struct.pack(endian + "HHI", tag, 4, len(idxs)) + struct.pack(
                    endian + "I", heap_cursor
                )
                heap += b"\0" * (4 * len(idxs))
                heap_cursor = heap_base + len(heap)
                ents.append(eb)
                continue
            elif isinstance(values, tuple) and values and values[0] == "ifd":
                vals = [offsets[values[1]]]
                typ = 4
            eb, raw = entry_bytes(tag, typ, vals, heap_cursor)
            if raw is not None:
                heap += raw if len(raw) % 2 == 0 else raw + b"\0"
                heap_cursor = heap_base + len(heap)
            ents.append(eb)
        serialized.append(ents)

    data_base = heap_base + len(heap)
    blob_offsets = []
    pos = data_base
    for blob in data_blobs:
        blob_offsets.append(pos)
        pos += len(blob) + (len(blob) % 2)
    for i, j, bi, ptyp in blob_refs:
        tag, _, _ = ifds[i].entries[j]
        count = len(data_blobs[bi]) if ptyp == 7 else 1
        serialized[i][j] = struct.pack(endian + "HHI", tag, ptyp, count) + struct.pack(
            endian + "I", blob_offsets[bi]
        )
    for heap_pos, idxs in multi_refs:
        packed = struct.pack(endian + "I" * len(idxs), *[blob_offsets[k] for k in idxs])
        at = heap_pos - heap_base
        heap[at : at + len(packed)] = packed

    bom = b"II" if endian == "<" else b"MM"
    out = bytearray(bom + struct.pack(endian + "HI", magic, header))
    out += b"\0" * (header - len(out))
    next_links = next_links or {}
    for i, (ifd, ents) in enumerate(zip(ifds, serialized)):
        nxt = next_links.get(i)
        nxt_off = offsets[nxt] if nxt is not None else 0
        out += struct.pack(endian + "H", len(ents)) + b"".join(ents) + struct.pack(endian + "I", nxt_off)
    out += heap
    for blob in data_blobs:
        out += blob
        if len(blob) % 2:
            out += b"\0"
    return bytes(out)


def write_dng_tiled(
    path, mosaic, tile_w=64, tile_h=32, make="raw2film-tpu", model="tiled"
):
    """Lossless-JPEG TILED DNG (the layout camera DNGs and Adobe DNG
    Converter output use): the raw IFD carries TileWidth/Length/Offsets/
    ByteCounts with one LJPEG blob per tile (edge tiles padded)."""
    from raw2film_tpu.io.ljpeg import encode_ljpeg

    h, w = mosaic.shape
    m = np.asarray(mosaic, np.uint16)
    tiles = []
    for ty in range(0, h, tile_h):
        for tx in range(0, w, tile_w):
            t = np.zeros((tile_h, tile_w), np.uint16)
            blk = m[ty : ty + tile_h, tx : tx + tile_w]
            t[: blk.shape[0], : blk.shape[1]] = blk
            tiles.append(encode_ljpeg(t))

    from raw2film_tpu.data import XYZ_TO_REC709

    ifd0 = _Ifd()
    ifd0.add(254, 4, [0])
    ifd0.add(256, 4, [w])
    ifd0.add(257, 4, [h])
    ifd0.add(258, 3, [16])
    ifd0.add(259, 3, [7])
    ifd0.add(262, 3, [32803])
    ifd0.add(271, 2, make)
    ifd0.add(272, 2, model)
    ifd0.add(277, 3, [1])
    ifd0.add(322, 4, [tile_w])
    ifd0.add(323, 4, [tile_h])
    ifd0.add(324, 4, ("blobs", list(range(len(tiles)))))
    ifd0.add(325, 4, [len(t) for t in tiles])
    ifd0.add(33421, 3, [2, 2])
    ifd0.add(33422, 1, [0, 1, 1, 2])  # RGGB
    ifd0.add(50706, 1, [1, 4, 0, 0])
    ifd0.add(50714, 3, [0])
    ifd0.add(50717, 3, [65535])
    cm = np.asarray(XYZ_TO_REC709, np.float64).ravel()
    ifd0.add(50721, 10, [(int(round(x * 10000)), 10000) for x in cm])
    blob = _serialize([ifd0], tiles)
    with open(path, "wb") as f:
        f.write(blob)


def write_nef(path, mosaic, bits=14, make="NIKON CORPORATION", model="NIKON Z 6"):
    """NEF skeleton: IFD0 (metadata + SubIFD pointer), raw in the SubIFD,
    bit-packed samples."""
    h, w = mosaic.shape
    payload = _pack14(mosaic) if bits == 14 else _pack12(mosaic)
    raw = _Ifd()
    raw.add(254, 4, [0])
    raw.add(256, 4, [w])
    raw.add(257, 4, [h])
    raw.add(258, 3, [bits])
    raw.add(259, 3, [1])
    raw.add(262, 3, [32803])
    raw.add(273, 4, ("blob", 0))
    raw.add(277, 3, [1])
    raw.add(278, 4, [h])
    raw.add(279, 4, [len(payload)])
    raw.add(33421, 3, [2, 2])
    raw.add(33422, 1, [0, 1, 1, 2])  # RGGB
    exif = _Ifd()
    exif.add(33434, 5, [(1, 250)])
    exif.add(33437, 5, [(28, 10)])
    exif.add(34855, 3, [400])
    ifd0 = _Ifd()
    ifd0.add(256, 4, [32])  # thumbnail-sized decoy dims
    ifd0.add(257, 4, [32])
    ifd0.add(271, 2, make)
    ifd0.add(272, 2, model)
    ifd0.add(330, 4, ("ifd", 1))
    ifd0.add(34665, 4, ("ifd", 2))
    blob = _serialize([ifd0, raw, exif], [payload])
    with open(path, "wb") as f:
        f.write(blob)


class _MsbBitWriter:
    """MSB-first bit writer WITHOUT JPEG byte stuffing (Nikon streams)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, nbits: int):
        if nbits <= 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.buf.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def done(self) -> bytes:
        if self.nbits:
            self.put(0, 8 - self.nbits)
        return bytes(self.buf)


def _canonical_codes(counts, values):
    """JPEG-canonical (code, length) per symbol value. Tables whose counts
    outnumber the listed values pad with symbol 0 — the dcraw nikon_tree
    rows rely on their trailing zero bytes this way (the 12-bit lossy tree
    lists 13 values for 14 codes)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[values[k] if k < len(values) else 0] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def nef_compress_lossless(mosaic: np.ndarray, bits: int) -> tuple[bytes, bytes]:
    """Encode a mosaic as a Nikon lossless-compressed bitstream. Returns
    (bitstream, makernote 0x0096 blob). Inverse of
    raw2film_tpu/io/nef.py::decode_nef_compressed for version 0x46."""
    from raw2film_tpu.io.nef import _TREES

    counts, values = _TREES[f"{bits}_lossless"]
    codes = _canonical_codes(counts, values)
    m = mosaic.astype(np.int64)
    h, w = m.shape
    vpred_init = np.full((2, 2), 1 << (bits - 1), np.int64)
    vpred = vpred_init.copy()
    bw = _MsbBitWriter()
    hpred = [0, 0]
    for row in range(h):
        for col in range(w):
            target = int(m[row, col])
            if col < 2:
                diff = target - int(vpred[row & 1, col])
                vpred[row & 1, col] = target
                hpred[col] = target
            else:
                diff = target - hpred[col & 1]
                hpred[col & 1] = target
            cat = int(abs(diff)).bit_length()
            code, length = codes[cat]
            bw.put(code, length)
            if cat:
                bw.put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    blob = bytes([0x46, 0x30]) + struct.pack(
        "<4H", *[int(x) for x in vpred_init.ravel()]
    ) + struct.pack("<H", 1)  # csize=1: identity curve
    return bw.done(), blob


def _nef_tree_symbols(counts, values):
    """(symbol, code, code_len) per tree entry, canonical order."""
    codes = _canonical_codes(counts, values)
    return [(sym, c, l) for sym, (c, l) in codes.items()]


def _nef_decode_diff(v: int, length: int, shl: int) -> int:
    """dcraw nikon_load_raw residual reconstruction: extra bits ``v`` of a
    symbol (len=length, shl=high-nibble shift) -> signed diff. shl>0 symbols
    (the after-split lossy trees) reconstruct on a 2^shl grid."""
    diff = ((v << 1) + 1) << shl >> 1
    if length > 0 and (diff & (1 << (length - 1))) == 0:
        diff -= (1 << length) - (0 if shl else 1)
    return diff


def nef_lossy_stream(
    bits: int,
    width: int,
    height: int,
    version=(0x44, 0x10),
    split_row: int = 0,
    seed: int = 0,
    csize: int = 257,
    d100_filler: bool = False,
):
    """Adversarial lossy-NEF conformance fixture: a random-but-valid symbol
    stream drawn from the real lossy code tables, the matching MakerNote
    0x0096 blob, and the EXPECTED decode computed by an independent Python
    model of the dcraw semantics (predictors accumulate unclamped; only the
    final curve lookup clamps to the curve range).

    Returns (bitstream, blob96, expected uint16[height, width]).
    """
    from raw2film_tpu.io.nef import _TREES

    b = "14" if bits == 14 else "12"
    vmax = 1 << bits
    rng = np.random.default_rng(seed)

    # Curve: monotone random tone samples. Type-1 lossy (0x44 0x10 /
    # D100-era) uses the csize samples directly; split versions (0x44
    # 0x20/0x40) expand by linear interpolation over vmax (0x40: quarter
    # range).
    samples = np.sort(rng.integers(0, 65536, csize)).astype(np.uint16)
    ver0, ver1 = version
    is_split = ver0 == 0x44 and ver1 in (0x20, 0x40)
    if is_split:
        srange = vmax // 4 if ver1 == 0x40 else vmax
        step = srange // (csize - 1)
        xs = np.clip(np.arange(csize) * step, 0, vmax - 1)
        curve = np.interp(np.arange(vmax), xs, samples.astype(np.float64))
        curve = curve.astype(np.uint16)
    else:
        curve = samples.copy()

    vpred_init = rng.integers(0, vmax, (2, 2)).astype(np.int64)
    trees = [_nef_tree_symbols(*_TREES[f"{b}_lossy"])]
    use_split = is_split and 0 < split_row < height
    if use_split:
        trees.append(_nef_tree_symbols(*_TREES[f"{b}_split"]))

    bw = _MsbBitWriter()
    expected = np.zeros((height, width), np.uint16)
    vpred = vpred_init.copy()
    hpred = [0, 0]
    cur = trees[0]
    for row in range(height):
        if use_split and row == split_row:
            cur = trees[1]
        for col in range(width):
            sym, code, code_len = cur[int(rng.integers(0, len(cur)))]
            length, shl = sym & 15, sym >> 4
            nextra = length - shl
            # Bias extras toward the edges (0 / max) half the time: the
            # adversarial cases for the reconstruction and sign logic.
            if nextra > 0:
                if rng.integers(0, 2):
                    v = int(rng.integers(0, 1 << nextra))
                else:
                    v = 0 if rng.integers(0, 2) else (1 << nextra) - 1
            else:
                v = 0
            bw.put(code, code_len)
            if nextra > 0:
                bw.put(v, nextra)
            diff = _nef_decode_diff(v, length, shl)
            if col < 2:
                vpred[row & 1, col] += diff
                hpred[col] = int(vpred[row & 1, col])
            else:
                hpred[col & 1] += diff
            idx = min(max(hpred[col & 1], 0), len(curve) - 1)
            expected[row, col] = curve[idx]

    blob = bytearray(version)
    if d100_filler:
        blob += b"\0" * 2110  # 0x49/0x58 layouts: filler before vpred
    blob += struct.pack("<4H", *[int(x) for x in vpred_init.ravel()])
    blob += struct.pack("<H", csize)
    blob += struct.pack(f"<{csize}H", *[int(s) for s in samples])
    if is_split:
        if len(blob) < 562:
            blob += b"\0" * (562 - len(blob))
        blob += struct.pack("<H", split_row)
    return bw.done(), bytes(blob), expected


def nef_compress_lossy(
    mosaic: np.ndarray, bits: int, split_row: int = 0, csize: int = 257
):
    """Encode curve-domain values as a lossy NEF stream (version 0x44 0x20).
    Before the split row the type-1 trees are plain ssss categories (every
    residual exact); after it the split trees quantize large residuals to a
    2^shl grid, so the encoder is greedy nearest-representable and tracks
    the DECODER's reconstruction as its predictor state.

    ``mosaic`` holds curve indices in [0, 2^bits). Returns (bitstream,
    blob96, expected uint16 = curve[decoded indices]) with an identity-
    sampled curve, so expected ~= mosaic up to curve sampling and residual
    quantization.
    """
    from raw2film_tpu.io.nef import _TREES

    b = "14" if bits == 14 else "12"
    vmax = 1 << bits
    m = np.asarray(mosaic, np.int64)
    h, w = m.shape
    if not (0 < split_row < h):
        raise ValueError("split_row must land inside the image")

    # Identity-sampled curve: samples at step boundaries, expanded back by
    # the decoder's linear interp (exact at multiples of step).
    step = vmax // (csize - 1)
    samples = np.minimum(np.arange(csize) * step, vmax - 1).astype(np.uint16)
    xs = np.clip(np.arange(csize) * step, 0, vmax - 1)
    curve = np.interp(np.arange(vmax), xs, samples.astype(np.float64))
    curve = curve.astype(np.uint16)

    def nearest(tree, d):
        """(symbol, code, len, v, decoded_diff) minimizing |decoded - d|."""
        best = None
        for sym, code, code_len in tree:
            length, shl = sym & 15, sym >> 4
            if length == 0:
                cand = [(0, 0)]
            else:
                nextra = length - shl
                off = 1 << (shl - 1) if shl else 0
                neg_corr = (1 << length) - (0 if shl else 1)
                vt_pos = (d - off) >> shl if d >= 0 else 0
                vt_neg = (d + neg_corr - off) >> shl if d < 0 else 0
                cand = []
                for vt in {vt_pos, vt_pos + 1, vt_neg, vt_neg + 1}:
                    vt = min(max(vt, 0), (1 << nextra) - 1)
                    cand.append((vt, _nef_decode_diff(vt, length, shl)))
            for vt, dd in cand:
                err = abs(dd - d)
                if best is None or err < best[0] or (
                    err == best[0] and code_len < best[1]
                ):
                    best = (err, code_len, sym, code, vt, dd)
        _, code_len, sym, code, vt, dd = best
        return sym, code, code_len, vt, dd

    tree1 = _nef_tree_symbols(*_TREES[f"{b}_lossy"])
    tree2 = _nef_tree_symbols(*_TREES[f"{b}_split"])
    bw = _MsbBitWriter()
    expected = np.zeros((h, w), np.uint16)
    vpred_init = np.full((2, 2), 1 << (bits - 1), np.int64)
    vpred = vpred_init.copy()
    hpred = [0, 0]
    tree = tree1
    for row in range(h):
        if row == split_row:
            tree = tree2
        for col in range(w):
            target = int(m[row, col])
            prev = int(vpred[row & 1, col]) if col < 2 else hpred[col & 1]
            sym, code, code_len, v, dd = nearest(tree, target - prev)
            length, shl = sym & 15, sym >> 4
            bw.put(code, code_len)
            if length - shl > 0:
                bw.put(v, length - shl)
            dec = prev + dd
            if col < 2:
                vpred[row & 1, col] = dec
                hpred[col] = dec
            else:
                hpred[col & 1] = dec
            expected[row, col] = curve[min(max(dec, 0), vmax - 1)]

    blob = bytearray([0x44, 0x20])
    blob += struct.pack("<4H", *[int(x) for x in vpred_init.ravel()])
    blob += struct.pack("<H", csize)
    blob += struct.pack(f"<{csize}H", *[int(s) for s in samples])
    blob += b"\0" * (562 - len(blob))
    blob += struct.pack("<H", split_row)
    return bw.done(), bytes(blob), expected


def _nikon_makernote(blob_0x96: bytes) -> bytes:
    """Self-contained Nikon MakerNote: "Nikon\\0" header + embedded
    little-endian TIFF whose value offsets are relative to its own start."""
    # embedded TIFF: header (8) + IFD with 1 entry (2 + 12 + 4 = 18) = 26
    blob_off = 26
    tiff = bytearray(b"II" + struct.pack("<HI", 42, 8))
    tiff += struct.pack("<H", 1)
    tiff += struct.pack("<HHI", 0x0096, 7, len(blob_0x96)) + struct.pack(
        "<I", blob_off
    )
    tiff += struct.pack("<I", 0)
    assert len(tiff) == blob_off
    tiff += blob_0x96
    return b"Nikon\x00\x02\x10\x00\x00" + bytes(tiff)


def write_nef_compressed(
    path, mosaic, bits=14, make="NIKON CORPORATION", model="NIKON Z 7",
    endian="<",
):
    """NEF with the real Nikon-compressed layout: Compression 34713 raw
    strip + MakerNote 0x0096 linearization blob (lossless version 0x46).
    ``endian=">"`` writes a big-endian (MM) container — what real Nikon
    bodies produce; the embedded MakerNote TIFF keeps its own BOM."""
    h, w = mosaic.shape
    payload, blob96 = nef_compress_lossless(np.asarray(mosaic), bits)
    _write_nef_container(path, payload, blob96, w, h, bits, make, model, endian)


def write_nef_lossy(
    path, mosaic, bits=14, split_row=None,
    make="NIKON CORPORATION", model="NIKON D780",
):
    """NEF carrying a LOSSY (version 0x44 0x20) compressed strip: sampled
    linearization curve + split-row tree switch. Returns the expected
    decode (curve-applied, residual-quantized after the split row)."""
    h, w = mosaic.shape
    payload, blob96, expected = nef_compress_lossy(
        np.asarray(mosaic), bits, split_row=split_row or h // 2
    )
    _write_nef_container(path, payload, blob96, w, h, bits, make, model, "<")
    return expected


def _write_nef_container(
    path, payload, blob96, w, h, bits, make, model, endian
):
    raw = _Ifd()
    raw.add(254, 4, [0])
    raw.add(256, 4, [w])
    raw.add(257, 4, [h])
    raw.add(258, 3, [bits])
    raw.add(259, 3, [34713])
    raw.add(262, 3, [32803])
    raw.add(273, 4, ("blob", 0))
    raw.add(277, 3, [1])
    raw.add(278, 4, [h])
    raw.add(279, 4, [len(payload)])
    raw.add(33421, 3, [2, 2])
    raw.add(33422, 1, [0, 1, 1, 2])  # RGGB
    exif = _Ifd()
    exif.add(33434, 5, [(1, 250)])
    exif.add(33437, 5, [(28, 10)])
    exif.add(34855, 3, [400])
    exif.add(37500, 7, _nikon_makernote(blob96))
    ifd0 = _Ifd()
    ifd0.add(256, 4, [32])
    ifd0.add(257, 4, [32])
    ifd0.add(271, 2, make)
    ifd0.add(272, 2, model)
    ifd0.add(330, 4, ("ifd", 1))
    ifd0.add(34665, 4, ("ifd", 2))
    blob = _serialize([ifd0, raw, exif], [payload], endian=endian)
    with open(path, "wb") as f:
        f.write(blob)


def rw2_v4_compress(mosaic: np.ndarray) -> bytes:
    """Encode a 12-bit mosaic as a Panasonic v4 bitstream (inverse of
    native r2f_decode_rw2_v4). Emits sh=0 tokens and plain 8-bit deltas, so
    the input must satisfy: width % 14 == 0, all samples in [0x80, 0xfff],
    and same-lane horizontal deltas within +/-127 (random-walk fixture data
    — the regime real sensor rows live in)."""
    m = np.asarray(mosaic, np.int64)
    h, w = m.shape
    assert w % 14 == 0
    assert m.min() >= 0x80 and m.max() <= 0xFFF, "samples out of v4 fixture range"

    SECTION, SPLIT = 0x4000, 0x1FF8
    packets = []
    for row in range(h):
        for p0 in range(0, w, 14):
            buf = bytearray(17)
            p = 0

            def put(value, n):
                # Inverse of pana_bits: with v = 128 - p bits remaining
                # after the read ends at p, bits live at (pk[v>>3] |
                # pk[(v>>3)+1] << 8) >> (v & 7).
                nonlocal p
                p += n
                v = 128 - p
                byte, shift = v >> 3, v & 7
                word = (buf[byte] | (buf[byte + 1] << 8)) | (
                    (value & ((1 << n) - 1)) << shift
                )
                buf[byte] = word & 0xFF
                buf[byte + 1] = (word >> 8) & 0xFF

            pred = [0, 0]
            seeded = [False, False]
            for i in range(14):
                if i % 3 == 2:
                    put(0, 2)  # sh = 0
                t = int(m[row, p0 + i])
                lane = i & 1
                if not seeded[lane]:
                    put(t >> 4, 8)  # nonz seed (>= 8 given t >= 0x80)
                    put(t & 0xF, 4)
                    seeded[lane] = True
                else:
                    delta = t - pred[lane]
                    assert -127 <= delta <= 127, "lane delta too large for fixture"
                    put(delta + 0x80, 8)
                pred[lane] = t
            assert p <= 128
            packets.append(bytes(buf[:16]))

    stream = bytearray()
    per_sec = SECTION // 16
    for s0 in range(0, len(packets), per_sec):
        # Packets fill each section FORWARD (dcraw's ^0x3ff0 flips only the
        # within-packet byte order); bytes within a packet are written
        # high-to-low by the put() addressing above.
        sec = bytearray(SECTION)
        for k, pkt in enumerate(packets[s0 : s0 + per_sec]):
            base = 16 * k
            sec[base : base + 16] = pkt
        stream += bytes(sec[SECTION - SPLIT :]) + bytes(sec[: SECTION - SPLIT])
    return bytes(stream)


def _rw2_pack_packets(mosaic: np.ndarray, bits: int) -> np.ndarray:
    """LSB-first 16-byte packet packing shared by v5 and v7 (10 px at
    12-bit, 9 at 14)."""
    per = 10 if bits == 12 else 9
    v = np.asarray(mosaic, np.uint64).ravel()
    pad = (-len(v)) % per
    if pad:
        v = np.append(v, np.zeros(pad, np.uint64))
    v = v.reshape(-1, per)
    lo = np.zeros(len(v), np.uint64)
    hi = np.zeros(len(v), np.uint64)
    for i in range(per):
        start = i * bits
        if start + bits <= 64:
            lo |= v[:, i] << np.uint64(start)
        elif start >= 64:
            hi |= v[:, i] << np.uint64(start - 64)
        else:
            low_bits = 64 - start
            lo |= (v[:, i] & np.uint64((1 << low_bits) - 1)) << np.uint64(start)
            hi |= v[:, i] >> np.uint64(low_bits)
    packets = np.empty((len(v), 16), np.uint8)
    packets[:, :8] = lo.astype("<u8").view(np.uint8).reshape(-1, 8)
    packets[:, 8:] = hi.astype("<u8").view(np.uint8).reshape(-1, 8)
    return packets.reshape(-1)


def rw2_v5_pack(mosaic: np.ndarray, bits: int = 14) -> bytes:
    """Inverse of io/rw2.py::decode_rw2_v5: LSB-first bit packing into
    16-byte packets (10 px at 12-bit, 9 at 14), rotated 0x4000 sections."""
    stream = _rw2_pack_packets(mosaic, bits)
    SECTION, SPLIT = 0x4000, 0x1FF8
    n_sec = -(-len(stream) // SECTION)
    full = np.zeros(n_sec * SECTION, np.uint8)
    full[: len(stream)] = stream
    full = full.reshape(n_sec, SECTION)
    rotated = np.concatenate([full[:, SECTION - SPLIT :], full[:, : SECTION - SPLIT]], axis=1)
    return rotated.reshape(-1).tobytes()


def rw2_v7_pack(mosaic: np.ndarray, bits: int = 14) -> bytes:
    """Inverse of io/rw2.py::decode_rw2_v7: the same packets, streamed
    straight (no section rotation)."""
    return _rw2_pack_packets(mosaic, bits).tobytes()


_V6_WIDTHS = (14, 14, 2, 10, 10, 10, 2, 10, 10, 10, 2, 10, 10, 10)
_V6_STARTS = (114, 100, 98, 88, 78, 68, 66, 56, 46, 36, 34, 24, 12, 2)


def _rw2_v6_pack_block(fields) -> bytes:
    """Pack the 14 v6 fields into a 128-bit LE block (MSB-first with the
    2-bit skip at [22,24) and 2 pad bits at the bottom — LibRaw's
    pana_cs6 layout)."""
    v = 0
    for val, start, width in zip(fields, _V6_STARTS, _V6_WIDTHS):
        v |= (int(val) & ((1 << width) - 1)) << start
    return v.to_bytes(16, "little")


def rw2_v6_encode(mosaic: np.ndarray, base: int = 0) -> bytes:
    """Inverse of io/rw2.py::decode_rw2_v6: 11-pixel blocks, two 14-bit
    parity seeds + 10-bit codes scaled by ``base`` (0 is lossless for
    random-walk data; base>0 quantizes by 1<<base). Requires width % 11
    == 0 and same-parity deltas representable at the chosen base."""
    m = np.asarray(mosaic, np.int64)
    h, w = m.shape
    assert w % 11 == 0
    eb = 4 if base == 3 else base
    pmul, pixel_base = 1 << eb, 0x200 << eb
    out = bytearray()
    for row in range(h):
        for b0 in range(0, w, 11):
            fields = []
            nonzero = [0, 0]
            seeded = [False, False]
            for pix in range(11):
                if pix % 3 == 2:
                    fields.append(base)
                t = int(m[row, b0 + pix]) + 0xF
                par = pix & 1
                if not seeded[par]:
                    assert 0 < t <= 0x3FFF, "v6 seed out of 14-bit range"
                    fields.append(t)
                    seeded[par] = True
                    nonzero[par] = t
                else:
                    offset = (
                        nonzero[par] - pixel_base
                        if pixel_base < 0x2000 and nonzero[par] > pixel_base
                        else 0
                    )
                    s = (t - offset) // pmul
                    assert 0 <= s <= 0x3FF, "delta out of v6 fixture range"
                    fields.append(s)
                    nonzero[par] = s * pmul + offset
            out += _rw2_v6_pack_block(fields)
    return bytes(out)


def write_rw2(
    path,
    mosaic,
    borders=None,
    raw_format=4,
    make="Panasonic",
    model="DC-GH5",
    cfa=1,
    bits=12,
    exif: dict | None = None,
):
    """RW2 skeleton: magic-85 TIFF, Panasonic tag dialect (sensor dims +
    active-area borders + per-channel blacks + RawDataOffset), v4-compressed
    or 16-bit payload."""
    h, w = mosaic.shape
    if raw_format == 4:
        payload = rw2_v4_compress(mosaic)
    elif raw_format == 5:
        payload = rw2_v5_pack(mosaic, bits=bits)
    elif raw_format == 6:
        payload = rw2_v6_encode(mosaic)
    elif raw_format == 7:
        payload = rw2_v7_pack(mosaic, bits=bits)
    else:
        payload = np.asarray(mosaic).astype("<u2").tobytes()
    top, left, bottom, right = borders or (0, 0, h, w)
    ifd0 = _Ifd()
    ifd0.add(0x0001, 7, b"0400")
    ifd0.add(0x0002, 3, [w])
    ifd0.add(0x0003, 3, [h])
    ifd0.add(0x0004, 3, [top])
    ifd0.add(0x0005, 3, [left])
    ifd0.add(0x0006, 3, [bottom])
    ifd0.add(0x0007, 3, [right])
    ifd0.add(0x0009, 3, [cfa])
    ifd0.add(0x000A, 3, [bits])
    ifd0.add(0x0017, 3, [200])
    ifd0.add(0x001C, 3, [128])  # blacks minus the +15 pedestal
    ifd0.add(0x001D, 3, [128])
    ifd0.add(0x001E, 3, [128])
    ifd0.add(0x002D, 3, [raw_format])
    ifd0.add(0x010F, 2, make)
    ifd0.add(0x0110, 2, model)
    ifd0.add(0x0112, 3, [1])
    ifd0.add(0x0118, 4, ("blob", 0))
    ifds = [ifd0]
    if exif:
        sub = _Ifd()
        if "ExposureTime" in exif:
            sub.add(33434, 5, [exif["ExposureTime"]])
        if "FNumber" in exif:
            sub.add(33437, 5, [exif["FNumber"]])
        if "FocalLength" in exif:
            sub.add(37386, 5, [exif["FocalLength"]])
        if "LensModel" in exif:
            sub.add(42036, 2, exif["LensModel"])
        ifd0.add(0x8769, 4, ("ifd", 1))
        ifds.append(sub)
    blob = _serialize(ifds, [payload], magic=0x55)
    with open(path, "wb") as f:
        f.write(blob)


def rw2_walk_mosaic(h: int, w: int, seed: int = 0) -> np.ndarray:
    """Random-walk 12-bit mosaic within the v4 fixture encoder's regime."""
    rng = np.random.default_rng(seed)
    steps = rng.integers(-60, 61, (h, w))
    m = 2048 + np.cumsum(steps, axis=1)
    # Reflect into [0x180, 0xE7F] so lane deltas stay small but values span
    # a wide range.
    lo, hi = 0x180, 0xE7F
    m = lo + np.abs((m - lo) % (2 * (hi - lo)) - (hi - lo))
    return m.astype(np.uint16)


def exif_jpeg(
    make="FUJIFILM",
    model="X-T5",
    iso=800,
    focal=35.0,
    fnumber=2.0,
    lens="XF35mmF2 R WR",
    exposure=(1, 125),
) -> bytes:
    """Minimal JPEG carrying a real APP1 Exif segment (SOI + APP1 + EOI) —
    the way RAF embeds the shot's EXIF in its preview JPEG."""
    ifd0 = _Ifd()
    ifd0.add(271, 2, make)
    ifd0.add(272, 2, model)
    ifd0.add(274, 3, [1])
    ifd0.add(34665, 4, ("ifd", 1))
    exif = _Ifd()
    exif.add(33434, 5, [exposure])
    exif.add(33437, 5, [(int(fnumber * 10), 10)])
    exif.add(34855, 3, [iso])
    exif.add(37386, 5, [(int(focal * 10), 10)])
    exif.add(42036, 2, lens)
    tiff = _serialize([ifd0, exif], [])
    app1 = b"Exif\x00\x00" + tiff
    return (
        b"\xff\xd8\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1 + b"\xff\xd9"
    )


def write_raf(
    path,
    mosaic,
    xtrans: str | None = None,
    style: str = "tiff",
    model="X-T5",
    black=1022,
    compressed: bool = False,
    bits: int = 14,
    block_size: int = 96,
    preview_jpeg: bytes | None = None,
):
    """RAF skeleton: FUJIFILM header + offset table + CFA-header records
    (0x0100 dims, 0x0131 X-Trans layout) + CFA data as either an embedded
    Fuji TIFF (``style="tiff"``: 0xF001/2/3/7/8/A tags, modern bodies) or
    the bare sensor dump (``style="bare"``: older bodies). With
    ``compressed=True`` the payload is the lossless-compressed stream
    (``fuji_compress``) instead of the 16-bit dump."""
    h, w = mosaic.shape
    if compressed:
        payload = fuji_compress(
            mosaic, xtrans or "RGGB", bits=bits, block_size=block_size
        )
    else:
        payload = np.asarray(mosaic).astype("<u2").tobytes()

    # CFA header records (big-endian).
    records = []
    records.append((0x0100, struct.pack(">HH", h, w)))
    if xtrans:
        code = {"R": 0, "G": 1, "B": 2}
        records.append((0x0131, bytes(code[c] for c in xtrans)))
    cfa_hdr = struct.pack(">I", len(records))
    for tag, data in records:
        cfa_hdr += struct.pack(">HH", tag, len(data)) + data

    if style == "tiff":
        fuji = _Ifd()
        fuji.add(0xF001, 4, [w])
        fuji.add(0xF002, 4, [h])
        fuji.add(0xF003, 4, [bits])
        fuji.add(0xF007, 4, ("blob", 0))
        fuji.add(0xF008, 4, [len(payload)])
        fuji.add(0xF00A, 4, [black] * 4)
        ifd0 = _Ifd()
        ifd0.add(0xF000, 4, ("ifd", 1))
        cfa_data = _serialize([ifd0, fuji], [payload])
    else:
        cfa_data = payload

    header = bytearray(b"FUJIFILMCCD-RAW ")
    header += b"0201"  # format version
    header += b"FF000000"  # camera number
    header += model.encode("ascii").ljust(32, b"\0")
    header += b"0100"  # dir version
    header += b"\0" * 20
    assert len(header) == 0x54
    jpeg = preview_jpeg or b""
    jpeg_off = 0x6C if jpeg else 0
    cfa_hdr_off = 0x6C + len(jpeg)
    cfa_off = cfa_hdr_off + len(cfa_hdr)
    header += struct.pack(">II", jpeg_off, len(jpeg))
    header += struct.pack(">II", cfa_hdr_off, len(cfa_hdr))
    header += struct.pack(">II", cfa_off, len(cfa_data))
    assert len(header) == 0x6C
    with open(path, "wb") as f:
        f.write(bytes(header) + jpeg + cfa_hdr + cfa_data)


# --- Fuji lossless compression (inverse of native r2f_decode_fuji) -------

_FUJI_LINES = 18  # R0..R4, G0..G7, B0..B4
_FR = {"R": 0, "G": 5, "B": 13}  # plane base line indices


def _fuji_cell_index(p: int, is_xtrans: bool) -> int:
    if not is_xtrans:
        return p >> 1
    return (((p * 2 // 3) & ~1) | ((p % 3) & 1)) + ((p % 3) >> 1)


def _fuji_bit_diff(v1: int, v2: int) -> int:
    k = 0
    if v2 < v1:
        while True:
            if k > 12:
                break
            k += 1
            if not ((v2 << k) < v1):
                break
    return k


def _fuji_fill_rules(pattern: str) -> list[int]:
    """Per-R/B-line even-cell fill rules, derived from the CFA layout the
    same way the decoder does (rules order R2,B2,R3,B3,R4,B4)."""
    line_color = ["R", "B", "R", "B", "R", "B"]
    line_rows = [(0, 1), (0, 1), (2, 3), (2, 3), (4, 5), (4, 5)]
    rules = []
    for i in range(6):
        used = [False] * 4
        for row in line_rows[i]:
            for p in range(12):
                if pattern[row * 6 + (p % 6)] == line_color[i]:
                    used[_fuji_cell_index(p, True) & 3] = True
        if not used[1] or not used[3]:
            raise ValueError("CFA layout not representable by the fuji coder")
        if not used[0] and not used[2]:
            rules.append(4)
        elif not used[0]:
            rules.append(0)
        elif not used[2]:
            rules.append(2)
        else:
            rules.append(-1)
    return rules


class _FujiStripEncoder:
    """Exact mirror of the native strip decoder: same line buffers, pass
    schedule, gradient contexts and pad handling; emits the residual codes
    the decoder will read back."""

    def __init__(self, bits: int, lw: int):
        self.max_value = (1 << bits) - 1
        self.total = self.max_value + 1
        self.raw_bits = bits
        self.max_bits = 4 * bits
        self.min_value = 0x40
        self.max_diff = max(2, (self.total + 0x20) >> 6)
        self.lw = lw
        self.buf = np.zeros((_FUJI_LINES, lw + 2), np.int64)
        self.grad_even = [[[self.max_diff, 1] for _ in range(41)] for _ in range(3)]
        self.grad_odd = [[[self.max_diff, 1] for _ in range(41)] for _ in range(3)]
        self.out = _MsbBitWriter()

    def _q(self, d: int) -> int:
        a = abs(d)
        if a >= 0x114:
            c = 4
        elif a >= 0x43:
            c = 3
        elif a >= 0x12:
            c = 2
        elif a > 0:
            c = 1
        else:
            c = 0
        return -c if d < 0 else c

    def _emit(self, t: int, pr: int, grad: int, g: list) -> int:
        d = (t - pr) if grad >= 0 else (pr - t)
        c = ((d + self.total // 2) % self.total) - self.total // 2
        k = 2 * c if c >= 0 else -2 * c - 1
        assert 0 <= k < self.total
        threshold = self.max_bits - self.raw_bits - 1
        db = _fuji_bit_diff(g[0], g[1])
        zeros = k >> db
        if zeros < threshold:
            self.out.put(1, zeros + 1)  # `zeros` 0-bits then the 1
            self.out.put(k, db)
        else:
            self.out.put(1, threshold + 1)
            self.out.put(k - 1, self.raw_bits)
        g[0] += abs(c)
        if g[1] == self.min_value:
            g[0] >>= 1
            g[1] >>= 1
        g[1] += 1
        # The value the decoder reconstructs (== t: wrap is exact).
        val = pr + c if grad >= 0 else pr - c
        if val < 0:
            val += self.total
        elif val > self.max_value:
            val -= self.total
        assert val == t, (val, t)
        return val

    def _interp_even(self, l: int, c: int) -> int:
        b = self.buf
        Rb, Rc, Rd = b[l - 1, c], b[l - 1, c - 1], b[l - 1, c + 1]
        Rf = b[l - 2, c]
        dC, dF, dD = abs(Rc - Rb), abs(Rf - Rb), abs(Rd - Rb)
        if dC > dF and dC > dD:
            return int(Rf + Rd + 2 * Rb)
        if dD > dC and dD > dF:
            return int(Rf + Rc + 2 * Rb)
        return int(Rd + Rc + 2 * Rb)

    def _enc_even(self, l: int, pos: int, gs: list, target):
        c = pos + 1
        b = self.buf
        Rb, Rc, Rf = b[l - 1, c], b[l - 1, c - 1], b[l - 2, c]
        grad = 9 * self._q(int(Rb - Rf)) + self._q(int(Rc - Rb))
        pr = self._interp_even(l, c) >> 2
        t = pr if target is None else int(target)
        b[l, c] = self._emit(t, pr, grad, gs[abs(grad)])

    def _enc_odd(self, l: int, pos: int, gs: list, target):
        c = pos + 1
        b = self.buf
        Ra, Rg = b[l, c - 1], b[l, c + 1]
        Rb, Rc, Rd = b[l - 1, c], b[l - 1, c - 1], b[l - 1, c + 1]
        grad = 9 * self._q(int(Rb - Rc)) + self._q(int(Rc - Ra))
        if (Rb > Rc and Rb > Rd) or (Rb < Rc and Rb < Rd):
            pr = int(Rg + Ra + 2 * Rb) >> 2
        else:
            pr = int(Ra + Rg) >> 1
        t = pr if target is None else int(target)
        b[l, c] = self._emit(t, pr, grad, gs[abs(grad)])

    def _pass(self, la: int, lb: int, gs: int, fa: int, fb: int, targets):
        b, lw = self.buf, self.lw
        for l in (la, lb):
            b[l, 0] = b[l - 1, 1]
            b[l, lw + 1] = b[l - 1, lw]
        ae = ao = be = bo = 0
        ao = bo = 1
        while be < lw or bo < lw:
            if be < lw:
                if fa == 4 or (fa >= 0 and (ae & 3) == fa):
                    b[la, ae + 1] = self._interp_even(la, ae + 1) >> 2
                else:
                    self._enc_even(la, ae, self.grad_even[gs], targets[la][ae])
                ae += 2
                if fb == 4 or (fb >= 0 and (be & 3) == fb):
                    b[lb, be + 1] = self._interp_even(lb, be + 1) >> 2
                else:
                    self._enc_even(lb, be, self.grad_even[gs], targets[lb][be])
                be += 2
            if (be > 8 or be >= lw) and bo < lw:
                self._enc_odd(la, ao, self.grad_odd[gs], targets[la][ao])
                ao += 2
                self._enc_odd(lb, bo, self.grad_odd[gs], targets[lb][bo])
                bo += 2

    def encode_set(self, rules: list[int], targets):
        R2, R3, R4 = 2, 3, 4
        G2, G3, G4, G5, G6, G7 = 7, 8, 9, 10, 11, 12
        B2, B3, B4 = 15, 16, 17
        self._pass(R2, G2, 0, rules[0], -1, targets)
        self._pass(G3, B2, 1, -1, rules[1], targets)
        self._pass(R3, G4, 2, rules[2], -1, targets)
        self._pass(G5, B3, 0, -1, rules[3], targets)
        self._pass(R4, G6, 1, rules[4], -1, targets)
        self._pass(G7, B4, 2, rules[5], -1, targets)

    def rotate(self):
        b = self.buf
        b[0] = b[3]
        b[1] = b[4]
        b[5] = b[11]
        b[6] = b[12]
        b[13] = b[16]
        b[14] = b[17]


def fuji_compress(
    mosaic: np.ndarray,
    pattern: str,
    bits: int = 14,
    block_size: int = 96,
) -> bytes:
    """Encode a mosaic as a Fuji lossless-compressed payload: 16-byte
    header + 16-aligned strip size table + independently coded vertical
    strips (inverse of native r2f_decode_fuji). ``pattern`` is the
    frame-aligned CFA string: 36 chars = X-Trans, 4 = Bayer."""
    m = np.asarray(mosaic, np.int64)
    h, w = m.shape
    is_xtrans = len(pattern) == 36
    if m.min() < 0 or m.max() >= (1 << bits):
        raise ValueError(f"mosaic values must fit {bits} bits")
    if h % 6:
        raise ValueError("height must be a multiple of 6")
    if block_size % 12:
        raise ValueError("block_size must be a multiple of 12")
    step = 6 if is_xtrans else 2
    rounded = (w + step - 1) // step * step
    bir = (rounded + block_size - 1) // block_size
    total_lines = h // 6
    rules = _fuji_fill_rules(pattern) if is_xtrans else [-1] * 6
    strips = []
    for blk in range(bir):
        col0 = blk * block_size
        cols = min(block_size, rounded - col0)
        lw = cols * 2 // 3 if is_xtrans else cols // 2
        enc = _FujiStripEncoder(bits, lw)
        for ls in range(total_lines):
            targets = [[None] * lw for _ in range(_FUJI_LINES)]
            # Real pixels first, padding columns second (padding never
            # conflicts — it reuses whatever the cell already holds).
            for pad_sweep in (False, True):
                for r in range(6):
                    row = ls * 6 + r
                    for p in range(cols):
                        col = col0 + p
                        if (col >= w) != pad_sweep:
                            continue
                        color = (
                            pattern[(row % 6) * 6 + (col % 6)]
                            if is_xtrans
                            else pattern[(row % 2) * 2 + (col % 2)]
                        )
                        line = _FR[color] + 2 + (r if color == "G" else r // 2)
                        idx = _fuji_cell_index(p, is_xtrans)
                        t = int(m[row, min(col, w - 1)])
                        prev = targets[line][idx]
                        if pad_sweep:
                            if prev is None:
                                targets[line][idx] = t
                            continue
                        if prev is not None and prev != t:
                            raise ValueError(
                                "CFA layout maps two different samples to "
                                f"one coded cell (line {line}, idx {idx})"
                            )
                        targets[line][idx] = t
            enc.encode_set(rules, targets)
            enc.rotate()
        strips.append(enc.out.done())

    header = struct.pack(
        ">HBBBHHHHBH",
        0x4953,
        1,
        16 if is_xtrans else 0,
        bits,
        h,
        rounded,
        w,
        block_size,
        bir,
        total_lines,
    )
    table = b"".join(struct.pack(">I", len(s)) for s in strips)
    if len(table) & 0xC:
        table += b"\0" * (0x10 - (len(table) & 0xC))
    return header + table + b"".join(strips)


def arw2_compress(mosaic11: np.ndarray) -> bytes:
    """Encode an 11-bit mosaic as a Sony cRAW/ARW2 stream (inverse of
    native r2f_decode_arw2). Each 16-byte block codes 16 same-phase pixels;
    exact round-trips need every block's max-min <= 127 (sh = 0, the regime
    smooth sensor data occupies — larger spans quantize like the real
    camera encoder). Width must be a multiple of 32."""
    m = np.asarray(mosaic11, np.int64)
    h, w = m.shape
    assert w % 32 == 0
    assert m.min() >= 0 and m.max() <= 0x7FF

    out = bytearray()
    for row in range(h):
        # Decoder's column walk: even-phase block, odd-phase block, next 32.
        col_starts = []
        for base in range(0, w, 32):
            col_starts.append((base, 0))
            col_starts.append((base + 1, 1))
        for start, _phase in col_starts:
            vals = m[row, start : start + 32 : 2]
            vmax, vmin = int(vals.max()), int(vals.min())
            imax, imin = int(vals.argmax()), int(vals.argmin())
            if imax == imin:  # flat block: decoder takes imax first
                imin = (imax + 1) % 16
            sh = 0
            while sh < 4 and (0x80 << sh) <= vmax - vmin:
                sh += 1
            block = bytearray(17)
            hdr = (vmax & 0x7FF) | ((vmin & 0x7FF) << 11) | (imax << 22) | (imin << 26)
            block[0:4] = struct.pack("<I", hdr)
            bit = 30
            for i in range(16):
                if i in (imax, imin):
                    continue
                d = (int(vals[i]) - vmin) >> sh
                assert 0 <= d <= 0x7F
                byte = bit >> 3
                word = (block[byte] | (block[byte + 1] << 8)) | (d << (bit & 7))
                block[byte] = word & 0xFF
                block[byte + 1] = (word >> 8) & 0xFF
                bit += 7
            out += block[:16]
    return bytes(out)


def _sony_makernote(sr2_offset: int, sr2_length: int, key: int) -> bytes:
    """Sony MakerNote: "SONY DSC " header + IFD with the inline-u32
    SR2SubIFD tags (0x7200 offset, 0x7201 length, 0x7221 key)."""
    mn = bytearray(b"SONY DSC \x00\x00\x00")
    mn += struct.pack("<H", 3)
    for tag, val in ((0x7200, sr2_offset), (0x7201, sr2_length), (0x7221, key)):
        mn += struct.pack("<HHII", tag, 4, 1, val)
    mn += struct.pack("<I", 0)
    return bytes(mn)


def write_arw2(
    path, mosaic11, make="SONY", model="ILCE-7M3", sr2_curve_knots=None,
    sr2_key=0x1234ABCD,
):
    """ARW with the real cRAW layout: Compression 32767, one byte per
    pixel, 8-bit declared storage. ``sr2_curve_knots`` (4 ints) appends an
    ENCRYPTED SR2 region carrying tone-curve tag 0x7010 plus the Sony
    MakerNote pointing at it (io/sr2.py reads it back)."""
    h, w = mosaic11.shape
    payload = arw2_compress(mosaic11)
    ifd0 = _Ifd()
    ifd0.add(256, 4, [w])
    ifd0.add(257, 4, [h])
    ifd0.add(258, 3, [8])
    ifd0.add(259, 3, [32767])
    ifd0.add(262, 3, [32803])
    ifd0.add(271, 2, make)
    ifd0.add(272, 2, model)
    ifd0.add(273, 4, ("blob", 0))
    ifd0.add(277, 3, [1])
    ifd0.add(278, 4, [h])
    ifd0.add(279, 4, [len(payload)])
    ifd0.add(33421, 3, [2, 2])
    ifd0.add(33422, 1, [0, 1, 1, 2])  # RGGB
    if sr2_curve_knots is not None:
        exif = _Ifd()
        exif.add(34855, 3, [100])
        exif.add(37500, 7, _sony_makernote(0, 0, 0))  # patched below
        ifd0.add(34665, 4, ("ifd", 1))
        blob = bytearray(_serialize([ifd0, exif], [payload]))
        # SR2 region at the file end: one-entry IFD (0x7010, SHORT x4,
        # file-absolute value offset) + the knot values (<< 2, the reader
        # shifts back).
        sr2_off = len(blob)
        vals_off = sr2_off + 2 + 12 + 4
        sr2 = struct.pack("<H", 1)
        sr2 += struct.pack("<HHII", 0x7010, 3, 4, vals_off)
        sr2 += struct.pack("<I", 0)
        sr2 += struct.pack("<4H", *[int(k) << 2 for k in sr2_curve_knots])
        sr2 += b"\0" * ((-len(sr2)) % 4)
        from raw2film_tpu.io.sr2 import sony_decrypt

        blob += sony_decrypt(sr2, sr2_key)  # XOR stream: involution
        mn_pos = blob.find(b"SONY DSC")
        assert mn_pos > 0
        patched = _sony_makernote(sr2_off, len(sr2), sr2_key)
        blob[mn_pos : mn_pos + len(patched)] = patched
    else:
        blob = bytearray(_serialize([ifd0], [payload]))
    with open(path, "wb") as f:
        f.write(bytes(blob))


def arw2_walk_mosaic(h: int, w: int, seed: int = 0) -> np.ndarray:
    """11-bit mosaic whose 16-pixel phase blocks stay within a 127 span."""
    rng = np.random.default_rng(seed)
    base = rng.integers(200, 1800, (h, w // 32 + 1))
    m = np.zeros((h, w), np.int64)
    for b0 in range(0, w, 32):
        jitter = rng.integers(0, 120, (h, 32))
        m[:, b0 : b0 + 32] = base[:, [b0 // 32]] + jitter
    return np.clip(m, 0, 0x7FF).astype(np.uint16)


# Fixture Huffman table for Pentax PEF: categories 0..12, canonical
# left-aligned 12-bit code starts.
_PEF_LENS = [2, 3, 3, 3, 4, 4, 5, 6, 7, 8, 9, 10, 10]


def _pef_table():
    starts = []
    s = 0
    for L in _PEF_LENS:
        starts.append(s)
        s += 4096 >> L
    assert s <= 4096
    return starts, _PEF_LENS


def pef_compress(mosaic: np.ndarray, bits: int = 12) -> tuple[bytes, bytes]:
    """Encode a mosaic as a Pentax-Huffman stream. Returns (bitstream,
    MakerNote 0x0220 blob). Inverse of io/pef.py::decode_pef_compressed."""
    starts, lens = _pef_table()
    codes = {
        c: (starts[c] >> (12 - lens[c]), lens[c]) for c in range(len(lens))
    }
    m = np.asarray(mosaic, np.int64)
    h, w = m.shape
    assert m.max() < (1 << bits)
    bw = _MsbBitWriter()
    vpred = np.zeros((2, 2), np.int64)
    hpred = [0, 0]
    for row in range(h):
        for col in range(w):
            t = int(m[row, col])
            if col < 2:
                diff = t - int(vpred[row & 1, col])
                vpred[row & 1, col] = t
                hpred[col] = t
            else:
                diff = t - hpred[col & 1]
                hpred[col & 1] = t
            cat = int(abs(diff)).bit_length()
            code, L = codes[cat]
            bw.put(code, L)
            if cat:
                bw.put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    blob = struct.pack("<H", (len(lens) - 12) & 0xFFFF) + b"\0" * 12
    blob += struct.pack(f"<{len(starts)}H", *starts)
    blob += bytes(lens)
    return bw.done(), blob


def _pentax_makernote(blob_0x220: bytes) -> bytes:
    """Self-contained Pentax MakerNote: AOC header + one-entry IFD with
    value offsets relative to the MakerNote start."""
    base = 4 + 2  # prefix + order mark
    ifd_size = 2 + 12 + 4
    blob_off = base + ifd_size
    mn = bytearray(b"AOC\x00II")
    mn += struct.pack("<H", 1)
    mn += struct.pack("<HHI", 0x0220, 7, len(blob_0x220)) + struct.pack(
        "<I", blob_off
    )
    mn += struct.pack("<I", 0)
    assert len(mn) == blob_off
    mn += blob_0x220
    return bytes(mn)


def write_pef_compressed(path, mosaic, make="PENTAX", model="PENTAX K-3"):
    """PEF with the real Pentax-compressed layout: Compression 65535 +
    MakerNote 0x0220 Huffman table."""
    h, w = mosaic.shape
    payload, blob = pef_compress(mosaic)
    ifd0 = _Ifd()
    ifd0.add(256, 4, [w])
    ifd0.add(257, 4, [h])
    ifd0.add(258, 3, [12])
    ifd0.add(259, 3, [65535])
    ifd0.add(262, 3, [32803])
    ifd0.add(271, 2, make)
    ifd0.add(272, 2, model)
    ifd0.add(273, 4, ("blob", 0))
    ifd0.add(277, 3, [1])
    ifd0.add(278, 4, [h])
    ifd0.add(279, 4, [len(payload)])
    ifd0.add(33421, 3, [2, 2])
    ifd0.add(33422, 1, [0, 1, 1, 2])  # RGGB
    ifd0.add(34665, 4, ("ifd", 1))
    exif = _Ifd()
    exif.add(33434, 5, [(1, 250)])
    exif.add(34855, 3, [200])
    exif.add(37500, 7, _pentax_makernote(blob))
    blob_file = _serialize([ifd0, exif], [payload])
    with open(path, "wb") as f:
        f.write(blob_file)


def write_arw(path, mosaic, make="SONY", model="ILCE-7M3"):
    """ARW skeleton: raw in IFD0, 16-bit stored samples, no BlackLevel tag
    (the parser must apply the Sony pedestal default)."""
    h, w = mosaic.shape
    payload = mosaic.astype("<u2").tobytes()
    ifd0 = _Ifd()
    ifd0.add(256, 4, [w])
    ifd0.add(257, 4, [h])
    ifd0.add(258, 3, [16])
    ifd0.add(259, 3, [1])
    ifd0.add(262, 3, [32803])
    ifd0.add(271, 2, make)
    ifd0.add(272, 2, model)
    ifd0.add(273, 4, ("blob", 0))
    ifd0.add(277, 3, [1])
    ifd0.add(278, 4, [h])
    ifd0.add(279, 4, [len(payload)])
    ifd0.add(33421, 3, [2, 2])
    ifd0.add(33422, 1, [0, 1, 1, 2])
    with open(path, "wb") as f:
        f.write(_serialize([ifd0], [payload]))


def write_pef(path, mosaic, make="PENTAX", model="PENTAX K-1"):
    """PEF skeleton: raw IFD chained after IFD0, 12-bit packed samples."""
    h, w = mosaic.shape
    payload = _pack12(mosaic)
    ifd0 = _Ifd()
    ifd0.add(271, 2, make)
    ifd0.add(272, 2, model)
    raw = _Ifd()
    raw.add(256, 4, [w])
    raw.add(257, 4, [h])
    raw.add(258, 3, [12])
    raw.add(259, 3, [1])
    raw.add(262, 3, [32803])
    raw.add(273, 4, ("blob", 0))
    raw.add(277, 3, [1])
    raw.add(278, 4, [h])
    raw.add(279, 4, [len(payload)])
    raw.add(33421, 3, [2, 2])
    raw.add(33422, 1, [0, 1, 1, 2])
    with open(path, "wb") as f:
        f.write(_serialize([ifd0, raw], [payload], next_links={0: 1}))


def write_orf(path, mosaic, make="OLYMPUS CORPORATION", model="E-M1MarkIII"):
    """ORF skeleton: Olympus magic 0x4F52, raw in IFD0, 12-bit packed."""
    h, w = mosaic.shape
    payload = _pack12(mosaic)
    ifd0 = _Ifd()
    ifd0.add(256, 4, [w])
    ifd0.add(257, 4, [h])
    ifd0.add(258, 3, [12])
    ifd0.add(259, 3, [1])
    ifd0.add(262, 3, [32803])
    ifd0.add(271, 2, make)
    ifd0.add(272, 2, model)
    ifd0.add(273, 4, ("blob", 0))
    ifd0.add(277, 3, [1])
    ifd0.add(278, 4, [h])
    ifd0.add(279, 4, [len(payload)])
    ifd0.add(33421, 3, [2, 2])
    ifd0.add(33422, 1, [0, 1, 1, 2])
    blob = bytearray(_serialize([ifd0], [payload]))
    struct.pack_into("<H", blob, 2, 0x4F52)  # 'RO'
    with open(path, "wb") as f:
        f.write(blob)


def orf_compress(mosaic: np.ndarray) -> bytes:
    """Encode a 12-bit mosaic as an Olympus-compressed stream (inverse of
    native r2f_decode_orf). Lossless for any input: the (diff << 2 | low)
    split represents every delta exactly."""
    m = np.asarray(mosaic, np.int64)
    h, w = m.shape
    bw = _MsbBitWriter()
    bw.put(0, 8 * 7)  # 7 skipped prefix bytes

    def pred_at(row, col):
        if row < 2 and col < 2:
            return 0
        if row < 2:
            return int(m[row, col - 2])
        if col < 2:
            return int(m[row - 2, col])
        wv = int(m[row, col - 2])
        n = int(m[row - 2, col])
        nw = int(m[row - 2, col - 2])
        if (wv < nw < n) or (n < nw < wv):
            if abs(wv - nw) > 32 or abs(n - nw) > 32:
                return wv + n - nw
            return (wv + n) >> 1
        return wv if abs(wv - nw) > abs(n - nw) else n

    for row in range(h):
        acarry = [[0, 0, 0], [0, 0, 0]]
        for col in range(w):
            carry = acarry[col & 1]
            i = 2 * (carry[2] < 3)
            nbits = 2 + i
            while ((carry[0] & 0xFFFF) >> (nbits + i)) != 0:
                nbits += 1
            delta = int(m[row, col]) - pred_at(row, col)
            low = delta & 3
            diffq = delta >> 2  # arithmetic: matches the decoder's <<2|low
            v = diffq - carry[1]
            if v >= 0:
                sign, c0 = 0, v
            else:
                sign, c0 = 1, ~v  # -v - 1
            assert c0 < (1 << 15), "carry magnitude out of format range"
            bw.put((sign << 2) | low, 3)
            high = c0 >> nbits
            if high >= 12:
                assert high < (1 << (15 - nbits))
                bw.put(0, 12)  # escape
                bw.put(high << 1, 16 - nbits)
            else:
                bw.put(1, high + 1)  # 0^high then 1
            bw.put(c0 & ((1 << nbits) - 1), nbits)
            carry[0] = c0
            carry[1] = (diffq * 3 + carry[1]) >> 5
            carry[2] = 0 if c0 > 16 else carry[2] + 1
    return bw.done()


def write_orf_compressed(
    path, mosaic, make="OLYMPUS CORPORATION", model="E-M1X"
):
    """ORF with the Olympus-compressed payload (Compression 65536 as a
    LONG; real bodies often leave Compression=1 and are detected by size —
    the reader handles both)."""
    h, w = mosaic.shape
    payload = orf_compress(mosaic)
    ifd0 = _Ifd()
    ifd0.add(256, 4, [w])
    ifd0.add(257, 4, [h])
    ifd0.add(258, 3, [12])
    ifd0.add(259, 4, [65536])
    ifd0.add(262, 3, [32803])
    ifd0.add(271, 2, make)
    ifd0.add(272, 2, model)
    ifd0.add(273, 4, ("blob", 0))
    ifd0.add(277, 3, [1])
    ifd0.add(278, 4, [h])
    ifd0.add(279, 4, [len(payload)])
    ifd0.add(33421, 3, [2, 2])
    ifd0.add(33422, 1, [0, 1, 1, 2])
    blob = bytearray(_serialize([ifd0], [payload]))
    struct.pack_into("<H", blob, 2, 0x4F52)  # 'RO'
    with open(path, "wb") as f:
        f.write(blob)


def _bmff_box(btype: bytes, payload: bytes, usertype: bytes | None = None) -> bytes:
    body = (usertype or b"") + payload
    return struct.pack(">I", 8 + len(body)) + btype + body


def write_crw(
    path,
    thumb_jpeg: bytes,
    make="Canon",
    model="Canon EOS D60",
    timestamp=1021334400,
):
    """CRW (CIFF) skeleton: 26-byte header + heap whose directory sits at
    the heap END (last 4 bytes = directory offset). Records: 0x080a
    make+model, 0x2007 JPEG thumbnail, a 0x300a sub-heap holding 0x180e
    capture time, and an inline (0x4000-flag) record — the browsing
    surfaces io/crw.py reads."""
    heap_start = 26

    def heap(records, inline=()):
        """records: list of (type, payload) stored in the heap body;
        inline: list of (type, 8-byte value) stored in the record itself."""
        body = bytearray()
        placed = []
        for typ, payload in records:
            placed.append((typ, len(payload), len(body)))
            body += payload
            if len(body) % 2:
                body += b"\0"
        dir_off = len(body)
        out = bytearray(body)
        out += struct.pack("<H", len(placed) + len(inline))
        for typ, length, off in placed:
            out += struct.pack("<HII", typ, length, off)
        for typ, value in inline:
            out += struct.pack("<H", typ | 0x4000) + value
        out += struct.pack("<I", dir_off)
        return bytes(out)

    sub = heap([(0x180E, struct.pack("<II", timestamp, 0))])
    mm = make.encode() + b"\0" + model.encode() + b"\0"
    main = heap(
        [(0x080A, mm), (0x2007, thumb_jpeg), (0x300A, sub)],
        inline=[(0x1810, struct.pack("<II", 640, 480))],
    )
    header = b"II" + struct.pack("<I", heap_start) + b"HEAPCCDR" + b"\0" * 12
    assert len(header) == 26
    with open(path, "wb") as f:
        f.write(header + main)


# Canon CRW codec tables (published dcraw crw_init_tables constants, also
# embedded in native/r2f_native.cc): 16 canonical code counts + symbol
# values per table; symbols are run<<4|ssss, 0x00 = EOB, 0xff = skip-one.
_CRW_FIRST = [
    bytes.fromhex(
        "00010402030102000000000000000000040305060207010809000a0bff"
    ),
    bytes.fromhex(
        "00020203010101010200000000000000030204010500060709080a0bff"
    ),
    bytes.fromhex(
        "000006030101020000000000000000000605070408030902000a010bff"
    ),
]
_CRW_SECOND = [
    bytes.fromhex(
        "0002020201040201020501010000008b0304020501060708121311140915"
        "220021160af023172431321819332541344235513637382979261a395657"
        "2827525558437659775461f9717875969749b753d774b698474895699991"
        "fab868b5b9d6f7d86746459489f881d5f6b488b12a4472d98766d4f53aa7"
        "73a9a88662c765c8c9a1f4d1e95a9285a6e793e8c1c67a64e14a6ae6b3f1"
        "d3a58ab29aba84a463e5c5f3d2c482aadae4f2ca83a3a2c3eac2e2e3ffff"
    ),
    bytes.fromhex(
        "0002020104010401030301000000008c0203010405121106130708142209"
        "2100231531320a16f0243341421917251851344352293561397162365326"
        "381a37812791795545287259a1b144695458d1fa57e1f1b94947636af956"
        "46a82a4a78993a75748665c176b696d68985c9f595b4c7f78a97b873b7d8"
        "d987a77a488284eaf4a6c55a94a4c692c368b5c8e4e5e6e9a2a3e3c26667"
        "93aad4d5e7f8889ad777c464e298a5cadae8f3f6a9b2b3f2d283bad3ffff"
    ),
    bytes.fromhex(
        "000006020103030205010202080a00750405030602070108091213141115"
        "0a1617f00022211823192432312533383734353639795758592856782741"
        "2977264276991a559897f94854968947b749fa7568b66769b9b8d852d788"
        "b5745146d9f83ad687457a95d5f686b4a994532aa843f5f7d466a75a448a"
        "c9e8c8e79a6a734a61c7f4c665e972e6719193a6da928562f3c5b2a484ba"
        "64a5b3d281e5d3aac4caf2b1e4d18363eac3e282f1a3c2a1c1e3a2e1ffff"
    ),
]


def _crw_codes(table: bytes) -> dict:
    """Canonical Huffman codes matching dcraw's make_decoder: symbols get
    codes in (length, order-of-appearance) order; returns sym -> (code, len)."""
    counts, values = table[:16], table[16:]
    maxlen = 16
    while maxlen and not counts[maxlen - 1]:
        maxlen -= 1
    codes: dict = {}
    h = 0
    vi = 0
    for ln in range(1, maxlen + 1):
        for _ in range(counts[ln - 1]):
            if h >= (1 << maxlen):
                return codes
            sym = values[vi]
            vi += 1
            codes.setdefault(sym, (h >> (maxlen - ln), ln))
            h += 1 << (maxlen - ln)
    return codes


class _CrwBitWriter:
    """MSB-first bit packer with JPEG-style 0xFF 0x00 byte stuffing."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, ln: int):
        self.acc = (self.acc << ln) | (code & ((1 << ln) - 1))
        self.n += ln
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.n -= 8
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0)

    def done(self) -> bytes:
        if self.n:
            b = (self.acc << (8 - self.n)) & 0xFF
            self.n = 0
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0)
        return bytes(self.buf)


def _crw_encode_stream(values10, width: int, height: int, table: int) -> bytes:
    """Encode 10-bit sensor values with the Canon CRW block codec: 64-pixel
    blocks of Huffman-coded diffs (DC tree for the first, AC run/size tree
    after), cross-block DC carry, per-row base[2]=512 resets."""
    first = _crw_codes(_CRW_FIRST[table])
    second = _crw_codes(_CRW_SECOND[table])
    bw = _CrwBitWriter()

    def amplitude(d: int) -> tuple[int, int]:
        ln = abs(d).bit_length()
        return (d if d > 0 else d + (1 << ln) - 1, ln)

    v = values10.reshape(-1)
    carry = 0
    base = [0, 0]
    pnum = 0
    idx = 0
    for row in range(0, height, 8):
        nblocks = min(8, height - row) * width >> 6
        for _ in range(nblocks):
            diff = [0] * 64
            for i in range(64):
                if pnum % width == 0:
                    base[0] = base[1] = 512
                pnum += 1
                t = int(v[idx])
                idx += 1
                diff[i] = t - base[i & 1]
                base[i & 1] = t
            applied0 = diff[0]
            diff[0] = applied0 - carry
            carry = applied0

            bits, ln = amplitude(diff[0])
            bw.put(*first[ln])
            if ln:
                bw.put(bits, ln)
            pos = 1
            while pos < 64:
                nz = next((k for k in range(pos, 64) if diff[k]), None)
                if nz is None:
                    bw.put(*second[0x00])  # EOB
                    break
                run = nz - pos
                while run >= 16:
                    bw.put(*second[0xF0])
                    run -= 16
                bits, ln = amplitude(diff[nz])
                while run and (run << 4 | ln) not in second:
                    bw.put(*second[0xFF])  # skip-one fallback
                    run -= 1
                bw.put(*second[run << 4 | ln])
                bw.put(bits, ln)
                pos = nz + 1
    return bw.done()


def write_crw_raw(
    path,
    mosaic,
    table=0,
    lowbits=True,
    borders=None,
    make="Canon",
    model="Canon EOS D60",
):
    """Full CRW file with a compressed raw payload at the codec's fixed
    offsets (2-bit low-bits plane at 26 when ``lowbits``, byte-stuffed
    Huffman stream at 540 + plane size), plus the CIFF heap records the
    reader consumes (0x1031 SensorInfo, 0x1835 DecoderTable, 0x080a
    make/model, 0x2005 raw). ``mosaic``: (H, W) uint16, 12-bit when
    ``lowbits`` else 10-bit; ``borders``: optional (left, top, right,
    bottom) active area. Returns the mosaic actually encoded (the
    low-bits plane gets a deterministic 0xFF+nonzero marker so the
    lowbits probe always resolves, mirroring real plane statistics)."""
    import numpy as np

    mosaic = np.array(mosaic, np.uint16, copy=True)
    h, w = mosaic.shape
    assert w % 8 == 0 and (8 * w) % 64 == 0
    assert mosaic.max() < (4096 if lowbits else 1024)

    plane = b""
    if lowbits:
        # Deterministic probe marker: plane byte 520 (file offset 546) =
        # 0xFF, byte 521 nonzero — the _has_lowbits scan needs one
        # 0xFF+nonzero pair past file offset 540.
        if h * w >= 4 * 522:
            mosaic.flat[520 * 4 : 521 * 4] |= 3
            mosaic.flat[521 * 4] |= 1
        lo = (mosaic.reshape(-1) & 3).astype(np.uint8)
        lo = lo.reshape(-1, 4)
        plane_arr = lo[:, 0] | (lo[:, 1] << 2) | (lo[:, 2] << 4) | (lo[:, 3] << 6)
        plane = plane_arr.astype(np.uint8).tobytes()
        values10 = mosaic >> 2
    else:
        values10 = mosaic
    stream = _crw_encode_stream(values10, w, h, table)

    heap = bytearray()
    heap += plane
    heap += b"\0" * (514 + len(plane) - len(heap))  # stream at file 540+plane
    if lowbits and h * w < 4 * 522:
        # Plane too short to reach the probe window (file offset >= 540):
        # put the 0xFF+nonzero marker in the padding instead — the probe
        # scans it, the reader's plane slice never includes it.
        heap[514:516] = b"\xff\x01"
    raw_off = len(heap)
    heap += stream
    if len(heap) % 2:
        heap += b"\0"

    if borders is None:
        borders = (0, 0, w - 1, h - 1)
    left, top, right, bottom = borders
    sensor = struct.pack("<9H", 9, w, h, 0, 0, left, top, right, bottom)
    mm = make.encode() + b"\0" + model.encode() + b"\0"
    placed = []
    for typ, payload in ((0x1031, sensor), (0x1835, struct.pack("<II", table, 0)), (0x080A, mm)):
        placed.append((typ, len(payload), len(heap)))
        heap += payload
        if len(heap) % 2:
            heap += b"\0"
    placed.append((0x2005, len(stream), raw_off))
    dir_off = len(heap)
    heap += struct.pack("<H", len(placed))
    for typ, length, off in placed:
        heap += struct.pack("<HII", typ, length, off)
    heap += struct.pack("<I", dir_off)

    header = b"II" + struct.pack("<I", 26) + b"HEAPCCDR" + b"\0" * 12
    with open(path, "wb") as f:
        f.write(header + heap)
    return mosaic


def write_cr3(path, preview_jpeg: bytes, make="Canon", model="Canon EOS R6"):
    """CR3 skeleton: ISO-BMFF with Canon's moov uuid (CMT1 EXIF TIFF +
    THMB) and the top-level PRVW uuid — the browsing surfaces io/cr3.py
    reads. No CRX payload (decode stays unsupported)."""
    canon_uuid = bytes.fromhex("85c0b687820f11e08111f4ce462b6a48")
    prvw_uuid = bytes.fromhex("eaf42b5e1c984b88b9fbb7dc406e4d16")

    exif = _Ifd()
    exif.add(33434, 5, [(1, 500)])
    exif.add(33437, 5, [(40, 10)])
    exif.add(34855, 3, [800])
    ifd0 = _Ifd()
    ifd0.add(271, 2, make)
    ifd0.add(272, 2, model)
    ifd0.add(274, 3, [1])
    ifd0.add(34665, 4, ("ifd", 1))
    cmt1 = _serialize([ifd0, exif], [])

    thmb = _bmff_box(
        b"THMB",
        struct.pack(">IHHII", 0, 160, 120, len(preview_jpeg), 0) + preview_jpeg,
    )
    cmt1_box = _bmff_box(b"CMT1", cmt1)
    canon = _bmff_box(b"uuid", cmt1_box + thmb, usertype=canon_uuid)
    moov = _bmff_box(b"moov", canon)
    prvw = _bmff_box(
        b"PRVW",
        struct.pack(">IHHHH", 0, 0, 320, 240, 0)
        + struct.pack(">I", len(preview_jpeg))
        + preview_jpeg,
    )
    prvw_u = _bmff_box(b"uuid", prvw, usertype=prvw_uuid)
    ftyp = _bmff_box(b"ftyp", b"crx " + struct.pack(">I", 1) + b"crx isom")
    with open(path, "wb") as f:
        f.write(ftyp + moov + prvw_u)


def write_cr2(path, mosaic, borders=None, make="Canon", model="Canon EOS R5"):
    """CR2 skeleton: 'CR' signature, raw in the LAST IFD with Compression=6
    lossless JPEG, CR2 slice tag, Canon MakerNote SensorInfo with borders.

    ``borders``: (left, top, right, bottom) active-area crop; the region
    left of ``left`` acts as the masked optical-black pedestal.
    """
    from raw2film_tpu.io.ljpeg import encode_ljpeg

    h, w = mosaic.shape
    # Slice the columns CR2-style: 2 slices when width allows.
    if w % 2 == 0 and w >= 64:
        n_sl, w_a = 1, w // 2
        w_b = w - n_sl * w_a
        flat = np.concatenate(
            [mosaic[:, :w_a].ravel(), mosaic[:, w_a:].ravel()]
        ).reshape(h, w)
    else:
        n_sl, w_a, w_b = 0, 0, w
        flat = mosaic
    payload = encode_ljpeg(flat.astype(np.uint16), precision=14)

    # Canon MakerNote: a plain IFD with FILE-absolute value offsets, stored
    # as a type-7 blob. Serialize with a marker blob first, then patch the
    # real MakerNote in once its absolute position is known.
    si = [9, w, h, 0, 0] + (list(borders) if borders else [0, 0, w - 1, h - 1])
    si = si + [0] * (17 - len(si))
    mn_size = 2 + 12 + 4 + 2 * len(si)
    marker = (b"MKNT" * ((mn_size + 3) // 4))[:mn_size]

    exif = _Ifd()
    exif.add(33434, 5, [(1, 160)])
    exif.add(34855, 3, [200])
    exif.add(37500, 7, ("blob7", 1))  # MakerNote -> blob index 1

    ifd0 = _Ifd()
    ifd0.add(271, 2, make)
    ifd0.add(272, 2, model)
    ifd0.add(34665, 4, ("ifd", 2))

    raw = _Ifd()
    raw.add(256, 4, [w])
    raw.add(257, 4, [h])
    raw.add(259, 3, [6])
    raw.add(273, 4, ("blob", 0))
    raw.add(279, 4, [len(payload)])
    if n_sl:
        raw.add(50752, 3, [n_sl, w_a, w_b])

    blob = bytearray(
        _serialize([ifd0, raw, exif], [payload, marker], next_links={0: 1}, header=16)
    )
    blob[8:12] = b"CR\x02\x00"
    mn_off = bytes(blob).find(marker)
    assert mn_off > 0
    mn = struct.pack("<H", 1)
    mn += struct.pack("<HHI", 0x00E0, 3, len(si)) + struct.pack("<I", mn_off + 18)
    mn += struct.pack("<I", 0)
    mn += struct.pack("<" + "H" * len(si), *si)
    assert len(mn) == mn_size
    blob[mn_off : mn_off + mn_size] = mn
    with open(path, "wb") as f:
        f.write(blob)


# ----------------------------------------------------------------- Canon CRX
# Synthetic encoder for the CR3 raw payload, mirroring the normative
# entropy/wavelet rules in raw2film_tpu/io/crx.py (architecture per the
# public CRX reverse-engineering; bit-level constants are r2f's
# reconstruction — the round trips pin decoder/encoder agreement).


def _crx_adapt(k: int, u: int) -> int:
    k += int((u >> k) > 2) + int((u >> k) > 5) - int(2 * u < (1 << k))
    return min(max(k, 0), 21)


def _crx_zigzag(e: int) -> int:
    return (e << 1) ^ (e >> 63) if e < 0 else (e << 1)


def _crx_rice_put(bw: "_MsbBitWriter", u: int, k: int) -> int:
    assert 0 <= u < (1 << 21), u
    q = u >> k
    if q >= 41:
        bw.put(0, 41)
        bw.put(1, 1)
        bw.put(u, 21)
    else:
        bw.put(0, q)
        bw.put(1, 1)
        bw.put(u, k)
    return _crx_adapt(k, u)


def crx_encode_dpcm(vals: np.ndarray, nbits: int) -> bytes:
    """LL / level-0 band: line 0 left-predicted, later lines top-predicted,
    zigzag residuals, k0 = 4."""
    bw = _MsbBitWriter()
    k = 4
    h, w = vals.shape
    v = vals.astype(np.int64)
    for y in range(h):
        for x in range(w):
            pred = (
                int(v[y - 1, x])
                if y
                else (int(v[0, x - 1]) if x else 1 << (nbits - 1))
            )
            e = int(v[y, x]) - pred
            k = _crx_rice_put(bw, _crx_zigzag(e), k)
    return bw.done()


def crx_encode_hf(coefs: np.ndarray) -> bytes:
    """High-frequency band: zigzag coefficients, zero-run mode (runs bounded
    by line ends; interrupting nonzero coded as zigzag-1), k0 = s0 = 1."""
    bw = _MsbBitWriter()
    k = s = 1
    h, w = coefs.shape
    prev_zero = True
    for y in range(h):
        row = coefs[y]
        x = 0
        while x < w:
            if prev_zero:
                r = 0
                while x + r < w and row[x + r] == 0:
                    r += 1
                s = _crx_rice_put(bw, r, s)
                x += r
                if x < w:
                    c = int(row[x])
                    k = _crx_rice_put(bw, _crx_zigzag(c) - 1, k)
                    x += 1
                    prev_zero = False
            else:
                c = int(row[x])
                k = _crx_rice_put(bw, _crx_zigzag(c), k)
                prev_zero = c == 0
                x += 1
    return bw.done()


def _dwt53_split(x: np.ndarray, axis: int):
    """Forward integer LeGall 5/3 along ``axis`` -> (low, high); exact
    inverse of io/crx.py::_idwt53_1d (same clip-reflected lifting)."""
    x = np.moveaxis(x, axis, 0).astype(np.int64)
    n = x.shape[0]
    if n == 1:
        return np.moveaxis(x, 0, axis), np.moveaxis(x[:0], 0, axis)
    ns, nd = (n + 1) // 2, n // 2
    even, odd = x[0::2], x[1::2]
    er = even[np.clip(np.arange(nd) + 1, 0, ns - 1)]
    d = odd - ((even[:nd] + er) >> 1)
    dl = d[np.clip(np.arange(ns) - 1, 0, nd - 1)]
    dr = d[np.clip(np.arange(ns), 0, nd - 1)]
    s = even + ((dl + dr + 2) >> 2)
    return np.moveaxis(s, 0, axis), np.moveaxis(d, 0, axis)


def crx_forward(plane: np.ndarray, levels: int):
    """-> (ll, [(hl, lh, hh) coarsest -> finest]); split W first then H,
    matching io/crx.py::_reconstruct."""
    cur = plane.astype(np.int64)
    highs = []
    for _ in range(levels):
        low_w, high_w = _dwt53_split(cur, 1)
        ll, lh = _dwt53_split(low_w, 0)
        hl, hh = _dwt53_split(high_w, 0)
        highs.append((hl, lh, hh))
        cur = ll
    return cur, highs[::-1]  # coarsest first


def crx_quantize(band: np.ndarray, qp: int) -> np.ndarray:
    """Forward quantizer matching io/crx.py::dequantize (r2f-normative):
    c = sign(v) * ((|v| * 40 + num // 2) // num), num = q_num(qp)."""
    from raw2film_tpu.io.crx import _Q_DEN, q_num

    if qp <= 0:
        return band
    num = q_num(qp)
    mag = (np.abs(band) * _Q_DEN + num // 2) // num
    return np.sign(band) * mag


def crx_sample(
    mosaic: np.ndarray,
    nbits: int,
    levels: int,
    qparam: int = 0,
    tile_cols: int = 1,
    tile_rows: int = 1,
):
    """-> (mdat sample bytes, record-run size, (tile_w, tile_h)): tile/
    plane/subband record run + entropy payloads. Wavelet LL bands carry a
    +2^(nbits+1) bias and 4 bits of headroom (the integer 5/3 lowpass can
    overshoot [0, 2^nbits) slightly) — mirrored by io/crx.py's decode.
    ``qparam`` > 0 quantizes the HF subbands (lossy CRAW; LL stays exact)
    and is declared in each 0xFF03 record. ``tile_cols``/``tile_rows`` > 1
    split the frame into a tile grid (one 0xFF01 record run per tile,
    raster order; edge tiles carry the remainder) the way high-MP bodies
    do."""
    h, w = mosaic.shape
    assert h % 2 == 0 and w % 2 == 0, "CRX subplanes need even dims"
    assert qparam == 0 or levels > 0, "quantization needs wavelet bands"

    def _even_ceil(n, parts):
        return -(-(n // 2) // parts) * 2

    tile_w = _even_ceil(w, tile_cols)
    tile_h = _even_ceil(h, tile_rows)

    records = bytearray()
    payloads = []
    for ty in range(tile_rows):
        for tx in range(tile_cols):
            sub = mosaic[
                ty * tile_h : (ty + 1) * tile_h,
                tx * tile_w : (tx + 1) * tile_w,
            ]
            planes = [
                sub[0::2, 0::2],
                sub[0::2, 1::2],
                sub[1::2, 0::2],
                sub[1::2, 1::2],
            ]
            tile_payloads = []
            band_sizes = []  # per plane: list of (band byte size, qparam)
            for p in planes:
                sizes = []
                if levels:
                    ll, highs = crx_forward(p, levels)
                    chunks = [
                        (
                            crx_encode_dpcm(ll + (1 << (nbits + 1)), nbits + 4),
                            0,
                        )
                    ]
                    for hl, lh, hh in highs:
                        for band in (hl, lh, hh):
                            band = crx_quantize(band, qparam)
                            chunks.append(
                                (
                                    crx_encode_hf(band) if band.size else b"",
                                    qparam,
                                )
                            )
                else:
                    chunks = [(crx_encode_dpcm(p, nbits), 0)]
                for c, q in chunks:
                    tile_payloads.append(c)
                    sizes.append((len(c), q))
                band_sizes.append(sizes)
            total = sum(len(c) for c in tile_payloads)
            records += struct.pack(
                ">HHIHH", 0xFF01, 12, total, ty * tile_cols + tx, 0
            )
            for pi, sizes in enumerate(band_sizes):
                records += struct.pack(
                    ">HHIHH", 0xFF02, 12, sum(sz for sz, _ in sizes), pi, 0
                )
                for bi, (sz, q) in enumerate(sizes):
                    records += struct.pack(">HHIHBB", 0xFF03, 12, sz, bi, q, 0)
            payloads.extend(tile_payloads)
    return (
        bytes(records) + b"".join(payloads),
        len(records),
        (tile_w, tile_h),
    )


def write_cr3_raw(
    path,
    mosaic: np.ndarray,
    nbits: int = 14,
    levels: int = 0,
    make="Canon",
    model="Canon EOS R3",
    enc_type: int = 0,
    cfa_layout: int = 0,
    preview_jpeg: bytes | None = None,
    qparam: int = 0,
    tile_cols: int = 1,
    tile_rows: int = 1,
):
    """Full CR3 with a CRAW raw track (CMP1 + mdat CRX payload) plus the
    browsing boxes (CMT1 EXIF, optional PRVW preview)."""
    h, w = mosaic.shape
    sample, hdr_size, (tile_w, tile_h) = crx_sample(
        mosaic, nbits, levels, qparam=qparam,
        tile_cols=tile_cols, tile_rows=tile_rows,
    )
    tile_flags = ((tile_cols > 1) << 7) | ((tile_rows > 1) << 6)
    cmp1 = (
        struct.pack(">HHHHIIII", 0, 48, 0x100, 0, w, h, tile_w, tile_h)
        + bytes(
            [nbits, (4 << 4) | cfa_layout, (enc_type << 4) | levels, tile_flags]
        )
        + struct.pack(">I", hdr_size)
    )
    cmp1_box = _bmff_box(b"CMP1", cmp1)
    craw_prefix = (
        b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + b"\x00" * 50
    )
    assert len(craw_prefix) == 78

    canon_uuid = bytes.fromhex("85c0b687820f11e08111f4ce462b6a48")
    exif = _Ifd()
    exif.add(33434, 5, [(1, 500)])
    exif.add(34855, 3, [800])
    ifd0 = _Ifd()
    ifd0.add(271, 2, make)
    ifd0.add(272, 2, model)
    ifd0.add(274, 3, [1])
    ifd0.add(34665, 4, ("ifd", 1))
    cmt1_box = _bmff_box(b"CMT1", _serialize([ifd0, exif], []))
    canon = _bmff_box(b"uuid", cmt1_box, usertype=canon_uuid)

    def build(offset: int) -> bytes:
        craw = _bmff_box(b"CRAW", craw_prefix + cmp1_box)
        stsd = _bmff_box(b"stsd", struct.pack(">II", 0, 1) + craw)
        stsz = _bmff_box(b"stsz", struct.pack(">III", 0, len(sample), 1))
        co64 = _bmff_box(b"co64", struct.pack(">IIQ", 0, 1, offset))
        stbl = _bmff_box(b"stbl", stsd + stsz + co64)
        trak = _bmff_box(
            b"trak", _bmff_box(b"mdia", _bmff_box(b"minf", stbl))
        )
        return _bmff_box(b"moov", canon + trak)

    ftyp = _bmff_box(b"ftyp", b"crx " + struct.pack(">I", 1) + b"crx isom")
    pre = ftyp
    if preview_jpeg is not None:
        prvw_uuid = bytes.fromhex("eaf42b5e1c984b88b9fbb7dc406e4d16")
        prvw = _bmff_box(
            b"PRVW",
            struct.pack(">IHHHH", 0, 0, 320, 240, 0)
            + struct.pack(">I", len(preview_jpeg))
            + preview_jpeg,
        )
        pre = ftyp + _bmff_box(b"uuid", prvw, usertype=prvw_uuid)
    moov = build(0)
    offset = len(pre) + len(moov) + 8  # mdat payload start
    moov = build(offset)
    with open(path, "wb") as f:
        f.write(pre + moov + _bmff_box(b"mdat", sample))
