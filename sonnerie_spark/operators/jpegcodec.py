"""Pure-Python baseline JPEG codec: numpy DCT + bit-level Huffman.

The last still-image format behind the ``decode_features`` seam,
implemented from the public ITU-T T.81 specification with no codec
library:

- ``decode_jpeg``: baseline sequential (SOF0) decode — marker walk,
  DQT/DHT/SOF0/SOS parse, byte-unstuffed bitstream, canonical Huffman,
  DC prediction + restart markers, dequant, inverse zigzag, float IDCT,
  chroma upsampling for any (h,v) factors up to 2, BT.601 YCbCr->RGB.
  Grayscale comes back HxWx1, color HxWx3. Progressive (SOF2) /
  arithmetic / 12-bit variants return None (recognized-but-unsupported,
  reported honestly by decode_media).
- ``encode_jpeg``: baseline encoder (grayscale or 4:4:4 color) with the
  Annex K luminance quantization table scaled by ``quality`` and
  self-built canonical Huffman tables (equal-length codes over the
  symbols actually emitted — JPEG carries tables in DHT, so custom
  tables are fully standard).

JPEG is lossy, but an image made of uniform 8x8 blocks with even
sample values is encoded EXACTLY at quality 50 (all AC coefficients
are zero; DC = 8c quantizes by 16 to round(c/2), exact for even c) —
the correctness gate exploits this to value-hash a lossy codec.

Worker contract matches ``pngcodec``/``gifcodec``: registered for
cloudpickle pickle-by-value, no package install needed on executors.

Reference parity note: njaard/sonnerie has no media handling; this is
part of the training-data-pipeline extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

#: ITU T.81 Annex K.1 luminance quantization table (quality 50 base)
QUANT_K1 = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)


def _zigzag() -> list[tuple[int, int]]:
    """The standard zigzag scan, generated from its defining rule:
    anti-diagonals in turn, odd diagonals walked top-right to
    bottom-left, even ones the reverse."""
    return sorted(
        ((i, j) for i in range(8) for j in range(8)),
        key=lambda t: (t[0] + t[1], t[0] if (t[0] + t[1]) % 2 else -t[0]),
    )


ZIGZAG = _zigzag()

#: orthonormal 8-point DCT-II basis; block DCT = M @ X @ M.T
_DCT_M = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _DCT_M.T @ coef @ _DCT_M


def _dct2(block: np.ndarray) -> np.ndarray:
    return _DCT_M @ block @ _DCT_M.T


class _BitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d, i = self.d, self.pos
        if i >= len(d):
            return False
        byte = d[i]
        if byte == 0xFF:
            if i + 1 < len(d) and d[i + 1] == 0x00:
                self.pos = i + 2  # stuffed FF
            else:
                return False  # a real marker: no more entropy bits
        else:
            self.pos = i + 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8
        return True

    def bit(self) -> int | None:
        if self.nbits == 0 and not self._fill():
            return None
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int | None:
        v = 0
        for _ in range(n):
            b = self.bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def align_to_marker(self) -> int | None:
        """Consume padding to the next marker; return its second byte."""
        self.acc = 0
        self.nbits = 0
        d = self.d
        i = self.pos
        while i + 1 < len(d):
            if d[i] == 0xFF and d[i + 1] != 0x00:
                self.pos = i + 2
                return d[i + 1]
            i += 1
        return None


def _build_huffman(counts: list[int], symbols: bytes) -> dict:
    """Canonical JPEG Huffman table: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict) -> int | None:
    code = 0
    for length in range(1, 17):
        b = br.bit()
        if b is None:
            return None
        code = (code << 1) | b
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _extend(v: int, ssss: int) -> int:
    if ssss == 0:
        return 0
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


def decode_jpeg(b: bytes) -> tuple[int, int, int, np.ndarray] | None:
    """Baseline-sequential decode -> (width, height, channels, HxWxC
    uint8), channels 1 (grayscale) or 3 (RGB). None when not a JPEG,
    malformed/truncated, or outside baseline (progressive etc.)."""
    hdr = parse_sof(b)
    if hdr is None or not hdr["baseline"]:
        return None
    n = len(b)
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    comps = hdr["components"]
    restart = 0
    i = 2
    while i + 4 <= n:
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0xD9:  # EOI before scan data
            return None
        (seglen,) = struct.unpack_from(">H", b, i + 2)
        seg = b[i + 4 : i + 2 + seglen]
        if len(seg) != seglen - 2:
            return None
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq != 0:
                    return None  # 16-bit tables: not baseline
                if j + 64 > len(seg):
                    return None
                tbl = np.zeros((8, 8), np.int32)
                for k, (r, c) in enumerate(ZIGZAG):
                    tbl[r, c] = seg[j + k]
                qt[tq] = tbl
                j += 64
        elif marker == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                counts = list(seg[j + 1 : j + 17])
                total = sum(counts)
                syms = seg[j + 17 : j + 17 + total]
                if len(syms) != total:
                    return None
                huff[(tc, th)] = _build_huffman(counts, syms)
                j += 17 + total
        elif marker == 0xDD:  # DRI
            if seglen != 4:
                return None
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid = seg[1 + 2 * c]
                td, ta = seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 0x0F
                comp = next((x for x in comps if x["id"] == cid), None)
                if comp is None:
                    return None
                scan.append((comp, td, ta))
            if ns != len(comps):
                return None  # non-interleaved multi-scan: unsupported
            return _decode_scan(
                b, i + 2 + seglen, hdr, scan, qt, huff, restart
            )
        i += 2 + seglen
    return None


def _decode_scan(b, pos, hdr, scan, qt, huff, restart):
    w, h = hdr["width"], hdr["height"]
    comps = [s[0] for s in scan]
    if len(scan) == 1:
        # Non-interleaved scan: the MCU is ONE block of the component,
        # rastered over ITS sampled dimensions (T.81 A.2.2) — sampling
        # factors are relative to the FRAME's max, not the scan's.
        fh = max(c["h"] for c in hdr["components"])
        fv = max(c["v"] for c in hdr["components"])
        c0 = dict(comps[0])
        sw = -(-w * c0["h"] // fh)
        sh = -(-h * c0["v"] // fv)
        c0["h"] = c0["v"] = 1
        comps = [c0]
        scan = [(c0, scan[0][1], scan[0][2])]
        hmax = vmax = 1
        mcux = -(-sw // 8)
        mcuy = -(-sh // 8)
    else:
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        if c["tq"] not in qt:
            return None
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        )
    br = _BitReader(b, pos)
    pred = [0] * len(comps)
    nmcu = mcux * mcuy
    for m in range(nmcu):
        if restart and m and m % restart == 0:
            mk = br.align_to_marker()
            if mk is None or not 0xD0 <= mk <= 0xD7:
                return None
            pred = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, (comp, td, ta) in enumerate(scan):
            dc_t = huff.get((0, td))
            ac_t = huff.get((1, ta))
            if dc_t is None or ac_t is None:
                return None
            q = qt[comp["tq"]]
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    coef = np.zeros((8, 8), np.int32)
                    ssss = _huff_decode(br, dc_t)
                    if ssss is None or ssss > 11:
                        return None
                    diff = br.receive(ssss)
                    if diff is None:
                        return None
                    pred[ci] += _extend(diff, ssss)
                    coef[0, 0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(br, ac_t)
                        if rs is None:
                            return None
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            return None
                        v = br.receive(s)
                        if v is None:
                            return None
                        rr, cc = ZIGZAG[k]
                        coef[rr, cc] = _extend(v, s)
                        k += 1
                    px = _idct2(coef * q) + 128.0
                    y0 = (my * comp["v"] + by) * 8
                    x0 = (mx * comp["h"] + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
    out_planes = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        # upsample to full resolution by sample repetition
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        gray = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, gray[:, :, None]
    if len(out_planes) != 3:
        return None
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bl], axis=2)
    return w, h, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def parse_sof(b: bytes) -> dict | None:
    """Marker walk to the frame header: geometry + baseline-ness.
    Returns None only when the bytes are not a JPEG stream at all."""
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:  # SOI
        return None
    i = 2
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:
            i += 2
            continue
        (seglen,) = struct.unpack_from(">H", b, i + 2)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            seg = b[i + 4 : i + 2 + seglen]
            if len(seg) < 6:
                return None
            precision = seg[0]
            hh, ww = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            comps = []
            for c in range(nc):
                if 6 + 3 * c + 3 > len(seg):
                    return None
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append(
                    {
                        "id": cid,
                        "h": hv >> 4,
                        "v": hv & 0x0F,
                        "tq": seg[8 + 3 * c],
                    }
                )
            if any(
                not 1 <= c["h"] <= 4 or not 1 <= c["v"] <= 4 for c in comps
            ):
                return None
            return {
                "width": ww,
                "height": hh,
                "channels": nc,
                "baseline": marker == 0xC0 and precision == 8
                and nc in (1, 3),
                "progressive": marker == 0xC2,
                "components": comps,
            }
        i += 2 + seglen
    return None


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-pad to byte boundary


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _block_symbols(blocks: list[np.ndarray], restart: int = 0) -> list[list]:
    """Per block: [(dc_ssss, dc_diff_bits), (run/size, bits)...] with a
    shared DC predictor (reset at restart intervals); returns the
    symbol streams for table building and emission."""
    streams = []
    pred = 0
    for bi, coef in enumerate(blocks):
        if restart and bi and bi % restart == 0:
            pred = 0
        zz = [int(coef[r, c]) for r, c in ZIGZAG]
        items = []
        diff = zz[0] - pred
        pred = zz[0]
        ssss = _category(diff)
        items.append(("dc", ssss, diff))
        run = 0
        last_nz = 0
        for k in range(63, 0, -1):
            if zz[k]:
                last_nz = k
                break
        for k in range(1, last_nz + 1):
            v = zz[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                items.append(("ac", 0xF0, 0))  # ZRL
                run -= 16
            s = _category(v)
            items.append(("ac", (run << 4) | s, v))
            run = 0
        if last_nz < 63:
            items.append(("ac", 0x00, 0))  # EOB
        streams.append(items)
    return streams


def _make_table(symbols: set[int]) -> tuple[list[int], bytes]:
    """Equal-length canonical table over the used symbols: valid JPEG
    (carried in DHT), trivially correct, never the all-ones code."""
    syms = sorted(symbols)
    length = 1
    while (1 << length) - 1 < len(syms):
        length += 1
    counts = [0] * 16
    counts[length - 1] = len(syms)
    return counts, bytes(syms)


def _encode_codes(counts: list[int], symbols: bytes) -> dict[int, tuple]:
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def encode_jpeg(arr, *, quality: int = 50, restart_interval: int = 0) -> bytes:
    """HxW / HxWx1 grayscale or HxWx3 RGB uint8 -> baseline JPEG.
    Quality scales the Annex K table exactly as IJG does (50 = 1x).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (DC predictors reset, bitstream byte-aligned)."""
    a = np.asarray(arr, np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3):
        raise ValueError("expected HxW[x1] or HxWx3 uint8")
    h, w, nc = a.shape
    if not 1 <= quality <= 100:
        raise ValueError("quality in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.clip((QUANT_K1 * scale + 50) // 100, 1, 255).astype(np.int32)

    if nc == 3:
        rgb = a.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
        planes = [y, cb, cr]
    else:
        planes = [a[:, :, 0].astype(np.float64)]

    bw = -(-w // 8) * 8
    bh = -(-h // 8) * 8
    comp_blocks = []
    for p in planes:
        padded = np.empty((bh, bw))
        padded[:h, :w] = p
        padded[h:, :w] = p[h - 1 : h, :]  # edge-replicate padding
        padded[:, w:] = padded[:, w - 1 : w]
        blocks = []
        for y0 in range(0, bh, 8):
            for x0 in range(0, bw, 8):
                blk = padded[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                coef = np.round(_dct2(blk) / q).astype(np.int32)
                blocks.append(coef)
        comp_blocks.append(blocks)

    # interleave per MCU (4:4:4: one block per component per MCU)
    streams = [_block_symbols(blks, restart_interval) for blks in comp_blocks]
    dc_syms = [set() for _ in range(nc)]
    ac_syms = [set() for _ in range(nc)]
    for ci, st in enumerate(streams):
        for items in st:
            for kind, sym, _ in items:
                (dc_syms if kind == "dc" else ac_syms)[ci].add(sym)
    # luminance gets table id 0; chroma shares table id 1
    groups = [(0,)] if nc == 1 else [(0,), (1, 2)]
    tables = []  # (tc, th, counts, syms, codes)
    comp_tid = {}
    for th, grp in enumerate(groups):
        dcs = set().union(*(dc_syms[c] for c in grp))
        acs = set().union(*(ac_syms[c] for c in grp))
        for tc, syms in ((0, dcs), (1, acs)):
            counts, sb = _make_table(syms)
            tables.append((tc, th, counts, sb, _encode_codes(counts, sb)))
        for c in grp:
            comp_tid[c] = th

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (table 0 only; all components reference it)
    zz = bytes(q[r, c] for r, c in ZIGZAG)
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + zz
    # SOF0
    sof = bytearray()
    sof += bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0])  # id, h=v=1, quant table 0
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    for tc, th, counts, sb, _codes in tables:
        seg = bytes([(tc << 4) | th]) + bytes(counts) + sb
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    # DRI
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytearray([nc])
    for c in range(nc):
        th = comp_tid[c]
        sos += bytes([c + 1, (th << 4) | th])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    codes = {}
    for tc, th, _counts, _sb, cd in tables:
        codes[(tc, th)] = cd
    wtr = _BitWriter()
    nblocks = len(comp_blocks[0])
    for m in range(nblocks):
        if restart_interval and m and m % restart_interval == 0:
            wtr.flush()
            wtr.out += bytes(
                [0xFF, 0xD0 + ((m // restart_interval - 1) % 8)]
            )
        for ci in range(nc):
            th = comp_tid[ci]
            for kind, sym, v in streams[ci][m]:
                tc = 0 if kind == "dc" else 1
                code, length = codes[(tc, th)][sym]
                wtr.put(code, length)
                s = sym & 0x0F if kind == "ac" else sym
                if kind == "dc":
                    s = sym
                if s:
                    wtr.put(v if v > 0 else v + (1 << s) - 1, s)
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


try:  # pragma: no cover - registration is environment-dependent
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001 - fall back to PYTHONPATH import
    pass
