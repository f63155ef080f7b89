"""Pure-Python GIF codec: LZW in plain Python + numpy, no imaging lib.

Companion to ``pngcodec`` on the compressed-image surface: GIF's only
compression is LZW, which needs no external library. Together they
leave ONLY the lossy codecs (JPEG/MP3/video) behind the
``decode_features`` seam.

- ``decode_gif``: first frame of a GIF87a/GIF89a stream — LZW
  decompress, palette expansion to RGB, Adam-style 4-pass interlace
  reorder. Extensions (GCE/comment/application) are skipped; animation
  frames after the first are ignored (first-frame semantics, the
  common still-image case in crawled corpora).
- ``encode_gif``: index-matrix + palette -> valid GIF89a bytes
  (optionally interlaced), with a from-scratch LZW compressor.

Same worker contract as ``pngcodec``: the module registers for
cloudpickle pickle-by-value, so mapInPandas closures that reference it
ship it inline and workers need no package install.

Reference parity note: njaard/sonnerie has no media handling; this is
part of the training-data-pipeline extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    """Row output order of an interlaced GIF: stored row j is displayed
    at ``order[j]``."""
    return np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    ).astype(np.int64)


def _lzw_decode(data: bytes, min_code_size: int, expect: int) -> bytes | None:
    """GIF-variant LZW: variable code width starting min+1 bits, CLEAR
    and END control codes, dictionary capped at 12 bits. Returns the
    index stream or None on a malformed stream."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # bit reader: GIF packs codes LSB-first
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    width = min_code_size + 1
    dict_base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(dict_base)
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= n:
                return None  # ran out before END code
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(dict_base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            return None
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) > expect:
            return None
    return bytes(out) if len(out) == expect else None


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """From-scratch GIF LZW compressor (emits CLEAR, codes, END)."""
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    run = b""
    for byte in indices:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        emit(table[run])
        table[cand] = next_code
        next_code += 1
        # Width sync: the decoder adds its dictionary entry one code
        # AFTER the encoder does (it needs the next code's first byte),
        # so its size-reaches-2^w bump lands one emit later than the
        # encoder's table does — bump at 2^w + 1 here to match.
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        run = bytes([byte])
    if run:
        emit(table[run])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def parse_screen(b: bytes) -> dict | None:
    """Header-only parse: logical screen geometry + version."""
    if len(b) < 13 or bytes(b[:4]) != b"GIF8" or b[4:6] not in (b"7a", b"9a"):
        return None
    w, h = struct.unpack_from("<HH", b, 6)
    packed = b[10]
    return {
        "width": w,
        "height": h,
        "version": bytes(b[:6]).decode("ascii"),
        "global_palette": bool(packed & 0x80),
        "palette_size": 2 << (packed & 0x07),
    }


def decode_gif(b: bytes) -> tuple[int, int, int, np.ndarray] | None:
    """First frame -> (width, height, 3, HxWx3 uint8 RGB array), or
    None when not a GIF / malformed / truncated."""
    scr = parse_screen(b)
    if scr is None:
        return None
    i = 13
    gct = None
    if scr["global_palette"]:
        n = 3 * scr["palette_size"]
        if i + n > len(b):
            return None
        gct = np.frombuffer(b[i : i + n], np.uint8).reshape(-1, 3)
        i += n
    while i < len(b):
        blk = b[i]
        if blk == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(b) and b[i] != 0:
                i += 1 + b[i]
            i += 1
        elif blk == 0x2C:  # image descriptor
            if i + 10 > len(b):
                return None
            _left, _top, w, h = struct.unpack_from("<HHHH", b, i + 1)
            packed = b[i + 9]
            i += 10
            pal = gct
            if packed & 0x80:  # local color table
                n = 3 * (2 << (packed & 0x07))
                if i + n > len(b):
                    return None
                pal = np.frombuffer(b[i : i + n], np.uint8).reshape(-1, 3)
                i += n
            if pal is None or w <= 0 or h <= 0 or i >= len(b):
                return None
            min_code = b[i]
            i += 1
            if not 2 <= min_code <= 11:
                return None
            data = bytearray()
            while i < len(b) and b[i] != 0:
                sz = b[i]
                if i + 1 + sz > len(b):
                    return None
                data += b[i + 1 : i + 1 + sz]
                i += 1 + sz
            if i >= len(b):
                return None  # missing sub-block terminator
            idx_stream = _lzw_decode(bytes(data), min_code, w * h)
            if idx_stream is None:
                return None
            idx = np.frombuffer(idx_stream, np.uint8)
            if int(idx.max(initial=0)) >= pal.shape[0]:
                return None
            mat = idx.reshape(h, w)
            if packed & 0x40:  # interlaced: reorder rows
                disp = np.empty_like(mat)
                disp[_interlace_order(h)] = mat
                mat = disp
            return w, h, 3, pal[mat]
        elif blk == 0x3B:  # trailer before any image
            return None
        else:
            return None
    return None


def encode_gif(
    indices, palette, *, interlace: bool = False, min_code_size: int = 8
) -> bytes:
    """HxW uint8 index matrix + Px3 palette -> valid GIF89a bytes."""
    idx = np.ascontiguousarray(indices, np.uint8)
    pal = np.ascontiguousarray(palette, np.uint8)
    if idx.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("need HxW indices and Px3 palette")
    h, w = idx.shape
    if int(idx.max(initial=0)) >= pal.shape[0]:
        raise ValueError("index out of palette range")
    # pad palette to a power of two >= 2
    bits = max(1, int(np.ceil(np.log2(max(2, pal.shape[0])))))
    full = np.zeros((1 << bits, 3), np.uint8)
    full[: pal.shape[0]] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT present, bg 0
    out += full.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0x00])
    mat = idx
    if interlace:
        mat = idx[_interlace_order(h)]  # store rows in pass order
    out += bytes([min_code_size])
    comp = _lzw_encode(mat.tobytes(), min_code_size)
    for off in range(0, len(comp), 255):
        chunk = comp[off : off + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


try:  # pragma: no cover - registration is environment-dependent
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001 - fall back to PYTHONPATH import
    pass
