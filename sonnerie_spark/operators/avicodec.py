"""Minimal RIFF AVI container codec (MJPEG video), pure stdlib.

The container layer for the video leg of the multimodal surface:

- ``encode_avi_mjpeg``: assemble already-encoded JPEG frames into a
  standards-shaped AVI (RIFF / hdrl / avih / strl / strh+strf / movi /
  idx1) with an MJPG video stream — used to synthesize deterministic
  video fixtures from the test corpus.
- ``parse_avi``: header-only metadata (width / height / frame count /
  microseconds per frame / fourcc handler) from ``avih`` + ``strh``.
  O(header bytes); never touches frame data.
- ``frame_offsets`` / ``iter_frames``: walk the ``movi`` list and
  return per-frame (offset, size) spans or the frame bytes themselves.
  The walk is a chunk-header skip — O(n_frames), not O(pixels) — which
  is what makes sampled decoding cheap: a frame-sampling pass touches
  only the JPEG bytes of the frames it keeps.

Frame pixel decoding is NOT here — MJPEG frames are plain baseline
JPEGs, handled by ``jpegcodec`` (composition, not a new codec).

No reference analogue (the reference is a pure time-series engine);
this is the training-data-pipeline extension surface for video columns.
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(listtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", listtype + payload)


def encode_avi_mjpeg(
    jpeg_frames: list[bytes], *, width: int, height: int, fps: int = 25
) -> bytes:
    """Assemble JPEG-encoded frames into an AVI with one MJPG stream."""
    n = len(jpeg_frames)
    usec = 1_000_000 // fps
    max_bytes = max((len(f) for f in jpeg_frames), default=0)
    avih = struct.pack(
        "<14I",
        usec,              # dwMicroSecPerFrame
        max_bytes * fps,   # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # dwFlags: AVIF_HASINDEX
        n,                 # dwTotalFrames
        0,                 # dwInitialFrames
        1,                 # dwStreams
        max_bytes,         # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,        # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIII",
            0,          # dwFlags
            0, 0,       # wPriority, wLanguage
            0,          # dwInitialFrames
            1,          # dwScale
            fps,        # dwRate (rate/scale = fps)
            0,          # dwStart
            n,          # dwLength (in frames)
            max_bytes,  # dwSuggestedBufferSize
            0xFFFFFFFF, # dwQuality (default)
            0,          # dwSampleSize (0 = variable, one frame/chunk)
            0,          # rcFrame (left/top)
        )
        + struct.pack("<HH", width, height)  # rcFrame (right/bottom)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,            # biSize
        width,
        height,
        1,             # biPlanes
        24,            # biBitCount
        b"MJPG",       # biCompression
        width * height * 3,
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"movi"
    idx = b""
    for f in jpeg_frames:
        # idx1 offsets are relative to the 'movi' fourcc position.
        idx += b"00dc" + struct.pack("<III", 0x10, len(movi_payload), len(f))
        movi_payload += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_payload)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _is_avi(b: bytes) -> bool:
    return (
        len(b) >= 12 and bytes(b[:4]) == b"RIFF" and bytes(b[8:12]) == b"AVI "
    )


def parse_avi(b: bytes) -> dict | None:
    """Header-only AVI metadata: width/height/n_frames/usec_per_frame/
    handler fourcc. Returns None when the bytes are not a RIFF AVI or
    the required ``avih`` header is missing/truncated."""
    if not _is_avi(b):
        return None
    out: dict = {}
    i = 12
    while i + 8 <= len(b):
        cid = bytes(b[i : i + 4])
        (csize,) = struct.unpack_from("<I", b, i + 4)
        if cid == b"LIST" and i + 12 <= len(b):
            listtype = bytes(b[i + 8 : i + 12])
            if listtype == b"hdrl":
                j = i + 12
                end = min(i + 8 + csize, len(b))
                while j + 8 <= end:
                    sid = bytes(b[j : j + 4])
                    (ssize,) = struct.unpack_from("<I", b, j + 4)
                    if sid == b"avih" and j + 8 + 40 <= len(b):
                        vals = struct.unpack_from("<10I", b, j + 8)
                        out.update(
                            usec_per_frame=vals[0],
                            n_frames=vals[4],
                            n_streams=vals[6],
                            width=vals[8],
                            height=vals[9],
                        )
                    elif sid == b"LIST" and bytes(b[j + 8 : j + 12]) == b"strl":
                        k = j + 12
                        send = min(j + 8 + ssize, len(b))
                        while k + 8 <= send:
                            tid = bytes(b[k : k + 4])
                            (tsize,) = struct.unpack_from("<I", b, k + 4)
                            if (
                                tid == b"strh"
                                and k + 16 <= len(b)
                                and bytes(b[k + 8 : k + 12]) == b"vids"
                                and "handler" not in out
                            ):
                                out["handler"] = (
                                    bytes(b[k + 12 : k + 16])
                                    .decode("ascii", "replace")
                                    .strip()
                                )
                            k += 8 + tsize + (tsize & 1)
                    j += 8 + ssize + (ssize & 1)
        i += 8 + csize + (csize & 1)
    if "width" not in out:
        return None
    return out


def frame_offsets(b: bytes) -> list[tuple[int, int]] | None:
    """(offset, size) spans of the stream-0 video frames in the movi
    list, in presentation order. A chunk-header walk — never reads
    frame payloads. Returns None for a non-AVI; spans whose declared
    size overruns the blob are EXCLUDED (truncated container)."""
    if not _is_avi(b):
        return None
    spans: list[tuple[int, int]] = []
    i = 12
    while i + 8 <= len(b):
        cid = bytes(b[i : i + 4])
        (csize,) = struct.unpack_from("<I", b, i + 4)
        if (
            cid == b"LIST"
            and i + 12 <= len(b)
            and bytes(b[i + 8 : i + 12]) == b"movi"
        ):
            j = i + 12
            end = min(i + 8 + csize, len(b))
            while j + 8 <= end:
                sid = bytes(b[j : j + 4])
                (ssize,) = struct.unpack_from("<I", b, j + 4)
                if sid in (b"00dc", b"00db") and j + 8 + ssize <= len(b):
                    spans.append((j + 8, ssize))
                j += 8 + ssize + (ssize & 1)
        i += 8 + csize + (csize & 1)
    return spans


def iter_frames(b: bytes):
    """Yield each video frame's bytes (memoryview, zero-copy)."""
    spans = frame_offsets(b)
    if spans is None:
        return
    mv = memoryview(b)
    for off, size in spans:
        yield mv[off : off + size]
