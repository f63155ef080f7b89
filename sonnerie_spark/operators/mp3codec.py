"""MPEG audio (MP3) bitstream framing codec, pure stdlib.

Real frame-header parsing for the most common crawled-audio format:
walk the elementary stream frame by frame (11-bit sync, version/layer
bits, the published bitrate and sample-rate index tables), skipping a
leading ID3v2 tag and a trailing ID3v1 tag, and derive channel count,
sample rate, frame count, and exact duration. This is the same tier of
"real" as the WAV path — container/bitstream structure fully decoded,
PCM synthesis (Huffman + IMDCT + polyphase filterbank) left behind the
clearly-labeled ``decode_features`` seam where a real audio library
plugs in.

``encode_mp3_frames`` synthesizes a syntactically valid CBR stream
(correct headers + deterministic payload bytes) so the gate can prove
the walk is real: a parser that reads one header and divides by the
file size gets VBR streams and padded frames wrong; the walk does not.

Tables and layout from the public MPEG-1/2 audio framing spec.
"""

from __future__ import annotations

# kbps, indexed by the 4-bit bitrate field; 0 = free, 15 = invalid.
_BITRATE = {
    # (version_group, layer): table  — version_group: 1 = MPEG1, 2 = MPEG2/2.5
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
}

_SAMPLERATE = {
    3: [44100, 48000, 32000],   # version bits 11 = MPEG1
    2: [22050, 24000, 16000],   # version bits 10 = MPEG2
    0: [11025, 12000, 8000],    # version bits 00 = MPEG2.5
}


def _frame_at(b: bytes, i: int) -> tuple[int, int, int, int] | None:
    """Parse one frame header at offset i.

    Returns (frame_size_bytes, samples_per_frame, sample_rate, channels)
    or None if the four bytes are not a valid MPEG audio frame header.
    """
    if i + 4 > len(b):
        return None
    h = int.from_bytes(b[i : i + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:  # 11-bit sync
        return None
    version = (h >> 19) & 3
    layer_bits = (h >> 17) & 3
    if version == 1 or layer_bits == 0:  # reserved
        return None
    layer = 4 - layer_bits  # 3 = Layer III, 2 = II, 1 = I
    vgroup = 1 if version == 3 else 2
    bitrate_idx = (h >> 12) & 0xF
    rate_idx = (h >> 10) & 3
    if bitrate_idx in (0, 15) or rate_idx == 3:
        return None  # free-format / invalid
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3
    bitrate = _BITRATE[(vgroup, layer)][bitrate_idx] * 1000
    rate = _SAMPLERATE[version][rate_idx]
    if layer == 1:
        samples = 384
        size = (12 * bitrate // rate + padding) * 4
    else:
        samples = 1152 if (layer == 2 or vgroup == 1) else 576
        size = samples // 8 * bitrate // rate + padding
    channels = 1 if mode == 3 else 2
    return size, samples, rate, channels


def parse_mp3(b: bytes) -> dict | None:
    """Walk an MP3 elementary stream: frame count, sample rate, channel
    count, exact duration_us, and whether the framing is consistent to
    EOF (``complete``). Skips a leading ID3v2 tag and a trailing ID3v1
    'TAG' block. Requires at least TWO chained frames so arbitrary
    bytes that happen to start 0xFFEx are not misclassified. Returns
    None when the bytes are not an MP3 stream."""
    i = 0
    if bytes(b[:3]) == b"ID3" and len(b) >= 10:
        # syncsafe 28-bit size after the 10-byte ID3v2 header
        sz = (
            (b[6] & 0x7F) << 21 | (b[7] & 0x7F) << 14
            | (b[8] & 0x7F) << 7 | (b[9] & 0x7F)
        )
        i = 10 + sz
    end = len(b)
    if end - i >= 128 and bytes(b[end - 128 : end - 125]) == b"TAG":
        end -= 128
    n = 0
    total_samples = 0
    rate = channels = None
    complete = True
    while i < end:
        got = _frame_at(b, i)
        if got is None or i + got[0] > end:
            # trailing garbage or a mid-frame cut; (i == end is the
            # clean-EOF exit via the loop condition, not this branch)
            complete = False
            break
        size, samples, r, ch = got
        if rate is None:
            rate, channels = r, ch
        elif r != rate:
            complete = False
            break
        n += 1
        total_samples += samples
        i += size
    if n < 2 or rate is None:
        return None
    return {
        "n_frames": n,
        "sample_rate": rate,
        "channels": channels,
        "duration_us": total_samples * 1_000_000 // rate,
        "complete": complete,
    }


def encode_mp3_frames(
    n_frames: int,
    *,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    mono: bool = False,
    fill: bytes = b"\x00",
) -> bytes:
    """Emit a syntactically valid MPEG-1 Layer III CBR stream: correct
    headers, deterministic filler payload. For fixtures/gates only —
    the payload is not real compressed audio."""
    b_idx = _BITRATE[(1, 3)].index(bitrate_kbps)
    r_idx = _SAMPLERATE[3].index(sample_rate)
    mode = 3 if mono else 0
    out = bytearray()
    for _ in range(n_frames):
        h = (
            0x7FF << 21 | 3 << 19 | 1 << 17  # sync, MPEG1, Layer III
            | 1 << 16                        # no CRC
            | b_idx << 12 | r_idx << 10 | mode << 6
        )
        size = 144 * bitrate_kbps * 1000 // sample_rate  # no padding bit
        frame = bytearray(h.to_bytes(4, "big"))
        body = (fill * (size // len(fill) + 1))[: size - 4]
        frame += body
        out += frame
    return bytes(out)
