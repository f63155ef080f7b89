"""AVI/MJPEG: pure-stdlib RIFF container codec and its decode_media /
sample_frames integration.

Proof obligations:
- encode_avi_mjpeg produces a container parse_avi/frame_offsets read
  back exactly (geometry, fps, frame count, per-frame byte identity);
- truncated containers are detected (header survives, missing frame
  chunks excluded, decode_media reports valid=false);
- non-AVI RIFF (WAV) and non-RIFF bytes are cleanly rejected, and WAV
  continues to route to the audio parser (both are RIFF);
- sample_frames keeps exactly the every-N frames, really decodes them
  (digest equals a direct jpegcodec decode), and fans out one row per
  kept frame; non-AVI rows yield the auditable frame_idx=-1 residue.
"""

import hashlib

import numpy as np

from sonnerie_spark.operators import avicodec, jpegcodec, multimodal


def _frames(n, wb=3, hb=2, seed=7):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        vals = (rng.integers(0, 128, (hb, wb)) * 2).astype(np.uint8)
        img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
        out.append(jpegcodec.encode_jpeg(img, quality=50))
    return out


def test_container_roundtrip():
    frames = _frames(5)
    avi = avicodec.encode_avi_mjpeg(frames, width=24, height=16, fps=25)
    hdr = avicodec.parse_avi(avi)
    assert hdr == {
        "usec_per_frame": 40000,
        "n_frames": 5,
        "n_streams": 1,
        "width": 24,
        "height": 16,
        "handler": "MJPG",
    }
    got = [bytes(f) for f in avicodec.iter_frames(avi)]
    assert got == frames


def test_truncation_and_rejection():
    frames = _frames(4)
    avi = avicodec.encode_avi_mjpeg(frames, width=24, height=16)
    # Cut inside the movi list: header still parses, promised frames
    # don't all materialize.
    cut = avi[: len(avi) - len(frames[-1]) - 300]
    assert avicodec.parse_avi(cut)["n_frames"] == 4
    assert len(avicodec.frame_offsets(cut)) < 4
    # Non-AVI RIFF and non-RIFF bytes.
    assert avicodec.parse_avi(b"RIFF\x04\x00\x00\x00WAVE") is None
    assert avicodec.frame_offsets(b"not riff at all") is None


def test_decode_media_avi_and_wav_coexist(spark):
    frames = _frames(3)
    avi = avicodec.encode_avi_mjpeg(frames, width=24, height=16, fps=25)
    cut = avi[: len(avi) - len(frames[-1]) - 300]
    # A real little WAV: 2ch 16-bit 8kHz, 4 frames.
    import struct

    wav = (
        b"RIFF" + struct.pack("<I", 36 + 16) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
        + b"data" + struct.pack("<I", 16) + b"\x00" * 16
    )
    media = spark.createDataFrame(
        [(1, "video", avi, None), (2, "video", cut, None),
         (3, "audio", wav, None)],
        multimodal.MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in multimodal.decode_media(media).collect()}
    full = rows[1]
    assert (full["codec"], full["width"], full["height"]) == ("mjpeg", 24, 16)
    assert (full["n_frames"], full["duration_us"], full["valid"]) == (3, 120000, True)
    w, h, ch, px = jpegcodec.decode_jpeg(frames[0])
    assert full["pixel_md5"] == hashlib.md5(px.tobytes()).hexdigest()
    trunc = rows[2]
    assert trunc["codec"] == "mjpeg" and trunc["valid"] is False
    assert rows[3]["codec"] == "wav" and rows[3]["sample_rate"] == 8000


def test_sample_frames_every_n(spark):
    frames = _frames(7)
    avi = avicodec.encode_avi_mjpeg(frames, width=24, height=16)
    media = spark.createDataFrame(
        [(1, "video", avi, None), (2, "video", b"junk", None)],
        multimodal.MEDIA_SCHEMA,
    )
    out = multimodal.sample_frames(media, every=3).collect()
    kept = sorted(
        (r["frame_idx"], r["pixel_md5"]) for r in out if r["media_id"] == 1
    )
    assert [i for i, _ in kept] == [0, 3, 6]
    for idx, md5 in kept:
        _, _, _, px = jpegcodec.decode_jpeg(frames[idx])
        assert md5 == hashlib.md5(px.tobytes()).hexdigest()
    residue = [r for r in out if r["media_id"] == 2]
    assert len(residue) == 1
    assert residue[0]["frame_idx"] == -1 and residue[0]["valid"] is False
