"""MP3 bitstream framing: pure-stdlib frame walk and its decode_media
integration.

Proof obligations:
- the walk recovers frame count / rate / channels / exact duration for
  CBR streams across the MPEG-1 Layer III bitrate-rate grid, including
  ID3v2-prefixed and ID3v1-suffixed streams;
- truncation mid-frame and trailing garbage report complete=False
  (honest invalidity), and the <2-frame guard rejects random 0xFFEx
  bytes so other binary content is not misclassified;
- decode_media routes MP3 to codec='mp3' without disturbing the other
  RIFF (WAV/AVI) routes.
"""

from sonnerie_spark.operators import mp3codec, multimodal


def test_cbr_grid_and_tags():
    for kbps, rate in ((64, 44100), (128, 48000), (320, 32000)):
        s = mp3codec.encode_mp3_frames(
            9, bitrate_kbps=kbps, sample_rate=rate, mono=True
        )
        got = mp3codec.parse_mp3(s)
        assert got == {
            "n_frames": 9,
            "sample_rate": rate,
            "channels": 1,
            "duration_us": 9 * 1152 * 1_000_000 // rate,
            "complete": True,
        }, (kbps, rate)
    s = mp3codec.encode_mp3_frames(5)
    id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + b"x" * 20
    id3v1 = b"TAG" + b"\x00" * 125
    assert mp3codec.parse_mp3(id3v2 + s + id3v1)["n_frames"] == 5


def test_honest_invalidity_and_rejection():
    s = mp3codec.encode_mp3_frames(6)
    cut = mp3codec.parse_mp3(s[: len(s) - 10])
    assert cut["n_frames"] == 5 and cut["complete"] is False
    tail = mp3codec.parse_mp3(s + b"not frames")
    assert tail["n_frames"] == 6 and tail["complete"] is False
    assert mp3codec.parse_mp3(b"\xff\xe3random bytes here") is None
    assert mp3codec.parse_mp3(mp3codec.encode_mp3_frames(1)) is None
    assert mp3codec.parse_mp3(b"") is None


def test_decode_media_mp3_route(spark):
    import struct

    s = mp3codec.encode_mp3_frames(8, sample_rate=48000, mono=False)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + 8) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 8) + b"\x00" * 8
    )
    media = spark.createDataFrame(
        [(1, "audio", s, None), (2, "audio", s[:40], None),
         (3, "audio", wav, None)],
        multimodal.MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in multimodal.decode_media(media).collect()}
    ok = rows[1]
    assert (ok["codec"], ok["channels"], ok["sample_rate"]) == ("mp3", 2, 48000)
    assert ok["n_frames"] == 8 and ok["valid"] is True
    assert ok["duration_us"] == 8 * 1152 * 1_000_000 // 48000
    assert rows[2]["codec"] is None and rows[2]["valid"] is False
    assert rows[3]["codec"] == "wav"
