"""decode_media: real header-parse decoding (netpbm, WAV) plus the
unknown-codec fallback, driven through the mapInPandas operator."""

import struct

from sonnerie_spark.operators import multimodal


def _wav_bytes(channels=2, rate=8000, bits=16, n_frames=4000, junk_chunk=True):
    block = channels * bits // 8
    data = b"\x00" * (n_frames * block)
    chunks = b""
    if junk_chunk:  # decoders must skip unknown chunks (word-aligned)
        chunks += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    chunks += (
        b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    )
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _media_df(spark, rows):
    return spark.createDataFrame(
        [(i, kind, content, None) for i, (kind, content) in enumerate(rows)],
        multimodal.MEDIA_SCHEMA,
    )


def test_decode_media_real_formats(spark):
    ppm = b"P6\n# a comment\n4 3\n255\n" + b"\xab" * (4 * 3 * 3)
    ppm_short = b"P6\n4 3\n255\n" + b"\xab" * 5  # truncated pixel payload
    pgm16 = b"P5 2 2 65535\n" + b"\x00" * (2 * 2 * 2)  # 16-bit grayscale
    wav = _wav_bytes(channels=2, rate=8000, n_frames=4000)
    junk = b"\x89PNG not actually parseable here"

    rows = [
        ("image", ppm),
        ("image", ppm_short),
        ("image", pgm16),
        ("audio", wav),
        ("image", junk),
    ]
    got = {
        r["media_id"]: r.asDict()
        for r in multimodal.decode_media(_media_df(spark, rows)).collect()
    }

    assert (got[0]["codec"], got[0]["width"], got[0]["height"], got[0]["valid"]) == (
        "ppm", 4, 3, True,
    )
    # header parses but payload is short -> dimensions known, valid False
    assert (got[1]["codec"], got[1]["width"], got[1]["height"], got[1]["valid"]) == (
        "ppm", 4, 3, False,
    )
    assert (got[2]["codec"], got[2]["width"], got[2]["height"], got[2]["valid"]) == (
        "pgm", 2, 2, True,
    )
    w = got[3]
    assert (w["codec"], w["channels"], w["sample_rate"]) == ("wav", 2, 8000)
    assert w["n_frames"] == 4000
    assert w["duration_us"] == 4000 * 1_000_000 // 8000  # 0.5 s
    assert w["valid"] is True
    assert got[4]["codec"] is None and got[4]["valid"] is False


def test_decode_media_wav_truncated_data(spark):
    """A data chunk whose declared size overruns the blob is an
    incomplete payload: frame math uses the clamped bytes, but valid
    must be False (mirrors the netpbm w*h*bpp completeness check)."""
    wav = _wav_bytes(channels=2, rate=8000, n_frames=4000)
    cut = wav[: len(wav) - 1000]  # drop the tail of the data chunk
    (row,) = multimodal.decode_media(_media_df(spark, [("audio", cut)])).collect()
    assert row["codec"] == "wav"
    assert row["valid"] is False
    assert row["n_frames"] < 4000  # frames computed from present bytes


def test_decode_media_wav_without_junk_chunk(spark):
    wav = _wav_bytes(channels=1, rate=44100, n_frames=44100, junk_chunk=False)
    (row,) = multimodal.decode_media(_media_df(spark, [("audio", wav)])).collect()
    assert (row["channels"], row["sample_rate"], row["duration_us"]) == (
        1, 44100, 1_000_000,
    )


try:
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=6, deadline=None)
    @given(
        w=st.integers(min_value=0, max_value=500),
        h=st.integers(min_value=0, max_value=500),
        maxval=st.integers(min_value=1, max_value=65535),
        channels=st.integers(min_value=1, max_value=8),
        rate=st.integers(min_value=1, max_value=192000),
        n_frames=st.integers(min_value=0, max_value=100000),
        junk=st.lists(st.binary(max_size=64), max_size=4),
    )
    def test_decode_media_fuzz(spark, w, h, maxval, channels, rate, n_frames, junk):
        """Constructed headers always roundtrip; arbitrary junk (and
        truncated valid headers) never crash the parser and never claim
        validity for payloads that are not there."""
        bpp = 3 * (2 if maxval > 255 else 1)
        ppm = (f"P6 {w} {h} {maxval}\n").encode() + b"\x00" * (w * h * bpp)
        wav = _wav_bytes(channels=channels, rate=rate, n_frames=n_frames,
                         junk_chunk=False)
        rows = [("image", ppm), ("audio", wav), ("image", ppm[: len(ppm) // 2])]
        rows += [("image", j) for j in junk]
        got = {
            r["media_id"]: r.asDict()
            for r in multimodal.decode_media(_media_df(spark, rows)).collect()
        }
        p = got[0]
        assert (p["codec"], p["width"], p["height"], p["valid"]) == (
            "ppm", w, h, True,
        )
        a = got[1]
        assert (a["codec"], a["channels"], a["sample_rate"]) == (
            "wav", channels, rate,
        )
        assert a["n_frames"] == n_frames
        assert a["duration_us"] == n_frames * 1_000_000 // rate
        # truncated ppm: never valid unless the halved payload still covers
        t = got[2]
        if t["codec"] is not None and t["valid"]:
            assert len(ppm) // 2 >= len(ppm) - w * h * bpp
        # junk rows: parser returned a row for each, no exceptions
        assert len(got) == len(rows)

except ImportError:  # pragma: no cover - hypothesis is in the image
    pass


def test_resize_media_roundtrips_through_decoder(spark):
    """resize_media really moves pixels: decode(resize(img)) reports the
    subsampled geometry, and the surviving pixels are exactly the
    nearest-neighbor selection of the original."""
    import numpy as np

    w, h = 7, 5
    rng = np.random.default_rng(42)
    pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    ppm = f"P6\n{w} {h}\n255\n".encode() + pix.tobytes()
    junk = b"not an image at all"
    df = _media_df(spark, [("image", ppm), ("image", junk)])

    out = {r["media_id"]: r.asDict()
           for r in multimodal.resize_media(df, factor=2).collect()}
    r = out[0]
    assert (r["codec"], r["width"], r["height"]) == ("ppm", 4, 3)
    # decode the resized bytes with the independent parser
    dec = multimodal.decode_media(
        _media_df(spark, [("image", bytes(r["content"]))])
    ).collect()[0]
    assert (dec["codec"], dec["width"], dec["height"], dec["valid"]) == (
        "ppm", 4, 3, True,
    )
    got = np.frombuffer(bytes(r["content"])[len(b"P6\n4 3\n255\n"):],
                        dtype=np.uint8).reshape(3, 4, 3)
    assert (got == pix[::2, ::2, :]).all()
    # undecodable input passes through as NULLs
    assert out[1]["codec"] is None and out[1]["content"] is None


def test_resample_media_roundtrips_through_decoder(spark):
    """resample_media really strides audio frames: decode(resample(x))
    reports rate/k and ceil(n/k) frames with duration preserved, and the
    surviving frames are exactly the stride selection."""
    import numpy as np
    import struct

    wav = _wav_bytes(channels=2, rate=8000, n_frames=1001, junk_chunk=True)
    df = _media_df(spark, [("audio", wav), ("audio", b"nope")])
    out = {r["media_id"]: r.asDict()
           for r in multimodal.resample_media(df, factor=4).collect()}
    r = out[0]
    assert (r["codec"], r["channels"], r["sample_rate"]) == ("wav", 2, 2000)
    assert r["n_frames"] == (1001 + 3) // 4  # ceil(1001/4)
    # duration preserved within one frame: 1001/8000 s vs 251/2000 s
    assert abs(r["duration_us"] - 1001 * 1_000_000 // 8000) <= 1_000_000 // 2000
    dec = multimodal.decode_media(
        _media_df(spark, [("audio", bytes(r["content"]))])
    ).collect()[0]
    assert (dec["codec"], dec["channels"], dec["sample_rate"], dec["n_frames"]) == (
        "wav", 2, 2000, 251,
    )
    assert out[1]["codec"] is None and out[1]["content"] is None

    # frame content: build a wav with recognizable per-frame bytes
    block = 2  # 1 channel, 16-bit
    frames = np.arange(40, dtype=np.uint8).reshape(20, block)
    data = frames.tobytes()
    wav2 = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 1, 1, 8000, 16000, block, 16)
            + b"data" + struct.pack("<I", len(data)) + data)
    (r2,) = multimodal.resample_media(
        _media_df(spark, [("audio", wav2)]), factor=2
    ).collect()
    got = np.frombuffer(bytes(r2["content"])[44:], dtype=np.uint8).reshape(-1, block)
    assert (got == frames[::2]).all()


def test_real_feature_decoder_dispatch(spark):
    """real_feature_decoder: per-channel stats from ACTUALLY decoded
    pixels/samples for every real-codec format, (0,0,zeros) for content
    only the stub default can fake (MP3 payload, junk)."""
    import struct

    import numpy as np

    from sonnerie_spark.operators import (
        avicodec, jpegcodec, mp3codec,
    )

    dec = multimodal.real_feature_decoder()

    pgm = b"P5 4 2 255\n" + bytes(range(8))
    w, h, feat = dec(pgm)
    assert (w, h) == (4, 2) and abs(feat[0] - 3.5) < 1e-9

    vals = (np.arange(6, dtype=np.uint8).reshape(2, 3) * 2)
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    jp = jpegcodec.encode_jpeg(img, quality=50)
    w, h, feat = dec(jp)
    assert (w, h) == (24, 16) and abs(feat[0] - img.mean()) < 1e-9

    avi = avicodec.encode_avi_mjpeg([jp], width=24, height=16)
    assert dec(avi)[:2] == (24, 16)  # frame-0 pixels, really decoded

    wav = (
        b"RIFF" + struct.pack("<I", 36 + 8) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 8)
        + struct.pack("<4h", 100, -100, 200, -200)
    )
    w, h, feat = dec(wav)
    assert (w, h) == (0, 0) and abs(feat[0]) < 1e-9 and feat[1] > 0

    assert dec(mp3codec.encode_mp3_frames(4)) == (0, 0, [0.0] * 8)
    assert dec(b"junk") == (0, 0, [0.0] * 8)

    # Spark path: one pass, mixed formats, real features out.
    media = spark.createDataFrame(
        [(1, "image", jp, None), (2, "audio", wav, None)],
        multimodal.MEDIA_SCHEMA,
    )
    rows = {
        r["media_id"]: r
        for r in multimodal.decode_features(
            media, decoder=multimodal.real_feature_decoder()
        ).collect()
    }
    assert rows[1]["width"] == 24 and abs(rows[1]["feature"][0] - 5.0) < 1e-5
    assert rows[2]["width"] == 0 and rows[2]["feature"][1] > 0


def test_dhash_format_invariant_and_near_pairs(spark):
    """dhash_media: the SAME pixels produce the SAME 63-bit hash
    whether they arrive as P6 PPM or as a PNG re-encode (the decode
    paths agree), a one-pixel perturbation moves the hash by at most
    a few bits, and hamming_near_pairs finds exactly the constructed
    near-dups through the chunk-blocked plan (no all-pairs join)."""
    import numpy as np
    from pyspark.sql import functions as F

    from sonnerie_spark.operators import pngcodec
    from sonnerie_spark.operators.dedup import hamming_near_pairs
    from sonnerie_spark.operators.multimodal import dhash_media

    rng_bytes = bytes((i * 97 + 13) % 251 for i in range(20 * 14 * 3))
    ppm = b"P6\n20 14\n255\n" + rng_bytes
    px = np.frombuffer(rng_bytes, np.uint8).reshape(14, 20, 3)
    png = pngcodec.encode_png(px)
    perturbed = bytearray(rng_bytes)
    perturbed[0] = (perturbed[0] + 1) % 251
    ppm2 = b"P6\n20 14\n255\n" + bytes(perturbed)

    media = spark.createDataFrame(
        [(0, "image", ppm, None), (1, "image", png, None),
         (2, "image", ppm2, None), (3, "image", b"garbage", None)],
        "media_id long, kind string, content binary, meta map<string,string>",
    )
    rows = {r["media_id"]: (r["codec"], r["dhash"])
            for r in dhash_media(media).collect()}
    assert rows[0][0] == "ppm" and rows[1][0] == "png"
    assert rows[0][1] == rows[1][1], "PPM and PNG of same pixels differ"
    assert rows[3] == (None, None)
    assert 0 <= rows[0][1] < (1 << 63)
    ham = bin(rows[0][1] ^ rows[2][1]).count("1")
    assert ham <= 2, ham  # one-pixel edit: tiny hamming move

    hashes = dhash_media(media).filter("dhash IS NOT NULL")
    pairs = hamming_near_pairs(
        hashes, "media_id", "dhash", bits=63, max_hamming=2
    )
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert (0, 1) in got and got[(0, 1)] == 0
    assert (0, 2) in got and got[(0, 2)] == ham
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    # candidates join on (chunk, value), never a cross / all-pairs join
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_hamming_near_pairs_guarantee_property(spark):
    """Pigeonhole guarantee: for a seed hash and every <=max_hamming
    bit-flip variant, the pair (seed, variant) is found; chunks <=
    max_hamming raises (no guarantee possible)."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from sonnerie_spark.operators.dedup import hamming_near_pairs

    seed = 0x3F2A95C1D4E6B07
    variants = [(0, seed)]
    flips = [1, 7, 20, 21, 41, 62]
    vid = 1
    import itertools

    for k in (1, 2, 3):
        for combo in itertools.combinations(flips, k):
            v = seed
            for b in combo:
                v ^= 1 << b
            variants.append((vid, v))
            vid += 1
    df = spark.createDataFrame(variants, "id long, h long")
    pairs = hamming_near_pairs(df, "id", "h", bits=63, max_hamming=3)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for i, v in variants[1:]:
        assert (0, i) in got, f"missed variant {i} (hamming {bin(seed ^ v).count('1')})"

    with _pytest.raises(ValueError, match="chunks"):
        hamming_near_pairs(df, "id", "h", max_hamming=3, chunks=3)


def test_hamming_chunk_split_covers_every_bit(spark):
    """Regression for the r8 ceil-width split: with bits=63 and
    max_hamming=9 (10 chunks), the old ceil split gave chunk 9 a
    start offset of 63 — its value was the constant 0 for every row,
    degenerating that chunk's equi-join into an all-pairs cross join.
    The fixed split must (a) produce exactly `chunks` ranges that
    tile [0, bits) with every width >= 1, and (b) reconstruct the
    original hash from the chunk values (impossible if any chunk is
    a constant), for the exact reported shape and a sweep of others.
    chunks > bits must raise."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from sonnerie_spark.operators.dedup import (
        _chunk_ranges,
        _chunk_value_exprs,
        hamming_near_pairs,
    )

    for bits, c in [(63, 10), (63, 1), (63, 63), (63, 7), (21, 5), (1, 1)]:
        ranges = _chunk_ranges(bits, c)
        assert len(ranges) == c
        assert all(w >= 1 for _, w in ranges), (bits, c, ranges)
        assert ranges[0][0] == 0
        assert all(
            ranges[i][0] + ranges[i][1] == ranges[i + 1][0]
            for i in range(c - 1)
        )
        assert ranges[-1][0] + ranges[-1][1] == bits

    # reconstruction over Spark for the reported (63, 10) shape
    hashes = [(i, (0x6F2A95C1D4E6B07 * (i + 1)) % (1 << 63)) for i in range(8)]
    df = spark.createDataFrame(hashes, "id long, h long")
    exprs = _chunk_value_exprs("h", 63, 10)
    starts = [s for s, _ in _chunk_ranges(63, 10)]
    recon = None
    for e, s in zip(exprs, starts):
        term = e * F.lit(1 << s).cast("long")
        recon = term if recon is None else recon + term
    bad = df.select((recon != F.col("h")).alias("m")).filter("m").count()
    assert bad == 0, "chunk values do not reconstruct the hash"

    with _pytest.raises(ValueError, match="chunks=70 > bits"):
        hamming_near_pairs(df, "id", "h", bits=63, max_hamming=9, chunks=70)
    # the reported shape itself must run and find the self-pairs
    dup = df.union(df.select(F.col("id") + 100, "h"))
    pairs = hamming_near_pairs(dup, "id", "h", bits=63, max_hamming=9)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for i in range(8):
        assert (i, i + 100) in got


def test_hamming_near_pairs_words_guarantee(spark):
    """Multi-word (126-bit) pigeonhole guarantee: for a 2-word seed
    hash and every <= max_hamming bit-flip variant — flips spread
    across BOTH words including the straddle case — the pair is
    found with the exact summed hamming; invalid chunk counts raise;
    malformed rows (null / wrong word count) are ignored."""
    import itertools

    import pytest as _pytest

    from sonnerie_spark.operators.dedup import hamming_near_pairs_words

    seed = [0x3F2A95C1D4E6B07, 0x5D1E9A40C3B72F8]
    variants = [(0, seed)]
    flips = [1, 20, 62, 63, 70, 101, 125]  # bit b -> word b//63, bit b%63
    vid = 1
    expect = {}
    for k in (1, 2, 3):
        for combo in itertools.combinations(flips, k):
            v = list(seed)
            for b in combo:
                v[b // 63] ^= 1 << (b % 63)
            variants.append((vid, v))
            expect[vid] = k
            vid += 1
    df = spark.createDataFrame(variants, "id long, h array<long>")
    pairs = hamming_near_pairs_words(
        df, "id", "h", words=2, max_hamming=3
    )
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    for i, k in expect.items():
        assert got.get((0, i)) == k, f"variant {i}: want {k}, got {got.get((0, i))}"

    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan

    with _pytest.raises(ValueError, match="chunks=1 < words=2"):
        hamming_near_pairs_words(
            df, "id", "h", words=2, max_hamming=0, chunks=1
        )
    with _pytest.raises(ValueError, match="cannot guarantee"):
        hamming_near_pairs_words(
            df, "id", "h", words=2, max_hamming=3, chunks=3
        )

    # malformed rows never join: null hash, wrong word count
    from pyspark.sql import functions as F

    bad = spark.createDataFrame(
        [(900, None), (901, [1])], "id long, h array<long>"
    )
    pairs2 = hamming_near_pairs_words(
        df.unionByName(bad), "id", "h", words=2, max_hamming=3
    )
    ids = {x for r in pairs2.collect() for x in (r["id_a"], r["id_b"])}
    assert 900 not in ids and 901 not in ids


def test_dhash128_invariance_and_word_independence(spark):
    """dhash128_media: PPM and PNG of the same pixels give the same
    two-word hash; word 0 equals dhash_media's single word (the
    horizontal gradient is shared); a one-pixel edit stays within a
    small summed hamming; a 1-row image (vertical gradient undefined)
    yields NULL."""
    import numpy as np

    from sonnerie_spark.operators import pngcodec
    from sonnerie_spark.operators.multimodal import dhash128_media, dhash_media

    rng_bytes = bytes((i * 97 + 13) % 251 for i in range(20 * 14 * 3))
    ppm = b"P6\n20 14\n255\n" + rng_bytes
    px = np.frombuffer(rng_bytes, np.uint8).reshape(14, 20, 3)
    png = pngcodec.encode_png(px)
    perturbed = bytearray(rng_bytes)
    perturbed[0] = (perturbed[0] + 1) % 251
    ppm2 = b"P6\n20 14\n255\n" + bytes(perturbed)
    one_row = b"P6\n20 1\n255\n" + rng_bytes[: 20 * 3]

    media = spark.createDataFrame(
        [(0, "image", ppm, None), (1, "image", png, None),
         (2, "image", ppm2, None), (3, "image", one_row, None)],
        "media_id long, kind string, content binary, meta map<string,string>",
    )
    wide = {r["media_id"]: r["dhash"] for r in dhash128_media(media).collect()}
    assert wide[0] == wide[1], "PPM and PNG of same pixels differ"
    assert wide[3] is None, "1-row image must yield NULL at 128-bit"
    assert all(0 <= w < (1 << 63) for w in wide[0])
    narrow = {r["media_id"]: r["dhash"] for r in dhash_media(media).collect()}
    assert wide[0][0] == narrow[0], "word 0 != single-word dhash"
    ham = sum(bin(a ^ b).count("1") for a, b in zip(wide[0], wide[2]))
    assert ham <= 2, ham
    # 1-row image IS hashable at 63-bit (no vertical gradient needed)
    assert narrow[3] is not None


def test_simhash_words_independence_and_determinism(spark):
    """simhash_words: identical texts collide exactly on BOTH words;
    the two words are different functions (independent hash families);
    a small edit moves each word only a few bits; words<1 raises."""
    import pytest as _pytest

    from sonnerie_spark.operators.dedup import simhash_words

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = {r["id"]: r["simhash"] for r in
           simhash_words(df, "doc_id", "text", words=2,
                         bits_per_word=60).collect()}
    assert sig[0] == sig[1], "identical texts must collide on both words"
    assert len(sig[0]) == 2 and all(0 <= w < (1 << 60) for w in sig[0])
    assert sig[0][0] != sig[0][1], "salted families must differ"
    ham = sum(bin(a ^ b).count("1") for a, b in zip(sig[0], sig[2]))
    assert 0 < ham <= 30, ham  # one-token edit: small move, not zero

    with _pytest.raises(ValueError, match="words"):
        simhash_words(df, "doc_id", "text", words=0)
