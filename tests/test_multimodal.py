"""Multimodal binary-column plumbing: schema, Arrow batch shape,
determinism, fan-out, and payload-size invariants (decode itself is a
documented stub)."""

import pytest
from pyspark.sql import functions as F

from binance_futures_data_lake_spark.operators.multimodal import (
    IMAGE_FEATURES_SCHEMA,
    image_features,
    resize_images,
    sample_frames,
    synthetic_media,
)
from binance_futures_data_lake_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, "documents", SF)
    m = synthetic_media(docs, kind="image").cache()
    m.count()
    return m


def test_media_schema(media):
    d = dict(media.dtypes)
    assert d["payload"] == "binary"
    assert d["kind"] == "string"
    assert d["meta"].startswith("struct<format:string,width:int,height:int")


def test_image_features_shape_and_determinism(spark, media):
    feats = image_features(media)
    assert feats.schema == IMAGE_FEATURES_SCHEMA
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == media.count()
    for r in rows.values():
        assert r.n_bytes > 0
        assert 0.0 <= r.mean_intensity <= 255.0
        assert r.std_intensity >= 0.0
    # deterministic across partitionings (no RNG, md5-derived stub)
    rows2 = {r.media_id: r for r in image_features(media.repartition(7)).collect()}
    assert {k: (v.mean_intensity, v.phash) for k, v in rows.items()} == {
        k: (v.mean_intensity, v.phash) for k, v in rows2.items()
    }


def test_identical_payloads_same_phash(spark):
    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other text")],
        ["doc_id", "text"],
    )
    m = synthetic_media(docs)
    f = {r.media_id: r.phash for r in image_features(m).collect()}
    # ids 1,2 share payload BUT differ in metadata dims → phash may differ;
    # equal dims + equal payload must be equal:
    docs_eq = spark.createDataFrame(
        [(0, "same text"), (192, "same text")], ["doc_id", "text"]
    )  # ids congruent mod lcm(64,48)=192 → same width AND height
    f_eq = {r.media_id: r.phash for r in image_features(synthetic_media(docs_eq)).collect()}
    assert f_eq[0] == f_eq[192]
    assert f[1] != f[3] or f[2] != f[3]  # different text ⇒ fingerprints differ somewhere


def test_resize_payload_roundtrip(spark, media):
    from binance_futures_data_lake_spark.operators.multimodal import png_decode_gray

    out = resize_images(media, 8, 6)
    rows = out.collect()
    assert len(rows) == media.count()
    for r in rows:
        assert r.width == 8 and r.height == 6
        # thumbnails are REAL PNGs: decode and check exact dims/pixel count
        w, h, px = png_decode_gray(bytes(r.payload))
        assert (w, h) == (8, 6) and len(px) == 8 * 6


def test_frame_sampling_fanout(spark, media):
    frames = sample_frames(media, every_ms=1000, max_frames=4)
    agg = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("frame_idx").alias("max_idx")
    )
    src_meta = {r.media_id: r.meta for r in media.select("media_id", "meta").collect()}
    for r in agg.collect():
        dur = src_meta[r.media_id]["duration_ms"]
        expect = min(4, max(1, dur // 1000))
        assert r.n == expect
        assert r.max_idx == expect - 1
    # frame timestamps monotone per media
    fr = frames.filter(F.col("media_id") == list(src_meta)[0]).orderBy("frame_idx").collect()
    ts = [r.frame_ts_ms for r in fr]
    assert ts == sorted(ts)


def test_png_codec_all_filter_types_roundtrip():
    """The decoder must undo every PNG scanline filter (0=None..4=Paeth),
    exercised with genuinely filtered files from the test encoder."""
    from binance_futures_data_lake_spark.operators.multimodal import (
        png_decode_gray,
        png_encode_gray,
    )

    px = bytes((i * 37 + 11) % 256 for i in range(48 * 32))
    for ft in range(5):
        enc = png_encode_gray(px, 48, 32, filter_type=ft)
        assert enc[:8] == b"\x89PNG\r\n\x1a\n"
        assert png_decode_gray(enc) == (48, 32, px)
    # filtered encodings differ on the wire but decode identically
    assert png_encode_gray(px, 48, 32, 0) != png_encode_gray(px, 48, 32, 4)


def test_png_decoder_rejects_garbage():
    from binance_futures_data_lake_spark.operators.multimodal import png_decode_gray

    with pytest.raises(ValueError):
        png_decode_gray(b"not a png at all")
    with pytest.raises(ValueError):
        png_decode_gray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4)


def test_wav_codec_roundtrip_and_chunk_walk():
    import struct

    import numpy as np

    from binance_futures_data_lake_spark.operators.multimodal import (
        wav_decode_pcm16,
        wav_encode_pcm16,
    )

    v = ((np.arange(777) * 131) % 65536 - 32768).astype("<i2").tobytes()
    enc = wav_encode_pcm16(v, 16000)
    assert enc[:4] == b"RIFF" and enc[8:12] == b"WAVE" and len(enc) == 44 + len(v)
    assert wav_decode_pcm16(enc) == (16000, 1, v)
    # real-world shapes the encoder never emits must still parse:
    # unknown chunk (odd length → word-aligned) before fmt, data split in two
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    a, b = v[:400], v[400:]
    body = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", 3) + b"odd\x00"  # 3-byte chunk + pad
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(a)) + a
        + b"data" + struct.pack("<I", len(b)) + b
    )
    raw = b"RIFF" + struct.pack("<I", len(body)) + body
    assert wav_decode_pcm16(raw) == (8000, 1, v)


def test_wav_codec_rejects_bad_input():
    import struct

    from binance_futures_data_lake_spark.operators.multimodal import (
        wav_decode_pcm16,
        wav_encode_pcm16,
    )

    with pytest.raises(ValueError):
        wav_encode_pcm16(b"\x00\x01\x02", 16000)  # not whole frames
    with pytest.raises(ValueError):
        wav_decode_pcm16(b"RIFF....not wave")
    # 8-bit PCM is a real WAV the codec honestly refuses
    fmt8 = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt8
    with pytest.raises(NotImplementedError):
        wav_decode_pcm16(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_audio_features_match_numpy_reference(spark):
    import numpy as np

    from binance_futures_data_lake_spark.operators.multimodal import (
        AUDIO_FEATURES_SCHEMA,
        audio_features,
    )

    docs = load_table(spark, "documents", SF)
    media = synthetic_media(docs, kind="audio").cache()
    media.count()
    feats = audio_features(media)
    assert feats.schema == AUDIO_FEATURES_SCHEMA
    rows = {r.media_id: r for r in feats.collect()}
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert rows.keys() == texts.keys()
    for did, text in texts.items():
        n = did % 800 + 400
        tb = np.frombuffer(text.encode(), np.uint8)
        v = (np.resize(tb, n).astype(np.int64) - 96) * 180
        r = rows[did]
        assert r.n_samples == n and r.n_bytes == 44 + 2 * n
        assert r.duration_ms == n * 1000 // 16000
        assert r.peak_abs == int(np.abs(v).max())
        assert r.zero_crossings == int((v[:-1] * v[1:] < 0).sum())
        assert abs(r.mean_amplitude - v.mean()) < 1e-6
        assert abs(r.rms - np.sqrt((v.astype(float) ** 2).mean())) < 1e-6
    # per-clip results independent of batch composition / partitioning
    rows2 = {r.media_id: r for r in audio_features(media.repartition(7)).collect()}
    assert {k: (v.rms, v.zero_crossings) for k, v in rows.items()} == {
        k: (v.rms, v.zero_crossings) for k, v in rows2.items()
    }


def test_audio_fingerprint_contour_and_invariances(spark):
    import struct

    import numpy as np

    from binance_futures_data_lake_spark.operators.multimodal import (
        audio_fingerprint, wav_encode_pcm16,
    )

    rng = np.random.default_rng(3)
    base = (rng.integers(-800, 800, size=640)).astype("<i2")
    louder = (base.astype(np.int32) * 3).clip(-32768, 32767).astype("<i2")
    short = base[:40]  # < n_frames -> null fingerprint
    rows = [
        (1, wav_encode_pcm16(base.tobytes(), 16000)),
        (2, wav_encode_pcm16(louder.tobytes(), 16000)),
        (3, wav_encode_pcm16(short.tobytes(), 16000)),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r.afp for r in audio_fingerprint(media).collect()}
    # numpy reference: 64 array_split frames, integer energies, delta signs
    frames = np.array_split(base.astype(np.int64), 64)
    e = np.array([int((f * f).sum()) for f in frames])
    want = sum(1 << i for i in range(63) if e[i + 1] > e[i])
    assert out[1] == want
    # gain-invariance: scaling every sample scales every frame energy
    assert out[2] == out[1]
    assert out[3] is None
    # batch-composition independence
    out2 = {r.media_id: r.afp for r in
            audio_fingerprint(media.repartition(3)).collect()}
    assert out2 == out
    with pytest.raises(ValueError):
        audio_fingerprint(media, n_frames=1)
