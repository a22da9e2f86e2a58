"""Multimodal plumbing tests: the Spark-side contracts run for real; only
the codec is a deterministic fake (no image libs in this container)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from projekt_data_engineering_iubh_spark.multimodal.binary_ops import (
    MEDIA_SCHEMA,
    _fit_longer_side,
    default_image_decoder,
    extract_image_features,
    fake_image_decoder,
    fake_image_resizer,
    resize_images,
    sample_frames,
    size_balanced,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG-fake-1", (11, None, None, None)),
        (2, "image", b"\x89PNG-fake-two", (13, None, None, None)),
        (3, "video", b"\x00\x00mp4-fake", (9, None, None, 3500)),
        (4, "audio", b"RIFF-fake", (9, None, None, 2000)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_features_deterministic(spark, media):
    feats = extract_image_features(media, decoder=fake_image_decoder)
    rows = {r.asset_id: r for r in feats.collect()}
    assert set(rows) == {1, 2}  # only images
    w, h, luma = fake_image_decoder(b"\x89PNG-fake-1")
    assert rows[1].width == w and rows[1].height == h
    assert rows[1].mean_luma == pytest.approx(luma)
    assert len(rows[1].phash) == 16
    # re-run → identical (decoder is pure)
    again = {r.asset_id: r for r in feats.collect()}
    assert again[2].phash == rows[2].phash


def test_missing_codec_raises_cleanly(spark, media):
    # the fixture payloads are non-BMP, so the stdlib leg of the r8
    # dispatching default can't take them; without Pillow the operator
    # must fail loudly, never silently skip
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed: the default codec takes over")
    except ImportError:
        pass
    feats = extract_image_features(media, decoder=None)
    with pytest.raises(Exception, match="no image codec"):
        feats.collect()


def test_frame_sampling_prunes_payload(spark, media, tmp_path):
    # pruning is observable only on a file source (a local relation always
    # carries all columns) — write to parquet and plan against that
    path = str(tmp_path / "media")
    media.write.parquet(path)
    frames = sample_frames(spark.read.parquet(path), every_ms=1000)
    got = sorted((r.asset_id, r.frame_ts_ms) for r in frames.collect())
    assert got == [(3, 0), (3, 1000), (3, 2000), (3, 3000)]
    # the binary column must be pruned from the parquet ReadSchema
    plan = frames._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and all("payload" not in ln for ln in read_schema)


def test_size_balanced_partitioning(spark, media):
    df = size_balanced(media, 2)
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == 4


def test_resize_images_deterministic(spark, media):
    out = {
        r.asset_id: r
        for r in resize_images(
            media, max_side=32, resizer=fake_image_resizer
        ).collect()
    }
    assert set(out) == {1, 2}  # images only
    for r in out.values():
        assert max(r.thumb_width, r.thumb_height) == 32
        assert len(r.thumbnail) == r.thumb_width * r.thumb_height
        # aspect ratio preserved within integer truncation
        assert abs(
            r.width / r.height - r.thumb_width / r.thumb_height
        ) < 0.1
    # deterministic across runs
    again = {
        r.asset_id: r.thumbnail
        for r in resize_images(
            media, max_side=32, resizer=fake_image_resizer
        ).collect()
    }
    assert {k: v.thumbnail for k, v in out.items()} == again


def test_resize_missing_codec_raises_cleanly(spark, media):
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed: the default codec takes over")
    except ImportError:
        pass
    with pytest.raises(Exception, match="NotImplementedError|no image codec"):
        resize_images(media).collect()


def test_fit_longer_side_exact_invariant():
    # FP-truncation regression (r2 ADVICE): int(L * (max_side/L)) can
    # yield max_side-1 (e.g. L=41, max_side=32) — the longer side must be
    # assigned exactly, both orientations, across a dense sweep
    assert _fit_longer_side(41, 20, 32) == (32, 16)
    assert _fit_longer_side(20, 41, 32) == (16, 32)
    for longer in range(1, 400):
        for shorter in (1, longer // 2 + 1, longer):
            for max_side in (7, 32, 128):
                tw, th = _fit_longer_side(longer, shorter, max_side)
                assert max(tw, th) == max_side, (longer, shorter, max_side)
                tw, th = _fit_longer_side(shorter, longer, max_side)
                assert max(tw, th) == max_side, (shorter, longer, max_side)


def test_pillow_codec_real_decode(spark):
    # real-codec path: same schema/contract as the fakes; skipped when
    # Pillow is absent (this container has no image libs)
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (41, 20), (200, 100, 50)).save(buf, format="PNG")
    payload = buf.getvalue()
    media = spark.createDataFrame(
        [(1, "image", payload, (len(payload), None, None, None))], MEDIA_SCHEMA
    )
    feats = {r.asset_id: r for r in extract_image_features(media).collect()}
    assert feats[1].width == 41 and feats[1].height == 20
    assert 0.0 < feats[1].mean_luma < 1.0

    out = {r.asset_id: r for r in resize_images(media, max_side=32).collect()}
    assert (out[1].thumb_width, out[1].thumb_height) == (32, 16)
    with Image.open(io.BytesIO(bytes(out[1].thumbnail))) as t:
        assert t.size == (32, 16)


def test_audio_features_deterministic(spark):
    from projekt_data_engineering_iubh_spark.multimodal.binary_ops import (
        default_audio_decoder,
        extract_audio_features,
        fake_audio_decoder,
    )

    rows = [
        (10, "audio", b"wavbytes-a" * 40, (400, None, None, 2000)),
        (11, "audio", b"wavbytes-b" * 25, (250, None, None, 1000)),
        (12, "image", b"not-audio", (9, None, None, None)),  # filtered out
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r.asset_id: r
        for r in extract_audio_features(
            media, decoder=fake_audio_decoder
        ).collect()
    }
    assert set(got) == {10, 11}
    for asset_id, _, payload, _ in rows[:2]:
        rate, channels, samples = fake_audio_decoder(payload)
        r = got[asset_id]
        assert (r.sample_rate, r.n_channels, r.n_samples) == (
            rate, channels, len(samples),
        )
        assert r.duration_s == pytest.approx(len(samples) / rate)
        assert 0.0 < r.rms <= 1.0

    # twice → identical (decoder is pure)
    again = {
        r.asset_id: r
        for r in extract_audio_features(
            media, decoder=fake_audio_decoder
        ).collect()
    }
    assert {k: v.asDict() for k, v in got.items()} == {
        k: v.asDict() for k, v in again.items()
    }


def test_audio_missing_codec_raises_cleanly(spark):
    from projekt_data_engineering_iubh_spark.multimodal.binary_ops import (
        default_audio_decoder,
        extract_audio_features,
    )

    try:
        import soundfile  # noqa: F401

        pytest.skip("soundfile installed: the default codec takes over")
    except ImportError:
        pass
    media = spark.createDataFrame(
        [(1, "audio", b"x", (1, None, None, None))], MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="no audio codec"):
        extract_audio_features(media).collect()


def test_soundfile_codec_real_decode(spark):
    sf = pytest.importorskip("soundfile")
    import io
    import math

    from projekt_data_engineering_iubh_spark.multimodal.binary_ops import (
        extract_audio_features,
    )

    buf = io.BytesIO()
    rate, n = 8000, 800
    samples = [0.5 * math.sin(2 * math.pi * 440 * i / rate) for i in range(n)]
    sf.write(buf, samples, rate, format="WAV")
    media = spark.createDataFrame(
        [(1, "audio", buf.getvalue(), (len(buf.getvalue()), None, None, None))],
        MEDIA_SCHEMA,
    )
    r = extract_audio_features(media).collect()[0]
    assert r.sample_rate == rate and r.n_samples == n
    assert r.rms == pytest.approx(0.5 / math.sqrt(2), rel=1e-2)


def test_media_dims_query_matches_python_plumbing(spark):
    """The docs_media_dims oracle query's synthesized dims and thumb
    arithmetic must equal the Python plumbing (fake_image_decoder dims
    derivation + _fit_longer_side) — the SQL contract and the mapInPandas
    codec path can never drift."""
    import hashlib

    from projekt_data_engineering_iubh_spark.catalog import load_table
    from projekt_data_engineering_iubh_spark.plans.curation_queries import (
        _THUMB_MAX,
        docs_media_dims,
    )

    sf = "/root/testdata/sf0.001"
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, sf, "documents")
        .select("doc_id", "text")
        .collect()
    }
    for r in docs_media_dims(spark, sf).collect():
        d = hashlib.md5(texts[r.doc_id].encode("utf-8")).digest()
        w, h = 64 + d[0] % 192, 64 + d[1] % 192
        assert (r.width, r.height) == (w, h), r.doc_id
        assert (r.thumb_w, r.thumb_h) == _fit_longer_side(w, h, _THUMB_MAX)
    assert texts
    # an exact .5 scaling tie is where Python round() (half-to-even)
    # would diverge from the portable HALF_UP contract — pin one directly
    assert _fit_longer_side(128, 94, 64) == (64, 47)  # 94*64/128 = 47.0
    assert _fit_longer_side(256, 2, 64) == (64, 1)  # 2*64/256 = 0.5 → 1
    assert _fit_longer_side(256, 6, 64) == (64, 2)  # 1.5 → 2 (even: 2)
    assert _fit_longer_side(256, 10, 64) == (64, 3)  # 2.5 → 3 (round(): 2)


# --- stdlib real-codec paths (r8: run in EVERY environment) ---------------


def _solid_bmp(w, h, bgr):
    from projekt_data_engineering_iubh_spark.multimodal.binary_ops import (
        bmp_encode,
    )

    return bmp_encode(w, h, [bytes(bgr) * w for _ in range(h)])


def test_bmp_codec_real_decode_through_operator(spark):
    """A REAL decode runs with no image library installed: the stdlib
    BMP codec is the default for BMP payloads, end to end through the
    Arrow-batched operator. Luma is exact Rec.601 over a solid image."""
    from projekt_data_engineering_iubh_spark.multimodal.binary_ops import (
        extract_image_features,
    )

    payload = _solid_bmp(41, 20, (50, 100, 200))  # BGR -> R=200 G=100 B=50
    media = spark.createDataFrame(
        [(1, "image", payload, (len(payload), None, None, None))],
        MEDIA_SCHEMA,
    )
    r = extract_image_features(media).collect()[0]  # no injected codec
    assert (r.width, r.height) == (41, 20)
    want = (0.299 * 200 + 0.587 * 100 + 0.114 * 50) / 255.0
    assert r.mean_luma == pytest.approx(want, abs=1e-12)


def test_bmp_parse_variants():
    """Top-down (negative height), 32-bit, and row padding all decode to
    the same pixels; malformed payloads raise ValueError (the dispatcher
    contract), never a struct error."""
    import struct

    from projekt_data_engineering_iubh_spark.multimodal.binary_ops import (
        _bmp_parse,
        bmp_encode,
        bmp_image_decoder,
    )

    rows = [bytes([10, 20, 30, 40, 50, 60]), bytes([70, 80, 90, 100, 110, 120])]
    base = bmp_encode(2, 2, rows)
    w, h, got = _bmp_parse(base)
    assert (w, h, got) == (2, 2, rows)  # bottom-up file -> top-down rows
    # width 3 exercises the 4-byte row padding (9 -> 12 bytes)
    pad = bmp_encode(3, 1, [bytes(range(9))])
    assert _bmp_parse(pad)[2] == [bytes(range(9))]
    # top-down: flip the height sign; rows must come back identical
    td = bytearray(base)
    struct.pack_into("<i", td, 22, -2)
    # reorder pixel rows to top-down storage to preserve content
    stride = 8
    td[54:62], td[62:70] = base[62:70], base[54:62]
    assert _bmp_parse(bytes(td))[2] == rows
    for bad in (b"", b"BMxx", b"\x89PNG" + b"\0" * 60, base[:40]):
        with pytest.raises(ValueError):
            bmp_image_decoder(bad)


def test_bmp_resizer_real_roundtrip(spark):
    """The stdlib resizer's thumbnail is itself a decodable BMP with
    exactly the _fit_longer_side dims, through the real operator with
    no injected codec."""
    from projekt_data_engineering_iubh_spark.multimodal.binary_ops import (
        _fit_longer_side,
        bmp_image_decoder,
        resize_images,
    )

    payload = _solid_bmp(41, 20, (10, 10, 10))
    media = spark.createDataFrame(
        [(1, "image", payload, (len(payload), None, None, None))],
        MEDIA_SCHEMA,
    )
    r = resize_images(media, max_side=32).collect()[0]
    assert (r.width, r.height) == (41, 20)
    assert (r.thumb_width, r.thumb_height) == _fit_longer_side(41, 20, 32)
    tw, th, luma = bmp_image_decoder(bytes(r.thumbnail))
    assert (tw, th) == (r.thumb_width, r.thumb_height)
    assert luma == pytest.approx(10 * (0.299 + 0.587 + 0.114) / 255, abs=1e-9)


def test_wav_codec_real_decode_through_operator(spark):
    """A REAL audio decode with no soundfile installed: stdlib wave
    module handles PCM WAV as the dispatching default. 16-bit stereo is
    mean-mixed to mono; RMS of a 440 Hz half-scale sine is 0.5/sqrt(2)."""
    import io
    import math
    import struct
    import wave

    from projekt_data_engineering_iubh_spark.multimodal.binary_ops import (
        extract_audio_features,
    )

    rate, n = 8000, 800
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        for i in range(n):
            v = int(0.5 * 32767 * math.sin(2 * math.pi * 440 * i / rate))
            wf.writeframes(struct.pack("<hh", v, v))  # identical channels
    payload = buf.getvalue()
    media = spark.createDataFrame(
        [(1, "audio", payload, (len(payload), None, None, None))],
        MEDIA_SCHEMA,
    )
    r = extract_audio_features(media).collect()[0]
    assert (r.sample_rate, r.n_channels, r.n_samples) == (rate, 2, n)
    assert r.duration_s == pytest.approx(n / rate)
    assert r.rms == pytest.approx(0.5 / math.sqrt(2), rel=1e-2)


def test_wav_decoder_widths():
    """8- and 32-bit PCM decode through the stdlib path too."""
    import io
    import struct
    import wave

    from projekt_data_engineering_iubh_spark.multimodal.binary_ops import (
        wav_audio_decoder,
    )

    for width, pack, scale in ((1, None, None), (4, "<i", 2147483648)):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(width)
            wf.setframerate(1000)
            if width == 1:
                wf.writeframes(bytes([128, 192, 64, 128]))
            else:
                for v in (0, scale // 2, -scale // 2, 0):
                    wf.writeframes(struct.pack(pack, min(v, scale - 1)))
        rate, ch, samples = wav_audio_decoder(buf.getvalue())
        assert (rate, ch, len(samples)) == (1000, 1, 4)
        assert samples[0] == pytest.approx(0.0, abs=1e-6)
        assert samples[1] == pytest.approx(
            0.5, abs=0.01
        ) and samples[2] == pytest.approx(-0.5, abs=0.01)


def test_bmp_codec_roundtrip_property():
    """Property fuzz (pure Python — no Spark per example): any pixel
    grid encoded by bmp_encode decodes back exactly (dims + pixel
    bytes) through _bmp_parse, across odd widths (row padding), 1-pixel
    edges, and extreme values; and the resizer's output decodes to its
    declared dims with pixels drawn from the source (nearest-neighbor
    never invents colors)."""
    from hypothesis import given, settings, strategies as st

    from projekt_data_engineering_iubh_spark.multimodal.binary_ops import (
        _bmp_parse,
        _fit_longer_side,
        bmp_encode,
        bmp_image_resizer,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 13),
        h=st.integers(1, 13),
        seed=st.integers(0, 2**32 - 1),
        max_side=st.sampled_from([1, 3, 7, 8]),
    )
    def check(w, h, seed, max_side):
        import random

        rng = random.Random(seed)
        rows = [
            bytes(rng.randrange(256) for _ in range(w * 3)) for _ in range(h)
        ]
        payload = bmp_encode(w, h, rows)
        gw, gh, got = _bmp_parse(payload)
        assert (gw, gh, got) == (w, h, rows)

        sw, sh, tw, th, thumb = bmp_image_resizer(payload, max_side)
        assert (sw, sh) == (w, h)
        assert (tw, th) == _fit_longer_side(w, h, max_side)
        dw, dh, drows = _bmp_parse(thumb)
        assert (dw, dh) == (tw, th)
        src_pixels = {
            row[i : i + 3] for row in rows for i in range(0, len(row), 3)
        }
        for row in drows:
            for i in range(0, len(row), 3):
                assert row[i : i + 3] in src_pixels

    check()


def test_dispatch_falls_back_on_unsupported_bmp_variant(monkeypatch):
    """A payload with BMP magic that the stdlib parser rejects (16-bit,
    RLE, palette) must fall through to Pillow when importable — r8's
    dispatch raised unconditionally on BMP magic, silently regressing
    environments that ship Pillow (ADVICE r8)."""
    import struct

    from projekt_data_engineering_iubh_spark.multimodal import binary_ops

    # minimal 16-bit BMP header: valid magic, bpp the stdlib rejects
    hdr = bytearray(binary_ops.bmp_encode(1, 1, [b"\x01\x02\x03"]))
    struct.pack_into("<H", hdr, 28, 16)
    bmp16 = bytes(hdr)
    with pytest.raises(ValueError):
        binary_ops._bmp_parse(bmp16)

    # no Pillow: the stdlib error propagates (clean, no struct error)
    monkeypatch.setattr(binary_ops, "_has_pillow", lambda: False)
    with pytest.raises((ValueError, NotImplementedError)):
        binary_ops.default_image_decoder()(bmp16)
    with pytest.raises((ValueError, NotImplementedError)):
        binary_ops.default_image_resizer()(bmp16, 8)

    # Pillow importable: the dispatcher must route the rejected payload
    # to the Pillow path instead of raising
    monkeypatch.setattr(binary_ops, "_has_pillow", lambda: True)
    monkeypatch.setattr(
        binary_ops, "pillow_image_decoder", lambda p: (7, 9, 0.5)
    )
    monkeypatch.setattr(
        binary_ops,
        "pillow_image_resizer",
        lambda p, m: (7, 9, 3, 4, b"thumb"),
    )
    assert binary_ops.default_image_decoder()(bmp16) == (7, 9, 0.5)
    assert binary_ops.default_image_resizer()(bmp16, 8) == (
        7, 9, 3, 4, b"thumb",
    )
    # supported BMPs still take the stdlib path (sentinels untouched)
    ok = binary_ops.bmp_encode(1, 1, [b"\x01\x02\x03"])
    assert binary_ops.default_image_decoder()(ok) != (7, 9, 0.5)


def test_dispatch_falls_back_on_unsupported_wav_variant(monkeypatch):
    """RIFF/WAVE payloads outside the wave module's coverage (24-bit
    PCM) must fall through to soundfile when importable."""
    import io
    import sys
    import types
    import wave

    from projekt_data_engineering_iubh_spark.multimodal import binary_ops

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(3)  # 24-bit: stdlib decoder raises
        wf.setframerate(8000)
        wf.writeframes(b"\x00\x01\x02" * 4)
    wav24 = buf.getvalue()
    with pytest.raises(NotImplementedError):
        binary_ops.wav_audio_decoder(wav24)

    # soundfile absent (this container): the stdlib error propagates
    if "soundfile" not in sys.modules:
        with pytest.raises(NotImplementedError):
            binary_ops.default_audio_decoder()(wav24)

    # fake an importable soundfile and a sentinel decoder: the
    # dispatcher must route the 24-bit payload there
    monkeypatch.setitem(sys.modules, "soundfile", types.ModuleType("soundfile"))
    monkeypatch.setattr(
        binary_ops, "soundfile_audio_decoder", lambda p: (8000, 1, [0.25])
    )
    assert binary_ops.default_audio_decoder()(wav24) == (8000, 1, [0.25])
    # supported WAVs still take the stdlib path
    buf2 = io.BytesIO()
    with wave.open(buf2, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(b"\x00\x40" * 4)
    got = binary_ops.default_audio_decoder()(buf2.getvalue())
    assert got[0] == 8000 and got[2] != [0.25]
