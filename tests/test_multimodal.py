"""Multimodal column plumbing: binary schema, stubbed decode, feature
extraction batch shape, frame sampling."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouse_weather_spark.operators.multimodal import (
    assets_table,
    fake_decode,
    frame_sample,
    media_features,
)


def test_assets_schema(spark, sf_dir):
    assets = assets_table(spark, sf_dir)
    kinds = dict(assets.dtypes)
    assert kinds["content"] == "binary"
    assert kinds["n_bytes"] == "bigint"
    assert assets.count() > 0


def test_decode_default_refuses_non_image_bytes(spark, sf_dir):
    # fixture "assets" are text bytes, not images: the real decoder
    # must refuse them rather than invent dimensions
    assets = assets_table(spark, sf_dir).limit(2)
    with pytest.raises(Exception, match="unrecognized image container"):
        media_features(assets).collect()


def test_media_features_with_fake_decoder(spark, sf_dir):
    assets = assets_table(spark, sf_dir)
    feats = media_features(assets, decode_fn=fake_decode)
    rows = feats.collect()
    assert len(rows) == assets.count()
    for r in rows[:10]:
        assert 64 <= r.width < 64 + 512 and 64 <= r.height < 64 + 512
        assert len(r.byte_histogram) == 16
        assert sum(r.byte_histogram) > 0
    # determinism across runs
    again = {r.doc_id: (r.width, r.height) for r in feats.collect()}
    assert all(again[r.doc_id] == (r.width, r.height) for r in rows)


def test_frame_sample_shape(spark, sf_dir):
    assets = assets_table(spark, sf_dir).filter("media_type = 'video/mp4'").limit(5)
    frames = frame_sample(assets, n_frames=4).collect()
    assert len(frames) == 4 * 5
    by_doc = {}
    for f in frames:
        by_doc.setdefault(f.doc_id, []).append(f.frame_idx)
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_doc.values())


def test_binaryfile_landing_feeds_media_features(spark, tmp_path):
    """REAL spark.read.format('binaryFile') ingest: land a directory of
    raw objects (the reference's bronze/web dump shape: html + images)
    into ASSET_SCHEMA and run the decode/feature stage on it."""
    from lakehouse_weather_spark.operators.multimodal import land_binary_assets

    d = tmp_path / "raw"
    (d / "html").mkdir(parents=True)
    (d / "image").mkdir()
    (d / "html" / "page1.html").write_bytes(b"<html><body>hi</body></html>")
    (d / "html" / "page2.html").write_bytes(b"<html><body>there</body></html>")
    png = bytes.fromhex("89504e470d0a1a0a") + b"\x00" * 64
    (d / "image" / "a.png").write_bytes(png)
    (d / "image" / "b.jpg").write_bytes(b"\xff\xd8\xff\xe0" + b"\x00" * 32)

    assets = land_binary_assets(spark, str(d / "*"))
    rows = {r.media_type: r for r in assets.collect()}
    assert set(rows) == {"text/html", "image/png", "image/jpeg"}
    assert assets.count() == 4
    got = assets.filter("media_type = 'image/png'").first()
    assert bytes(got.content) == png and got.n_bytes == len(png)
    # doc_ids are stable hashes of the path: unique and deterministic
    assert assets.select("doc_id").distinct().count() == 4
    assert land_binary_assets(spark, str(d / "*")).select("doc_id").exceptAll(
        assets.select("doc_id")
    ).isEmpty()

    feats = media_features(assets, decode_fn=fake_decode)
    assert feats.count() == 4
    f = feats.first()
    assert f.width >= 64 and len(f.byte_histogram) == 16


def test_binaryfile_metadata_only_prunes_content(spark, tmp_path):
    """Selecting only metadata from a binaryFile scan must NOT read the
    content bytes (ReadSchema pruning) — the at-scale integrity pass."""
    from lakehouse_weather_spark.operators.multimodal import land_binary_assets

    d = tmp_path / "raw2"
    d.mkdir()
    (d / "x.png").write_bytes(b"\x89PNG" + b"\x00" * 128)
    meta = land_binary_assets(spark, str(d)).select("doc_id", "media_type", "n_bytes")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        meta.explain("formatted")
    plan = buf.getvalue()
    assert "content" not in plan.split("ReadSchema")[1].splitlines()[0]
    assert meta.first().n_bytes == 132


def test_binary_object_writer_roundtrip(spark, tmp_path):
    """Raw-object sink -> binaryFile re-ingest round trip: every object
    written lands back with identical bytes (reference bronze dump
    layout: <kind>/<id>.<ext>)."""
    from lakehouse_weather_spark.operators.multimodal import (
        land_binary_assets,
        write_binary_objects,
    )

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.html").write_bytes(b"<html><body>alpha</body></html>")
    (src / "b.png").write_bytes(b"\x89PNG\r\n\x1a\n" + b"\x01" * 50)
    (src / "c.wav").write_bytes(b"RIFF" + b"\x02" * 40)

    assets = land_binary_assets(spark, str(src))
    out = tmp_path / "dump"
    n = write_binary_objects(assets, str(out))
    assert n == 3
    assert sorted(p.name for p in out.iterdir()) == ["audio", "image", "text"]

    relanded = land_binary_assets(spark, str(out / "*"))
    orig = {bytes(r.content) for r in assets.collect()}
    back = {bytes(r.content) for r in relanded.collect()}
    assert back == orig
    assert {r.media_type for r in relanded.collect()} == {
        "text/html", "image/png", "audio/wav",
    }


def test_binary_ahash_neardup_detects_mutated_payload(spark, tmp_path):
    """A byte payload and a lightly mutated copy must pair at small
    hamming; an unrelated payload must not pair with either."""
    from lakehouse_weather_spark.operators.multimodal import (
        AHASH_HAMMING_MAX,
        q_binary_ahash,
        q_binary_neardup,
    )

    base = ("spark table value row scan merge batch " * 8).strip()
    # flip a couple of characters -> tiny perturbation of block means
    mutated = "SPARK" + base[5:]
    other = "zzzz " * 60
    rows = [(0, base, "en", "s", len(base)),
            (1, mutated, "en", "s", len(mutated)),
            (2, other.strip(), "en", "s", len(other.strip()))]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")

    sigs = {r.doc_id: r.ahash for r in q_binary_ahash(spark, str(tmp_path)).collect()}
    assert len(sigs) == 3
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in q_binary_neardup(spark, str(tmp_path)).collect()}
    assert (0, 1) in pairs
    assert pairs[(0, 1)] <= AHASH_HAMMING_MAX
    assert (0, 2) not in pairs and (1, 2) not in pairs


def _tiny_png(w: int, h: int, color_type: int = 2) -> bytes:
    """Construct a minimal VALID PNG entirely from the public spec
    (signature + IHDR + IDAT + IEND, zlib-deflated scanlines)."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    channels = {0: 1, 2: 3, 6: 4}[color_type]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x7f" * (w * channels) for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_real_decode_parses_actual_image_headers():
    import struct

    from lakehouse_weather_spark.operators.multimodal import real_decode

    assert real_decode(_tiny_png(7, 5)) == (7, 5, 3)
    assert real_decode(_tiny_png(640, 480, color_type=6)) == (640, 480, 4)
    assert real_decode(_tiny_png(3, 2, color_type=0)) == (3, 2, 1)

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert real_decode(gif) == (320, 200, 3)

    bmp = (
        b"BM" + struct.pack("<IHHI", 122, 0, 0, 122)
        + struct.pack("<IiiHH", 40, 33, -44, 1, 24) + b"\x00" * 64
    )
    assert real_decode(bmp) == (33, 44, 3)  # negative height = top-down

    # minimal JPEG marker stream: SOI, APP0, SOF0 (h=9, w=11, 3 comps)
    jpeg = (
        b"\xff\xd8\xff\xe0" + struct.pack(">H", 4) + b"JF"
        + b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 9, 11, 3)
    )
    assert real_decode(jpeg) == (11, 9, 3)

    with pytest.raises(ValueError, match="unrecognized"):
        real_decode(b"plain text, not an image")
    with pytest.raises(ValueError):
        real_decode(b"\x89PNG\r\n\x1a\n truncated")


def test_media_features_real_decoder_end_to_end(spark):
    """Real PNG bytes flow through the production mapInPandas shape
    with the DEFAULT decoder — no fake injected."""
    from lakehouse_weather_spark.operators.multimodal import ASSET_SCHEMA

    rows = [
        (1, "image/png", _tiny_png(16, 8), None),
        (2, "image/png", _tiny_png(4, 32, color_type=6), None),
    ]
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    got = {r.doc_id: r for r in media_features(df).collect()}
    assert (got[1].width, got[1].height, got[1].channels) == (16, 8, 3)
    assert (got[2].width, got[2].height, got[2].channels) == (4, 32, 4)
    assert len(got[1].byte_histogram) == 16


# --- DCT perceptual hash + container probes (round 7) -----------------


def test_dct_matrix_matches_naive_reference():
    """The matmul DCT kernel must equal the O(n^4) textbook DCT-II sum."""
    import numpy as np

    from lakehouse_weather_spark.operators.multimodal import _dct_mat

    n = 8
    C = _dct_mat(n)
    X = (np.arange(n * n, dtype=np.float64).reshape(n, n) * 7) % 101
    D = C @ X @ C.T
    ref = np.zeros((n, n))
    for k in range(n):
        for li in range(n):
            s = 0.0
            for i in range(n):
                for j in range(n):
                    s += (
                        X[i, j]
                        * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
                        * np.cos(np.pi * (2 * j + 1) * li / (2 * n))
                    )
            sk = np.sqrt((1 if k == 0 else 2) / n)
            sl = np.sqrt((1 if li == 0 else 2) / n)
            ref[k, li] = sk * sl * s
    assert np.allclose(D, ref)
    # orthonormal: C @ C.T == I
    assert np.allclose(C @ C.T, np.eye(n))


def test_phash_properties():
    import numpy as np

    from lakehouse_weather_spark.operators.multimodal import (
        fake_pixels,
        phash64,
    )

    a = b"the quick brown fox jumps over the lazy dog " * 30
    h_a = phash64(fake_pixels(a))
    # deterministic
    assert h_a == phash64(fake_pixels(a))
    # int64 range (BIGINT column)
    assert -(1 << 63) <= h_a < (1 << 63)
    # a small payload perturbation moves FEW bits; unrelated content
    # moves many (the perceptual-locality property aHash lacks under
    # re-encoding)
    near = bytearray(a)
    near[100] ^= 0x01
    h_near = phash64(fake_pixels(bytes(near)))
    far = bytes(reversed(a)) + b"entirely different payload " * 40
    h_far = phash64(fake_pixels(far))

    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert ham(h_a, h_near) < ham(h_a, h_far)
    assert ham(h_a, h_near) <= 8
    # brightness offset flips at most the DC bit (bit 0)
    h_bright = phash64(fake_pixels(a).astype("float64") + 25.0)
    assert (h_a ^ h_bright) & ~1 == 0


def test_q_binary_phash_matches_driver_side(spark, sf_dir):
    from lakehouse_weather_spark.operators.multimodal import (
        assets_table,
        fake_pixels,
        phash64,
    )
    from lakehouse_weather_spark.registry import load_all

    out = {
        r.doc_id: r.phash
        for r in load_all()["q_binary_phash"].fn(spark, sf_dir).collect()
    }
    assets = assets_table(spark, sf_dir).select("doc_id", "content").collect()
    assert out and len(out) == len(assets)
    for r in assets[:25]:
        assert out[r.doc_id] == phash64(fake_pixels(bytes(r.content)))


def _exif_jpeg(orientation=6, dt=b"2026:01:02 03:04:05\x00"):
    import struct

    entries = struct.pack(
        "<HHIHxx", 0x0112, 3, 1, orientation
    ) + struct.pack("<HHII", 0x0132, 2, len(dt), 38)
    tiff = (
        b"II" + struct.pack("<HI", 42, 8)
        + struct.pack("<H", 2) + entries
        + struct.pack("<I", 0) + dt
    )
    app1 = b"Exif\x00\x00" + tiff
    return (
        b"\xff\xd8\xff\xe1" + __import__("struct").pack(">H", len(app1) + 2)
        + app1
    )


def test_exif_probe_parses_ifd0():
    from lakehouse_weather_spark.operators.multimodal import exif_probe

    meta = exif_probe(_exif_jpeg())
    assert meta["orientation"] == 6
    assert meta["datetime"] == "2026:01:02 03:04:05"
    # non-JPEG and Exif-less payloads degrade to {}
    assert exif_probe(b"\x89PNG\r\n\x1a\nrest") == {}
    assert exif_probe(b"") == {}
    assert exif_probe(b"\xff\xd8\xff\xdb\x00\x04\x00\x00") == {}


def test_wav_probe_parses_riff_header():
    import struct

    from lakehouse_weather_spark.operators.multimodal import wav_probe

    data_len = 44100 * 2 * 2  # one second of 16-bit stereo
    wav = (
        b"RIFF" + struct.pack("<I", 36 + data_len) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 176400, 4, 16)
        + b"data" + struct.pack("<I", data_len) + b"\x00" * data_len
    )
    meta = wav_probe(wav)
    assert meta["channels"] == 2
    assert meta["sample_rate"] == 44100
    assert meta["bits"] == 16
    assert meta["duration_ms"] == 1000
    assert wav_probe(b"not a wav") == {}


def test_video_frame_neardup_pairs_shared_frames(spark, tmp_path):
    from lakehouse_weather_spark.operators.multimodal import (
        _VIDEO_MIN_SHARED,
        frame_phashes,
        fake_pixels,
    )
    import pyspark.sql.functions as F

    # three "videos": a and b share the first half of their bytes
    # (so the first 2 of 4 sampled frames coincide); c is unrelated
    half = bytes(range(256)) * 8
    va = half + b"tail-A-" * 100
    vb = half + b"tail-B!" * 100
    vc = bytes(reversed(half)) + b"other" * 200
    df = spark.createDataFrame(
        [(1, va), (2, vb), (3, vc)], "doc_id long, content binary"
    )
    sigs = frame_phashes(df, pixel_fn=fake_pixels)
    rows = sigs.collect()
    assert len(rows) == 12  # 3 videos x 4 frames
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.phash)
    shared_ab = by_doc[1] & by_doc[2]
    assert len(shared_ab) >= _VIDEO_MIN_SHARED
    assert not (by_doc[1] & by_doc[3])
    # the registered query's join reproduces the set arithmetic
    sd = sigs.select("doc_id", "phash").distinct()
    a = sd.select(F.col("doc_id").alias("doc_a"), "phash")
    b = sd.select(F.col("doc_id").alias("doc_b"), "phash")
    pairs = (
        a.join(b, "phash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _VIDEO_MIN_SHARED)
        .collect()
    )
    assert [(r.doc_a, r.doc_b) for r in pairs] == [(1, 2)]


def test_q_video_frame_neardup_runs(spark, sf_dir):
    from lakehouse_weather_spark.registry import load_all

    df = load_all()["q_video_frame_neardup"].fn(spark, sf_dir)
    assert df.columns == ["doc_a", "doc_b", "n_shared_frames"]
    from pyspark.sql import functions as F

    rows = df.collect()
    assert len(rows) > 0  # re-upload twins guarantee a non-empty record

    # exactly the byte-identical re-upload twins (v, v + offset) must
    # pair — identical bytes => identical frame windows => >= 2 shared
    # distinct frame hashes (4 windows can at most collide to 2)
    from lakehouse_weather_spark.operators.multimodal import (
        _REUPLOAD_EVERY,
        _REUPLOAD_OFFSET,
        assets_table,
    )

    expected = {
        (int(r.doc_id), int(r.doc_id) + _REUPLOAD_OFFSET)
        for r in assets_table(spark, sf_dir)
        .filter(
            (F.col("media_type") == "video/mp4")
            & (F.col("doc_id") % _REUPLOAD_EVERY == 2)
        )
        .select("doc_id")
        .collect()
    }
    got = {(int(r.doc_a), int(r.doc_b)) for r in rows}
    assert expected <= got
    # non-twin pairs only via true frame-hash collisions between
    # distinct source docs; none exist in this corpus
    assert got == expected
