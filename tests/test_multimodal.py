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


def test_decode_stub_raises_without_codec(spark, sf_dir):
    assets = assets_table(spark, sf_dir).limit(2)
    with pytest.raises(Exception, match="NotImplementedError|image codec"):
        media_features(assets).collect()  # default decoder must refuse


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
