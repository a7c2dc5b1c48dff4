"""Multimodal plumbing: the Arrow/mapInPandas path must agree with
JVM-side expressions computed over the same binary column."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce511_spark.multimodal import (
    N_HIST_BINS,
    attach_fake_media,
    decode_real,
    extract_features,
    sample_frames,
)
from mapreduce511_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    return attach_fake_media(load_table(spark, SF_SMOKE, "documents")).cache()


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_real(b"\x00", "fake/raw")


def test_feature_bytes_match_jvm_length(spark, media):
    feats = extract_features(media)
    jvm = media.select("doc_id", F.length("content").cast("long").alias("jvm_bytes"))
    diff = (
        feats.join(jvm, "doc_id")
        .filter(F.col("n_bytes") != F.col("jvm_bytes"))
        .count()
    )
    assert diff == 0
    assert feats.count() == media.count()


def test_histogram_sums_to_n_bytes(spark, media):
    feats = extract_features(media)
    bad = feats.filter(
        F.aggregate("histogram", F.lit(0).cast("long"), lambda a, x: a + x)
        != F.col("n_bytes")
    ).count()
    assert bad == 0
    assert feats.select(F.max(F.size("histogram"))).first()[0] == N_HIST_BINS


def test_frame_sampling_shape(spark, media):
    frames = sample_frames(media, every_n=4)
    # every asset yields at least one frame; frame indexes step by 4
    assert frames.select("doc_id").distinct().count() == media.count()
    assert frames.filter(F.col("frame_idx") % 4 != 0).count() == 0
    assert frames.filter(F.length("frame") > 64).count() == 0


def test_resize_halves_bytes_and_dims(spark, media):
    from mapreduce511_spark.multimodal import resize_assets

    small = resize_assets(media, factor=2)
    j = (
        media.select("doc_id", F.length("content").alias("n0"),
                     F.col("media.width").alias("w0"))
        .join(
            small.select("doc_id", F.length("content").alias("n1"),
                         F.col("media.width").alias("w1")),
            "doc_id",
        )
    )
    # ceil(n0/2) bytes after [::2]
    assert j.filter(F.col("n1") != F.ceil(F.col("n0") / 2)).count() == 0
    assert j.filter(
        (F.col("w1") != F.greatest(F.floor(F.col("w0") / 2), F.lit(1)))
    ).count() == 0
