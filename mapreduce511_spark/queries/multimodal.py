"""Multimodal queries — binary-column plumbing exercised end-to-end.

Rows-only for the driver gate (DuckDB can't mirror the mapInPandas
feature extraction over blobs); Spark-native cross-checks live in
``tests/test_multimodal.py`` (n_bytes from the Arrow path must equal
``length(content)`` from the JVM path, etc.).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce511_spark.multimodal import (
    attach_fake_media,
    extract_features,
    sample_frames,
)
from mapreduce511_spark.queries import register
from mapreduce511_spark.sources.tables import load_table


@register("multimodal_features")
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach fake media columns, run the Arrow-batched feature
    extractor, aggregate per source: the full binary-column round trip
    (JVM -> Arrow -> numpy -> Arrow -> JVM) with only the final tiny
    aggregate leaving the executors."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_fake_media(docs)
    feats = extract_features(media, passthrough=("source",))
    return feats.groupBy("source").agg(
        F.count("*").alias("n_assets"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("mean_byte"), 3).alias("avg_mean_byte"),
    )


@register("multimodal_frame_sample")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (video-style demux stub): every 4th 64-byte
    frame per asset, then per-asset frame counts + byte totals."""
    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(attach_fake_media(docs), every_n=4)
    return frames.groupBy("doc_id").agg(
        F.count("*").alias("n_sampled_frames"),
        F.sum(F.length("frame")).alias("sampled_bytes"),
    )
