"""Multimodal column convention + Arrow-batched processing plumbing.

Media assets ride through the engine as opaque ``binary`` columns with
a typed metadata struct (north-star extension; nothing in the
reference — ``/root/reference`` is text-only — but required for a
100 TB training-data pipeline).

Convention
----------
``content: binary`` + ``media: struct<kind, fmt, width, height,
n_frames>``. Decode / feature-extraction runs in ``mapInPandas``
(Arrow batches, never per-row Python). The real codec step is STUBBED:
this container has no image/audio libraries, so ``decode_real`` raises
``NotImplementedError`` and the tested path is a deterministic fake
decoder (byte histogram over the binary payload) exercising the exact
same schema / partitioning / batch shape the real one would use.

Scale notes: binary payloads dominate row size — keep
``spark.sql.files.maxPartitionBytes`` small enough that a batch of
payloads fits executor memory, project metadata-only early when a
query doesn't touch bytes (column pruning drops ``content`` at the
Parquet scan), and never shuffle the binary column for joins that only
need the key (semi-join first, fetch bytes after).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_HIST_BINS = 16

MEDIA_META = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("histogram", T.ArrayType(T.LongType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

_FRAME_BYTES = 64  # fake codec: fixed-size 'frames' inside the payload


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Deterministically synthesize the multimodal columns from the
    ``documents`` table: payload = UTF-8 bytes of the text (stand-in
    for an encoded image), metadata derived from doc fields. Pure
    Column expressions — the payload never leaves the JVM here."""
    return docs.select(
        "doc_id",
        "source",
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("fake/raw").alias("fmt"),
            (F.lit(16) + (F.col("doc_id") % 64)).cast("int").alias("width"),
            (F.lit(16) + ((F.col("doc_id") * 7) % 64)).cast("int").alias("height"),
            F.greatest(
                (F.length(F.encode("text", "UTF-8")) / _FRAME_BYTES).cast("int"),
                F.lit(1),
            ).alias("n_frames"),
        ).alias("media"),
    )


def decode_real(payload: bytes, fmt: str) -> object:
    """The real codec hook. Image/audio libraries are not available in
    this container — implement with PIL/libav when they are."""
    raise NotImplementedError(
        "real media decoding is stubbed in this environment; "
        "use extract_features() (deterministic fake decoder)"
    )


def extract_features(
    media_df: DataFrame, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """Per-asset features via ``mapInPandas``: byte count, mean byte
    value, 16-bin byte histogram. This is the plumbing the real
    decoder drops into — Arrow batches in, vectorized numpy per batch,
    Arrow batches out; no driver collect, no per-row Python.

    ``passthrough`` columns ride along through the Arrow batch so
    downstream grouping doesn't need a join back to the media table
    (which would re-shuffle the binary payloads' lineage)."""
    out_schema = T.StructType(
        [media_df.schema[c] for c in passthrough] + list(FEATURE_SCHEMA.fields)
    )
    cols = ["doc_id", "n_bytes", "mean_byte", "histogram"]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            payloads = list(pdf["content"])
            n = len(payloads)
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
            # one pass over the concatenated bytes of the whole Arrow
            # batch: per-row histograms via a single bincount on
            # (row_index * N_BINS + high_nibble), per-row means via
            # reduceat — no per-row Python.
            cat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            row_idx = np.repeat(np.arange(n), lens)
            hist = np.bincount(
                row_idx * N_HIST_BINS + (cat >> 4), minlength=n * N_HIST_BINS
            ).reshape(n, N_HIST_BINS)
            if n and lens.min() > 0:
                offsets = np.zeros(n, dtype=np.int64)
                np.cumsum(lens[:-1], out=offsets[1:])
                sums = np.add.reduceat(cat.astype(np.int64), offsets)
            else:  # reduceat can't express empty segments — rare path
                sums = np.fromiter(
                    (np.frombuffer(p, dtype=np.uint8).sum() for p in payloads),
                    dtype=np.int64,
                    count=n,
                )
            means = np.where(lens > 0, sums / np.maximum(lens, 1), 0.0)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": lens,
                    "mean_byte": means,
                    "histogram": list(hist.astype("int64")),
                }
            )
            for c in reversed(passthrough):
                out.insert(0, c, list(pdf[c]))
            yield out

    return media_df.select(*passthrough, "doc_id", "content").mapInPandas(
        batches, schema=out_schema
    )


def sample_frames(media_df: DataFrame, every_n: int = 4) -> DataFrame:
    """Video-style frame sampling over the fake codec: split the
    payload into fixed 64-byte 'frames', keep every ``every_n``-th.
    Same mapInPandas shape a real demuxer would use."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[tuple[int, int, bytes]] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                n = max(len(payload) // _FRAME_BYTES, 1)
                for idx in range(0, n, every_n):
                    out.append(
                        (
                            int(doc_id),
                            idx,
                            bytes(
                                payload[
                                    idx * _FRAME_BYTES : (idx + 1) * _FRAME_BYTES
                                ]
                            ),
                        )
                    )
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "frame"])

    return media_df.select("doc_id", "content").mapInPandas(
        batches, schema=FRAME_SCHEMA
    )


def resize_assets(media_df: DataFrame, factor: int = 2) -> DataFrame:
    """Resize stub (the image-resize slot of the pipeline): the fake
    codec downsamples payload bytes by ``factor`` and halves the
    metadata dimensions accordingly — same mapInPandas shape a real
    resampler (PIL/cv2) drops into, with metadata kept consistent."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("media", MEDIA_META),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload, media in zip(
                pdf["doc_id"], pdf["content"], pdf["media"]
            ):
                arr = np.frombuffer(payload, dtype=np.uint8)[::factor]
                meta = dict(media)
                meta["width"] = max(int(meta["width"]) // factor, 1)
                meta["height"] = max(int(meta["height"]) // factor, 1)
                rows.append((int(doc_id), arr.tobytes(), meta))
            yield pd.DataFrame(rows, columns=["doc_id", "content", "media"])

    return media_df.select("doc_id", "content", "media").mapInPandas(
        batches, schema=out_schema
    )
