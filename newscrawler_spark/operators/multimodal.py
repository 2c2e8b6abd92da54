"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content rides as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample are
``mapInPandas`` stages over Arrow batches.  The image/audio codec
libraries are not in this container, so the actual decode is STUBBED
(``decode_image_stub`` raises NotImplementedError; the deterministic
fake decoder below stands in), but everything Spark-side — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested.

The reference's analog is ArticleImage handling
(``src/models/article.py:10-17``, image de-dup at
``newspaper_scraper/scraper.py:214-226``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType()),      # image|audio|video
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Wrap the documents table as a media table: text bytes stand in
    for an opaque payload (deterministic fake for the missing codecs)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("image/fake").alias("mime"),
            (F.pmod(F.col("doc_id"), F.lit(8)) * 64 + 64).cast("int").alias("width"),
            (F.pmod(F.col("doc_id"), F.lit(4)) * 64 + 64).cast("int").alias("height"),
            F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image_stub(payload: bytes) -> "np.ndarray":
    """Real decoder entry point — requires an image codec (Pillow/cv2),
    which is not available in this environment."""
    raise NotImplementedError(
        "image decode requires Pillow/libvips; wire here when available"
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("histogram", T.ArrayType(T.IntegerType())),
    ]
)


def feature_extract_map_in_pandas(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake feature extractor: per-payload byte histogram
    (16 bins), mean, entropy — one vectorized pass per Arrow batch.
    Replace the body with a real decode+CNN featurizer; the Spark-side
    contract (schema, batching, partitioning) does not change."""
    for pdf in it:
        rows = {"media_id": [], "n_bytes": [], "byte_sum": [], "byte_mean": [], "byte_entropy": [], "histogram": []}
        for mid, payload in zip(pdf["media_id"].tolist(), pdf["payload"].tolist()):
            buf = np.frombuffer(bytes(payload), dtype=np.uint8) if payload is not None else np.zeros(0, np.uint8)
            hist = np.bincount(buf >> 4, minlength=16).astype(np.int64)
            total = max(int(hist.sum()), 1)
            p = hist / total
            nz = p[p > 0]
            rows["media_id"].append(mid)
            rows["n_bytes"].append(int(buf.size))
            rows["byte_sum"].append(int(buf.sum()))
            rows["byte_mean"].append(round(float(buf.mean()) if buf.size else 0.0, 4))
            # + 0.0 normalizes IEEE -0.0 (empty / single-bin payloads
            # negate a 0.0 sum) — '-0.0' and '0.0' hash differently
            rows["byte_entropy"].append(round(float(-(nz * np.log2(nz)).sum()) + 0.0, 4))
            rows["histogram"].append([int(x) for x in hist])
        yield pd.DataFrame(rows)


def media_features(media: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Feature-extraction stage: Arrow-batched extractor over the
    payload column.

    A single small parquet file scans as ONE partition, which would run
    the whole python stage serially on one worker — so when the input is
    a file scan over fewer files than the cluster's parallelism the
    payloads are repartitioned up to it first.  The probe is
    ``inputFiles()`` (plan inspection only — ``.rdd.getNumPartitions()``
    forces physical planning and, under AQE, can eagerly run upstream
    stages); shuffle-fed inputs (``inputFiles() == []``) already carry
    shuffle-partition parallelism and skip it, as does a 100 TB media
    table that scans as thousands of files (features are row-local, so
    re-batching never changes results).  ``inputFiles() == []`` is also
    what a LOCAL relation reports (createDataFrame test inputs plan as
    a 1-partition LocalTableScan, which would run the python stage
    serially), so n_files == 0 additionally probes ``isLocal()`` —
    cheap for a local relation by definition — and repartitions those
    too."""
    sel = media.select("media_id", "payload")
    target = min_parallelism or media.sparkSession.sparkContext.defaultParallelism
    n_files = len(media.inputFiles())
    if 0 < n_files < target or (n_files == 0 and media.isLocal()):
        sel = sel.repartition(target)
    return sel.mapInPandas(
        feature_extract_map_in_pandas, schema=FEATURE_SCHEMA
    )


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_no) rows for
    frames 0, n, 2n, ... derived from metadata; the decode itself is the
    stubbed step. Demonstrates the explode-shaped UDTF plumbing."""
    n_frames = F.least(F.col("meta.n_bytes") / 100, F.lit(100)).cast("int")
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames, F.lit(every_n))).alias("frame_no"),
    )
