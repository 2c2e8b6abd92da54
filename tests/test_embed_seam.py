"""The predict_batch_udf real-model seam (functions/embed.py; reference
src/vector/embedding_models.py:72-189): the loader-pattern UDF must
produce exactly the same embeddings as the mapInPandas path, enforce
the batch/dtype contract inside predict (1-D ndarray in, (n, dim)
float32 out — violations fail the job), and survive nulls."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from newscrawler_spark.functions.embed import (
    DIM,
    embed_map_in_pandas,
    embed_predict_batch_udf,
    embed_text,
    make_embed_predict_fn,
)


def test_predict_fn_contract_direct():
    import numpy as np

    predict = make_embed_predict_fn()
    out = predict(np.array(["hello world", "", "spark engine"], dtype=object))
    assert out.shape == (3, DIM) and out.dtype == np.float32
    # row 0 equals the frozen scalar embedder (float32-cast)
    assert out[0].tolist() == pytest.approx(embed_text("hello world"), abs=1e-6)
    # contract violations raise rather than mis-batch
    with pytest.raises(TypeError):
        predict(["not", "an", "ndarray"])
    with pytest.raises(TypeError):
        predict(np.array([["2d"]], dtype=object))


def test_predict_batch_udf_equals_map_in_pandas(spark):
    docs = spark.createDataFrame(
        [(i, f"token{i} shared word alpha beta {'x' * (i % 5)}") for i in range(200)]
        + [(999, None)],
        "doc_id long, text string",
    )
    via_udf = {
        r["doc_id"]: r["embedding"]
        for r in docs.withColumn(
            "embedding", embed_predict_batch_udf(batch_size=32)(F.col("text"))
        )
        .select("doc_id", "embedding")
        .collect()
    }
    via_map = {
        r["doc_id"]: r["embedding"]
        for r in docs.mapInPandas(
            embed_map_in_pandas, schema="doc_id long, embedding array<float>"
        ).collect()
    }
    assert set(via_udf) == set(via_map)
    for k in via_udf:
        assert via_udf[k] == pytest.approx(via_map[k], abs=1e-6), k
    # null text → zero vector, not a task failure
    assert all(x == 0.0 for x in via_udf[999])
    # embeddings are unit-normalized (or zero)
    for v in via_udf.values():
        n = math.sqrt(sum(x * x for x in v))
        assert n == pytest.approx(1.0, abs=1e-3) or n == 0.0
