"""Text embedding UDF plumbing (reference X7: langchain ``embed_query``
with chunking, `src/vector/processor.py:46-72`; pgvector column
`src/database/models.py:25`).

No embedding model ships in this environment, so the embedder is the
deterministic **hashing trick**: tokens hash (md5) into ``dim`` buckets
with a ±1 sign bit, L2-normalized — the classic feature-hashing text
vectorizer.  It is a real vectorized pandas UDF with the exact
signature a ``predict_batch_udf``-wrapped model would have, so swapping
in a model later changes one function body, not the pipeline.
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterator

import numpy as np
import pandas as pd

DIM = 64

# explicit ASCII whitespace class — the same tri-engine pin as
# collapse_ws: the integer-kernel twin (q_text_embed_buckets) and its
# DuckDB oracle tokenize with this class, so the float UDF must too
_WS_RE = re.compile(r"[ \t\n\r\f\x0b]+")


def embed_text(text: str, dim: int = DIM) -> list[float]:
    """Frozen hashing-trick embedding of whitespace tokens.

    NULL text embeds as the zero vector (the empty-text result), not a
    task-killing AttributeError — one null row must not abort the
    embedding job (same guard as extract_batch on null html)."""
    vec = np.zeros(dim, dtype=np.float64)
    for tok in _WS_RE.split((text or "").lower()):
        if not tok:
            continue
        h = hashlib.md5(tok.encode("utf-8")).digest()
        bucket = int.from_bytes(h[:4], "big") % dim
        sign = 1.0 if h[4] & 1 else -1.0
        vec[bucket] += sign
    norm = float(np.linalg.norm(vec))
    if norm > 0:
        vec /= norm
    return [float(round(x, 6)) for x in vec]


EMBED_SCHEMA = "doc_id long, embedding array<float>"


def embed_map_in_pandas(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, text) → (doc_id, embedding)."""
    for pdf in it:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "embedding": [embed_text(t) for t in pdf["text"].tolist()],
            }
        )


def make_embed_predict_fn(dim: int = DIM):
    """``predict_batch_udf`` loader (the reference's real-model seam:
    ``src/vector/embedding_models.py:72-189`` loads sentence-transformers
    /OpenAI once per worker and encodes batches).  Called ONCE per python
    worker — this is where a real deployment would load torch/onnx
    weights; the sandbox stand-in "loads" the deterministic hashing
    model instead, through the SAME loader shape, so swapping in a real
    model changes only this body.

    The returned predict enforces the batch contract a real model relies
    on (violations raise, failing the job loudly rather than silently
    mis-batching): input is a 1-D numpy array of the batch's strings
    (never a scalar, never a pandas Series), output is a 2-D float32
    array of shape (len(batch), dim)."""

    def predict(inputs: "np.ndarray") -> "np.ndarray":
        if not isinstance(inputs, np.ndarray) or inputs.ndim != 1:
            raise TypeError(f"predict_batch_udf batch contract: {type(inputs)}")
        out = np.asarray(
            [embed_text(t if isinstance(t, str) else "", dim) for t in inputs],
            dtype=np.float32,
        ).reshape(len(inputs), dim)
        return out

    return predict


def embed_predict_batch_udf(dim: int = DIM, batch_size: int = 64):
    """The production embedding column as a ``pyspark.ml.functions.
    predict_batch_udf`` — Arrow-batched, loader-cached per worker,
    drop-in for a GPU model.  Equivalence with the mapInPandas twin is
    asserted in tests/test_embed_seam.py."""
    from pyspark.ml.functions import predict_batch_udf
    from pyspark.sql.types import ArrayType, FloatType

    return predict_batch_udf(
        lambda: make_embed_predict_fn(dim),
        return_type=ArrayType(FloatType()),
        batch_size=batch_size,
    )
