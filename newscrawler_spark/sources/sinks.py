"""Article sinks (reference S7/S8).

The reference writes one JSON file per article (`src/utils/
batch_processor.py:186-204`) and inserts-if-absent into Postgres
(`src/cli.py:70-99`).  Spark-side: JSON-lines output (one article per
line — the distributed analog of file-per-article; a 100 TB corpus
can't afford a million tiny files) and the insert-if-absent semantics
live in the seen anti-join + append protocol (crawler steps 1/10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_articles_json(articles: DataFrame, path: str, partitions: int | None = None) -> None:
    """JSON-lines sink with the reference's serialized-article shape
    (models/article.py:45-73): url/title/content/metadata nested dict."""
    shaped = articles.select(
        F.to_json(
            F.struct(
                F.col("url"),
                F.col("title"),
                F.col("text").alias("content"),
                F.struct(
                    F.col("source_domain"),
                    F.col("authors"),
                    F.col("published_date"),
                    F.col("lang").alias("language"),
                    F.col("images"),
                ).alias("metadata"),
                F.col("quality_score"),
            ),
            # keep null fields in the output: the reference's serialized
            # article dict (models/article.py:45-73) has a FIXED key set,
            # and to_json's default ignoreNullFields would make the
            # emitted schema vary per row (a null published_date or
            # authors list drops the key entirely)
            {"ignoreNullFields": "false"},
        ).alias("value")
    )
    if partitions is not None:
        shaped = shaped.repartition(partitions)
    shaped.write.mode("overwrite").text(path)
