"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the exactness baseline (J6/W4 analog of the
reference's pgvector ``<=>`` search, ``src/api/routers/search.py:
159-218``), plus a random-hyperplane LSH-bucketed ANN as the scale
path.

Scale design:
  * the query vector is a broadcast literal — top-k is one scan +
    ``TakeOrderedAndProject``, no shuffle of the embedding table;
  * dot products run in a single codegen'd ``aggregate`` higher-order
    expression over the array (JVM-side, no Python);
  * the LSH path buckets vectors by sign-pattern against H deterministic
    hyperplanes (md5-seeded, reproducible anywhere), so queries touch
    only their bucket — the brute-force oracle bounds its recall in
    tests;
  * exact near-dup pairs use norm-band blocking: |cos| ≥ t forces the
    norm ratio into a band only when vectors are normalized — for raw
    vectors we block on the LSH key and verify, keeping shuffles
    key-sized.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newscrawler_spark.functions.rounding import pinned_round


def _dot_expr(vec_col: str, qlit: str) -> str:
    """SQL expr: Σ vec[i]*q[i] in double, sequential left fold."""
    return (
        f"aggregate(zip_with({vec_col}, {qlit}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _norm_expr(vec_col: str) -> str:
    return (
        f"sqrt(aggregate(transform({vec_col}, x -> cast(x as double) * cast(x as double)), "
        f"cast(0.0 as double), (acc, v) -> acc + v))"
    )


def _array_lit(q: list[float]) -> str:
    return "array(" + ", ".join(f"cast({float(x)!r} as double)" for x in q) + ")"


def cosine_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: scan + codegen'd dot product + TakeOrdered.

    Similarity is rounded to 4dp and tie-broken on id so the result is
    a deterministic set, comparable across engines.
    """
    qlit = _array_lit(query)
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query))
    sim = F.expr(_dot_expr(vec_col, qlit)) / (F.expr(_norm_expr(vec_col)) * F.lit(qnorm))
    return (
        embeddings.select(F.col(id_col), pinned_round(sim, 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


# --- LSH-bucketed ANN (scale path) ---------------------------------------


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from md5 bytes — no RNG
    state, reproducible in any language/engine."""
    out = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        vals = []
        ctr = 0
        while len(vals) < dim:
            h = hashlib.md5(f"{seed}:{p}:{ctr}".encode()).digest()
            for i in range(0, 16, 2):
                v = int.from_bytes(h[i : i + 2], "big")
                vals.append((v / 65535.0) * 2.0 - 1.0)
            ctr += 1
        out[p] = vals[:dim]
    return out


def multi_table_bucket_udf(dim: int, n_planes: int, n_tables: int, seed: int = 42):
    """mapInPandas body emitting (row ⊗ table) with the row's bucket in
    each of the L independent hash tables — the standard multi-table
    LSH layout (tables OR-ed at query time to trade space for recall)."""
    all_planes = [
        _hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]

    def body(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            frames = []
            for t, planes in enumerate(all_planes):
                out = pdf.copy()
                out["table_id"] = t
                if len(mat):
                    signs = (mat @ planes.T) > 0
                    bucket = np.zeros(len(mat), dtype=np.int64)
                    for p in range(n_planes):
                        bucket |= signs[:, p].astype(np.int64) << p
                    out["bucket"] = bucket
                else:
                    out["bucket"] = pd.Series([], dtype="int64")
                frames.append(out)
            yield pd.concat(frames)

    return body


def ann_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k via multi-table random-hyperplane LSH: a row is a
    candidate if it shares the query's bucket in ANY of the L tables;
    candidates are ranked exactly.

    At scale the table is written pre-bucketed (L× storage, partitioned
    by (table_id, bucket)); a query reads ~L·n/2^planes rows instead of
    n.  Recall follows 1-(1-p^planes)^L with p = 1-θ/π, so L buys
    recall without touching latency-critical bucket size — the recall
    floor is asserted against brute force in tests, not assumed.
    """
    from pyspark.sql import types as T

    dim = len(query)
    q = np.array(query, dtype=np.float64)
    probes = []  # (table_id, bucket) the query lands in
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        b = 0
        for p in range(n_planes):
            if float(q @ planes[p]) > 0:
                b |= 1 << p
        probes.append((t, b))

    schema = T.StructType(
        list(embeddings.schema.fields)
        + [T.StructField("table_id", T.IntegerType()), T.StructField("bucket", T.LongType())]
    )
    bucketed = embeddings.mapInPandas(
        multi_table_bucket_udf(dim, n_planes, n_tables, seed), schema=schema
    )
    probe_df = embeddings.sparkSession.createDataFrame(
        probes, "table_id int, bucket long"
    )
    candidates = (
        bucketed.join(F.broadcast(probe_df), ["table_id", "bucket"])
        .select("vec_id", "embedding")
        .dropDuplicates(["vec_id"])
    )
    return cosine_topk(candidates, query, k)


def _gemm_pairs_fn(threshold: float):
    """applyInPandas body for one block-pair task: normalize, one numpy
    GEMM, threshold, emit (id_a, id_b, cosine) with id_a < id_b.
    4dp rounding = floor(x*1e4 + 0.5)/1e4, identical to Spark/DuckDB
    HALF_UP for the positive cosines that survive the threshold."""

    empty = pd.DataFrame(
        {
            "id_a": pd.Series(dtype="int64"),
            "id_b": pd.Series(dtype="int64"),
            "cosine": pd.Series(dtype="float64"),
        }
    )

    def body(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        def prep(part):
            ids = part["vec_id"].to_numpy()
            mat = np.array(part["embedding"].tolist(), dtype=np.float64)
            nrm = np.linalg.norm(mat, axis=1)
            nrm[nrm == 0] = 1.0
            return ids, mat / nrm[:, None]

        a = pdf[pdf["side"] == 0]
        b = pdf[pdf["side"] == 1]
        # the task's KIND comes from the carried `cross` flag, never from
        # which sides happen to be non-empty: with sparse/clustered
        # vec_ids a cross task can see only one side (the other block is
        # empty) — "no b rows" would misroute it into the within-block
        # branch and re-emit that block's pairs once per empty partner
        if bool(pdf["cross"].iloc[0]):  # cross-block task
            if not len(a) or not len(b):
                return empty  # empty partner block -> no cross pairs
            ids_a, na = prep(a)
            ids_b, nb = prep(b)
            sim = np.floor(na @ nb.T * 10000 + 0.5) / 10000
            ii, jj = np.nonzero(sim >= threshold)
            id1, id2 = ids_a[ii], ids_b[jj]
        else:  # within-block task: upper triangle only
            ids_a, na = prep(a)
            sim = np.floor(na @ na.T * 10000 + 0.5) / 10000
            ii, jj = np.nonzero(np.triu(sim >= threshold, k=1))
            id1, id2 = ids_a[ii], ids_a[jj]
        lo = np.minimum(id1, id2)
        hi = np.maximum(id1, id2)
        return pd.DataFrame(
            {"id_a": lo, "id_b": hi, "cosine": sim[ii, jj]}
        ).astype({"id_a": "int64", "id_b": "int64"})

    return body


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 6,
    n_tables: int = 24,
    seed: int = 42,
    exact: bool = False,
    n_blocks: int = 16,
) -> DataFrame:
    """Pairs with cosine ≥ threshold (rounded to 4dp).

    exact=True — EXACT all-pairs as distributed blocked GEMM: vectors
    are hashed into ``n_blocks`` blocks, each of the B(B+1)/2 block-pair
    tasks gets its rows via one broadcast-mapping join, and an
    ``applyInPandas`` task runs a single vectorized numpy matmul.  The
    only shuffle is the ×(B+1) replication equi-shuffle; no theta-join /
    nested-loop ever happens, every unordered pair is computed exactly
    once, and task size is (n/B)² — B scales with the cluster.  O(n²d)
    FLOPs are inherent to the exact answer; this is the right *plan* for
    them (the FAISS brute-force shape).
    exact=False — LSH blocking (:func:`rademacher_candidate_pairs`) +
    verification of candidate pairs only.  Sub-quadratic candidate
    generation; recall < 1 (measured against the exact path in tests,
    strong at high thresholds, weaker near the random-cosine regime —
    see the docstring there).
    """
    if exact:
        spark = embeddings.sparkSession
        rows = []
        for bi in range(n_blocks):
            for bj in range(bi, n_blocks):
                task = bi * n_blocks + bj
                rows.append((bi, task, 0, bj != bi))
                if bj != bi:
                    rows.append((bj, task, 1, True))
        tasks = spark.createDataFrame(
            rows, "blk int, task_id int, side int, cross boolean"
        )
        replicated = (
            embeddings.select("vec_id", "embedding")
            .withColumn("blk", F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int"))
            .join(F.broadcast(tasks), "blk")
        )
        return replicated.groupBy("task_id").applyInPandas(
            _gemm_pairs_fn(threshold), schema="id_a long, id_b long, cosine double"
        )

    cand = rademacher_candidate_pairs(embeddings, n_planes, n_tables, seed)
    e = embeddings.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
        F.expr(_norm_expr("embedding")).alias("nrm"),
    )
    a = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    pairs = cand.join(a, "id_a").join(b, "id_b")
    dot = F.expr("aggregate(zip_with(va, vb, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)")
    return (
        pairs.withColumn("cosine", pinned_round(dot / (F.col("na") * F.col("nb")), 4))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# --- IVF-flat ANN (coarse quantizer → probed lists → exact rerank) -------


def ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse centroids: slot c gets the embedding of the
    MINIMUM id with id % C == c — a stride sample over the id space.

    Purely relational (no RNG / k-means iteration state), so any engine
    derives the identical codebook from the data alone; the driver
    collect is bounded at C rows.  A quality-tuned codebook (k-means on
    a sample) drops in here without touching the query path.
    """
    mins = (
        embeddings.select(
            F.pmod(F.col(id_col), F.lit(n_centroids)).cast("int").alias("cid"),
            F.col(id_col),
        )
        .groupBy("cid")
        .agg(F.min(id_col).alias("cvid"))
    )
    rows = (
        mins.join(
            embeddings.select(F.col(id_col).alias("cvid"), F.col(vec_col).alias("cvec")),
            "cvid",
        )
        .select("cid", "cvec")
        .collect()
    )
    return sorted((r["cid"], [float(x) for x in r["cvec"]]) for r in rows)


def _round4_half_away(x: float) -> float:
    """round(x, 4) with HALF_UP/away-from-zero ties — what Spark's
    ``round`` and DuckDB's ``round`` both do (Python's built-in
    banker's rounding does NOT)."""
    s = -1.0 if x < 0 else 1.0
    return s * math.floor(abs(x) * 10000 + 0.5) / 10000


def _ivf_best_struct(centroids: list[tuple[int, list[float]]], vec_col: str = "embedding"):
    """struct(s=best pinned cosine, nc=-cid of that centroid): argmax
    over C codegen'd cosine expressions, ties → smallest cid via struct
    max on (sim, -cid)."""
    structs = []
    for cid, cvec in centroids:
        qlit = _array_lit(cvec)
        cnorm = math.sqrt(sum(x * x for x in cvec))
        sim = pinned_round(
            F.expr(_dot_expr(vec_col, qlit)) / (F.expr(_norm_expr(vec_col)) * F.lit(cnorm)),
            4,
        )
        structs.append(F.struct(sim.alias("s"), F.lit(-cid).alias("nc")))
    return F.array_max(F.array(*structs))


def ivf_assign_expr(centroids: list[tuple[int, list[float]]], vec_col: str = "embedding"):
    """Column expr: the centroid id each vector is assigned to —
    argmax over C codegen'd cosine expressions (ties → smallest cid via
    struct max on (sim, -cid)).  Pure JVM expressions: at scale the
    assignment runs once at WRITE time and becomes the table's
    partition column (``partitionBy(cid)``), so a query scans only its
    probed lists."""
    return (-_ivf_best_struct(centroids, vec_col).getField("nc")).cast("int")


def ivf_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat ANN top-k (the FAISS IVF shape, Spark-first): rank the C
    centroids against the query, probe the top ``nprobe`` inverted
    lists, exact cosine rerank inside them.

    A query touches ~nprobe/C of the corpus instead of all of it; with
    the assignment materialized as a partition column the probed-list
    filter becomes partition PRUNING — the unprobed ~ (C-nprobe)/C of a
    100 TB table is never read.  Recall is measured against
    :func:`cosine_topk` in tests, never assumed.
    """
    cents = ivf_centroids(embeddings, n_centroids, id_col, vec_col)
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query))
    ranked = sorted(
        (
            (
                -_round4_half_away(
                    sum(float(a) * float(b) for a, b in zip(query, cvec))
                    / (qnorm * math.sqrt(sum(x * x for x in cvec)) or 1.0)
                ),
                cid,
            )
            for cid, cvec in cents
        )
    )
    probed = [cid for _, cid in ranked[:nprobe]]
    assigned = embeddings.withColumn("_ivf_cid", ivf_assign_expr(cents, vec_col))
    cands = assigned.filter(F.col("_ivf_cid").isin(probed)).drop("_ivf_cid")
    return cosine_topk(cands, query, k, vec_col, id_col)


# --- integer Rademacher LSH (cross-engine-exact blocking) ----------------


def rademacher_planes(dim: int, n_planes: int, n_tables: int, seed: int = 42) -> np.ndarray:
    """±1 hyperplanes derived from md5 parity — bit-identical in any
    engine that has md5(string): w[t][p][i] = +1 iff the first hex digit
    of md5('plane:{seed}:{t}:{p}:{i}') is even."""
    w = np.empty((n_tables, n_planes, dim), dtype=np.int64)
    for t in range(n_tables):
        for p in range(n_planes):
            for i in range(dim):
                h = hashlib.md5(f"plane:{seed}:{t}:{p}:{i}".encode()).hexdigest()
                w[t, p, i] = 1 if int(h[0], 16) % 2 == 0 else -1
    return w


def rademacher_bucket_udf(dim: int, n_planes: int, n_tables: int, seed: int = 42):
    """mapInPandas body emitting (vec_id, table_id, bucket): vectors are
    quantized to integers (floor(x*1e4 + 0.5) — no rounding-mode
    ambiguity) and bucketed by the sign pattern of EXACT integer dot
    products against the ±1 planes, so any engine computes the same
    buckets regardless of float summation order."""
    w = rademacher_planes(dim, n_planes, n_tables, seed)

    def body(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = 1 << np.arange(n_planes, dtype=np.int64)
        for pdf in it:
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            if len(mat) == 0:
                continue
            q = np.floor(mat * 10000 + 0.5).astype(np.int64)
            vec_ids = pdf["vec_id"].to_numpy()
            frames = []
            for t in range(n_tables):
                dots = q @ w[t].T  # (n, n_planes) exact int64
                buckets = ((dots > 0).astype(np.int64) * shifts).sum(axis=1)
                frames.append(
                    pd.DataFrame(
                        {"vec_id": vec_ids, "table_id": t, "bucket": buckets}
                    )
                )
            yield pd.concat(frames)

    return body


def rademacher_query_buckets(
    query: list[float], n_planes: int, n_tables: int, seed: int = 42
) -> list[tuple[int, int]]:
    """The (table_id, bucket) probes of one query vector — the exact
    scalar twin of :func:`rademacher_bucket_udf` (same quantization,
    same integer dots), so a probe always lands in the bucket the UDF
    would assign the identical vector to."""
    w = rademacher_planes(len(query), n_planes, n_tables, seed)
    q = np.floor(np.asarray(query, dtype=np.float64) * 10000 + 0.5).astype(np.int64)
    shifts = 1 << np.arange(n_planes, dtype=np.int64)
    probes = []
    for t in range(n_tables):
        dots = q @ w[t].T
        probes.append((t, int(((dots > 0).astype(np.int64) * shifts).sum())))
    return probes


def ann_topk_rademacher(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Multi-table ANN top-k with CROSS-ENGINE-EXACT buckets.

    Same plan shape as :func:`ann_topk` (pre-bucketable layout, broadcast
    probe join, candidates reranked exactly), but the buckets come from
    the integer Rademacher scheme: vectors quantized to ints, ±1 planes
    from md5 parity, exact integer dot products — so ANY engine with
    md5() derives bit-identical buckets and the FULL approximate result
    (bucketing + probing + rerank) has a DuckDB oracle, not just a
    recall bound.  Recall is still measured against brute force in
    tests; the oracle checks the algorithm, the recall test checks the
    operating point."""
    dim = len(query)
    bucketed = embeddings.select("vec_id", "embedding").mapInPandas(
        rademacher_bucket_udf(dim, n_planes, n_tables, seed),
        schema="vec_id long, table_id int, bucket long",
    )
    probe_df = embeddings.sparkSession.createDataFrame(
        rademacher_query_buckets(query, n_planes, n_tables, seed),
        "table_id int, bucket long",
    )
    cand_ids = (
        bucketed.join(F.broadcast(probe_df), ["table_id", "bucket"])
        .select("vec_id")
        .distinct()
    )
    cands = embeddings.join(cand_ids, "vec_id").select("vec_id", "embedding")
    return cosine_topk(cands, query, k)


def rademacher_candidate_pairs(
    embeddings: DataFrame, n_planes: int = 6, n_tables: int = 24, seed: int = 42
) -> DataFrame:
    """Candidate (id_a < id_b) pairs sharing an LSH bucket in ANY of the
    L tables — equi-join shuffles only, candidate volume ≈ L·Σ_b n_b²/2.

    Operating-point honesty: random-hyperplane LSH separates well when
    the target cosine is high (≥0.8: near-identical vectors, the actual
    near-dup regime).  Near the random-cosine regime (threshold ~0.45 on
    unit-random data) no (k, L) gives both high recall and strong
    pruning — k=6/L=24 measures ~0.90 recall at ~3× candidate pruning
    (tests/test_dedup_similarity.py); exact=True is the fallback there.
    """
    first = embeddings.select("embedding").first()
    if first is None:  # empty relation: no pairs (and no dim to infer)
        return embeddings.sparkSession.createDataFrame([], "id_a long, id_b long")
    dim = len(first["embedding"])
    bucketed = embeddings.select("vec_id", "embedding").mapInPandas(
        rademacher_bucket_udf(dim, n_planes, n_tables, seed),
        schema="vec_id long, table_id int, bucket long",
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    return (
        a.join(b, ["table_id", "bucket"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
    )


# --- SemDeDup: semantic deduplication over embedding clusters -------------


def semantic_dedup(
    embeddings: DataFrame,
    eps: float = 0.30,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space, then inside each cluster drop every item that has
    a semantic duplicate (pinned 4dp cosine >= ``eps``) ranked before
    it — the keeper of a duplicate pair is the item with the LOWER
    (centroid_sim, id), the paper's "keep the example farthest from the
    centroid" rule made deterministic.

    Drop rule (exactly what the DuckDB oracle's EXISTS evaluates):
    drop b iff EXISTS a in the same cluster with
    ``cos(a, b) >= eps AND (a.csim, a.id) < (b.csim, b.id)``.

    Scale shape (the paper's own): the pair problem is confined to
    clusters — one hash shuffle on cid, then one numpy GEMM per cluster
    inside ``applyInPandas`` (the whole group arrives as one frame).
    Cluster count C grows with the corpus so cluster size stays
    worker-bounded (SemDeDup used k=50k-110k at 1.7B docs); the stride
    codebook here is the deterministic stand-in for its k-means — a
    tuned codebook drops into :func:`ivf_centroids` without touching
    this query path.  Assignment is pure JVM codegen and at write time
    becomes a partition column, making the shuffle free on re-runs.

    Output: (vec_id, cid, csim, keep).
    """
    cents = ivf_centroids(embeddings, n_centroids, id_col, vec_col)
    best = _ivf_best_struct(cents, vec_col)
    assigned = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("_v"),
        (-best.getField("nc")).cast("int").alias("cid"),
        best.getField("s").alias("csim"),
    )

    def dedup_cluster(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["csim", "vec_id"]).reset_index(drop=True)
        m = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        nrm = np.sqrt((m * m).sum(axis=1))
        nrm[nrm == 0.0] = 1.0
        g = (m @ m.T) / np.outer(nrm, nrm)
        # the pinned-round floor form (functions/rounding), NOT banker's
        g = np.floor(g * 10000.0 + 0.5) / 10000.0
        # in (csim, vec_id) order, b is dropped iff any earlier a hits eps
        dom = np.tril(g >= eps, k=-1).any(axis=1)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "cid": pdf["cid"],
                "csim": pdf["csim"],
                "keep": ~dom,
            }
        )

    return assigned.groupBy("cid").applyInPandas(
        dedup_cluster, "vec_id long, cid int, csim double, keep boolean"
    )


# ---- Product quantization (Jégou et al. 2011) -----------------------

PQ_M = 8          # subspaces
PQ_KS = 16        # centroids per subspace (4-bit codes)


def _sub_slice(col: str, s: int, dsub: int):
    """1-based subvector slice for subspace ``s`` — identical semantics
    to DuckDB list_slice in the oracle."""
    return F.slice(F.col(col), s * dsub + 1, dsub)


def _l2sq(a, b):
    """Σ (a[i]-b[i])² as a sequential double fold."""
    diff = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double"))
    )
    return F.aggregate(
        diff, F.lit(0.0).cast("double"), lambda acc, v: acc + v
    )


def pq_codebook(
    embeddings: DataFrame, dim: int, m: int = PQ_M, ks: int = PQ_KS
) -> DataFrame:
    """Deterministic PQ codebook: centroid ``j`` of every subspace is
    the corresponding subvector of ``vec_id == j`` (the stride-sample
    convention of the IVF codebook above — a k-means fit would slot in
    here unchanged).  Returns the (m·ks)-row dimension (s, j, cv)."""
    dsub = dim // m
    subs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).alias("s"),
                    _sub_slice("embedding", s, dsub).alias("cv"),
                )
                for s in range(m)
            ]
        )
    )
    return (
        embeddings.where(F.col("vec_id") < ks)
        .select(F.col("vec_id").alias("j"), subs.alias("u"))
        .select("j", "u.s", "u.cv")
    )


def pq_encode(
    embeddings: DataFrame, dim: int, m: int = PQ_M, ks: int = PQ_KS
) -> DataFrame:
    """Encode every vector as ``m`` 4-bit codes: per subspace, the
    argmin-L2 centroid (pinned distance, ``j`` tiebreak — the argmin is
    a deterministic cross-engine decision).

    Scale shape: the codebook is an (m·ks)-row broadcast dim; the
    n·m·ks distance fanout partial-aggregates its argmin map-side
    (rows of one (vec, s) never cross partitions before the combine),
    so the shuffle carries n·m code rows — 8 bytes of code per vector
    replaces 4·dim bytes of floats downstream, the point of PQ at
    10^10-vector scale.  Returns (vec_id, s, code)."""
    dsub = dim // m
    cb = pq_codebook(embeddings, dim, m, ks)
    subs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).alias("s"),
                    _sub_slice("embedding", s, dsub).alias("sv"),
                )
                for s in range(m)
            ]
        )
    )
    fan = (
        embeddings.select("vec_id", subs.alias("u"))
        .select("vec_id", "u.s", "u.sv")
        .join(F.broadcast(cb), "s")
    )
    d2 = pinned_round(_l2sq(F.col("sv"), F.col("cv")), 4)
    return (
        fan.select(
            "vec_id", "s", F.struct(d2.alias("d"), F.col("j").alias("j")).alias("dj")
        )
        .groupBy("vec_id", "s")
        .agg(F.min("dj").getField("j").alias("code"))
    )


def pq_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 20,
    m: int = PQ_M,
    ks: int = PQ_KS,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: the query builds an (m·ks)
    distance table against the codebook; a vector's approximate
    distance is the sum of its codes' table entries — the scan reads
    ONLY the code rows, never the float vectors (the 100 TB read-path
    win).  Returns (vec_id, adc) ascending, ``vec_id`` tiebreak."""
    dim = len(query)
    dsub = dim // m
    cb = pq_codebook(embeddings, dim, m, ks)
    qsub = {s: _array_lit(query[s * dsub : (s + 1) * dsub]) for s in range(m)}
    qd = F.lit(None).cast("double")
    expr = None
    for s in range(m):
        cond = F.col("s") == s
        val = pinned_round(_l2sq(F.expr(qsub[s]), F.col("cv")), 4)
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    qtab = cb.select("s", "j", expr.alias("qd"))
    codes = pq_encode(embeddings, dim, m, ks)
    return (
        codes.join(
            F.broadcast(qtab),
            (codes["s"] == qtab["s"]) & (codes["code"] == qtab["j"]),
        )
        .groupBy("vec_id")
        .agg(pinned_round(F.sum("qd"), 4).alias("adc"))
        .orderBy("adc", "vec_id")
        .limit(k)
    )


# ---- k-NN graph (blocked GEMM, per-row top-k) ----------------------------


def _knn_block_fn(k: int):
    """applyInPandas body for one block-pair task: quantize (the pinned
    1e4 integer contract — operators/cluster.QUANT), one EXACT int64
    GEMM, per-row local top-k by (pinned cosine desc, nbr id asc).
    Integer dots + IEEE sqrt/divide make every emitted cosine
    bit-identical in any engine — no float-accumulation-order risk."""

    empty = pd.DataFrame(
        {
            "vec_id": pd.Series(dtype="int64"),
            "nbr": pd.Series(dtype="int64"),
            "cosine": pd.Series(dtype="float64"),
        }
    )

    def prep(part):
        ids = part["vec_id"].to_numpy()
        m = np.array(part["embedding"].tolist(), dtype=np.float64)
        q = np.floor(m * 10000.0 + 0.5).astype(np.int64)
        n2 = (q * q).sum(axis=1)
        nrm = np.sqrt(n2.astype(np.float64))
        nrm[nrm == 0.0] = 1.0
        return ids, q, nrm

    def topk(sims_row, nbr_ids, mask=None):
        s = sims_row if mask is None else np.where(mask, sims_row, -np.inf)
        order = np.lexsort((nbr_ids, -s))[:k]
        order = order[np.isfinite(s[order])]
        return nbr_ids[order], s[order]

    def emit(out, vid, nbrs, sims):
        for nb, sm in zip(nbrs, sims):
            out[0].append(vid)
            out[1].append(nb)
            out[2].append(sm)

    def body(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        out: tuple = ([], [], [])
        a = pdf[pdf["side"] == 0]
        if bool(pdf["cross"].iloc[0]):
            b = pdf[pdf["side"] == 1]
            if not len(a) or not len(b):
                return empty
            ia, qa, na = prep(a)
            ib, qb, nb_ = prep(b)
            dots = (qa @ qb.T).astype(np.float64)
            sim = np.floor(dots / np.outer(na, nb_) * 10000.0 + 0.5) / 10000.0
            for r in range(len(ia)):
                emit(out, ia[r], *topk(sim[r], ib))
            for c in range(len(ib)):
                emit(out, ib[c], *topk(sim[:, c], ia))
        else:
            if not len(a):
                return empty
            ia, qa, na = prep(a)
            dots = (qa @ qa.T).astype(np.float64)
            sim = np.floor(dots / np.outer(na, na) * 10000.0 + 0.5) / 10000.0
            notself = ~np.eye(len(ia), dtype=bool)
            for r in range(len(ia)):
                emit(out, ia[r], *topk(sim[r], ia, mask=notself[r]))
        return pd.DataFrame(
            {"vec_id": out[0], "nbr": out[1], "cosine": out[2]}
        ).astype({"vec_id": "int64", "nbr": "int64"})

    return body


def knn_graph(
    embeddings: DataFrame, k: int = 5, n_blocks: int = 8
) -> DataFrame:
    """Exact k-nearest-neighbor graph over the embedding table — the
    substrate of graph-based curation (kNN-dedup, label propagation,
    NN-descent seeds, UMAP/HNSW construction all start here).

    Plan: the blocked-GEMM task map of the exact pair operator
    (embedding_near_dup_pairs exact=True — B(B+1)/2 tasks, one matmul
    each, the ×(B+1) replication equi-shuffle), but each task emits
    only its rows' LOCAL top-k against the partner block, and a final
    rank window merges the ≤ B·k candidates per vector — the shuffle
    after the GEMM carries n·B·k rows, never n².  O(n²d) FLOPs are the
    exact answer's cost; B scales with the cluster.

    Cross-engine exactness: embeddings are quantized to the pinned 1e4
    integer grid first, so the GEMM is INTEGER (numpy int64, exact) and
    the oracle's fold reproduces every dot bit-for-bit; cosine =
    dot / (sqrt(n2a)·sqrt(n2b)) in IEEE doubles, pinned 4dp, ties →
    smaller nbr id.  (The float-GEMM pair operator tolerates
    accumulation-order ulps because it only thresholds; a RANKING
    operator cannot — hence the integer grid.)

    Output: (vec_id, nbr, cosine, rnk 1..k).
    """
    from pyspark.sql import Window

    spark = embeddings.sparkSession
    rows = []
    for bi in range(n_blocks):
        for bj in range(bi, n_blocks):
            task = bi * n_blocks + bj
            rows.append((bi, task, 0, bj != bi))
            if bj != bi:
                rows.append((bj, task, 1, True))
    tasks = spark.createDataFrame(rows, "blk int, task_id int, side int, cross boolean")
    replicated = (
        embeddings.select("vec_id", "embedding")
        .withColumn("blk", F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int"))
        .join(F.broadcast(tasks), "blk")
    )
    cands = replicated.groupBy("task_id").applyInPandas(
        _knn_block_fn(k), schema="vec_id long, nbr long, cosine double"
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), "nbr")
    return (
        cands.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("vec_id", "nbr", "cosine", F.col("rnk").cast("int").alias("rnk"))
    )
