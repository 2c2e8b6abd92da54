"""Dedup family + similarity search semantics beyond the SQL oracle:
LSH candidate recall, ANN recall vs brute force, simhash blocking
exactness, multimodal plumbing shape."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


def test_jaccard_capped_equals_uncapped(spark, docs):
    """The df-capped candidate path (the 100 TB hot-shingle guard the
    gate uses, max_df=100) must produce exactly the uncapped result on
    corpora whose shingle df stays under the cap (gate corpora max df:
    7 at sf0.01, 25 at sf0.1) — same pairs, same exact jaccard values."""
    from newscrawler_spark.operators.dedup import jaccard_candidates

    def rows(max_df):
        return {
            (r["doc_a"], r["doc_b"], r["shared"], r["na"], r["nb"], r["jaccard"])
            for r in jaccard_candidates(
                docs, n=3, threshold=0.5, max_df=max_df
            ).collect()
        }

    capped, uncapped = rows(100), rows(None)
    assert capped == uncapped and len(capped) > 0
    # a cap below the corpus's hot-shingle df must still verify EXACT
    # jaccard on the pairs it does emit (subset, never altered values)
    tight = rows(3)
    assert tight <= uncapped


def test_lsh_candidates_cover_high_jaccard(spark, docs):
    """Banding theory: pairs with very high true Jaccard must appear in
    the LSH candidate set (16 hashes, 4 bands → ~(1-(1-s^4)^4), >0.99
    at s≥0.9)."""
    from newscrawler_spark.operators.dedup import jaccard_candidates, lsh_candidate_pairs

    truth = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_candidates(docs, threshold=0.9).collect()
    }
    assert truth, "corpus should contain near-dup pairs"
    cands = {
        (r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(docs).collect()
    }
    missed = truth - cands
    assert not missed, f"LSH missed high-jaccard pairs: {missed}"


def test_minhash_within_band_consistency(spark, docs):
    """Identical texts (doc vs itself, simulated by unioning a copy)
    produce identical signatures → always candidates."""
    from newscrawler_spark.operators.dedup import minhash_signatures

    two = docs.limit(5).union(
        docs.limit(5).withColumn("doc_id", F.col("doc_id") + 100000)
    )
    sig = minhash_signatures(two).toPandas()
    base = sig[sig.doc_id < 100000].set_index(["doc_id", "seed"])["minhash"]
    copy = sig[sig.doc_id >= 100000].copy()
    copy["doc_id"] -= 100000
    copy = copy.set_index(["doc_id", "seed"])["minhash"]
    assert (base.sort_index() == copy.sort_index()).all()


def test_simhash_blocking_exact_for_radius_1(spark, docs):
    """Half-blocking recovers EXACTLY the pairs with Hamming ≤ 1
    (pigeonhole) — verified against a driver-side brute force."""
    from newscrawler_spark.operators.dedup import simhash16, simhash_near_dups

    sub = docs.limit(120)
    sims = {r["doc_id"]: r["simhash"] for r in simhash16(sub).collect()}
    brute = set()
    ids = sorted(sims)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin(sims[a] ^ sims[b]).count("1") <= 1:
                brute.add((a, b))
    got = {(r["doc_a"], r["doc_b"]) for r in simhash_near_dups(sub, max_hamming=1).collect()}
    assert got == brute


def test_ann_recall_vs_bruteforce(spark, emb):
    from newscrawler_spark.operators.similarity import ann_topk, cosine_topk

    q = [float(x) for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]]
    truth = [r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()]
    approx = [r["vec_id"] for r in ann_topk(emb, q, k=10, n_planes=6, n_tables=8).collect()]
    recall = len(set(truth) & set(approx)) / 10
    assert recall >= 0.5, f"ANN recall {recall} too low (6 planes × 8 tables)"
    assert approx[0] == truth[0] == 1  # the query vector itself ranks first


def test_ann_rademacher_probe_twin_and_recall(spark, emb):
    """The scalar query-probe path must land in EXACTLY the bucket the
    Arrow UDF assigns the identical vector (cross-engine-exact integer
    scheme — this equality is what makes the DuckDB oracle of
    q_sim_ann_lsh sound), and the operating point must keep useful
    recall vs brute force."""
    from newscrawler_spark.operators.similarity import (
        ann_topk_rademacher,
        cosine_topk,
        rademacher_bucket_udf,
        rademacher_query_buckets,
    )

    q = [float(x) for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]]
    probes = dict(rademacher_query_buckets(q, n_planes=4, n_tables=16))
    udf_rows = (
        emb.filter(F.col("vec_id") == 1)
        .select("vec_id", "embedding")
        .mapInPandas(
            rademacher_bucket_udf(len(q), 4, 16), schema="vec_id long, table_id int, bucket long"
        )
        .collect()
    )
    assert {r["table_id"]: r["bucket"] for r in udf_rows} == probes

    truth = [r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()]
    approx = [
        r["vec_id"] for r in ann_topk_rademacher(emb, q, k=10, n_planes=4, n_tables=16).collect()
    ]
    assert approx[0] == truth[0] == 1  # own bucket always probed
    recall = len(set(truth) & set(approx)) / 10
    assert recall >= 0.6, f"rademacher ANN recall {recall} too low (4 planes × 16 tables)"


def test_ivf_topk_recall_and_partition_math(spark, emb):
    """IVF-flat: probing nprobe/C of the lists must still find the query
    vector itself (its own list is always ranked first) and a healthy
    share of the true top-k; the candidate set must be exactly the union
    of the probed lists (what partition pruning would read)."""
    from newscrawler_spark.operators.similarity import (
        cosine_topk,
        ivf_assign_expr,
        ivf_centroids,
        ivf_topk,
    )

    q = [float(x) for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]]
    truth = [r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()]
    approx = [r["vec_id"] for r in ivf_topk(emb, q, k=10, n_centroids=8, nprobe=3).collect()]
    assert approx[0] == truth[0] == 1  # own list is probed first
    recall = len(set(truth) & set(approx)) / 10
    assert recall >= 0.4, f"IVF recall {recall} too low (3/8 lists probed)"

    # assignment is total and deterministic: every vector lands in
    # exactly one of the C lists, twice over
    cents = ivf_centroids(emb, n_centroids=8)
    assert [c for c, _ in cents] == list(range(8))
    a1 = emb.withColumn("cid", ivf_assign_expr(cents)).select("vec_id", "cid")
    counts = {r["cid"]: r["n"] for r in a1.groupBy("cid").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == emb.count()
    a2 = {r["vec_id"]: r["cid"] for r in a1.collect()}
    a3 = {r["vec_id"]: r["cid"] for r in
          emb.withColumn("cid", ivf_assign_expr(cents)).select("vec_id", "cid").collect()}
    assert a2 == a3


def test_embedding_neardup_lsh_vs_exact(spark, emb):
    """LSH-blocked near-dup is a subset of exact; at a high threshold
    with multiprobe-free blocking we accept partial recall but demand
    precision 1.0 (no false pairs)."""
    from newscrawler_spark.operators.similarity import embedding_near_dup_pairs

    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(emb, threshold=0.4, exact=True).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(emb, threshold=0.4, n_planes=4).collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert exact[k] == v


def test_multimodal_plumbing(spark, docs):
    from newscrawler_spark.operators.multimodal import (
        decode_image_stub,
        documents_as_media,
        frame_sample_stub,
        media_features,
    )

    media = documents_as_media(docs)
    assert media.schema["payload"].dataType.typeName() == "binary"
    assert media.schema["meta"].dataType.typeName() == "struct"
    feats = media_features(media)
    rows = feats.limit(10).collect()
    for r in rows:
        assert len(r["histogram"]) == 16
        assert sum(r["histogram"]) == r["n_bytes"]
        assert 0 <= r["byte_entropy"] <= 4.0  # 16 bins → ≤ log2(16)
    frames = frame_sample_stub(media).limit(100).collect()
    assert all(r["frame_no"] % 10 == 0 for r in frames)
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"xx")


def test_streaming_token_bucket(spark, tmp_path):
    """applyInPandasWithState per-host budget over a streaming frontier."""
    import pandas as pd

    from newscrawler_spark.streaming.rounds import host_token_bucket_stream

    pdf = pd.DataFrame(
        {
            "host": ["a.com"] * 20 + ["b.com"] * 3,
            "canon_url": [f"https://x/{i}" for i in range(23)],
            "url_hash": list(range(23)),
            "priority": [i % 3 + 1 for i in range(23)],
        }
    )
    src = str(tmp_path / "frontier")
    spark.createDataFrame(pdf).write.parquet(src)
    stream = spark.readStream.schema(
        "host string, canon_url string, url_hash long, priority long"
    ).parquet(src)
    out = host_token_bucket_stream(stream, budget=5)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("bucket_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    res = spark.table("bucket_out").toPandas()
    counts = res.groupby("host").size().to_dict()
    assert counts["a.com"] == 5  # budget-capped
    assert counts["b.com"] == 3  # under budget


def test_streaming_dedup_matches_batch_distinct(spark, tmp_path):
    """dropDuplicatesWithinWatermark over a bounded replay == DISTINCT
    (every duplicate pair inside one watermark horizon), and state is
    keyed only on the projected dedup keys."""
    import pandas as pd

    from newscrawler_spark.streaming.rounds import dedup_stream, run_append_to_memory

    base = pd.Timestamp("2024-01-01 00:00:00")
    pdf = pd.DataFrame(
        {
            "event_id": range(40),
            "ts": [base + pd.Timedelta(seconds=i * 5) for i in range(40)],
            "user_id": [i % 7 for i in range(40)],
            "event_type": ["click" if i % 2 else "view" for i in range(40)],
            "value": [float(i) for i in range(40)],
            "props": ["{}"] * 40,
        }
    )
    src = str(tmp_path / "events")
    os.makedirs(src)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src, mode="overwrite")
    dd = dedup_stream(spark, src, schema, keys=["event_type", "user_id"])
    got = run_append_to_memory(dd, "dd_test").toPandas()
    want = pdf[["event_type", "user_id"]].drop_duplicates()
    assert len(got) == len(want)
    assert set(map(tuple, got.to_numpy())) == set(map(tuple, want.to_numpy()))


def test_exact_pairs_sparse_blocks_no_crash_no_dupes(spark):
    """Blocked GEMM with vec_ids clustered in ONE block (all others
    empty): cross tasks see a single side — must emit nothing (not
    crash on the empty side, not re-emit the within-block pairs once
    per empty partner block)."""
    from newscrawler_spark.operators.similarity import embedding_near_dup_pairs

    # all ids ≡ 0 (mod 16) -> only block 0 is populated
    rows = [(i * 16, [1.0, 0.0, 0.0, float(i % 2)]) for i in range(4)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = embedding_near_dup_pairs(emb, threshold=0.5, exact=True).collect()
    keys = [(r.id_a, r.id_b) for r in pairs]
    assert len(keys) == len(set(keys)), f"duplicated pairs: {sorted(keys)}"
    assert len(keys) > 0  # identical direction vectors clear 0.5
    # ids ≡ 1 (mod 16): block 1 only; side-0 of cross tasks is empty
    rows = [(1 + i * 16, [0.0, 1.0, 0.0, 0.0]) for i in range(3)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = embedding_near_dup_pairs(emb, threshold=0.5, exact=True).collect()
    keys = [(r.id_a, r.id_b) for r in pairs]
    assert len(keys) == len(set(keys)) and len(keys) == 3  # C(3,2) identical vecs


def test_neardup_lsh_empty_input(spark):
    from newscrawler_spark.operators.similarity import embedding_near_dup_pairs

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert embedding_near_dup_pairs(emb, threshold=0.5).count() == 0


def test_streaming_token_bucket_chunked_global_order(spark, tmp_path):
    """Admission must be the GLOBAL (priority, url_hash) prefix of the
    whole host group even when Arrow batching splits the group across
    multiple pandas chunks — per-chunk sort+admit would let low-priority
    rows from an earlier chunk steal tokens (and vary run to run with
    post-shuffle chunk order)."""
    import pandas as pd

    from newscrawler_spark.streaming.rounds import host_token_bucket_stream

    n = 50
    pdf = pd.DataFrame(
        {
            "host": ["a.com"] * n,
            "canon_url": [f"https://x/{i}" for i in range(n)],
            "url_hash": list(range(n)),
            # the 5 best (priority 1) rows sit at the END of the file so
            # naive chunk-ordered admission would spend tokens before
            # ever seeing them
            "priority": [9] * (n - 5) + [1] * 5,
        }
    )
    src = str(tmp_path / "frontier_chunked")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10")
    try:
        stream = spark.readStream.schema(
            "host string, canon_url string, url_hash long, priority long"
        ).parquet(src)
        out = host_token_bucket_stream(stream, budget=5)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("bucket_chunked")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    res = spark.table("bucket_chunked").toPandas()
    assert len(res) == 5
    assert sorted(res["priority"]) == [1, 1, 1, 1, 1]
    assert sorted(res["url_hash"]) == [45, 46, 47, 48, 49]


def test_pq_matches_numpy_spec(spark, emb):
    """Pure-numpy PQ spec (codes + ADC, pinned argmins) must equal the
    engine exactly."""
    import numpy as np

    from newscrawler_spark.operators.similarity import pq_encode, pq_topk

    M, KS, DIM = 8, 16, 64
    DSUB = DIM // M

    def pin(x):
        return np.floor(np.float64(x) * 10000.0 + 0.5) / 10000.0

    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    cb = {
        (s, j): vecs[j][s * DSUB : (s + 1) * DSUB]
        for s in range(M)
        for j in range(KS)
    }
    spec_codes = {}
    for v, x in vecs.items():
        for s in range(M):
            sv = x[s * DSUB : (s + 1) * DSUB]
            d = [
                (pin(float(((sv - cb[(s, j)]) ** 2).sum())), j)
                for j in range(KS)
            ]
            spec_codes[(v, s)] = min(d)[1]
    got_codes = {
        (r["vec_id"], r["s"]): r["code"]
        for r in pq_encode(emb, dim=DIM).collect()
    }
    assert got_codes == spec_codes

    q = vecs[0]
    qtab = {
        (s, j): pin(float(((q[s * DSUB : (s + 1) * DSUB] - cb[(s, j)]) ** 2).sum()))
        for s in range(M)
        for j in range(KS)
    }
    adc = {
        v: pin(sum(qtab[(s, spec_codes[(v, s)])] for s in range(M)))
        for v in vecs
    }
    spec_top = sorted(adc.items(), key=lambda kv: (kv[1], kv[0]))[:20]
    got_top = [
        (r["vec_id"], r["adc"])
        for r in pq_topk(emb, [float(x) for x in vecs[0]], k=20).collect()
    ]
    assert got_top == spec_top
    assert got_top[0] == (0, 0.0)  # the query is centroid 0 everywhere


def test_pq_plan_broadcast_only_no_vector_read_in_adc(spark, emb):
    from tests.test_plans import _plan

    from newscrawler_spark.operators.similarity import pq_topk

    q = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    plan = _plan(pq_topk(emb, q), "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # argmin partial-combines map-side before the code shuffle
    assert "partial_min" in plan, plan


def test_incremental_dedup_planted(spark):
    """Planted batch: one exact dup, one near dup (small edit), one
    novel doc — flags and keep decisions must match."""
    from newscrawler_spark.operators.dedup import incremental_dedup

    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " zz"
    novel = " ".join(f"n{i}" for i in range(40))
    existing = spark.createDataFrame(
        [(1, base), (2, " ".join(f"e{i}" for i in range(40)))],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, base), (11, near), (12, novel)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["exact_dup"], r["n_near"] > 0, r["keep"])
        for r in incremental_dedup(batch, existing).collect()
    }
    assert got[10] == (True, True, False)   # exact dup (also a near hit)
    assert got[11] == (False, True, False)  # near dup only
    assert got[12] == (False, False, True)  # novel


def test_incremental_dedup_never_pairs_within_batch(spark):
    """Two identical docs INSIDE the batch must both be kept when the
    existing corpus has neither (batch-internal dedup is a separate,
    whole-corpus concern)."""
    from newscrawler_spark.operators.dedup import incremental_dedup

    t = " ".join(f"x{i}" for i in range(40))
    batch = spark.createDataFrame([(1, t), (2, t)], "doc_id long, text string")
    existing = spark.createDataFrame(
        [(9, " ".join(f"y{i}" for i in range(40)))], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["keep"] for r in incremental_dedup(batch, existing).collect()}
    assert got == {1: True, 2: True}


def test_knn_graph_matches_bruteforce(spark, sf_dir):
    """knn_graph == a pure-numpy brute force on the pinned integer
    grid, including every rank and tie decision."""
    import math

    import numpy as np

    from newscrawler_spark.operators.similarity import knn_graph

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(120)
    got = [
        (r["vec_id"], r["rnk"], r["nbr"], r["cosine"])
        for r in knn_graph(emb, k=3, n_blocks=4).collect()
    ]
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    q = np.floor(m * 10000.0 + 0.5).astype(np.int64)
    nrm = np.sqrt((q * q).sum(axis=1).astype(np.float64))
    nrm[nrm == 0.0] = 1.0
    sim = np.floor((q @ q.T).astype(np.float64) / np.outer(nrm, nrm) * 10000.0 + 0.5) / 10000.0
    want = []
    for i in range(len(ids)):
        cands = sorted(
            ((-sim[i, j], ids[j]) for j in range(len(ids)) if j != i)
        )[:3]
        for rk, (ns, nb) in enumerate(cands, start=1):
            want.append((ids[i], rk, int(nb), -ns))
    assert sorted(got) == sorted(want)


def test_ivf_sweep_monotone_recall(spark):
    """Recall@k must be non-decreasing in nprobe (wider probes only add
    candidates) and reach 100% when every list is probed."""
    import __spark_entry__ as m
    from newscrawler_spark.operators.similarity import ivf_topk

    sf = "/root/testdata/sf0.001"
    rows = {
        r["nprobe"]: r["recall_bp"]
        for r in m.queries()["sim_ivf_sweep"](spark, sf).collect()
    }
    widths = sorted(rows)
    assert [rows[w] for w in widths] == sorted(rows[w] for w in widths)
    # probing all 16 lists is exhaustive — equals brute force
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    truth = {r["vec_id"] for r in m.q_sim_bruteforce_topk(spark, sf).collect()}
    full = {
        r["vec_id"]
        for r in ivf_topk(
            emb, m._query_vec(spark, sf), k=20, n_centroids=16, nprobe=16
        ).collect()
    }
    assert full == truth
