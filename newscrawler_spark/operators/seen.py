"""URL-seen set: broadcast bloom prefilter + exact anti-join.

The reference's seen set is a per-row ``SELECT ... WHERE url = :url``
before INSERT (``src/cli.py:72-77``) backed by a UNIQUE index
(``init-schema.sql:8``).  At 10^10-URL scale the Spark translation is:

  1. a **bloom filter** over the seen ``url_hash`` values, built
     map-side (one partial bitset per partition, OR-ed on the driver)
     and broadcast to prefilter the frontier — bloom *negatives* are
     definitely new and skip the join entirely;
  2. an **exact left-anti join** on ``(url_hash, url)`` for the bloom
     *positives* only.  The join keys include the full URL string, so a
     60-bit hash collision can never drop a URL — the hash exists to
     make the bloom and the shuffle cheap, the anti-join is the truth.

Scale notes (10^10 frontier): a single bloom for 10^10 hashes at fpp
1e-3 is ~17 GB — too big for one broadcast.  The structure here extends
to *partitioned* blooms: bucket both sides by ``pmod(url_hash, B)``,
build one bloom per bucket, and apply each bloom only to its bucket
(bucket-aligned, no extra shuffle, each broadcast ~17 GB / B).  The
sandbox exercises the identical code path with ``n_buckets=1``;
``n_buckets>1`` is covered by ``tests/test_seen.py``.

Equivalence contract: ``anti_join_seen(f, s) ≡ f.join(s, keys,
"left_anti")`` for every input — tested bloom-on vs bloom-off.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_MIX = np.uint64(0x9E3779B97F4A7C15)


class NumpyBloom:
    """Vectorized bloom filter over int64 hashes (numpy bitset).

    Double hashing: probe_i = (h1 + i*h2) mod m, h2 odd — standard
    Kirsch-Mitzenmacher construction, entirely ufunc-vectorized so the
    pandas-UDF prefilter costs O(batch) numpy ops, not per-row Python.
    """

    def __init__(self, expected: int, fpp: float = 1e-3, words: np.ndarray | None = None):
        expected = max(expected, 16)
        m = int(-expected * math.log(fpp) / (math.log(2) ** 2))
        self.m = ((m + 63) // 64) * 64
        self.k = max(1, round(self.m / expected * math.log(2)))
        self.words = (
            words if words is not None else np.zeros(self.m // 64, dtype=np.uint64)
        )

    def _probes(self, hashes: np.ndarray) -> Iterator[np.ndarray]:
        h1 = hashes.astype(np.int64).view(np.uint64)
        h2 = ((h1 * _MIX) & _MASK64) | np.uint64(1)
        for i in range(self.k):
            yield ((h1 + np.uint64(i) * h2) % np.uint64(self.m)).astype(np.uint64)

    def add(self, hashes: np.ndarray) -> None:
        for idx in self._probes(hashes):
            np.bitwise_or.at(self.words, (idx >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (idx & np.uint64(63)))

    def might_contain(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        out = np.ones(len(hashes), dtype=bool)
        for idx in self._probes(hashes):
            word = self.words[(idx >> np.uint64(6)).astype(np.int64)]
            out &= ((word >> (idx & np.uint64(63))) & np.uint64(1)).astype(bool)
        return out

    def union(self, other: "NumpyBloom") -> None:
        assert self.m == other.m and self.k == other.k
        self.words |= other.words

    @classmethod
    def from_state(cls, words: np.ndarray, m: int, k: int) -> "NumpyBloom":
        obj = object.__new__(cls)
        obj.words, obj.m, obj.k = words, m, k
        return obj


def build_bloom(seen: DataFrame, hash_col: str, expected: int, fpp: float = 1e-3) -> NumpyBloom:
    """Build a bloom over ``seen[hash_col]`` map-side.

    Each partition emits one serialized partial bitset (mapInPandas);
    the driver ORs them — the full hash set never moves to the driver,
    only ~m/8 bytes per partition.
    """
    proto = NumpyBloom(expected, fpp)
    m, k = proto.m, proto.k

    def partial(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bloom = NumpyBloom(expected, fpp)
        assert bloom.m == m and bloom.k == k
        nonempty = False
        for pdf in it:
            h = pdf[hash_col].to_numpy(dtype=np.int64)
            if len(h):
                bloom.add(h)
                nonempty = True
        if nonempty:
            yield pd.DataFrame({"bits": [bloom.words.tobytes()]})

    parts = seen.select(hash_col).mapInPandas(partial, schema="bits binary").collect()
    for row in parts:
        proto.words |= np.frombuffer(row["bits"], dtype=np.uint64)
    return proto


class BloomBucketStore:
    """Partitioned, bucket-aligned blooms (SURVEY §7.3): one bitset per
    ``pmod(url_hash, B)`` bucket, stored as shared-storage blobs that
    EXECUTORS write and read directly — the driver never assembles (or
    even sees) a full bitset.

    Why: a single bloom for 10^10 hashes at fpp 1e-3 is ~17 GB — too
    big to build on, hold in, or broadcast from the driver.  Bucketed,
    each blob is ~17 GB / B; build tasks OR only their buckets' deltas
    into their buckets' blobs, and apply tasks load only the buckets
    their rows touch (with the seen/frontier tables bucket-partitioned
    by the same key in storage — the Iceberg layout — that is exactly
    one blob per task, fetched once).  In this sandbox the "shared
    storage" is the store's local _blobs dir (same protocol as the
    RoundStore manifest blobs); on a cluster it is object-store puts
    from executors.

    Files are per-round cumulative (``bloomb{b}-{r}.m{m}k{k}.bin``): round r's
    blob for bucket b = round r-1's ∪ bloom(delta_r ∩ bucket b), so
    resume reads exactly the committed round's files and a crash
    mid-build is invisible (next run overwrites round r's files
    idempotently; commit is the round manifest, as for tables).
    """

    def __init__(self, root: str, n_buckets: int, expected_per_bucket: int, fpp: float):
        proto = NumpyBloom(expected_per_bucket, fpp)
        self.root = root
        self.n_buckets = n_buckets
        self.m, self.k = proto.m, proto.k
        self.expected_per_bucket = expected_per_bucket
        self.fpp = fpp

    def path(self, bucket: int, round_id: int) -> str:
        import os

        # m/k are part of the filename: blobs written under a different
        # bloom config (e.g. a resume with a new --bloom-expected) are
        # simply "not found", so complete() turns false and the caller
        # rebuilds from the committed seen rounds — reinterpreting a
        # bitset with the wrong m would produce false NEGATIVES, which
        # the exact-anti-join-on-positives design cannot recover from.
        return os.path.join(
            self.root, f"bloomb{bucket}-{round_id}.m{self.m}k{self.k}.bin"
        )

    def complete(self, round_id: int) -> bool:
        """True iff every bucket has a blob for ``round_id``."""
        import os

        return all(
            os.path.exists(self.path(b, round_id)) for b in range(self.n_buckets)
        )

    # -- executor-side primitives (no Spark imports at call time) ------
    def load_bucket(self, bucket: int, round_id: int) -> NumpyBloom:
        import os

        p = self.path(bucket, round_id)
        if round_id < 0 or not os.path.exists(p):
            return NumpyBloom(self.expected_per_bucket, self.fpp)
        words = np.fromfile(p, dtype=np.uint64)
        if words.size != self.m // 64:
            raise ValueError(
                f"bloom blob {p} has {words.size} words, expected "
                f"{self.m // 64} — written under a different bloom config"
            )
        return NumpyBloom.from_state(words, self.m, self.k)

    def write_bucket(self, bucket: int, round_id: int, bloom: NumpyBloom) -> None:
        import os

        os.makedirs(self.root, exist_ok=True)
        p = self.path(bucket, round_id)
        tmp = p + f".tmp{os.getpid()}"
        bloom.words.tofile(tmp)
        os.rename(tmp, p)


def _bucket_of(hashes: np.ndarray, n_buckets: int) -> np.ndarray:
    """pmod(hash, B) with Spark's non-negative-modulo semantics."""
    return ((hashes.astype(np.int64) % n_buckets) + n_buckets) % n_buckets


def advance_partitioned_bloom(
    seen_delta: DataFrame,
    hash_col: str,
    store: BloomBucketStore,
    round_id: int,
) -> int:
    """Advance every bucket's cumulative bloom to ``round_id`` by OR-ing
    in the round's seen delta — entirely on the executors.

    The delta is repartitioned by bucket (B-way shuffle of the skinny
    hash column only — on an Iceberg seen table bucket-partitioned by
    the same key this shuffle disappears; here it moves 8 bytes/row), a
    skeleton row per bucket guarantees even empty buckets carry their
    cumulative file forward, and each task loads round r-1's blobs for
    ITS buckets, ORs, and writes round r's blobs directly.  The driver
    receives only (bucket, n_added) counters.
    """
    spark = seen_delta.sparkSession
    B = store.n_buckets
    # skeleton rows use a flag, NOT a null hash — a nullable int64
    # column arrives in pandas as float64, silently rounding 60-bit
    # hashes (>2^53) and corrupting the bitset (false negatives, which
    # unlike false positives break the equivalence contract)
    skeleton = spark.range(B).select(
        F.col("id").cast("int").alias("__bucket"),
        F.lit(0).cast("long").alias("__h"),
        F.lit(False).alias("__real"),
    )
    rows = seen_delta.select(
        F.pmod(F.col(hash_col), F.lit(B)).cast("int").alias("__bucket"),
        F.col(hash_col).alias("__h"),
        F.lit(True).alias("__real"),
    ).unionByName(skeleton)

    root, n_buckets, expected, fpp = store.root, store.n_buckets, store.expected_per_bucket, store.fpp

    def advance(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        st = BloomBucketStore(root, n_buckets, expected, fpp)
        blooms: dict[int, NumpyBloom] = {}
        counts: dict[int, int] = {}
        for pdf in it:
            for b, grp in pdf.groupby("__bucket"):
                b = int(b)
                if b not in blooms:
                    blooms[b] = st.load_bucket(b, round_id - 1)
                    counts[b] = 0
                h = grp.loc[grp["__real"], "__h"].to_numpy(dtype=np.int64)
                if len(h):
                    blooms[b].add(h)
                    counts[b] += len(h)
        for b, bloom in blooms.items():
            st.write_bucket(b, round_id, bloom)
        if blooms:
            yield pd.DataFrame(
                {"bucket": list(blooms), "n_added": [counts[b] for b in blooms]}
            )

    stats = (
        rows.repartition(B, "__bucket")
        .mapInPandas(advance, schema="bucket int, n_added long")
        .collect()
    )
    return int(sum(r["n_added"] for r in stats))


def anti_join_seen_partitioned(
    frontier: DataFrame,
    seen: DataFrame,
    store: BloomBucketStore,
    round_id: int,
    url_col: str = "canon_url",
    hash_col: str = "url_hash",
) -> DataFrame:
    """Bucket-aligned bloom prefilter + exact anti-join fallback — the
    partitioned twin of :func:`anti_join_seen` (same equivalence
    contract, tested bloom-on vs bloom-off).

    The prefilter is applied map-side wherever the frontier rows
    already are (no extra shuffle); each task lazily loads only the
    bucket blobs its batch touches, cached per task.  With the frontier
    bucket-partitioned by the same key in storage (the 10^10 layout)
    that is exactly one blob per task.
    """
    root, n_buckets, expected, fpp = store.root, store.n_buckets, store.expected_per_bucket, store.fpp
    rid = round_id

    def prefilter(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        st = BloomBucketStore(root, n_buckets, expected, fpp)
        cache: dict[int, NumpyBloom] = {}
        for pdf in it:
            h = pdf[hash_col].to_numpy(dtype=np.int64)
            out = np.zeros(len(h), dtype=bool)
            buckets = _bucket_of(h, n_buckets)
            for b in np.unique(buckets):
                b = int(b)
                if b not in cache:
                    cache[b] = st.load_bucket(b, rid)
                mask = buckets == b
                out[mask] = cache[b].might_contain(h[mask])
            pdf = pdf.copy()
            pdf["__maybe_seen"] = out
            yield pdf

    return _prefiltered_anti_join(frontier, seen, prefilter, url_col, hash_col)


def _prefiltered_anti_join(
    frontier: DataFrame,
    seen: DataFrame,
    prefilter,
    url_col: str,
    hash_col: str,
) -> DataFrame:
    """The shared bloom-prefilter contract: ``prefilter`` (a mapInPandas
    function) tags each row ``__maybe_seen``; negatives bypass the join
    (a bloom has no false negatives), positives take the EXACT (hash,
    url) anti-join.  Single copy — both the broadcast-bloom and the
    bucket-partitioned paths must stay behaviorally identical to the
    plain left-anti baseline (tested bloom-on vs bloom-off)."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(frontier.schema.fields) + [T.StructField("__maybe_seen", T.BooleanType())]
    )
    seen_keys = seen.select(hash_col, url_col).dropDuplicates([hash_col, url_col])
    tagged = frontier.mapInPandas(prefilter, schema=out_schema)
    definitely_new = tagged.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    maybe = tagged.filter(F.col("__maybe_seen")).drop("__maybe_seen")
    survivors = maybe.join(seen_keys, on=[hash_col, url_col], how="left_anti")
    return definitely_new.unionByName(survivors)


def anti_join_seen(
    frontier: DataFrame,
    seen: DataFrame,
    url_col: str = "canon_url",
    hash_col: str = "url_hash",
    bloom: NumpyBloom | None = None,
) -> DataFrame:
    """Rows of ``frontier`` whose (hash, url) is absent from ``seen``.

    With a bloom: negatives bypass the join; positives take the exact
    anti-join.  Without: plain left-anti (the correctness baseline).
    """
    if bloom is None:
        seen_keys = seen.select(hash_col, url_col).dropDuplicates([hash_col, url_col])
        return frontier.join(seen_keys, on=[hash_col, url_col], how="left_anti")

    spark = frontier.sparkSession
    bc = spark.sparkContext.broadcast((bloom.words, bloom.m, bloom.k))

    def prefilter(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        words, m, k = bc.value
        bloom_local = NumpyBloom.from_state(words, m, k)
        for pdf in it:
            h = pdf[hash_col].to_numpy(dtype=np.int64)
            pdf = pdf.copy()
            pdf["__maybe_seen"] = bloom_local.might_contain(h)
            yield pdf

    return _prefiltered_anti_join(frontier, seen, prefilter, url_col, hash_col)
