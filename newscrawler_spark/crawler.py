"""Batched frontier-expansion crawler — the Spark rebuild of the
reference's scheduler/worker pipeline.

The reference runs a poll loop popping jobs from a heap into worker
threads (``src/scrapers/scheduler.py:324-456``) and a thread-pool batch
processor (``src/utils/batch_processor.py:95-146``).  Here the whole
crawl is a driver loop of deterministic *rounds*; one round is a single
declarative DataFrame job:

    frontier ──anti-join──▶ unseen ──⋈ robots (broadcast)──▶ allowed
        ──politeness window (salted two-phase)──▶ admitted │ deferred
        ──⋈ pages (the "fetch" join)──▶ fetched │ missing
        ──mapInPandas extract──▶ articles + discovered links
        ──▶ next frontier = deferred ∪ links (lexicographic-min dedup)

Everything durable goes through ``RoundStore`` (atomic per-round
commits, exact resume).  Frontier state is re-read from the store each
round, which also truncates Spark lineage across rounds.

Scale shape (10^10 frontier, 1000 executors):
  * the anti-join input is cut by the broadcast bloom (operators/seen);
  * the politeness window is salted two-phase (operators/politeness) so
    a hot host cannot serialize a stage;
  * the admitted set is budget-bounded (hosts × budget), so the fetch
    join broadcasts the admitted side against the bucketed pages table
    — the 100 TB side never shuffles;
  * per-round outputs append as new partitions; nothing rewrites old
    rounds.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions.canonical import with_canonical
from .functions.extract import extract_batch
from .functions.robots import parse_robots, robots_filter_map_in_pandas, rules_to_json
from .operators.politeness import admit_per_host, global_fetch_order
from .operators.seen import anti_join_seen, build_bloom
from .plans.storage import RoundStore
from .sources.corpus import robots_body_of

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("canon_url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("discovered_round", T.IntegerType(), False),
    ]
)

SEEN_SCHEMA = "url_hash long, canon_url string, host string, round_id int, status string"


@dataclass(frozen=True)
class CrawlConfig:
    max_rounds: int = 10
    round_budget: int = 10          # politeness tokens per host per round
    default_priority: int = 2       # priority of discovered links (ref: MEDIUM)
    min_content_len: int = 40       # ref min-content gate (newspaper_scraper.py:39)
    max_links_per_page: int = 100   # ref link cap (scraper_gui.py:483-486)
    n_salts: int = 8
    use_bloom: bool = True
    bloom_fpp: float = 1e-3
    respect_robots: bool = True
    broadcast_admitted_max: int = 2_000_000  # rows; beyond → shuffle join


class FrontierCrawler:
    def __init__(
        self,
        spark: SparkSession,
        pages_path: str,
        seeds_path: str,
        store: RoundStore,
        config: CrawlConfig = CrawlConfig(),
    ):
        self.spark = spark
        self.config = config
        self.store = store
        self.pages = with_canonical(
            spark.read.parquet(pages_path), "url"
        ).select(
            F.col("canon_url").alias("page_url"),
            F.col("url_hash").alias("page_hash"),
            "warc_ts",
            "html",
            F.col("text").alias("ground_text"),
            "lang",
        )
        self.seeds_path = seeds_path
        self.robots_dim = self._build_robots_dim()

    # ------------------------------------------------------------------
    def _build_robots_dim(self) -> DataFrame:
        """Per-host robots rules + crawl delay, as a broadcastable dim.

        Robots bodies are ordinary pages at https://{host}/robots.txt
        (reference fetches+caches them per domain, robots_cache.py:64-91).
        One row per host — at millions of hosts this stays a dim table;
        past broadcast size it degrades to an ordinary shuffle join on
        ``host`` with no code change (Catalyst/AQE picks).
        """
        robots_rows = (
            self.pages.filter(F.col("page_url").endswith("/robots.txt"))
            .select("page_url", "html")
            .collect()
        )
        out = []
        for row in robots_rows:
            host = row["page_url"].split("://", 1)[1].split("/", 1)[0]
            parsed = parse_robots(robots_body_of(bytes(row["html"])))
            out.append((host, rules_to_json(parsed), parsed["delay"]))
        schema = "host string, robots_rules string, robots_delay double"
        if not out:
            return self.spark.createDataFrame([], schema)
        return self.spark.createDataFrame(out, schema)

    # ------------------------------------------------------------------
    def initialize(self) -> None:
        """Seed the frontier from active sources (ref scheduler.py:516-524)."""
        seeds = self.spark.read.parquet(self.seeds_path)
        frontier0 = (
            with_canonical(seeds.filter(F.col("active")), "base_url")
            .select(
                "canon_url",
                "url_hash",
                "host",
                F.col("priority").cast("int").alias("priority"),
                F.lit(0).cast("int").alias("discovered_round"),
            )
            .dropDuplicates(["url_hash", "canon_url"])
        )
        self.store.write_round("frontier", -1, frontier0)
        self.store.commit_round(-1, {"initialized": True})

    # ------------------------------------------------------------------
    def run(self, resume: bool = True) -> dict:
        """Run rounds until the frontier drains or max_rounds is hit."""
        last = self.store.last_committed_round()
        if last < -1 or not resume:
            self.initialize()
            last = -1
        else:
            self.store.rollback_uncommitted(last)
            if last == -1 and self.store.read_round(self.spark, "frontier", -1) is None:
                self.initialize()
        totals = {"fetched": 0, "rounds": 0}
        seq_offset = 0
        for r in range(last + 1):
            man = self.store.manifest(r) if r >= 0 else {}
            seq_offset += man.get("admitted", 0)
            totals["fetched"] += man.get("extracted", 0) + man.get("short", 0)
            totals["rounds"] += 1
        for r in range(last + 1, self.config.max_rounds):
            frontier = self.store.read_round(self.spark, "frontier", r - 1)
            if frontier is None or frontier.isEmpty():
                break
            stats = self.run_round(r, frontier, seq_offset)
            seq_offset += stats["admitted"]
            totals["fetched"] += stats["extracted"] + stats["short"]
            totals["rounds"] += 1
            if stats["next_frontier"] == 0:
                break
        totals["seq"] = seq_offset
        return totals

    # ------------------------------------------------------------------
    def run_round(self, round_id: int, frontier: DataFrame, seq_offset: int) -> dict:
        cfg = self.config
        t0 = time.time()

        # 1. URL-seen anti-join (bloom prefilter + exact fallback)
        seen = self.store.read_rounds(self.spark, "seen", upto=round_id - 1)
        if seen is not None:
            bloom = None
            if cfg.use_bloom:
                expected = sum(
                    self.store.manifest(r).get("seen_delta", 0)
                    for r in range(round_id)
                )
                bloom = build_bloom(seen, "url_hash", expected, cfg.bloom_fpp)
            candidates = anti_join_seen(frontier, seen, "canon_url", "url_hash", bloom)
        else:
            candidates = frontier

        # 2. robots gate (broadcast dim join + vectorized rule eval)
        with_rules = candidates.join(
            F.broadcast(self.robots_dim), on="host", how="left"
        )
        if cfg.respect_robots:
            rules_schema = T.StructType(
                list(with_rules.schema.fields)
                + [T.StructField("allowed", T.BooleanType(), False)]
            )
            evaluated = with_rules.mapInPandas(
                robots_filter_map_in_pandas, schema=rules_schema
            ).persist()
            denied = evaluated.filter(~F.col("allowed"))
            allowed = evaluated.filter(F.col("allowed"))
        else:
            evaluated = with_rules.persist()
            denied = evaluated.limit(0)
            allowed = evaluated

        # 3. politeness budgets: tokens per host per round (T3 analog)
        allowed = allowed.withColumn(
            "host_budget",
            F.greatest(
                F.lit(1),
                (F.lit(cfg.round_budget) / F.greatest(F.coalesce("robots_delay", F.lit(1.0)), F.lit(1.0)))
                .cast("int"),
            ),
        )
        admitted, deferred = admit_per_host(allowed, "host_budget", cfg.n_salts)
        admitted = global_fetch_order(admitted, seq_offset).persist()
        n_admitted = admitted.count()

        # 4. the "fetch" join — frontier side is budget-bounded, so
        # broadcast it against the big pages table when small enough.
        adm = admitted.select(
            "canon_url", "url_hash", "host", "priority", "discovered_round", "fetch_seq"
        )
        probe = F.broadcast(adm) if n_admitted <= cfg.broadcast_admitted_max else adm
        fetched = probe.join(
            self.pages,
            on=[adm.url_hash == self.pages.page_hash, adm.canon_url == self.pages.page_url],
            how="left",
        ).drop("page_url", "page_hash")

        # 5. extraction (vectorized, byte-identical contract)
        ext_schema = T.StructType(
            [f for f in fetched.schema.fields if f.name not in ("html", "ground_text")]
            + [
                T.StructField("title", T.StringType()),
                T.StructField("text", T.StringType()),
                T.StructField("out_links", T.ArrayType(T.StringType())),
                T.StructField("authors", T.ArrayType(T.StringType())),
                T.StructField("published", T.StringType()),
                T.StructField("partition_id", T.IntegerType()),
            ]
        )

        def extract_part(it):
            import pandas as pd
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId() if TaskContext.get() else -1
            for pdf in it:
                ext = extract_batch(pdf["canon_url"], pdf["html"])
                keep = pdf.drop(columns=["html", "ground_text"]).reset_index(drop=True)
                out = pd.concat([keep, ext], axis=1)
                out.loc[pdf["html"].isna().to_numpy(), ["title", "text"]] = None
                out["partition_id"] = pid
                yield out

        extracted = fetched.mapInPandas(extract_part, schema=ext_schema).persist()

        missing = extracted.filter(F.col("warc_ts").isNull())
        present = extracted.filter(F.col("warc_ts").isNotNull())
        articles = present.filter(F.length("text") >= cfg.min_content_len)
        short = present.filter(F.length("text") < cfg.min_content_len)

        # 6. article rows (A7 quality score as pure column arithmetic,
        #    ref base_scraper.py:69-117 weights 30/30/20/20)
        quality = F.round(
            0.3 * F.least(F.length("text") / 1000.0, F.lit(1.0))
            + 0.3
            * (
                0.5 * F.when(F.size("authors") > 0, 1.0).otherwise(0.0)
                + 0.5 * F.when(F.col("published").isNotNull(), 1.0).otherwise(0.0)
            )
            + 0.2 * F.least(F.length("title") / 50.0, F.lit(1.0)),
            6,
        )
        article_rows = articles.select(
            F.col("canon_url").alias("url"),
            "url_hash",
            F.col("host").alias("source_domain"),
            "title",
            "text",
            F.col("authors"),
            F.to_timestamp("published").alias("published_date"),
            quality.alias("quality_score"),
            "lang",
            F.lit(round_id).alias("round_id"),
            "fetch_seq",
        )

        # 7. discovered links → next frontier (U1 union + lexicographic-
        #    min dedup, the batch analog of pushing dup jobs on the heap)
        links = present.select(
            F.explode(F.slice("out_links", 1, cfg.max_links_per_page)).alias("canon_url")
        )
        links = (
            with_canonical(links, "canon_url")
            .select(
                "canon_url",
                "url_hash",
                "host",
                F.lit(cfg.default_priority).cast("int").alias("priority"),
                F.lit(round_id + 1).cast("int").alias("discovered_round"),
            )
        )
        deferred_rows = deferred.select(
            "canon_url", "url_hash", "host", "priority", "discovered_round"
        )
        next_frontier = (
            deferred_rows.unionByName(links)
            .groupBy("url_hash", "canon_url", "host")
            .agg(F.min(F.struct("priority", "discovered_round")).alias("k"))
            .select(
                "canon_url",
                "url_hash",
                "host",
                F.col("k.priority").alias("priority"),
                F.col("k.discovered_round").alias("discovered_round"),
            )
        )

        # 8. seen delta: every terminal URL this round
        status = (
            F.when(F.col("warc_ts").isNull(), "missing")
            .when(F.length("text") >= cfg.min_content_len, "fetched")
            .otherwise("short")
        )
        seen_delta = extracted.select(
            "url_hash",
            "canon_url",
            "host",
            F.lit(round_id).alias("round_id"),
            status.alias("status"),
        ).unionByName(
            denied.select(
                "url_hash",
                "canon_url",
                "host",
                F.lit(round_id).alias("round_id"),
                F.lit("robots_denied").alias("status"),
            )
        )

        # 9. per-partition lineage + per-status metrics (CrawlLog analog)
        logs = (
            extracted.groupBy("partition_id", status.alias("status"))
            .agg(
                F.count("*").alias("n_urls"),
                F.count("out_links").alias("n_pages_with_links"),
                F.sum(F.size(F.coalesce("out_links", F.array()))).alias("links_discovered"),
            )
            .withColumn("round_id", F.lit(round_id))
            .withColumn("host_bucket", F.lit(None).cast("int"))
        )

        # 10. persist round (atomic commit at the end)
        self.store.write_round("articles", round_id, article_rows)
        self.store.write_round("order", round_id, admitted.select(
            F.col("canon_url").alias("url"), "url_hash", "fetch_seq", "priority",
            "discovered_round", "host",
        ))
        self.store.write_round("seen", round_id, seen_delta)
        self.store.write_round("crawl_logs", round_id, logs)
        self.store.write_round("frontier", round_id, next_frontier)

        stats = {
            "admitted": n_admitted,
            "extracted": articles.count(),
            "short": short.count(),
            "missing": missing.count(),
            "robots_denied": denied.count(),
            "deferred": deferred.count(),
            "seen_delta": seen_delta.count(),
            "next_frontier": self.store.read_round(self.spark, "frontier", round_id).count(),
            "wall_secs": round(time.time() - t0, 3),
        }
        self.store.commit_round(round_id, stats)
        admitted.unpersist()
        extracted.unpersist()
        evaluated.unpersist()
        return stats
