"""N vs 4N scaling harness (the north-rule evidence).

Two measurements of the SAME bulk crawl job on the SAME input, only the
parallelism level changing:

**Primary — N vs 4N cores (local[1] vs local[4])**: this sandbox VM
(32 vCPU = 16 physical, HT) scales pure CPU linearly to ~8 concurrent
processes and flattens beyond.  A ``local[N]`` leg of this job keeps up
to ~2N cores busy, not N: every Arrow/pandas stage pipelines a JVM task
thread with its Python worker.  1 vs 4 cores therefore peaks at ~8
active cores — inside the host's linear window on BOTH legs — while
2 vs 8 pushes the 4N leg to ~16 active cores, the saturation edge,
and measures the host rather than the engine.  Each leg is pinned with
``taskset`` to exactly 2N vCPUs (same honesty fix as the cluster
workers: an unpinned JVM sizes its pools to the whole host and flatters
the N baseline).  Repeats are interleaved (1,4,1,4,…) so slow-host
windows hit both sizes equally.

**Secondary — 1 vs 4 executor JVMs (standalone cluster)**: one master +
four CPU-pinned 2-core worker daemons, job shipped with ``spark-submit
--py-files``; exercises cross-JVM broadcast/shuffle/commit paths the
thread-mode run cannot.  On this VM the pinned-vCPU runs inflate
per-task time at 4N (hypervisor co-scheduling; see BASELINE.md note),
so this is a correctness-of-distribution check, not the headline ratio.

Writes BENCH/BASELINE.md with throughput at both sizes for both
harnesses and the scaling efficiency = (rate_4N / rate_N) / 4 of the
primary, target ≥ 0.8.

Usage: python tools/scaling_bench.py [--pages 1000000] [--repeats 3]
       [--cluster-repeats 2] [--skip-cluster]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark  # noqa: E402

SPARK_HOME = os.path.dirname(os.path.abspath(pyspark.__file__))
SPARK_CLASS = os.path.join(SPARK_HOME, "bin", "spark-class")
SPARK_SUBMIT = os.path.join(SPARK_HOME, "bin", "spark-submit")
MASTER_URL = "spark://127.0.0.1:7077"
BENCH = os.path.join(REPO, ".bench")

# N = 1 executor, 4N = 4 executors (1 core each, worker daemon pinned
# to 2 vCPUs).  Why 1-core pinned executors: a 1-core executor's busy
# set is exactly 2 processes (the JVM task thread pipelined with its
# python worker), so pinning the worker to 2 vCPUs is density-neutral —
# the same honesty fix as the primary local legs (local[1] → 2 vCPUs).
# N = 2 pinned vCPUs, 4N = 8, BOTH inside this VM's linear CPU window
# (probe: 1→4 procs 4.00×, 1→8 procs 6.90×); the earlier 2-core-
# executor variants measured the host instead of the engine (unpinned:
# the 1-executor JVM sized its pools to the 32-vCPU host and flattered
# the baseline; pinned: 4 busy procs on 2 vCPUs = 2× oversubscription
# on both legs).  The executor count (the unit the north rule scales)
# still changes 1 → 4 with real separate JVMs.
N_WORKERS = 4
CORES_PER_WORKER = 1
VCPUS_PER_WORKER = 2
WORKER_MEM = "14g"
N_CORES = CORES_PER_WORKER          # N  = 1 executor
FOURN_CORES = 4 * CORES_PER_WORKER  # 4N = 4 executors


def _env() -> dict:
    env = dict(os.environ)
    env["SPARK_HOME"] = SPARK_HOME
    env.setdefault("SPARK_LOG_DIR", os.path.join(BENCH, "cluster-logs"))
    env["SPARK_NO_DAEMONIZE"] = "0"
    return env


def start_cluster() -> list:
    os.makedirs(os.path.join(BENCH, "cluster-logs"), exist_ok=True)
    procs = []
    mlog = open(os.path.join(BENCH, "cluster-logs", "master.log"), "w")
    procs.append(
        subprocess.Popen(
            [SPARK_CLASS, "org.apache.spark.deploy.master.Master",
             "--host", "127.0.0.1", "--port", "7077", "--webui-port", "8090"],
            stdout=mlog, stderr=subprocess.STDOUT, env=_env(),
        )
    )
    time.sleep(6)
    for i in range(N_WORKERS):
        wlog = open(os.path.join(BENCH, "cluster-logs", f"worker{i}.log"), "w")
        wdir = os.path.join(BENCH, f"worker{i}")
        os.makedirs(wdir, exist_ok=True)
        # Each worker daemon (and the executor JVM + python workers it
        # forks — affinity inherits) is pinned to its own VCPUS_PER_WORKER
        # vCPUs.  At 1 core/executor the busy set is 2 procs (task
        # thread + python worker), so a 2-vCPU pin is density-neutral —
        # identical to the primary legs' local[1]-on-2-vCPUs design.
        # The pinned JVM also sizes GC/shuffle pools to 2 procs instead
        # of the 32-vCPU host, stopping the unpinned-baseline leak.
        lo = i * VCPUS_PER_WORKER
        pin = ["taskset", "-c", f"{lo}-{lo + VCPUS_PER_WORKER - 1}"]
        procs.append(
            subprocess.Popen(
                pin + [SPARK_CLASS, "org.apache.spark.deploy.worker.Worker",
                 MASTER_URL, "--cores", str(CORES_PER_WORKER), "--memory", WORKER_MEM,
                 "--work-dir", wdir, "--webui-port", str(8191 + i)],
                stdout=wlog, stderr=subprocess.STDOUT, env=_env(),
            )
        )
    time.sleep(8)
    return procs


def stop_cluster(procs: list) -> None:
    for p in procs:
        p.terminate()
    for p in procs:
        try:
            p.wait(timeout=10)
        except Exception:
            p.kill()


def build_pyfiles_zip() -> str:
    zpath = os.path.join(BENCH, "newscrawler_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "newscrawler_spark")
        for root, _, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def _tree_mtime(paths: list) -> float:
    """Newest mtime under the watched dirs/glob patterns.  The store
    dirs alone are NOT a sufficient liveness channel (a healthy 1-core
    extract stage runs 300+ s before its first store write — the first
    r5 watchdog killed healthy submits on exactly that gap), so callers
    also watch the Spark scratch dirs (/tmp/blockmgr-*, /tmp/spark-*):
    shuffle blocks land there as individual TASKS complete, a
    near-continuous signal on any healthy stage, and one the parked
    driver of the AQE hang produces none of.  Bounded walk: scratch
    dirs hold O(shuffle partitions) files per stage."""
    import glob as _glob

    newest = 0.0
    roots: list = []
    for p in paths:
        if any(ch in p for ch in "*?["):
            roots.extend(_glob.glob(p))
        else:
            roots.append(p)
    for root in roots:
        if not os.path.isdir(root):
            continue
        for dirpath, _dirnames, filenames in os.walk(root):
            try:
                newest = max(newest, os.stat(dirpath).st_mtime)
                for fn in filenames:
                    newest = max(newest, os.stat(os.path.join(dirpath, fn)).st_mtime)
            except OSError:
                continue  # file vanished mid-walk (tmp-rename commits)
    return newest


def _run_with_liveness(cmd: list, env: dict, hard_timeout: int, idle_timeout: int, watch_dirs: list):
    """subprocess.run equivalent with a liveness watchdog: kill the
    child when stdout+stderr byte counts AND the watched store trees
    all stop changing for ``idle_timeout`` seconds while the process
    is still alive (the AQE-hang signature: driver parked, executors
    idle, nothing written anywhere), or at ``hard_timeout`` outright.
    Returns a CompletedProcess-shaped object with .stdout/.stderr."""
    import tempfile
    import time as _time

    with tempfile.TemporaryFile("w+") as fo, tempfile.TemporaryFile("w+") as fe:
        p = subprocess.Popen(cmd, stdout=fo, stderr=fe, env=env, text=True)
        start = last_activity = _time.time()
        last_sig = None
        while True:
            rc = p.poll()
            if rc is not None:
                break
            now = _time.time()
            sig = (
                os.fstat(fo.fileno()).st_size,
                os.fstat(fe.fileno()).st_size,
                _tree_mtime(watch_dirs),
            )
            if sig != last_sig:
                last_sig, last_activity = sig, now
            reason = None
            if now - start > hard_timeout:
                reason = f"hard timeout {hard_timeout}s"
            elif now - last_activity > idle_timeout:
                reason = f"liveness idle {idle_timeout}s (no stdout/stderr/store activity)"
            if reason:
                p.kill()
                p.wait()
                print(f"watchdog kill: {reason}", flush=True)
                raise subprocess.TimeoutExpired(cmd, hard_timeout, output=reason)
            _time.sleep(5)
        fo.seek(0)
        fe.seek(0)
        return subprocess.CompletedProcess(cmd, rc, fo.read(), fe.read())


def submit_crawl(total_cores: int, corpus: dict, warmup: dict, zpath: str, tag: str, n_pages: int = 1_000_000, extra_args: list | None = None, extra_conf: list | None = None) -> dict:
    store = os.path.join(BENCH, f"cluster_store_{tag}")
    cmd = [
        SPARK_SUBMIT,
        "--master", MASTER_URL,
        "--deploy-mode", "client",
        "--py-files", zpath,
        "--total-executor-cores", str(total_cores),
        "--executor-cores", str(CORES_PER_WORKER),
        "--executor-memory", "12g",
        "--driver-memory", "8g",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.adaptive.skewJoin.enabled=true",
        # identical logical layout at both sizes; only resources differ.
        # 4× the 4N core count: finer shuffle waves at 4 executors (a
        # 17-taskSec stage AQE-coalesced to 5 tasks ran 2 ragged waves on
        # 4 slots); serial-neutral at 1 executor.  The 4m advisory keeps
        # AQE from re-coalescing the small (≤50 MB) crawl shuffles back
        # below the slot count.
        "--conf", f"spark.sql.shuffle.partitions={FOURN_CORES * 4}",
        "--conf", "spark.sql.adaptive.advisoryPartitionSizeInBytes=4m",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        # wide rows (html ~12 KB): 2k-row Arrow batches keep per-task live
        # memory ~25 MB instead of 120 MB (GC pressure, measured)
        "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=2000",
        "--conf", "spark.sql.files.maxPartitionBytes=33554432",
        "--conf", "spark.locality.wait=0s",
        "--conf", "spark.executor.extraJavaOptions=-XX:+UseParallelGC",
        "--conf", "spark.driver.extraJavaOptions=-XX:+UseParallelGC",
        "--conf", "spark.ui.enabled=false",
        *[a for c in (extra_conf or []) for a in ("--conf", c)],
        os.path.join(REPO, "tools", "crawl_job.py"),
        "--pages", corpus["pages"],
        "--seeds", corpus["seeds"],
        "--store", store,
        "--bulk",
        "--bloom-expected", str(max(1_000_000, 2 * n_pages)),
        "--warmup-pages", warmup["pages"],
        "--warmup-seeds", warmup["seeds"],
        "--warmup-store", os.path.join(BENCH, f"cluster_warm_{tag}"),
        # The cluster harness runs the bucket co-partitioned fetch join
        # (prepare_bucketed_pages layout, unmeasured one-time setup) —
        # the >5M-admitted 100 TB shape: no driver-built broadcast of
        # the ~1M-row admitted relation.  Paired step-timed probes:
        # articles step 121 s (broadcast) → 80 s (bucketed) at 4
        # executors, identical at 1 — the broadcast build+torrent was
        # the non-scaling component cross-JVM.
        "--bucketed-pages", "16",
    ] + (extra_args or [])
    # Retries on hang: ~1 in 6 submits hits a known code-independent
    # AQE hang (driver parks in AdaptiveSparkPlanExec.withFinalPlanUpdate
    # after a stage completes, executors idle — see CLAUDE.md); a rerun
    # of the identical submit succeeds, so don't let one hang kill a
    # 40-minute multi-leg run.  Two layers:
    #   * liveness watchdog (idle_timeout, default 360 s): the job
    #     heartbeats on stdout (crawl_job HEARTBEAT lines), commits
    #     store files as steps finish, AND drops shuffle blocks into
    #     the Spark scratch dirs (/tmp/blockmgr-*, /tmp/spark-*) as
    #     every task completes — when ALL of stdout/stderr/store/
    #     scratch go idle while the process lives, that is the hang
    #     signature (parked driver, idle executors, zero writes) —
    #     kill + resubmit after one idle window instead of the full
    #     hard timeout.  The store dirs alone are NOT enough: a
    #     healthy 1-core extract stage writes no store files for
    #     300+ s (the first r5 watchdog killed healthy submits on
    #     that gap — hence the scratch-dir channel + 360 s window);
    #   * hard timeout (900 s ≈ 3× the slowest healthy leg) as the
    #     backstop for pathological-but-active runs.
    submit_timeout = int(os.environ.get("SPARK_GRAFT_SUBMIT_TIMEOUT", "900"))
    idle_timeout = int(os.environ.get("SPARK_GRAFT_SUBMIT_IDLE", "360"))
    watch = [
        store,
        os.path.join(BENCH, f"cluster_warm_{tag}"),
        store + "_bucketed_pages",
        "/tmp/blockmgr-*",
        "/tmp/spark-*",
    ]
    for attempt in (0, 1):
        try:
            out = _run_with_liveness(cmd, _env(), submit_timeout, idle_timeout, watch)
            break
        except subprocess.TimeoutExpired as e:
            if attempt == 1:
                raise
            print(f"submit (cores={total_cores}, tag={tag}) {e.args if e.args else ''} "
                  f"(sporadic AQE hang; idle={idle_timeout}s hard={submit_timeout}s) "
                  "— retrying once", flush=True)
    for line in out.stdout.splitlines():
        if line.startswith("CRAWL_RESULT "):
            return json.loads(line[len("CRAWL_RESULT "):])
    sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-5000:] + "\n")
    raise RuntimeError(f"no CRAWL_RESULT in submit output (cores={total_cores})")


def run_local_child(cores: int, pages: str, seeds: str, tag: str, n_pages: int = 1_000_000) -> None:
    """Child-process body for one local[cores] bulk measurement (fresh
    JVM per run; printed as one LOCAL_RESULT json line)."""
    import shutil
    import time as _t

    from newscrawler_spark.crawler import CrawlConfig, FrontierCrawler
    from newscrawler_spark.plans.storage import RoundStore
    from newscrawler_spark.session import get_spark
    from newscrawler_spark.sources.corpus import generate_corpus

    spark = get_spark(app_name=f"scale_local_{cores}", master=f"local[{cores}]",
                      shuffle_partitions=16)
    warm = generate_corpus(os.path.join(BENCH, "warmup"), n_pages=300, n_hosts=6)
    wstore = os.path.join(BENCH, f"local_warm_{tag}")
    shutil.rmtree(wstore, ignore_errors=True)
    FrontierCrawler(spark, warm["pages"], warm["seeds"], RoundStore(wstore),
                    CrawlConfig(max_rounds=2, round_budget=20, n_salts=4)).run(resume=False)

    store_dir = os.path.join(BENCH, f"local_store_{tag}")
    shutil.rmtree(store_dir, ignore_errors=True)
    cfg = CrawlConfig(
        max_rounds=1, round_budget=1_000_000_000, n_salts=8,
        bloom_expected=max(1_000_000, 2 * n_pages), cache_pages=False, repartition_fetched=False,
        broadcast_admitted_max=5_000_000, scalable_fetch_order=True,
    )
    crawler = FrontierCrawler(spark, pages, seeds, RoundStore(store_dir), cfg)
    t0 = _t.time()
    crawler.initialize(url_df=spark.read.parquet(pages).select("url"))
    totals = crawler.run(resume=True)
    wall = _t.time() - t0
    print("LOCAL_RESULT " + json.dumps(
        {"cores": cores, "urls": totals["fetched"], "urls_admitted": totals["seq"],
         "secs": round(wall, 2),
         "urls_per_sec": round(totals["fetched"] / wall, 1)}), flush=True)
    spark.stop()


def run_local(cores: int, corpus: dict, tag: str, n_pages: int = 1_000_000) -> dict:
    # Pin each leg to exactly 2×cores vCPUs (JVM task threads + their
    # pipelined python workers) — the same honesty fix the cluster
    # harness applies to its workers: an unpinned "local[1]" JVM sizes
    # GC/shuffle/codegen thread pools to the 32-vCPU HOST and leaks
    # extra effective cores into the N baseline, understating N→4N
    # efficiency.  Affinity inherits to the python workers.
    pin = ["taskset", "-c", f"0-{2 * cores - 1}"]
    out = subprocess.run(
        pin + [sys.executable, os.path.abspath(__file__), "--_child", str(cores),
         "--pages-path", corpus["pages"], "--seeds-path", corpus["seeds"],
         "--tag", tag, "--n-pages", str(n_pages)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("LOCAL_RESULT "):
            return json.loads(line[len("LOCAL_RESULT "):])
    sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
    raise RuntimeError(f"no LOCAL_RESULT (cores={cores})")


_PROBE_WORK = 3_000_000  # md5 chain length per probe process


def host_window_probe(repeats: int = 2) -> dict:
    """Same-window pure-CPU achievable ratio for the 2-vs-8-vCPU leg
    pinning.  The VM's CPU budget drifts between (and within) boot
    windows, and the drift is NOT always uniform across cpuset sizes —
    one observed window sped the 2-vCPU set up 10% while slowing the
    8-vCPU set 30%.  Probing the exact same cpusets the legs use, at
    bench time, turns the measured efficiency into a fraction of what
    this window's host can physically deliver."""
    code = (
        "import hashlib\nh = b'x'\n"
        f"for _ in range({_PROBE_WORK}): h = hashlib.md5(h).digest()"
    )
    rates: dict[int, float] = {}
    for procs in (2, 8):
        best = 0.0
        for _ in range(repeats):
            t0 = time.time()
            ps = [
                subprocess.Popen(
                    ["taskset", "-c", str(i), sys.executable, "-c", code],
                    stdout=subprocess.DEVNULL,
                )
                for i in range(procs)
            ]
            for p in ps:
                p.wait()
            best = max(best, procs * _PROBE_WORK / (time.time() - t0))
        rates[procs] = best
    return {
        "rate_2": round(rates[2], 0),
        "rate_8": round(rates[8], 0),
        "achievable": round((rates[8] / rates[2]) / 4, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=int(os.environ.get("SPARK_GRAFT_SCALE_PAGES", "1000000")))
    ap.add_argument("--hosts", type=int, default=int(os.environ.get("SPARK_GRAFT_BENCH_HOSTS", "80")))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cluster-repeats", type=int, default=2)
    ap.add_argument("--skip-cluster", action="store_true")
    ap.add_argument("--skip-local", action="store_true",
                    help="cluster legs only; reuse the local numbers in BENCH/local_results.json")
    ap.add_argument("--_child", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--pages-path", help=argparse.SUPPRESS)
    ap.add_argument("--seeds-path", help=argparse.SUPPRESS)
    ap.add_argument("--tag", help=argparse.SUPPRESS)
    ap.add_argument("--n-pages", type=int, default=1_000_000, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args._child is not None:
        run_local_child(args._child, args.pages_path, args.seeds_path, args.tag, args.n_pages)
        return

    # cheap cache/flag validation BEFORE the (minutes-long) corpus
    # generation: a bad --skip-local invocation must fail fast, not
    # after building a 1M-page corpus it will never use
    results_path = os.path.join(REPO, "BENCH", "local_results.json")
    if args.skip_local and not os.path.exists(results_path):
        sys.exit(
            f"--skip-local: no cached local results at {results_path}; "
            "run once without --skip-local first"
        )

    from newscrawler_spark.sources.corpus import generate_corpus

    corpus = generate_corpus(
        os.path.join(BENCH, f"corpus_{args.pages}"),
        n_pages=args.pages, n_hosts=args.hosts, seed=42, paras_range=(12, 22),
    )
    warmup = generate_corpus(os.path.join(BENCH, "warmup"), n_pages=300, n_hosts=6)

    # --- primary: N vs 4N cores in the host's linear window, interleaved
    local = {1: [], 4: []}
    if args.skip_local:
        with open(results_path) as f:
            saved = json.load(f)
        if "results" not in saved:  # legacy flat format: no metadata to validate
            print("WARNING: legacy local_results.json (no pages/ts metadata); "
                  "reused numbers may come from a different corpus size", flush=True)
            local = {int(k): v for k, v in saved.items()}
        else:
            if saved.get("pages") != args.pages:
                sys.exit(
                    f"--skip-local: cached local results are for pages={saved.get('pages')}, "
                    f"current invocation is pages={args.pages} — rerun without --skip-local"
                )
            age_h = (time.time() - saved.get("ts", 0)) / 3600
            if age_h > 24:
                print(f"WARNING: cached local results are {age_h:.1f}h old — "
                      "host speed drifts between VM windows; ratios vs fresh "
                      "cluster legs may be skewed", flush=True)
            local = {int(k): v for k, v in saved["results"].items()}
    else:
        for rep in range(args.repeats):
            for cores in (1, 4):
                r = run_local(cores, corpus, f"{cores}_{rep}", args.pages)
                local[cores].append(r)
                print(f"local[{cores}] rep={rep}: {r['urls_per_sec']} urls/s ({r['secs']}s)", flush=True)
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(results_path, "w") as f:
            json.dump({"pages": args.pages, "ts": time.time(), "results": local}, f)
    bl1 = max(local[1], key=lambda r: r["urls_per_sec"])
    bl4 = max(local[4], key=lambda r: r["urls_per_sec"])
    eff = (bl4["urls_per_sec"] / bl1["urls_per_sec"]) / 4

    # --- secondary: 1 vs 4 executor JVMs on the pinned standalone cluster
    cl = {N_CORES: [], FOURN_CORES: []}
    window = None
    if not args.skip_cluster:
        zpath = build_pyfiles_zip()
        # Fresh master+worker daemons PER LEG: repeated submits into one
        # long-lived cluster showed bimodal 4N legs (5.3k vs 7.0-8.2k
        # urls/s in one session) while back-to-back fresh-cluster legs
        # ran uniformly fast (3/3 at 7.0-8.1k, same window) — daemon or
        # work-dir state accumulated across apps, not host drift (the
        # same-window pure-CPU probe read 0.92 achievable).  ~12 s of
        # daemon start/stop per leg is outside the timed job.
        for rep in range(args.cluster_repeats):
            for cores in (N_CORES, FOURN_CORES):
                procs = start_cluster()
                try:
                    r = submit_crawl(cores, corpus, warmup, zpath, f"{cores}_{rep}", n_pages=args.pages)
                finally:
                    stop_cluster(procs)
                cl[cores].append(r)
                print(f"cluster cores={cores} rep={rep}: {r['urls_per_sec']} urls/s "
                      f"({r['secs']}s)", flush=True)
        window = host_window_probe()
        print(f"host window probe (2 vs 8 pinned vCPUs): {window}", flush=True)

    if cl[N_CORES]:
        bc2 = max(cl[N_CORES], key=lambda r: r["urls_per_sec"])
        bc8 = max(cl[FOURN_CORES], key=lambda r: r["urls_per_sec"])
        ceff = (bc8["urls_per_sec"] / bc2["urls_per_sec"]) / 4
        cluster_md = f"""
## Secondary: 1 vs 4 executor JVMs (standalone cluster)

Same job and input on a real standalone cluster — 1 master + {N_WORKERS}
worker daemons, 1 core per executor, each worker pinned to its own
{VCPUS_PER_WORKER} vCPUs (a 1-core executor's busy set is exactly 2
processes — the task thread pipelined with its python worker — so the
pin is density-neutral and both legs sit inside the host's linear CPU
window, the same methodology as the primary local legs); submitted
via `spark-submit --py-files newscrawler_spark.zip tools/crawl_job.py`.
The cluster job runs the bucket co-partitioned fetch join
(`prepare_bucketed_pages` layout, one-time unmeasured setup — the
Iceberg bucket-transform analog): the shape for admitted sets past
driver-broadcast size, where the step-timed probes showed the
driver-built broadcast (~1M-row admitted relation) as the articles
chain's non-scaling component cross-JVM (121 s → 80 s at 4 executors
with the bucketed join, identical at 1):

| cluster size | executors | urls | wall (s) | urls/sec |
|---|---|---|---|---|
| N  ({N_CORES} core)  | 1 × 1-core executor JVM | {bc2['urls']} | {bc2['secs']} | {bc2['urls_per_sec']} |
| 4N ({FOURN_CORES} cores) | 4 × 1-core executor JVMs | {bc8['urls']} | {bc8['secs']} | {bc8['urls_per_sec']} |

**Cross-JVM efficiency (4N vs N) = ({bc8['urls_per_sec']} /
{bc2['urls_per_sec']}) / 4 = {ceff:.2f}** (raw repeats
{json.dumps({str(k): [r['urls_per_sec'] for r in v] for k, v in cl.items()})}).
Same-window pure-CPU probe for these exact cpusets (2 vs 8 pinned
vCPUs, measured immediately after the legs): **{window['achievable']:.2f}**
(probe aggregate md5 rates: 2-proc {window['rate_2']:.0f}/s, 8-proc
{window['rate_8']:.0f}/s).  The probe is CONTEXT, not a precise
ceiling — the VM's CPU budget drifts asymmetrically across cpuset
sizes between windows, and measured efficiencies have exceeded the
probe's ratio in some windows (r4), so an efficiency-to-probe
normalization is not precision evidence; the ≥0.8 conclusion rests on
the disclosed raw repeats alone.
This secondary harness proves the same plans scale across separate
JVMs — cross-JVM torrent broadcast, disk shuffle files, per-JVM python
pools, real spark-submit packaging — at the same pinned-vCPU density
as the primary legs, so the two ratios are directly comparable.
"""
    else:
        # --skip-cluster: keep the previously recorded secondary section
        # (the local and cluster sections are refreshed independently;
        # each discloses its own raw repeats and code state).
        cluster_md = ""
        prev = os.path.join(REPO, "BENCH", "BASELINE.md")
        if os.path.exists(prev):
            text = open(prev).read()
            i = text.find("\n## Secondary:")
            if i != -1:
                # cut before the Data-scaling section (re-rendered from
                # BENCH/data_scaling.json) and the reference-baseline
                # bullet, else both would be duplicated on every
                # --skip-cluster regeneration
                ends = [
                    j
                    for j in (
                        text.find("\n## Data scaling", i),
                        text.find("\n- Reference baseline", i),
                    )
                    if j != -1
                ]
                cluster_md = text[i : min(ends)] if ends else text[i:]

    # Data-scaling section: written by tools/data_scaling_probe.py into
    # BENCH/data_scaling.json; rendered here so regeneration keeps it.
    data_md = ""
    ds_path = os.path.join(REPO, "BENCH", "data_scaling.json")
    if os.path.exists(ds_path):
        with open(ds_path) as f:
            ds = json.load(f)
        lo, hi = (str(n) for n in ds["sizes"])
        data_md = f"""
## Data scaling: same 4 executors, input doubled

Fixed resources (4 × 1-core pinned executors, same harness as the
secondary legs), input grown {int(hi) // int(lo)}×: wall must grow
linearly or a shuffle/skew/driver structure is growing faster than
the data.  Interleaved repeats, best per size:

| input (pages) | urls | wall (s) | urls/sec |
|---|---|---|---|
| {lo} | {ds["best"][lo]["urls"]} | {ds["best"][lo]["secs"]} | {ds["best"][lo]["urls_per_sec"]} |
| {hi} | {ds["best"][hi]["urls"]} | {ds["best"][hi]["secs"]} | {ds["best"][hi]["urls_per_sec"]} |

**Wall ratio {ds["wall_ratio"]}× for {int(hi) // int(lo)}× the input —
linearity {ds["linearity"]} (1.0 = perfectly linear; < 1.0 =
fixed per-job overhead amortizing).**  Raw walls: {ds["raw_secs"]}.
Reproduce: `python tools/data_scaling_probe.py`.
"""

    md = f"""# BENCH/BASELINE — N vs 4N scaling (north-rule evidence)

Identical bulk-crawl job, identical {args.pages}-page input, only the
parallelism level changes.

## Primary: N = 1 core vs 4N = 4 cores (host linear window)

Pure-CPU probe on this VM (32 vCPU = 16 physical, HT): 1→2 procs 2.03×,
1→4 procs 4.00×, 1→8 procs 6.90× (eff 0.86), 1→16 procs 10.7× (0.67).
An Arrow/pandas stage pipelines each JVM task thread with a Python
worker, so a `local[N]` leg needs ~2N cores — each leg is PINNED with
`taskset` to exactly 2N vCPUs (N=1 → 2 vCPUs, 4N → 8 vCPUs), keeping
BOTH legs inside the probe's linear window AND stopping the unpinned-N
leak (a JVM given the whole host sizes GC/shuffle pools to 32 vCPUs
and flatters the N baseline); a 2-vs-8 window would put the 4N leg at
~16 active processes where the HOST alone caps the ratio at 0.67-0.86.
Fresh JVM per run, repeats interleaved (1,4,1,4,…), best of
{args.repeats}:

| size | urls fetched+extracted | wall (s) | urls/sec |
|---|---|---|---|
| N  (local[1]) | {bl1['urls']} | {bl1['secs']} | {bl1['urls_per_sec']} |
| 4N (local[4]) | {bl4['urls']} | {bl4['secs']} | {bl4['urls_per_sec']} |

**Scaling efficiency (4N vs N) = ({bl4['urls_per_sec']} / {bl1['urls_per_sec']}) / 4 =
{eff:.2f}** (target ≥ 0.8).  Per-interleaved-pair ratios:
{", ".join(f"rep{i} {(p4['urls_per_sec'] / p1['urls_per_sec']) / 4:.2f}" for i, (p1, p4) in enumerate(zip(local[1], local[4])))}
— best-of pairs the fastest window per side; the per-pair view shows
whether the conclusion depends on the window choice.

Host context for this window: a boot-time pure-CPU probe at the same
process counts read (6.90x / 2.03x) / 4 = **0.85**, but the probe
under-predicts some windows (r4 measured 0.99 against it), so it is
context, not a ceiling — the ≥0.8 conclusion rests on the disclosed
raw repeats, not on an efficiency-to-probe normalization.

- Raw repeats (urls/sec): {json.dumps({str(k): [r['urls_per_sec'] for r in v] for k, v in local.items()})}
- Input: {args.pages}-page synthetic Common-Crawl-style corpus (seed=42,
  article-sized pages ~12 KB, hot host ≈ 33% of pages); one bulk
  frontier round seeding the full URL list (the reference's CSV batch
  shape, batch_processor.py:65-93) — canonicalize → robots (pushdown-
  pruned dim) → broadcast fetch join (pages side never shuffles) →
  byte-identical extraction → link discovery/dedup → checkpointed
  writes, bloom seen-set on.
- Plan levers that made the ratio (see PLANS.md): broadcast of the
  admitted keys instead of a pages-side shuffle; In-pushdown robots dim
  scan; two-pass range-partitioned fetch-seq assignment (no single-
  partition window); Arrow 2k-row batches.
{cluster_md}{data_md}
- Reference baseline (BASELINE.md): 5.1 articles/sec at 20 threads,
  thread-scaling efficiency 0.32.  This engine at N (1 core) runs
  {bl1['urls_per_sec'] / 5.1:.0f}× the reference's best throughput.

Reproduce: `python tools/scaling_bench.py`
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
