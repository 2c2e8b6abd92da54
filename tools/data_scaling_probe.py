"""Data-scaling probe: fixed resources (4 × 1-core executors on the
pinned standalone cluster), input doubled — 1M vs 2M pages.

The resource-scaling legs (scaling_bench.py) evidence the north rule's
two-cluster-size criterion; this probe evidences the OTHER axis a
100 TB deployment needs: wall time must grow ~linearly with input on
the same resources.  A superlinear blowup here would name a shuffle,
skew, or driver structure whose cost grows faster than the data
(e.g. a broadcast that stops fitting, a sort that starts spilling),
which per-size-ratio legs cannot see.

Legs are interleaved (1M, 2M, 1M, 2M) on one cluster so both sizes sit
in the same host window; best-of per size.  Linearity = (wall_2M /
wall_1M) / 2 — 1.0 is perfectly linear, < 1.0 means the bigger input
amortizes fixed overhead (expected: per-job driver/AQE time is
input-independent).

Usage: python tools/data_scaling_probe.py [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import scaling_bench as sb  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--sizes", default="1000000,2000000")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from newscrawler_spark.sources.corpus import generate_corpus

    corpora = {
        n: generate_corpus(
            os.path.join(sb.BENCH, f"corpus_{n}"),
            n_pages=n, n_hosts=80, seed=42, paras_range=(12, 22),
        )
        for n in sizes
    }
    warmup = generate_corpus(os.path.join(sb.BENCH, "warmup"), n_pages=300, n_hosts=6)

    zpath = sb.build_pyfiles_zip()
    procs = sb.start_cluster()
    runs: dict[int, list] = {n: [] for n in sizes}
    try:
        for rep in range(args.repeats):
            for n in sizes:
                r = sb.submit_crawl(
                    sb.FOURN_CORES, corpora[n], warmup, zpath,
                    f"data_{n}_{rep}", n_pages=n,
                )
                runs[n].append(r)
                print(f"pages={n} rep={rep}: {r['urls_per_sec']} urls/s "
                      f"({r['secs']}s, init {r.get('init_secs')}s)", flush=True)
    finally:
        sb.stop_cluster(procs)

    best = {n: max(runs[n], key=lambda r: r["urls_per_sec"]) for n in sizes}
    lo, hi = sizes[0], sizes[-1]
    ratio = best[hi]["secs"] / best[lo]["secs"]
    linearity = ratio / (hi / lo)
    out = {
        "executors": 4,
        "sizes": sizes,
        "best": {str(n): best[n] for n in sizes},
        "raw_secs": {str(n): [r["secs"] for r in runs[n]] for n in sizes},
        "wall_ratio": round(ratio, 3),
        "linearity": round(linearity, 3),
    }
    print("DATA_SCALING " + json.dumps(out))


if __name__ == "__main__":
    main()
