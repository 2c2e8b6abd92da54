"""Local replica of the driver's correctness gate: run every
queries()[name] on Spark and its oracle_sql()[name] on DuckDB over the
same sf dir; compare row count, column names, and order-insensitive
values.  Usage: python tools/check_oracle.py [sf_dir] [only_query...]
"""

from __future__ import annotations

import math
import os
import sys
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            col = df[c]
            if getattr(col.dt, "tz", None) is not None:
                col = col.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = col.astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            import numpy as np

            # unwrap numpy scalars element-wise: under numpy>=2 the str
            # repr of np.float64 inside a tuple ('(np.float64(0.5),)')
            # differs from a python float's ('(0.5,)'), so a Spark list
            # column vs a DuckDB ndarray column would string-compare
            # unequal even with identical values
            def _plain(x):
                return x.item() if isinstance(x, np.generic) else x

            df[c] = df[c].apply(
                lambda v: tuple(_plain(x) for x in v)
                if isinstance(v, (list, tuple, np.ndarray))
                else _plain(v)
            )
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(a.columns) != sorted(b.columns):
        return [f"columns differ: spark={sorted(a.columns)} duck={sorted(b.columns)}"]
    if len(a) != len(b):
        errs.append(f"row count differs: spark={len(a)} duck={len(b)}")
        return errs
    a, b = normalize(a), normalize(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                av = av.astype(float)
                bv = bv.astype(float)
                bad = ~(
                    (av.isna() & bv.isna())
                    | (av == bv)
                )
                if bad.any():
                    diffs = (av[bad] - bv[bad]).abs()
                    errs.append(
                        f"col {c}: {bad.sum()} float mismatches, max abs diff "
                        f"{diffs.max():.3e}, first: spark={av[bad].iloc[0]!r} duck={bv[bad].iloc[0]!r}"
                    )
            else:
                eq = (av.astype(str).fillna("<NA>") == bv.astype(str).fillna("<NA>"))
                if not eq.all():
                    i = int((~eq).idxmax())
                    errs.append(
                        f"col {c}: {(~eq).sum()} mismatches, first at row {i}: "
                        f"spark={av.iloc[i]!r} duck={bv.iloc[i]!r}"
                    )
        except Exception as e:
            errs.append(f"col {c}: compare error {e}")
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from newscrawler_spark.session import get_spark

    spark = get_spark("oracle_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t)}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        unknown = only - set(qs)
        if unknown:
            # a typo'd filter must not report "0 fail" success after
            # checking nothing
            sys.exit(f"unknown query name(s): {sorted(unknown)}")
    n_pass = n_fail = n_rows_only = 0
    timings: list[tuple[str, float, float]] = []
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark query raised")
            traceback.print_exc()
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            # rows-only by design: the driver records a weaker
            # rows/schema check; no value comparison is possible
            timings.append((name, t_spark, 0.0))
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{t_spark:.1f}s]")
            n_rows_only += 1
            continue
        t1 = time.time()
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL  {name}: oracle SQL raised")
            traceback.print_exc()
            n_fail += 1
            continue
        t_duck = time.time() - t1
        timings.append((name, t_spark, t_duck))
        errs = compare(name, sdf, ddf)
        if errs:
            print(f"FAIL  {name} ({len(sdf)} vs {len(ddf)} rows)")
            for e in errs[:4]:
                print(f"      {e}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sdf)} rows [spark {t_spark:.1f}s, duck {t_duck:.1f}s]")
            n_pass += 1
    if len(timings) > 3:
        slow = sorted(timings, key=lambda t: -(t[1] + t[2]))[:8]
        total = sum(t[1] + t[2] for t in timings)
        print(f"\ntotal gate wall {total:.0f}s; slowest:")
        for name, ts, td in slow:
            print(f"  {name}: spark {ts:.1f}s + duck {td:.1f}s")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
