"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every query in the catalog at the given sf dir, runs its oracle SQL
in DuckDB over the same parquet (tables registered as views), and
compares row count + column names + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from debgpt7_8_with_vectordb_spark.session import get_spark  # noqa: E402
from debgpt7_8_with_vectordb_spark.tables import TABLE_NAMES  # noqa: E402

TOL = 1e-6


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count spark={len(spark_pdf)} duck={len(duck_pdf)}")
    scols, dcols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if scols != dcols:
        problems.append(f"columns spark={scols} duck={dcols}")
        return problems
    if problems:
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        try:
            if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
                close = (
                    (sv.astype(float) - dv.astype(float)).abs() <= TOL
                ) | (sv.isna() & dv.isna())
                if not close.all():
                    bad = (~close).idxmax()
                    problems.append(
                        f"col {c}: value mismatch at sorted row {bad}: "
                        f"{sv[bad]!r} vs {dv[bad]!r}"
                    )
            else:
                eq = (sv == dv) | (sv.isna() & dv.isna())
                if not eq.all():
                    bad = (~eq).idxmax()
                    problems.append(
                        f"col {c}: value mismatch at sorted row {bad}: "
                        f"{sv[bad]!r} vs {dv[bad]!r}"
                    )
        except Exception as exc:  # dtype clash etc.
            problems.append(f"col {c}: compare error {exc}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from debgpt7_8_with_vectordb_spark.plans import QUERIES
    from debgpt7_8_with_vectordb_spark.plans.catalog import resolve_oracles

    # Handoff-artifact tokens resolve to corpus-keyed paths for THIS
    # sf_dir, so a concurrent run at another sf can't cross corpora.
    ORACLE = resolve_oracles(sf_dir)

    spark = get_spark(shuffle_partitions=8)
    con = duck_connection(sf_dir)
    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            failures += 1
            continue
        if name not in ORACLE:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(ORACLE[name]).fetchdf()
        except Exception as exc:
            print(f"FAIL  {name}: oracle error {exc}")
            failures += 1
            continue
        problems = compare(sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"OK    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
    spark.stop()
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
