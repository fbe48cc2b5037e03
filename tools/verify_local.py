"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given sf dir, then compares row count, column names, and
order-insensitive values (exact, like a value hash would). Reports
per-query PASS/FAIL with a diff sample — run this before every commit so
CORRECTNESS_r{N}.json holds no surprises.

Usage: python tools/verify_local.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from kafka_stream_service_spark.session import get_spark  # noqa: E402
from kafka_stream_service_spark.tables import TABLE_NAMES, table_path  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df[sorted(df.columns)].copy()

    def canon(v):
        if v is None:
            return "<null>"
        if isinstance(v, float):
            if math.isnan(v):
                return "<null>"
            return repr(v)  # exact double repr
        if isinstance(v, (list, tuple, dict)):
            # The driver's canonicalizer (pandas sort_values over all
            # columns) raises "unhashable type" on container cells — mimic
            # that hard failure so complex outputs never reach a round.
            raise TypeError(
                f"complex cell value {type(v).__name__} in output — serialize the "
                "column (array_join / to_json) on both Spark and oracle sides"
            )
        if isinstance(v, bytes):
            return v.hex()
        if hasattr(v, "tolist"):  # numpy arrays/scalars
            t = v.tolist()
            return canon(t)
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)

    for c in df.columns:
        df[c] = df[c].map(canon)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns: spark={sc} duck={dc}")
        return problems
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        neq = (a != b).any(axis=1)
        if neq.any():
            idx = neq.idxmax()
            n_bad = int(neq.sum())
            for c in a.columns:
                if a.loc[idx, c] != b.loc[idx, c]:
                    problems.append(
                        f"{n_bad} rows differ; first diff col={c!r}: "
                        f"spark={a.loc[idx, c]!r} duck={b.loc[idx, c]!r}"
                    )
                    break
    return problems


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = set(a for a in args if "/" not in a)

    spark = get_spark("verify_local")
    con = duck_connection(sf_dir)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    n_pass = n_fail = n_rows_only = 0
    t_all = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: SPARK ERROR\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in oracles:
            n_rows_only += 1
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL  {name}: DUCKDB ERROR\n{traceback.format_exc()}")
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            n_fail += 1
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
        else:
            n_pass += 1
            print(f"PASS  {name} ({len(sdf)} rows) [{time.time()-t0:.1f}s]")

    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
        f"[{time.time()-t_all:.0f}s total]"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
