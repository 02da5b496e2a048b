"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at the given sf_dir, runs the matching
``oracle_sql()`` in DuckDB over the same parquet views, and compares
row-count, column names, and order-insensitive values (sorted by all
columns). Queries without an oracle get a rows-only check.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_df(result) -> pd.DataFrame:
    import pyarrow as pa
    try:
        import ray.data
        if isinstance(result, ray.data.Dataset):
            return result.to_pandas()
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    if len(ray_df) != len(sql_df):
        return f"ROWS MISMATCH ray={len(ray_df)} sql={len(sql_df)}"
    a, b = canon(ray_df.copy()), canon(sql_df.copy())
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH ray={list(a.columns)} sql={list(b.columns)}"
    hash_ok = True
    for c in a.columns:
        av, bv = a[c], b[c]
        # strict: exact match after canon round-6 — emulates the driver's
        # value hash (round 1 lesson: isclose-tolerant check passed while
        # the driver hash failed on last-ulp float sums)
        strict = av.astype(str).tolist() == bv.astype(str).tolist()
        if not strict:
            hash_ok = False
        if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
            ok = all(
                (pd.isna(x) and pd.isna(y)) or
                (not pd.isna(x) and not pd.isna(y) and
                 math.isclose(float(x), float(y), rel_tol=1e-6, abs_tol=1e-6))
                for x, y in zip(av, bv))
        else:
            ok = strict
        if not ok:
            diff = [(i, x, y) for i, (x, y) in enumerate(zip(av, bv))
                    if str(x) != str(y)][:3]
            return f"VALUES MISMATCH col={c} first={diff}"
    if not hash_ok:
        bad = [c for c in a.columns
               if a[c].astype(str).tolist() != b[c].astype(str).tolist()]
        diffs = []
        for c in bad[:1]:
            diffs = [(i, x, y) for i, (x, y)
                     in enumerate(zip(a[c], b[c])) if str(x) != str(y)][:3]
        return f"HASH MISMATCH cols={bad} first={diffs}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e
    qs, oracles = e.queries(), e.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_df(fn(sf_dir))
        except Exception as exc:
            print(f"{name:32s} QUERY ERROR: {type(exc).__name__}: {exc}")
            failures += 1
            continue
        if name in oracles:
            try:
                sql_df = con.execute(oracles[name]).df()
            except Exception as exc:
                print(f"{name:32s} ORACLE ERROR: {exc}")
                failures += 1
                continue
            verdict = compare(name, ray_df, sql_df)
        else:
            verdict = f"rows-only: {len(ray_df)} rows"
        status = (verdict if verdict.startswith(("OK", "rows-only"))
                  else f"FAIL {verdict}")
        if verdict.startswith("HASH MISMATCH"):
            status = f"HASHFAIL {verdict}"
        if status.startswith(("FAIL", "HASHFAIL")):
            failures += 1
        print(f"{name:32s} {status}")

    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
