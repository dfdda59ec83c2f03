"""Local stand-in for the driver's correctness gate.

Runs every queries() entry at sf0.01 in Spark, runs the matching
oracle_sql() in DuckDB against the same parquet files, compares
(row count, column names, order-insensitive values).

Usage: python tools/check_correctness.py [key ...]
       python tools/check_correctness.py --json CORRECTNESS_local_rN.json
       CHECK_SF_DIR=/root/testdata/sf0.1 python tools/check_correctness.py \
           neardup_minhash simhash_pairs ...   # second-scale value check
           # (r5: caps and q/bits laddering are scale-dependent — the
           # sf0.01 oracle never exercises the regimes the bench runs)

--json writes the full per-key result as a checked-in artifact so the
rounds where the driver's frozen key list lags the registry still have
visible, regression-diffable coverage for every registered query
(VERDICT r3 "what's wrong" #1). tests/test_correctness_coverage.py
gates on it: a registered query missing from BOTH the newest driver
artifact and the newest local artifact fails CI.
"""

from __future__ import annotations

import json
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from opentelemetry_collector_spark.session import get_spark

import os

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
    return df.sort_values(list(df.columns), ignore_index=True).fillna("∅NULL")


TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main(keys: list[str]) -> int:
    json_path = None
    if "--json" in keys:
        i = keys.index("--json")
        json_path = keys[i + 1] if i + 1 < len(keys) else "CORRECTNESS_local.json"
        keys = keys[:i] + keys[i + 2:]
    results: dict[str, dict] = {}
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:  # mirror the driver's pre-registered views
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # oracle keys that don't match any registered query are dead weight
    # (or typos) — surface them loudly
    orphans = sorted(set(oracles) - set(qs))
    if orphans:
        print(f"WARNING: oracle_sql keys with no queries() entry: {orphans}")
    keys = keys or list(qs)
    failed = []
    for k in keys:
        try:
            got = normalize(qs[k](spark, SF_DIR).toPandas())
            if k not in oracles:
                results[k] = {"match": "rows_only", "rows": len(got)}
                print(f"{k}: rows-only check, {len(got)} rows")
                continue
            want = normalize(con.sql(oracles[k]).df())
            if list(got.columns) != list(want.columns):
                failed.append(k)
                results[k] = {"match": "column_mismatch", "rows": len(got)}
                print(f"{k}: COLUMN MISMATCH spark={list(got.columns)} oracle={list(want.columns)}")
                continue
            if len(got) != len(want):
                failed.append(k)
                results[k] = {"match": "rowcount_mismatch", "rows": len(got)}
                print(f"{k}: ROWCOUNT MISMATCH spark={len(got)} oracle={len(want)}")
                continue
            eq = got.values == want.values
            if not eq.all():
                failed.append(k)
                results[k] = {"match": "value_mismatch", "rows": len(got)}
                import numpy as np

                bad = np.argwhere(~eq)[:5]
                print(f"{k}: VALUE MISMATCH at {len(np.argwhere(~eq))} cells; first:")
                for r, c in bad:
                    col = got.columns[c]
                    print(f"   row {r} col {col}: spark={got.iloc[r, c]!r} oracle={want.iloc[r, c]!r}")
                continue
            results[k] = {"match": "ok", "rows": len(got), "cols": len(got.columns)}
            print(f"{k}: OK ({len(got)} rows, {len(got.columns)} cols)")
        except Exception as e:  # noqa: BLE001
            failed.append(k)
            results[k] = {"match": "error", "error": f"{type(e).__name__}: {e}"}
            print(f"{k}: ERROR {type(e).__name__}: {e}")
        finally:
            # LSH/simhash/winnow queries persist fingerprint frames for
            # their own self-joins; 56 queries in one session would
            # otherwise accumulate them (same lifecycle rule bench.py
            # applies)
            spark.catalog.clearCache()
    # keys-vs-registry diff: the r2 driver file silently omitted 3
    # registered queries — a subset run must never read as full coverage
    missing = sorted(set(qs) - set(keys))
    if missing:
        print(f"\nNOT RUN ({len(missing)} registered queries): {missing}")
    print(
        f"\n{len(keys) - len(failed)}/{len(keys)} passed"
        + (f" ({len(qs)} registered)" if not missing else "")
    )
    if json_path:
        artifact = {
            "sf_dir": SF_DIR,
            "registered": len(qs),
            "checked": len(keys),
            "passed": len(keys) - len(failed),
            "not_run": missing,
            "results": results,
        }
        with open(json_path, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {json_path}")
    return 1 if failed or orphans else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
