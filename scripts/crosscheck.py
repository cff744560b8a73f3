#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/crosscheck.py <sfDir> <verifyOutDir> [jsonOut]

Reads each `<verifyOutDir>/<name>` parquet (written by graft.Verify), runs
the matching oracle SQL from `<verifyOutDir>/oracle_sql.json` in DuckDB with
every test table registered as a view, and compares row counts, column-name
sets, and (column-name-sorted) cell values. With `jsonOut`, also writes a
driver-shaped per-query artifact (rows/schema/hash match booleans + a
provenance stamp) — used for the committed larger-SF crosscheck records.
"""
import json
import math
import subprocess
import sys
from datetime import datetime, timezone

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append("NULL")
            elif isinstance(v, float):
                row.append(repr(v))
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


def main(sf_dir: str, out_dir: str, json_out: str = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single-file parquet; Spark-written derived
        # dirs (tools/ScaleData) are directories of part files
        path = f"{sf_dir}/{t}.parquet"
        import os
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        sel = "*"
        if t == "events":
            # ScaleData-derived dirs store ts as canonical epoch-nanos
            # LONG (the engine's own wire form via Tables.normalizeEventTs);
            # oracle SQL speaks epoch_ns(ts) over a timestamp, so surface
            # the long back as TIMESTAMP (values are µs-resolution, the
            # //1000 is lossless)
            typ = con.sql(f"SELECT typeof(ts) FROM '{path}' LIMIT 1").fetchone()[0]
            if typ == "BIGINT":
                sel = "* REPLACE (make_timestamp(ts // 1000) AS ts)"
        con.execute(f"CREATE VIEW {t} AS SELECT {sel} FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    report = {}

    def record(name, rows_match, schema_match, hash_match,
               spark_rows=None, oracle_rows=None, err=None):
        report[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err,
        }

    for name, sql in sorted(oracle.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            record(name, False, False, False, err=f"no spark output: {e}")
            failures += 1
            continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            record(name, False, False, False, err=f"oracle error: {e}")
            failures += 1
            continue
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            print(f"FAIL {name}: columns spark={sorted(spark_df.columns)} "
                  f"duck={sorted(duck_df.columns)}")
            record(name, len(spark_df) == len(duck_df), False, False,
                   len(spark_df), len(duck_df))
            failures += 1
            continue
        s, d = normalize(spark_df), normalize(duck_df)
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            record(name, False, True, False, len(s), len(d))
            failures += 1
        elif s != d:
            bad = next(i for i, (a, b) in enumerate(zip(s, d)) if a != b)
            print(f"FAIL {name}: values differ at sorted-row {bad}:\n"
                  f"  spark={s[bad]}\n  duck ={d[bad]}")
            record(name, True, True, False, len(s), len(d))
            failures += 1
        else:
            print(f"OK   {name}: {len(s)} rows")
            record(name, True, True, True, len(s), len(d))
    if json_out:
        try:
            commit = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True).stdout.strip()
        except Exception:
            commit = ""
        artifact = {
            "_meta": {
                "sf_dir": sf_dir, "queries": len(oracle),
                "failures": failures, "commit": commit,
                "generated_at": datetime.now(timezone.utc)
                .isoformat(timespec="seconds"),
            },
            **report,
        }
        with open(json_out, "w") as f:
            json.dump(artifact, f, indent=2)
        print(f"wrote {json_out}")
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
