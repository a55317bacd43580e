#!/usr/bin/env python3
"""Dev-only mirror of the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Registers every parquet table in sfDir under its bare name, runs each
SQL from <verifyOutDir>/oracle_sql.json, and compares against the
Spark result parquet written by graft.Verify. Comparison: sort columns
by name, sort rows by all columns, compare cell-by-cell (exact for
non-floats; 1e-9 relative tolerance for floats, since Spark and DuckDB
may sum doubles in different orders).

Driver-exactness rules (r10 lesson — q_gold_weekly shipped red):
  * Any HUGEINT/UHUGEINT column in the ORACLE result is an immediate
    failure: Spark has no int128, so the driver's hash can never match
    even when every value is equal (DuckDB sums BIGINT into HUGEINT;
    cast the oracle aggregate back to BIGINT). fetchdf() silently
    renders HUGEINT as float64, which is how the old tolerance-based
    compare false-greened it.
  * Columns that are integer-typed in DuckDB on BOTH sides compare
    exactly, even when pandas coerces them to float64 (nullable ints);
    the float tolerance applies only to genuine floating columns.

This is a local feedback loop only — NOT part of the library.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
INT128_TYPES = {"HUGEINT", "UHUGEINT"}


def duck_types(con, sql):
    """Column-name → DuckDB type string for a query, without fetching."""
    rel = con.sql(sql)
    return dict(zip(rel.columns, (str(t) for t in rel.types)))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    failures = 0
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"[FAIL] {name}: no spark result dir")
            failures += 1
            continue
        try:
            wtypes = duck_types(con, sql)
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            failures += 1
            continue
        spark_sql = f"SELECT * FROM '{res_dir}/*.parquet'"
        gtypes = duck_types(con, spark_sql)
        got = con.execute(spark_sql).fetchdf()
        # int128 never matches the driver's int64 hash encoding even for
        # equal values — fail loudly before any value compare.
        drifted = [c for c, t in wtypes.items() if t in INT128_TYPES]
        if drifted:
            print(f"[FAIL] {name}: oracle column(s) {drifted} are HUGEINT — "
                  f"Spark emits int64, driver hash can never match; "
                  f"CAST the oracle aggregate AS BIGINT")
            failures += 1
            continue
        # integer-on-both-sides columns compare exactly (no tolerance),
        # even when pandas renders them as float64 because of NULLs.
        int_cols = {c for c, t in wtypes.items()
                    if t in INT_TYPES and gtypes.get(c) in INT_TYPES}
        wcols, gcols = sorted(want.columns), sorted(got.columns)
        if wcols != gcols:
            print(f"[FAIL] {name}: columns differ\n  oracle: {wcols}\n  spark:  {gcols}")
            failures += 1
            continue
        if len(want) != len(got):
            print(f"[FAIL] {name}: row count {len(want)} (oracle) vs {len(got)} (spark)")
            failures += 1
            continue
        w = want[wcols].sort_values(wcols, ignore_index=True)
        g = got[gcols].sort_values(gcols, ignore_index=True)
        bad = None
        for c in wcols:
            for i, (a, b) in enumerate(zip(w[c], g[c])):
                try:
                    if pd.isna(a) and pd.isna(b):  # None/NaT/NaN on both sides
                        continue
                except (TypeError, ValueError):
                    pass
                try:
                    an, bn = float("nan"), float("nan")
                    if (isinstance(a, float) or isinstance(b, float)) and c not in int_cols:
                        an, bn = float(a), float(b)
                        if math.isnan(an) and math.isnan(bn):
                            continue
                        if an == bn or abs(an - bn) <= 1e-9 * max(1.0, abs(an), abs(bn)):
                            continue
                        bad = (c, i, a, b)
                        break
                    if c in int_cols:
                        # exact integer semantics regardless of pandas dtype
                        if (pd.isna(a)) != (pd.isna(b)) or \
                           (not pd.isna(a) and int(a) != int(b)):
                            bad = (c, i, a, b)
                            break
                    elif a != b:
                        bad = (c, i, a, b)
                        break
                except (TypeError, ValueError):
                    # NaT/None mixtures and non-orderable cells land
                    # here; fall back to repr equality.
                    if repr(a) != repr(b):
                        bad = (c, i, a, b)
                        break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"[FAIL] {name}: col {c} row {i}: oracle={a!r} spark={b!r}")
            failures += 1
        else:
            print(f"[ ok ] {name}: {len(want)} rows, {len(wcols)} cols match")
    print(f"{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
