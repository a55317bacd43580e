#!/usr/bin/env python3
"""Dev-only mirror of the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Registers every parquet table in sfDir under its bare name, runs each
SQL from <verifyOutDir>/oracle_sql.json, and compares against the
Spark result parquet written by graft.Verify. Comparison: sort columns
by name, sort rows by all columns, compare cell-by-cell (exact for
non-floats; 1e-9 relative tolerance for floats, since Spark and DuckDB
may sum doubles in different orders).

This is a local feedback loop only — NOT part of the library.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


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
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            failures += 1
            continue
        got = con.execute(f"SELECT * FROM '{res_dir}/*.parquet'").fetchdf()
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
                    if isinstance(a, float) or isinstance(b, float):
                        an, bn = float(a), float(b)
                        if math.isnan(an) and math.isnan(bn):
                            continue
                        if an == bn or abs(an - bn) <= 1e-9 * max(1.0, abs(an), abs(bn)):
                            continue
                        bad = (c, i, a, b)
                        break
                    if a != b:
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
