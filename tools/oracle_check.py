#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by `graft.Verify`, replays the
corresponding SQL from oracle_sql.json in DuckDB (tables = the sf_dir
parquet files), and compares row counts, column names, and values.
Mirrors the driver's compare: columns sorted by name, values hashed.
"""
import json
import math
import sys
from pathlib import Path

import duckdb


def canon(rows, cols):
    """Rows -> sorted list of tuples of canonicalized values."""
    def cv(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            # driver-style: stable repr; tiny fp noise still mismatches,
            # which is exactly what we want to surface early
            return repr(round(v, 9))
        return repr(v)
    return sorted(tuple(cv(r[i]) for i in cols) for r in rows)


def main(out_dir, sf_dir):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = 0
    for name in sorted(oracle):
        res_dir = out / name
        if not res_dir.exists():
            print(f"{name}: MISSING spark result")
            failures += 1
            continue
        got = con.execute(
            f"SELECT * FROM '{res_dir}/*.parquet'").fetchall()
        got_cols = [d[0] for d in con.execute(
            f"SELECT * FROM '{res_dir}/*.parquet' LIMIT 0").description]
        try:
            want_rel = con.execute(oracle[name])
            want_cols = [d[0] for d in want_rel.description]
            want = want_rel.fetchall()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"{name}: SCHEMA MISMATCH spark={sorted(got_cols)} oracle={sorted(want_cols)}")
            failures += 1
            continue
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        wi = [want_cols.index(c) for c in sorted(want_cols)]
        cg, cw = canon(got, gi), canon(want, wi)
        if len(cg) != len(cw):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(cg)} oracle={len(cw)}")
            failures += 1
        elif cg != cw:
            diff = next(i for i in range(len(cg)) if cg[i] != cw[i])
            print(f"{name}: VALUE MISMATCH at sorted row {diff}:")
            print(f"  spark : {cg[diff][:6]}")
            print(f"  oracle: {cw[diff][:6]}")
            failures += 1
        else:
            print(f"{name}: MATCH ({len(cg)} rows)")

    # queries with no oracle get a rows-only note
    for d in sorted(out.iterdir()):
        if d.is_dir() and d.name not in oracle:
            n = con.execute(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
            print(f"{d.name}: rows-only ({n} rows, no oracle)")
    print(f"\n{'FAIL' if failures else 'OK'}: {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
