#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by `graft.Verify`, replays the
corresponding SQL from oracle_sql.json in DuckDB (tables = the sf_dir
parquet files), and compares row counts, column names, and values.

The driver's hash gate compares *rendered* values, which makes it
type-rendering sensitive: DuckDB sum(BIGINT) returns HUGEINT (renders
float-style, "499.0" vs "499") and DECIMAL trailing zeros render
scale-preserved on one side and float-style on the other ("123.40" vs
"123.4"). Round 1 lost 10 value-identical queries to exactly this. So this
gate is stricter than value equality:

 1. Any DECIMAL or HUGEINT column in EITHER side's output is an immediate
    failure ("driver-unsafe type") — emit BIGINT scaled integers instead.
 2. Column types must fall in the same *rendering class* (ints with ints,
    doubles with doubles, strings with strings); int32 vs int64 is fine
    because both render "45".
 3. Values compare on canonicalized reprs as before.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

# DuckDB type name -> rendering class. Types absent here (DECIMAL(...),
# HUGEINT, ...) are driver-unsafe.
RENDER_CLASS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "int",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BLOB": "bytes", "BOOLEAN": "bool",
    "DATE": "date", "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
}


def col_types(con, sql):
    """[(name, duckdb_type)] for a query, via DESCRIBE."""
    return [(r[0], r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall()]


def unsafe_types(types):
    return [(c, t) for c, t in types if t.upper() not in RENDER_CLASS]


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
        got_sql = f"SELECT * FROM '{res_dir}/*.parquet'"
        got_types = col_types(con, got_sql)
        try:
            want_types = col_types(con, oracle[name])
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
            failures += 1
            continue

        # 1. driver-unsafe types on either side
        bad = [("spark", c, t) for c, t in unsafe_types(got_types)] + \
              [("oracle", c, t) for c, t in unsafe_types(want_types)]
        if bad:
            print(f"{name}: DRIVER-UNSAFE TYPE {bad} — emit BIGINT/STRING/DOUBLE only")
            failures += 1
            continue

        got_cols = [c for c, _ in got_types]
        want_cols = [c for c, _ in want_types]
        if sorted(got_cols) != sorted(want_cols):
            print(f"{name}: SCHEMA MISMATCH spark={sorted(got_cols)} oracle={sorted(want_cols)}")
            failures += 1
            continue

        # 2. rendering-class parity per column name
        gt = {c: RENDER_CLASS[t.upper()] for c, t in got_types}
        wt = {c: RENDER_CLASS[t.upper()] for c, t in want_types}
        clash = [(c, gt[c], wt[c]) for c in gt if gt[c] != wt[c]]
        if clash:
            print(f"{name}: RENDER-CLASS MISMATCH {clash}")
            failures += 1
            continue

        got = con.execute(got_sql).fetchall()
        try:
            want_rel = con.execute(oracle[name])
            want = want_rel.fetchall()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
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
