#!/usr/bin/env python3
"""Local differential checker mirroring the driver's DuckDB-oracle gate.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir>

Loads oracle_sql.json, registers each harness table as a DuckDB view over
<sfDir>/<name>.parquet, runs every oracle statement, and compares against
the Spark result parquet at <verifyOutDir>/<name> — columns sorted by
name, rows sorted by all columns, values stringified. Dev-only tool; the
graded gate is the driver's own compare.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_rows(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"MISSING  {name}: no Spark result dir")
            n_fail += 1
            continue
        try:
            o_cols, o_rows = table_rows(con, sql)
        except Exception as e:
            print(f"ORA-ERR  {name}: {e}")
            n_fail += 1
            continue
        try:
            s_cols, s_rows = table_rows(
                con, f"SELECT * FROM '{res_dir}/*.parquet'")
        except Exception as e:
            print(f"SPK-ERR  {name}: {e}")
            n_fail += 1
            continue
        if o_cols != s_cols:
            print(f"COLS     {name}: oracle={o_cols} spark={s_cols}")
            n_fail += 1
        elif o_rows != s_rows:
            diff = next((i for i, (a, b) in enumerate(zip(o_rows, s_rows))
                         if a != b), min(len(o_rows), len(s_rows)))
            print(f"ROWS     {name}: {len(o_rows)} oracle vs {len(s_rows)} spark rows; "
                  f"first diff at {diff}:")
            if diff < len(o_rows):
                print(f"  oracle: {o_rows[diff]}")
            if diff < len(s_rows):
                print(f"  spark : {s_rows[diff]}")
            n_fail += 1
        else:
            print(f"PASS     {name} ({len(o_rows)} rows)")
            n_pass += 1
    # queries without oracle: rows-only presence check
    for d in sorted(Path(out_dir).iterdir()):
        if d.is_dir() and d.name not in oracle:
            try:
                n = con.execute(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
                print(f"ROWSONLY {d.name}: {n} rows")
            except Exception as e:
                print(f"ROWSONLY {d.name}: ERR {e}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
