#!/usr/bin/env python3
"""Dev-loop oracle parity check (mimics the driver's CORRECTNESS gate).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads oracle_sql.json dumped by graft.Verify, runs each SQL in DuckDB over
views named after the parquet tables in sfDir, and compares against the
Spark result parquet in verifyOutDir/<name>: row count, column-name set, and
a hash over values with columns sorted by name and rows sorted.
"""
import sys, json, glob, os
import duckdb

def canon(con, rel_sql, label):
    df = con.sql(rel_sql).fetchdf()
    cols = sorted(df.columns)
    df = df[cols]
    # normalize: floats rounded to 9 sig digits, NaN/None unified, dates/ts to str
    rows = []
    for t in df.itertuples(index=False):
        row = []
        for v in t:
            if v is None or (isinstance(v, float) and v != v):
                row.append("NULL")
            elif isinstance(v, float):
                row.append(f"{v:.9g}")
            elif isinstance(v, bytes):
                row.append(v.hex())
            else:
                row.append(str(v))
        rows.append("\x01".join(row))
    rows.sort()
    import hashlib
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return cols, len(rows), h

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            scols, snrows, shash = canon(con, f"SELECT * FROM '{spark_dir}/*.parquet'", "spark")
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}"); n_fail += 1; continue
        try:
            ocols, onrows, ohash = canon(con, f"SELECT * FROM ({sql})", "oracle")
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}"); n_fail += 1; continue
        if scols != ocols:
            print(f"FAIL {name}: cols spark={scols} oracle={ocols}"); n_fail += 1
        elif snrows != onrows:
            print(f"FAIL {name}: rows spark={snrows} oracle={onrows}"); n_fail += 1
        elif shash != ohash:
            print(f"FAIL {name}: hash mismatch ({snrows} rows)"); n_fail += 1
        else:
            print(f"PASS {name} ({snrows} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
