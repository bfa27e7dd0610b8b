#!/usr/bin/env python3
"""Order-independent content hash per parquet table in a fixture dir.

Pins tools.ScaleUp determinism: the sf1 fixture is derived from the
driver's sf0.1 parquet by pure arithmetic (replica cross join + id
offsetting), so its ROW SET must be reproducible across machines and
Spark partitionings even though file bytes are not. Hash = xor of
per-row md5 prefixes over all columns cast to VARCHAR — associative and
commutative, so partition order cannot change it.

Usage: python3 tools/fixture_hash.py <dir>
"""
import sys, glob, os
import duckdb


def main():
    d = sys.argv[1]
    con = duckdb.connect()
    for p in sorted(glob.glob(f"{d}/*.parquet")):
        name = os.path.basename(p).replace(".parquet", "")
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE OR REPLACE VIEW _fx AS SELECT * FROM '{src}'")
        row = con.sql(
            """SELECT COUNT(*),
                 to_hex(bit_xor(hash(CAST(t AS VARCHAR))))
               FROM _fx t"""
        ).fetchone()
        print(f"{name}: rows={row[0]} hash={row[1]}")


if __name__ == "__main__":
    main()
