#!/usr/bin/env python3
"""Constrained-heap gate (r14 verdict task 3): prove the
"heap-independent" claims (DISK_ONLY caches, RocksDB streaming state,
domain-bounded sketches, DriverBudget-capped hybrid paths) by running the
heap-sensitive sf1 rows under a deliberately SMALL driver heap and
asserting the results are hash-identical to the default-heap run.

This is engine-vs-engine identity at two heaps; the default-heap outputs
are themselves DuckDB-oracle-gated by tools/sf1_gate.py, so a 3g hash
match is transitively oracle-green.

Usage:
  java -Xmx3g graft.Verify <sf1Dir> <outSmall> <ROWS>
  java -Xmx8g graft.Verify <sf1Dir> <outBig>   <ROWS>
  python3 tools/heap_gate.py <outSmall> <outBig> [HEAPGATE.json]

ROWS (importable as heap_gate.ROWS): the 20 rows whose designs make
at-scale memory claims.
"""
import sys, json, os, glob
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_check import canon

# The 20 rows with explicit memory-stance claims:
#  - RocksDB / bounded streaming state: the q_stream_* family
#  - DISK_ONLY gram cache: q_dsir_select
#  - domain-bounded counting/sketch state: percentiles, heavy_hitters,
#    kmv, stream_ks/stream_hitters
#  - corpus-hash shuffles + hot-bucket caps: the dedup family
#  - DriverBudget-capped hybrid paths: dedup_clusters, cluster_keeper,
#    embed_clusters
#  - iterative aggregate loops: pagerank, lr_quality
ROWS = [
    "q_dedup_pipeline", "q_line_dedup", "q_substring_dedup",
    "q_dedup_minhash", "q_minhash_lsh", "q_dedup_clusters",
    "q_cluster_keeper", "q_embed_clusters", "q_semdedup_prune",
    "q_stream_join", "q_stream_neardup", "q_stream_dedup",
    "q_stream_ks", "q_stream_hitters", "q_percentiles",
    "q_heavy_hitters", "q_kmv_distinct", "q_lr_quality",
    "q_dsir_select", "q_pagerank",
]


def main():
    small_dir, big_dir = sys.argv[1], sys.argv[2]
    out_json = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    results, n_pass, n_fail = {}, 0, 0
    for q in ROWS:
        row = {}
        for tag, d in (("small", small_dir), ("big", big_dir)):
            p = f"{d}/{q}"
            if not os.path.isdir(p):
                row[tag] = None
                continue
            cols, n, h = canon(con, f"SELECT * FROM '{p}/*.parquet'", tag)
            row[tag] = {"rows": n, "hash": h}
        ok = (row.get("small") is not None and row.get("big") is not None
              and row["small"] == row["big"])
        results[q] = {**row, "match": ok}
        if ok:
            n_pass += 1
            print(f"PASS {q} ({row['big']['rows']} rows)")
        else:
            n_fail += 1
            print(f"FAIL {q}: small={row.get('small')} big={row.get('big')}")
    print(f"== {n_pass} pass, {n_fail} fail")
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"small_dir": small_dir, "big_dir": big_dir,
                       "rows": results, "pass": n_pass, "fail": n_fail},
                      f, indent=1, sort_keys=True)
        print(f"wrote {out_json}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
