#!/usr/bin/env python3
"""sf1 heavy-set oracle gate -> CORRECTNESS_sf1.json.

The per-round driver gate runs at sf0.01; SF-dependent machinery (hybrid
driver-path caps, LSH bucket-population caps, counting-sort histogram
width, pointer-jumping depth) only exercises its at-scale branches on a
bigger corpus. This gate runs the same three checks (rows + schema +
hash, identical canonicalization to tools/oracle_check.py) over the
tools.ScaleUp sf1 fixture for the ~20 heaviest catalog queries and emits
the round-file format.

Usage: python3 tools/sf1_gate.py <sf1Dir> <verifyOutDir> [outJson]
(run `sbt "runMain graft.Verify <sf1Dir> <verifyOutDir> <heavy,set>"` first)
"""
import sys, json, glob, os
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_check import canon

HEAVY = [
    "q_dedup_exact", "q_dedup_minhash", "q_minhash_lsh", "q_dedup_pipeline",
    "q_incr_index", "q_dedup_simhash", "q_simhash_pairs", "q_dedup_clusters",
    "q_cluster_keeper", "q_embed_clusters", "q_semdedup_prune", "q_pagerank",
    "q_percentiles", "q_heavy_hitters", "q_substring_dedup", "q_line_dedup",
    "q_chunk_windows", "q_changelog_native", "q_stratified_split",
    "q_corpus_clean",
    # r12 additions: the multiprobe recall ladder (floors must hold at
    # 10x — they RISE: the replicated corpus puts each probe's replicas
    # in its own bucket), the mixture-weight derivation (integer
    # isqrt/ppm arithmetic on 10x token counts), and the source/wire
    # family (partition/offset assignment, group-mode re-split, and
    # adaptive rate admission over a 10x backlog)
    "q_ann_recall", "q_mix_weights", "q_kafka_roundtrip", "q_group_stream",
    "q_rate_limited",
    # r12 second session: the delta-fold MV identity on a 10x changelog
    # (997-key collision density rises 10x — many more multi-op keys),
    # the replica-max weighted draw over 10x docs, and the retention
    # matrix (collect_set week vectors at 10x user activity). The
    # contrastive miner stays OUT: its brute ground-truth side is
    # anchors x corpus by design (the IVF probe list is the scale path),
    # and its DuckDB replay at sf1 is ~3B join terms.
    "q_incr_mv", "q_weighted_sample", "q_retention",
    # r12 third session: the version-diff changelog (fingerprint skip +
    # bucket-pruned key diff over a 10x-key table — changed-bucket
    # detection must stay exact as per-bucket populations grow) and the
    # equi-depth binning (discrete boundaries off a 10x-deep histogram).
    # q_containment stays out: its shingle-set kernel is q_substring_dedup's,
    # already gated here; the containment arithmetic is per-pair division.
    "q_version_diff", "q_quantile_bins",
    # r13: the full streaming-state family — state stores (RocksDB since
    # r13 for the multi-store join/neardup), watermark eviction, and the
    # WAP commit fence have scale-dependent behavior (state partition
    # populations, store sizes, version counts) that sf0.01 cannot
    # stress. Reference behavior proven: streamer/buffer.go:199-204
    # (offsets only after commit) and pipe/file.go:545-572 (file-sink
    # commit protocol).
    "q_stream_window", "q_stream_dedup", "q_stream_join", "q_stream_session",
    "q_stream_retract", "q_stream_neardup", "q_stream_enrich", "q_stream_wap",
    # r13: the lake family — bucket counts, file populations per
    # partition, and version fences all grow with SF
    "q_wap_publish", "q_compaction", "q_cow_upsert", "q_snapshot_diff",
    "q_zorder", "q_bloom_prune",
    # r13: CDC semantics whose collision/ordering density rises with SF
    # (multi-op keys in the handoff merge, seqno assignment over a 10x
    # changelog, full encode/decode roundtrips over 10x rows)
    "q_handoff_merge", "q_seqno_assign", "q_cf_roundtrip", "q_avro_roundtrip",
    # r13: the relational core at 6M lineitem / 1M events — skew salting,
    # bucket-join co-location, range/as-of window growth, funnel and
    # session chains over 10x-deep per-user histories
    "q1_agg", "q3_join_topk", "q_skew_join", "q_bucket_join", "q_range_join",
    "q_asof_join", "q_topk_per_group", "q_sessionize", "q_funnel",
    "q_moving_agg", "q_approx_stats",
    # r13: text/corpus ops whose shingle/posting populations grow 10x
    "q_gopher_rules", "q_repetition", "q_text_fingerprint", "q_bm25",
    "q_inverted_index", "q_decontaminate", "q_pack_sequences",
    # r13 second session: the segmented (16-file rotated) binlog encode —
    # the r13 rewrite of the catalog's heaviest fixture; the gate proves
    # the parallel encode replays hash-identically at 10x volume
    "q_binlog_binary",
    # r13 third session: push the gate toward the FULL catalog. Left out,
    # each for a stated reason: the socket/wire family (the loopback
    # protocol servers are the operator under test and their single-image
    # fixtures are deliberately unsegmented), multimodal (binary decode
    # fixtures, DuckDB cannot replay the codecs), contrastive_pairs/_ivf
    # (brute ground-truth side is anchors x corpus by design — its DuckDB
    # replay at sf1 is ~3B join terms), and q_ngram_jaccard/q_containment
    # (the all-pairs shingle oracle; the same kernel is already gated via
    # q_substring_dedup).
    # ANN / embedding family — brute oracles are one-query x corpus:
    "q_embed_topk", "q_embed_lsh", "q_embed_neardup", "q_embed_covariance",
    "q_pca_project", "q_ivf_probe", "q_pq_topk", "q_ivfpq_topk",
    "q_knn_ivf", "q_knn_classify",
    # relational remainder at 6M lineitem / 1M events:
    "q_cube", "q_rollup", "q_unpivot", "q_pivot_users", "q_setops",
    "q_rank_stats", "q_range_frame", "q_first_per_day", "q_scd2",
    "q_multi_join", "q_anti_join", "q_exists_semi", "q_scalar_subq",
    "q_state_join", "q_topk_agg", "q_window_events",
    # text/corpus remainder over 50k docs:
    "q_text_langid", "q_text_quality", "q_text_tokens", "q_text_scrub",
    "q_term_freq", "q_doc_stats", "q_bigrams", "q_ngram_lm",
    "q_skipgram_pairs", "q_curation_e2e", "q_token_budget", "q_domain_mix",
    # audits / lake reads:
    "q_null_audit", "q_pk_audit", "q_fk_audit", "q_value_histogram",
    "q_sample_hash", "q_json_extract", "q_partition_prune", "q_schema_merge",
    # CDC functional semantics at 10x changelog volume:
    "q_cf_json", "q_row_key", "q_type_norm", "q_event_gate",
    "q_route_registered", "q_projection_pk", "q_snapshot_scan",
    "q_snapshot_rowfilter", "q_sql_dml", "q_sql_dml_idempotent",
    "q_fanout", "q_partition_key", "q_changelog_expand",
    # incremental remainder:
    "q_anomaly_events",
    # r13 fourth session: the corpus-release operators — shard-layout
    # windows over 10x-deep shards, a 10x bigram/token model applied to a
    # 10x held-out corpus, and the CUBE card over 10x cell populations
    "q_epoch_shuffle", "q_heldout_lm", "q_nb_classify", "q_dataset_card",
    # r13 fourth session: LSH dedup-quality eval — the recall floor must
    # hold where it matters, on the 10x near-dup graph
    "q_lsh_recall",
    # r13 fourth session: BPE vocabulary learning — trained merges replay
    # as a literal replace chain; the 10x corpus re-trains and re-counts
    "q_bpe_tokenize",
    # r13 fourth session: append-only shard maintenance — v1 stability
    # under 10x-deep shard tails
    "q_shard_append",
    # r13 fifth session: the tokenizer ENCODE path — per-doc id streams
    # over the 10x corpus; the ordered reassembly and vocab join must
    # stay exact as per-doc token streams and the alphabet rank table
    # rebuild at 10x
    "q_tokenize_apply",
    # r13 fifth session: DSIR importance resampling — bucket populations
    # and the smoothed log-ratio table shift with corpus size, and the
    # distributed top-N cut must stay exact as the weight distribution
    # tightens at 10x
    "q_dsir_select",
    # r13 fifth session: the streaming DSIR gate — frozen-model scoring
    # across micro-batches must equal the batch formula as per-batch
    # corpora and the model's bucket populations grow 10x
    "q_stream_dsir",
    # r13 fifth session: edit-distance near-dup verification — the
    # candidate set (LSH buckets + hot-bucket cap) and the per-pair
    # levenshtein verdicts must stay exact as bucket populations grow 10x
    "q_edit_neardup",
    # r14 (verdict task 5: close or re-justify every exclusion): the
    # sink/codec roundtrips and the socket/wire family ARE replayable at
    # sf1 — r13's "single-image fixtures are deliberately unsegmented"
    # described the fixtures, not a blocker; the whole set runs in ~2 min
    # of Spark wall. Framing/gzip/decrypt (crypto, pgp, msgpack), the
    # loopback REST sinks moving 10x bytes through real HTTP (webhdfs,
    # s3), and the wire servers replaying 10x volume through real sockets
    # (changelog/kafka socket, DDL probe, group rebalance) all carry
    # volume-dependent paths (chunking, multipart thresholds, drain
    # batching, partition assignment) worth gating at 10x.
    "q_crypto_roundtrip", "q_msgpack_framed", "q_pgp_roundtrip",
    "q_webhdfs_sink", "q_s3_sink",
    "q_changelog_socket", "q_kafka_socket", "q_ddl_socket",
    "q_group_rebalance",
    # r14 second session: the curation additions — KS drift's histogram
    # deepens 10x per type, the LR filter re-trains on 10x docs (exact
    # integer moments + gradient sums must stay deterministic at 10x
    # volume), URL dedup groups grow 10x, and the leak split's component
    # graph is the 10x LSH graph
    "q_ks_drift", "q_lr_quality", "q_url_canonical", "q_leak_split",
    # r14 second session: the streaming drift monitor — per-batch
    # histogram-delta merge must stay exact over 10x batch volume (same
    # oracle as the batch KS, which is the claim under test)
    "q_stream_ks",
    # r14 second session: KMV bottom-k distinct (the WindowGroupLimit
    # partial cap and DECIMAL(38,0) estimator arithmetic over a 10x hash
    # population), streaming CMS hitters (per-batch cell-delta merge at
    # 10x batch volume, same oracle as the batch sketch), MAD outlier
    # gate (both counting histograms widen with the 10x value domain)
    "q_kmv_distinct", "q_stream_hitters", "q_mad_outliers",
    # r14 second session: the greedy-subword encoder — vocab selection
    # runs over the 10x-weighted substring counts and the oracle's
    # recursive walk re-derives everything independently at 10x
    "q_wordpiece",
    # r14 second session: the skew profiler's mass histogram and
    # rank-floor quantiles over the 10x per-key mass distribution
    "q_key_skew",
    # r14 second session: incremental IVF append — frozen-centroid
    # assignment + file append over the 10x index, all-cells probe ==
    # brute force over old ∪ new
    "q_ivf_append",
    # r14 second session: snapshot expiry — the current-version read
    # after vacuuming a 10x versioned table
    "q_vacuum",
    # r14 second session: the segmentation DP vs its shortest-path dual
    # re-proven over the 10x vocabulary (both engines re-derive the
    # optimum independently)
    "q_optimal_segment",
]

# Excluded from the sf1 gate, each for a stated reason (re-audited r14):
#   q_multimodal_bytes/features/resize/audio/video — the operator IS the
#     binary codec path (ImageIO/WAV/GIF decode); DuckDB cannot replay
#     the codecs, so there is no oracle at any SF beyond the sf0.01
#     rows-only check. Scale behavior is per-row narrow decode.
#   q_ngram_jaccard / q_containment — their ORACLES are the all-pairs
#     shingle joins (quadratic by design: ~3B join terms at sf1 in
#     DuckDB); the shared shingle-set kernel is already sf1-gated via
#     q_substring_dedup, and the per-pair arithmetic is SF-independent.
#   q_contrastive_pairs / q_contrastive_ivf — the brute-force ground
#     truth side is anchors x corpus by design (the IVF probe list is
#     the scale path, and ITS recall floor is gated via q_ann_recall /
#     q_contrastive_ivf at sf0.01/0.1/1 in CORRECTNESS runs); the DuckDB
#     replay at sf1 is ~3B join terms.


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    out_json = sys.argv[3] if len(sys.argv) > 3 else "CORRECTNESS_sf1.json"
    # optional 4th arg: comma-separated subset — recheck only those
    # queries and MERGE into an existing out_json (incremental gating
    # when the heavy list grows; prior entries carry over verbatim)
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    if only:
        unknown = only - set(HEAVY)
        if unknown:
            # fail fast: a typo'd name would otherwise be silently ignored
            # and the intended query's stale prior entry carried forward
            # as green without a recheck
            sys.exit(f"unknown queries in subset (not in HEAVY): {sorted(unknown)}")
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        # ScaleUp writes Spark-style DIRECTORIES; driver fixtures are files
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    if only and os.path.isfile(out_json):
        prior = json.load(open(out_json)).get("queries", {})
        # mark carried-over entries so the artifact records which rows
        # were actually rechecked this run vs copied from the prior file
        results.update({k: dict(v, carried=True)
                        for k, v in prior.items() if k in set(HEAVY) - only})
    n_fail = 0
    for name in HEAVY:
        if only and name not in only:
            if name not in results:
                results[name] = {"rows_match": False, "schema_match": False,
                                 "hash_match": False, "spark_rows": None,
                                 "oracle_rows": None, "err": "not rechecked"}
                n_fail += 1
            elif not (results[name].get("rows_match") and
                      results[name].get("schema_match") and
                      results[name].get("hash_match")):
                n_fail += 1
            continue
        rec = {"rows_match": False, "schema_match": False, "hash_match": False,
               "spark_rows": None, "oracle_rows": None, "err": None}
        results[name] = rec
        try:
            spark_dir = f"{out_dir}/{name}"
            if not os.path.isdir(spark_dir):
                raise RuntimeError("no spark output")
            if name not in oracle:
                raise RuntimeError("no oracle sql")
            scols, snrows, shash = canon(con, f"SELECT * FROM '{spark_dir}/*.parquet'", "spark")
            ocols, onrows, ohash = canon(con, f"SELECT * FROM ({oracle[name]})", "oracle")
            rec["spark_rows"], rec["oracle_rows"] = snrows, onrows
            rec["rows_match"] = snrows == onrows
            rec["schema_match"] = scols == ocols
            rec["hash_match"] = shash == ohash
        except Exception as e:
            rec["err"] = str(e)[:300]
        ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        if not ok:
            n_fail += 1
        print(("PASS" if ok else "FAIL"), name,
              f"({rec['spark_rows']} rows)" if ok else rec)
    with open(out_json, "w") as f:
        json.dump({"sf": sf_dir, "queries": results}, f, indent=1)
    print(f"== {len(HEAVY) - n_fail} pass, {n_fail} fail -> {out_json}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
