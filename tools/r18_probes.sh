#!/bin/bash
# Round-18 probe campaign (verdict tasks 1/2/3/5 + the defaults-only
# pagerank sf100 re-probe of task 4). Sequential: sbt locks the project
# dir, and interleaved probes would perturb each other's timings anyway.
# Each probe's stdout lands in /tmp/r18_probes/<tag>.log; a one-line
# STATUS per probe goes to the campaign log.
set -u
cd /root/repo
OUT=/tmp/r18_probes
mkdir -p "$OUT"
log() { echo "$(date +%H:%M:%S) $*" | tee -a "$OUT/campaign.log"; }
run() { # run <tag> <sbt-args...>
  local tag="$1"; shift
  log "START $tag"
  local t0=$SECONDS
  sbt -batch "$@" > "$OUT/$tag.log" 2>&1
  local rc=$?
  log "END $tag rc=$rc wall=$((SECONDS-t0))s"
}

# --- early sanity on the round's NEW code paths (cheap, fail fast) ------
run decont_sf1   "runMain graft.tools.DecontScaleProbe /tmp/graft_sf1"
run q_pagerank_sf1_sanity "runMain graft.tools.OneRun q_pagerank /tmp/graft_sf1"

# --- task 1: ANN build/probe split ladder -------------------------------
run ivfpq_sf0.1 "runMain graft.tools.IvfpqProf /root/testdata/sf0.1"
run ivfpq_sf1   "runMain graft.tools.IvfpqProf /tmp/graft_sf1"
run ivfpq_sf10  "runMain graft.tools.IvfpqProf /tmp/graft_sf10"
run ivfpq_sf100 "runMain graft.tools.IvfpqProf /tmp/graft_sf100"

# --- task 2: candidate-density ladder (bound recorded after) ------------
run density_sf0.1 "runMain graft.tools.DensityProbe /root/testdata/sf0.1"
run density_sf1   "runMain graft.tools.DensityProbe /tmp/graft_sf1"
run density_sf10  "runMain graft.tools.DensityProbe /tmp/graft_sf10"
run density_sf100 "runMain graft.tools.DensityProbe /tmp/graft_sf100"

# --- task 5: sf1/sf10 rows for the r17-probed families ------------------
for q in q_dedup_clusters q_epoch_shuffle q_shard_append q_substring_dedup q_curation_e2e q_pagerank; do
  run "${q}_sf1"  "runMain graft.tools.OneRun $q /tmp/graft_sf1"
  run "${q}_sf10" "runMain graft.tools.OneRun $q /tmp/graft_sf10"
done

# --- task 3: gate-bypassed decontamination mass at third decade ---------
run decont_sf100 "runMain graft.tools.DecontScaleProbe /tmp/graft_sf100"

# --- task 4: pagerank sf100, DEFAULTS-ONLY command ----------------------
run pagerank_sf100_defaults "runMain graft.tools.OneRun q_pagerank /tmp/graft_sf100"

log "CAMPAIGN COMPLETE"
