#!/usr/bin/env python3
"""Computed bench adjudication (r13 verdict task 8): the min-vs-prior-median
rule that BASELINE.md has been applying in prose, as a tool.

Compares a current bench artifact (BENCH_FULL.json format: per-query
medians + per-query spread runs) against a prior one (BENCH_FULL or a
driver BENCH_r{N}.json with a "queries" map) and classifies every common
query:

  faster        median <= prior / threshold
  steady        within threshold either way
  ambient       median > prior * threshold, BUT the query's own spread is
                suspect OR its best run sits at/below the prior median
                (*1.1 slack) — the signature of machine state, not plans:
                the plan demonstrably still executes at the old cost
  regressed     median > prior * threshold AND the spread is tight AND the
                MINIMUM never reaches the prior median — every sample is
                slower; this is a finding to investigate, not noise

Drift normalization (r18 verdict task 2 — three consecutive rounds needed
manual A/B/A to excuse false "regressed" rows) happens BEFORE the rules
above, in two layers:

  1. per-sample calib: when the artifact's spread rows carry a "calib"
     array (Bench emits one per run since r19 — the bracketed intra-pass
     CPU-probe context), every sample is scaled by idle_ref/calib before
     the median/min are taken, so a sample measured inside a hot window
     is compared at its cooled-down equivalent. Artifacts without the
     array fall back to the artifact-level calib_median_s.
  2. ambient scale: the calib probe is itself a noisy point sample (r18:
     current 0.697 vs control 0.714 while the real window drift was
     x1.16), so after calib normalization the tool takes the MEDIAN of
     per-query ratios across the common set — a code change touches few
     queries, so the catalog-wide median ratio is a robust estimator of
     residual machine drift — and classifies each row on its RESIDUAL
     ratio (ratio / ambient_scale). Applied only when the common set has
     >= 25 rows (a dev-subset comparison has no untouched majority to
     estimate from) and capped to [1/1.5, 1.5] (drift beyond x1.5 is not
     plausible window heat and must not mask a broad real regression).
     Raw and residual ratios are both recorded per row.

Also prints the machine-evidence block when present (load calib, page
cache, fixture warmth), since "ambient" claims should be read against it.

Usage: python3 tools/bench_adjudicate.py <current.json> <prior.json>
       [threshold=1.3] [--json out.json] [--control auto|off|force]
       [--control-commit SHA] [--control-ratio 1.15]

--json writes the full per-row classification (plus the machine-evidence
block and totals) as a committed artifact, e.g. ADJUDICATION_r{N}.json —
so the judge reads computed verdicts, not narrative.

Control replay (r15 verdict task 5, auto-run by default with --json):
whenever the common-subset ratio exceeds --control-ratio (1.15), the
machine-state explanation must be PROVEN, not narrated — the tool checks
out the PRIOR artifact's producing commit (machine.git_head, stamped by
Bench since r16; override with --control-commit) into a scratch git
worktree, replays the same bench in the same environment window, and
embeds a `control` block: {commit, total_control_s, ratio_vs_control,
counts_vs_control}. ratio_vs_control ~1.0x while the raw ratio is 1.3x
is machine-adjudicated ambient inflation; ratio_vs_control staying high
is a genuine regression. --control off skips it; force runs it even
under the trigger ratio.
"""
import json
import os
import subprocess
import sys


def load(path):
    d = json.load(open(path))
    # driver round artifacts wrap the bench line under "parsed"
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    qs = d.get("queries", {}) or {}
    spread = d.get("spread", {}) or {}
    return d, qs, spread


def _median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2] if xs else None


def _norm_query(q, meta, spread, ref):
    """(normalized_median, normalized_min) for one query, or None.

    Per-sample calib scaling when the spread row has a parallel "calib"
    array; artifact-level calib_median_s fallback per sample otherwise.
    """
    fallback = meta.get("calib_median_s") or -1.0
    sp = spread.get(q, {})
    runs = sp.get("runs") or []
    calibs = sp.get("calib") or []
    normed = []
    for i, r in enumerate(runs):
        if r is None or r < 0:
            continue
        c = calibs[i] if i < len(calibs) else -1.0
        if not c or c <= 0:
            c = fallback
        normed.append(r * ref / c if c and c > 0 else r)
    if not normed:
        return None
    return _median(normed), min(normed)


def classify(cur_q, cur_s, prior_q, thr,
             cur_meta=None, prior_meta=None, prior_s=None):
    """Per-query verdicts {q: (verdict, cur, prior, min, suspect, resid)}.

    cur/prior/min in the result stay RAW seconds (what a reader checks
    against the artifacts); the verdict is decided on calib-normalized,
    ambient-scale-residual ratios (module docstring). resid is the
    residual ratio the thresholds were applied to.
    """
    cur_meta, prior_meta = cur_meta or {}, prior_meta or {}
    prior_s = prior_s or {}
    ref = cur_meta.get("calib_idle_ref_s") \
        or prior_meta.get("calib_idle_ref_s") or 0.65
    rows = {}
    for q in sorted(set(cur_q) & set(prior_q)):
        c, p = cur_q[q], prior_q[q]
        if c is None or p is None or c < 0 or p <= 0:
            continue
        sp = cur_s.get(q, {})
        mn = sp.get("min", c)
        suspect = bool(sp.get("suspect"))
        f_cur = (ref / cur_meta["calib_median_s"]
                 if cur_meta.get("calib_median_s", 0) > 0 else 1.0)
        cn = _norm_query(q, cur_meta, cur_s, ref)
        c_n, mn_n = cn if cn else (c * f_cur, (mn if mn >= 0 else c) * f_cur)
        f_pri = (ref / prior_meta["calib_median_s"]
                 if prior_meta.get("calib_median_s", 0) > 0 else 1.0)
        pn = _norm_query(q, prior_meta, prior_s, ref)
        p_n = pn[0] if pn else p * f_pri
        rows[q] = (c, p, mn, suspect, c_n, mn_n, p_n)
    # layer 2: catalog-wide median of normalized ratios as residual drift
    ratios = [r[4] / r[6] for r in rows.values() if r[6] > 0]
    scale = 1.0
    if len(ratios) >= 25:
        med = _median(ratios)
        if med and med > 0:
            scale = min(1.5, max(1 / 1.5, med))
    verdicts = {}
    for q, (c, p, mn, suspect, c_n, mn_n, p_n) in rows.items():
        resid = (c_n / p_n) / scale if p_n > 0 else -1.0
        min_resid = (mn_n / p_n) / scale if p_n > 0 else -1.0
        if resid <= 1 / thr:
            v = "faster"
        elif resid <= thr:
            v = "steady"
        elif suspect or (0 <= min_resid <= 1.1):
            v = "ambient"
        else:
            v = "regressed"
        verdicts[q] = (v, c, p, mn, suspect, resid)
    return verdicts, scale


def run_control(commit, sf_dir, repo_root, knobs=None):
    """Replay the bench at `commit` in a scratch worktree, same window.

    Returns (queries, meta) parsed from the control run's BENCH_FULL.json,
    or (None, reason) on failure. Never raises: the control is evidence,
    not a gate, and a broken replay must not lose the adjudication.

    Two stale-evidence traps guarded here (r16 ADVICE): BENCH_FULL.json is
    a git-TRACKED file, so `git worktree add` materializes the control
    commit's COMMITTED artifact at wt/BENCH_FULL.json — and a reused
    /tmp/graft_ctrl_* worktree can hold a previous replay's output. If the
    sbt replay then fails (old-commit compile error, OOM, missing sbt),
    silently parsing that file would present numbers from a different
    environment window as a fresh same-window control — defeating the
    control's purpose. So: delete the file before launching (verified
    absent — deletion IS the staleness gate) and fail on a nonzero sbt
    exit; a file that exists after the replay was necessarily written by
    it.

    `knobs` (the current artifact's machine.env stamp) reconstructs the
    SPARK_GRAFT_* configuration that shaped the current run, so the
    control is configured identically instead of inheriting whatever this
    process's shell exports.
    """
    wt = f"/tmp/graft_ctrl_{commit[:12]}"
    try:
        if not os.path.isdir(wt):
            subprocess.run(["git", "worktree", "add", "--detach", wt, commit],
                           cwd=repo_root, check=True, capture_output=True)
        full = os.path.join(wt, "BENCH_FULL.json")
        # committed/stale artifact must never pose as a fresh control:
        # os.remove raises on failure, and the existence re-check below
        # makes deletion itself the staleness gate — any file present
        # after the replay was necessarily written after this point
        # (r18 ADVICE item 3: the former 1 s mtime tolerance admitted a
        # genuinely stale artifact written just before the launch).
        if os.path.exists(full):
            os.remove(full)
        if os.path.exists(full):
            return None, "stale BENCH_FULL.json could not be deleted pre-launch"
        env = {k: v for k, v in os.environ.items()
               if not k.startswith("SPARK_GRAFT_")}
        for k, v in (knobs or {}).items():
            if k.startswith("SPARK_GRAFT_"):
                env[k] = v
        env["SPARK_GRAFT_SF_DIR"] = sf_dir
        r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                           cwd=wt, env=env, capture_output=True, text=True,
                           timeout=3600)
        if r.returncode != 0:
            tail = ((r.stdout or "") + (r.stderr or ""))[-500:]
            return None, f"control sbt exited {r.returncode}: {tail}"
        if not os.path.isfile(full):
            tail = (r.stdout or "")[-500:]
            return None, f"control bench produced no BENCH_FULL.json: {tail}"
        # no mtime check needed: the file was verifiably absent at launch,
        # so existing now means the replay wrote it
        d = json.load(open(full))
        return d.get("queries", {}) or {}, d
    except Exception as e:
        return None, f"control replay failed: {e}"


def main():
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]

    def opt(name, default):
        if name in args:
            i = args.index(name)
            v = args[i + 1]
            del args[i:i + 2]
            return v
        return default
    control_mode = opt("--control", "auto" if json_out else "off")
    control_commit = opt("--control-commit", None)
    control_ratio = float(opt("--control-ratio", "1.15"))
    cur_path, prior_path = args[0], args[1]
    thr = float(args[2]) if len(args) > 2 else 1.3
    cur, cur_q, cur_s = load(cur_path)
    prior, prior_q, prior_s = load(prior_path)

    mach = cur.get("machine")
    if mach:
        warm = "COLD" if mach.get("fixture_cold_start") else "warm"
        print(f"machine: calib={cur.get('calib_median_s')} "
              f"(idle ref {cur.get('calib_idle_ref_s')}), "
              f"load_suspect={cur.get('load_suspect')}, fixtures={warm} "
              f"(scan1={mach.get('fixture_scan1_s')}s scan2={mach.get('fixture_scan2_s')}s), "
              f"page_cached_start={mach.get('page_cached_start_kb', 0) // 1024}MB, "
              f"tmp_free={mach.get('tmp_free_start_mb')}MB")

    verdicts, ambient_scale = classify(
        cur_q, cur_s, prior_q, thr, cur, prior, prior_s)

    order = {"regressed": 0, "ambient": 1, "faster": 2, "steady": 3}
    counts = {}
    for q, (v, c, p, mn, sus, resid) in sorted(
            verdicts.items(), key=lambda kv: (order[kv[1][0]], kv[0])):
        counts[v] = counts.get(v, 0) + 1
        if v != "steady":
            flag = " spread-suspect" if sus else ""
            print(f"{v:9s} {q}: {c:.2f}s vs prior {p:.2f}s "
                  f"(x{c / p:.2f} raw, x{resid:.2f} residual, "
                  f"min {mn:.2f}){flag}")
    tot_c = sum(c for _, c, _, _, _, _ in verdicts.values())
    tot_p = sum(p for _, _, p, _, _, _ in verdicts.values())
    ratio = f"x{tot_c / tot_p:.2f}" if tot_p > 0 else "n/a"
    print(f"\ncommon queries: {len(verdicts)}; totals {tot_c:.1f}s vs "
          f"{tot_p:.1f}s ({ratio}); ambient_scale=x{ambient_scale:.3f}; "
          + ", ".join(f"{k}={v}" for k, v in sorted(counts.items())))

    # ---- control replay: machine-adjudicate ambient inflation ----
    control_block = None
    raw_ratio = tot_c / tot_p if tot_p > 0 else 0.0
    want_control = control_mode == "force" or (
        control_mode == "auto" and raw_ratio > control_ratio)
    if want_control:
        prior_mach = prior.get("machine") or {}
        commit = control_commit or prior_mach.get("git_head")
        sf_dir = cur.get("sf")
        if not commit:
            reason = ("prior artifact was produced on a DIRTY tree — "
                      "git_head would not match the measured code"
                      if prior_mach.get("git_dirty") else
                      "no control commit (prior artifact has no "
                      "machine.git_head; pass --control-commit)")
            control_block = {"skipped": reason}
        elif not sf_dir or not os.path.isdir(sf_dir):
            control_block = {"skipped": f"sf dir unavailable: {sf_dir}"}
        else:
            print(f"\nratio x{raw_ratio:.2f} > {control_ratio} — replaying "
                  f"control commit {commit[:12]} at {sf_dir} ...")
            repo_root = os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))
            knobs = (cur.get("machine") or {}).get("env") or {}
            ctrl_q, ctrl_meta = run_control(commit, sf_dir, repo_root, knobs)
            if ctrl_q is None:
                control_block = {"skipped": ctrl_meta}
                print(f"control: {ctrl_meta}")
            else:
                ctrl_spread = ctrl_meta.get("spread", {}) or {}
                cv, c_scale = classify(cur_q, cur_s, ctrl_q, thr,
                                       cur, ctrl_meta, ctrl_spread)
                c_tot = sum(c for _, c, _, _, _, _ in cv.values())
                c_ctl = sum(p for _, _, p, _, _, _ in cv.values())
                c_counts = {}
                for v, *_ in cv.values():
                    c_counts[v] = c_counts.get(v, 0) + 1
                control_block = {
                    "commit": commit, "sf": sf_dir,
                    "env_knobs": {k: v for k, v in sorted(knobs.items())
                                  if k.startswith("SPARK_GRAFT_")},
                    "common_queries": len(cv),
                    "total_current_common_s": round(c_tot, 3),
                    "total_control_s": round(c_ctl, 3),
                    "ratio_vs_control":
                        round(c_tot / c_ctl, 4) if c_ctl > 0 else None,
                    "control_calib_median_s":
                        ctrl_meta.get("calib_median_s"),
                    "ambient_scale_vs_control": round(c_scale, 4),
                    "counts_vs_control": c_counts,
                    "regressed_vs_control": sorted(
                        q for q, (v, *_) in cv.items() if v == "regressed"),
                }
                print(f"control ({commit[:12]}): {c_tot:.1f}s vs "
                      f"{c_ctl:.1f}s = x{c_tot / c_ctl:.2f} over "
                      f"{len(cv)} queries; " + ", ".join(
                          f"{k}={v}" for k, v in sorted(c_counts.items())))

    if json_out:
        artifact = {
            "current": cur_path, "prior": prior_path, "threshold": thr,
            "machine": mach,
            "calib_median_s": cur.get("calib_median_s"),
            "load_suspect": cur.get("load_suspect"),
            "common_queries": len(verdicts),
            "total_current_s": round(tot_c, 3),
            "total_prior_s": round(tot_p, 3),
            "ratio": round(tot_c / tot_p, 4) if tot_p > 0 else None,
            "ambient_scale": round(ambient_scale, 4),
            "counts": counts,
            "rows": {q: {"verdict": v, "current_s": c, "prior_s": p,
                         "min_s": mn, "spread_suspect": sus,
                         "ratio": round(c / p, 4),
                         "residual_ratio": round(resid, 4)}
                     for q, (v, c, p, mn, sus, resid)
                     in sorted(verdicts.items())},
            "control": control_block,
        }
        with open(json_out, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    if counts.get("regressed"):
        print("REGRESSED rows present: tight spread and the best run never "
              "reached the prior median — investigate before shipping.")
        sys.exit(1)


if __name__ == "__main__":
    main()
