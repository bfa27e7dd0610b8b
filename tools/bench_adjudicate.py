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

Also prints the machine-evidence block when present (load calib, page
cache, fixture warmth), since "ambient" claims should be read against it.

Usage: python3 tools/bench_adjudicate.py <current.json> <prior.json>
       [threshold=1.3] [--json out.json]

--json writes the full per-row classification (plus the machine-evidence
block and totals) as a committed artifact, e.g. ADJUDICATION_r{N}.json —
so the judge reads computed verdicts, not narrative.
"""
import sys, json


def load(path):
    d = json.load(open(path))
    # driver round artifacts wrap the bench line under "parsed"
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    qs = d.get("queries", {}) or {}
    spread = d.get("spread", {}) or {}
    return d, qs, spread


def main():
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    cur_path, prior_path = args[0], args[1]
    thr = float(args[2]) if len(args) > 2 else 1.3
    cur, cur_q, cur_s = load(cur_path)
    _, prior_q, _ = load(prior_path)

    mach = cur.get("machine")
    if mach:
        warm = "COLD" if mach.get("fixture_cold_start") else "warm"
        print(f"machine: calib={cur.get('calib_median_s')} "
              f"(idle ref {cur.get('calib_idle_ref_s')}), "
              f"load_suspect={cur.get('load_suspect')}, fixtures={warm} "
              f"(scan1={mach.get('fixture_scan1_s')}s scan2={mach.get('fixture_scan2_s')}s), "
              f"page_cached_start={mach.get('page_cached_start_kb', 0) // 1024}MB, "
              f"tmp_free={mach.get('tmp_free_start_mb')}MB")

    common = sorted(set(cur_q) & set(prior_q))
    verdicts = {}
    for q in common:
        c, p = cur_q[q], prior_q[q]
        if c is None or p is None or c < 0 or p <= 0:
            continue
        sp = cur_s.get(q, {})
        mn = sp.get("min", c)
        suspect = bool(sp.get("suspect"))
        if c <= p / thr:
            v = "faster"
        elif c <= p * thr:
            v = "steady"
        elif suspect or (mn >= 0 and mn <= p * 1.1):
            v = "ambient"
        else:
            v = "regressed"
        verdicts[q] = (v, c, p, mn, suspect)

    order = {"regressed": 0, "ambient": 1, "faster": 2, "steady": 3}
    counts = {}
    for q, (v, c, p, mn, sus) in sorted(
            verdicts.items(), key=lambda kv: (order[kv[1][0]], kv[0])):
        counts[v] = counts.get(v, 0) + 1
        if v != "steady":
            flag = " spread-suspect" if sus else ""
            print(f"{v:9s} {q}: {c:.2f}s vs prior {p:.2f}s "
                  f"(x{c / p:.2f}, min {mn:.2f}){flag}")
    tot_c = sum(c for _, c, _, _, _ in verdicts.values())
    tot_p = sum(p for _, _, p, _, _ in verdicts.values())
    ratio = f"x{tot_c / tot_p:.2f}" if tot_p > 0 else "n/a"
    print(f"\ncommon queries: {len(verdicts)}; totals {tot_c:.1f}s vs "
          f"{tot_p:.1f}s ({ratio}); "
          + ", ".join(f"{k}={v}" for k, v in sorted(counts.items())))
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
            "counts": counts,
            "rows": {q: {"verdict": v, "current_s": c, "prior_s": p,
                         "min_s": mn, "spread_suspect": sus,
                         "ratio": round(c / p, 4)}
                     for q, (v, c, p, mn, sus) in sorted(verdicts.items())},
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
