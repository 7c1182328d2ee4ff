#!/usr/bin/env python3
"""Bench drift guard: flag queries slower than their best recorded time.

Compares a fresh BENCH.json per-query map against the BEST time each query
ever recorded in git history (every committed version of BENCH.json), and
separates REGRESSION from ENVIRONMENTAL drift:

  - the median ratio (current / baseline) across all queries estimates
    host noise — quiet-host runs sit near 1.0-1.3, a throttled host shifts
    every query uniformly (the round-4 adjudication problem this tool
    replaces);
  - a query is flagged only when it is BOTH >1.5x its baseline AND >1.5x
    the median ratio (i.e. it moved more than the host did);
  - the BASELINE is the best-of-history FLOORED at the 25th percentile of
    that query's own history: a single exceptionally-quiet run otherwise
    sets an unreachable floor forever (the round-7/8 dedup false-positive
    class — two outlier-quiet runs made 2x "regressions" out of times
    sitting exactly on the query's typical envelope). P25 keeps regression
    sensitivity (a sustained 2x jump still flags against the typical-good
    era) while bounding a lucky run's influence;
  - a suspect must PERSIST: sub-second queries on a 171-query run draw
    ~2x noise spikes whose membership ROAMS between runs (observed twice
    in round 8: two back-to-back quiet-median runs each flagged six
    queries with zero overlap, every prior suspect back at its
    historical value). A query elevated in the fresh run but NOT in the
    most recent committed run at the same (sf, cpus) is reported as
    transient-awaiting-confirmation and does not fail the check; only
    two consecutive elevated runs exit 1.

Usage: python3 tools/bench_drift.py [BENCH.json]   (run from the repo root)
Exit 0 = clean or uniform-environmental; exit 1 = isolated regressions.
"""
import json
import statistics
import subprocess
import sys


# First commit with the honest noop-write sink (ff17daf, round 5). Earlier
# BENCH.json versions drove queries with .count(), under which Catalyst
# pruned unreferenced aggregate work and top-level sorts — those times are
# NOT comparable (BASELINE.md documents the same-code 51.2s -> 91.2s shift),
# so best-of-history starts at the sink change.
HONEST_SINK_COMMIT = "ff17daf"

# Per-query plan eras: when a query's PLAN was deliberately replaced (a
# scale-safety trade documented in the source), bests recorded under the
# RETIRED plan are permanent false positives, not targets — e.g.
# q_agg_percentile's 1.30s value-map best predates the two-pass bucketed
# order-statistics plan (ops/ExactPercentile, commit 98c0199) that replaced
# it because the per-group value map OOMs at 100x on near-unique columns.
# Times recorded before the named commit are excluded for that query.
PLAN_ERAS = {
    "q_agg_percentile": "98c0199",
    # PassJoin-segment best (0.49s) predates the symmetric-deletion plan
    # (e2e4aa7) that replaced it for the quadratic-on-low-entropy-dictionary
    # scale failure; the deletion plan costs ~0.4s more at the 64-name
    # fixture and ~10x less at a 160k dictionary.
    "q_join_fuzzy": "e2e4aa7",
    # The round-10 fuzzy clause (`sprk~1`, commit 72ba520) added a per-doc
    # token split + thresholded levenshtein exists to the full-scan path —
    # a deliberate QUERY-CONTENT extension (PLANS.md round-10), not a plan
    # regression; pre-fuzzy bests (0.79s) are unreachable by construction.
    "q_idx_text_match": "72ba520",
}


def post_era_revs(era_commit):
    """BENCH-touching revs at or after the era commit (inclusive)."""
    revs = subprocess.check_output(
        ["git", "rev-list", f"{era_commit}~1..HEAD"], text=True).split()
    return set(revs)


def history_best(sf, cpus):
    """Best per-query time over committed BENCH.json versions at the SAME
    scale factor and core count (a sf0.001 or 8-cpu run is not a baseline
    for a sf0.1 32-cpu run; entries without a cpus field predate it and
    were all 32-cpu driver runs). Queries with a PLAN_ERAS entry only
    consider revisions from their current plan's era."""
    revs = subprocess.check_output(
        ["git", "log", "--format=%H", f"{HONEST_SINK_COMMIT}~1..HEAD",
         "--", "BENCH.json"], text=True).split()
    eras = {q: post_era_revs(c) for q, c in PLAN_ERAS.items()}
    best = {}
    for rev in revs:
        try:
            doc = json.loads(subprocess.check_output(
                ["git", "show", f"{rev}:BENCH.json"], text=True,
                stderr=subprocess.DEVNULL))
        except Exception:
            continue
        if doc.get("sf") != sf or doc.get("cpus", 32) != cpus:
            continue
        for q, t in (doc.get("queries") or {}).items():
            if q in eras and rev not in eras[q]:
                continue  # recorded under a retired plan
            if isinstance(t, (int, float)) and t > 0:
                best.setdefault(q, []).append(t)
    # robust baseline: best floored at the history's 25th percentile
    out = {}
    for q, ts in best.items():
        ts.sort()
        p25 = ts[max(0, (len(ts) - 1) // 4)]
        out[q] = max(min(ts), p25) if len(ts) >= 4 else min(ts)
    return out


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH.json"
    doc = json.load(open(path))
    cur = doc.get("queries") or {}
    if not cur:
        print(f"no per-query map in {path}")
        return 2
    sf, cpus = doc.get("sf"), doc.get("cpus", 32)
    print(f"current run: {len(cur)} queries, sf={sf}, cpus={cpus}")
    best = history_best(sf, cpus)
    ratios = {q: cur[q] / best[q] for q in cur if q in best and best[q] > 0}
    if not ratios:
        print("no overlapping history — nothing to compare")
        return 0
    med = statistics.median(ratios.values())
    host = ("quiet" if med <= 1.3 else
            f"UNIFORM DRIFT (median {med:.2f}x = environmental, not regression)")
    print(f"{len(ratios)} queries vs best-of-history; median ratio "
          f"{med:.2f}x -> host: {host}")
    flagged = sorted(
        ((q, r) for q, r in ratios.items() if r > 1.5 and r > 1.5 * med),
        key=lambda x: -x[1])
    # persistence gate: compare against the most recent committed run at
    # the same (sf, cpus) — a suspect not elevated there is transient
    prev = {}
    try:
        revs = subprocess.check_output(
            ["git", "log", "--format=%H", "--", "BENCH.json"], text=True).split()
        for rev in revs:
            d = json.loads(subprocess.check_output(
                ["git", "show", f"{rev}:BENCH.json"], text=True,
                stderr=subprocess.DEVNULL))
            if d.get("sf") == sf and d.get("cpus", 32) == cpus:
                prev = d.get("queries") or {}
                break
    except Exception:
        pass
    # normalize the prev run by ITS OWN median host drift, mirroring the
    # fresh-run test — a uniformly throttled previous run elevates most
    # queries, which would promote roaming noise to "persistent" exactly
    # when host noise is worst
    prev_ratios = [prev[q] / best[q] for q in prev if q in best and best[q] > 0]
    prev_med = statistics.median(prev_ratios) if prev_ratios else 1.0
    persistent, transient = [], []
    for q, r in flagged:
        prev_elevated = (q in prev and q in best and best[q] > 0
                         and prev[q] / best[q] > 1.5
                         and prev[q] / best[q] > 1.5 * prev_med)
        (persistent if prev_elevated else transient).append((q, r))
    if transient:
        print(f"\n{len(transient)} transient suspects (elevated in THIS run "
              "only — rerun to confirm before believing):")
        for q, r in transient:
            print(f"  {q}: {cur[q]:.2f}s vs baseline {best[q]:.2f}s = {r:.1f}x")
    flagged = persistent
    new = sorted(q for q in cur if q not in best)
    if new:
        print(f"{len(new)} queries with no history (new this round): "
              + ", ".join(new[:8]) + ("..." if len(new) > 8 else ""))
    if not flagged:
        print("no isolated regressions (every slow query moved with the host)")
        return 0
    print(f"\n{len(flagged)} ISOLATED regression suspects "
          "(moved >1.5x best AND >1.5x the host median):")
    for q, r in flagged:
        print(f"  {q}: {cur[q]:.2f}s vs best {best[q]:.2f}s = {r:.1f}x")
    return 1


if __name__ == "__main__":
    sys.exit(main())
