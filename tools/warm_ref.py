#!/usr/bin/env python3
"""Regenerate the per-query WARM reference levels in BENCH_SCALING.json.

The bench's probe-series normalization catches degradation SPIKES
(nearest probe above the corroborated-floor band) but is blind to
SUSTAINED moderate degradation: a whole run at ~2x its true warm level
probes "flat" and passes as clean (the round-15 artifact of record
carried untouched queries at 2x their round-14 levels for exactly this
reason). The fix needs a per-query reference that does NOT come from
the run being judged — Bench flags any query above 2x its reference as
sustained_degraded_queries (see Bench.sustainedDegraded).

Reference = the per-query 25TH PERCENTILE across the clean population:

  - every COMMITTED bench_full.json version in git history that is a
    COMPLETE certified-clean close (>= 150 measured queries, >= 10
    probes in the series, empty failed/skipped/capped, empty
    degraded_window_queries, not tainted) — the >=150/>=10 filter
    drops MID-RUN snapshots (the artifact rewrites after every query;
    commits catch partials whose taxonomy is trivially empty);
  - plus the BENCH_SCALING per-query sf0.1 sweep rows (single-query
    warm runs) as one extra sample each.

Why p25 and not min/median: the per-query MIN is maximally fragile to
memo-hit attribution (memo-sharing families charge training to
whichever member measures FIRST, and the heavy-first ordering shifted
across rounds — a close where another member paid leaves a bogus
near-zero "warm level"); the MEDIAN is too lax (half the clean closes
ran on mediocre windows, so 2x median misses real 2x degradation).
The 25th percentile sits at the healthy-window level while shrugging
off a few attribution outliers.

PLAN_CHANGED_SINCE: a query whose measured plan materially changed
invalidates its own history — samples from artifacts committed before
the change date are dropped for that query (it then has no reference,
and therefore no flag, until post-change clean closes accumulate,
exactly like a new query).

Run after a certified-clean bench lands:
    python3 tools/warm_ref.py
Writes the "warm_sf0.1" map in place; every other key is preserved.
"""
import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# query -> commit hash of the plan change: history from artifact
# commits that are PROPER ANCESTORS of this commit is invalid for the
# query. Hash ancestry, not calendar dates (ADVICE r16): commit-date
# granularity cannot order two commits on the change day itself, so a
# date cutoff either kept pre-change closes (strict <) or dropped
# valid post-change closes committed later the same day (<=).
PIN_COMMIT = "30a01334d2d2640006cf6cb7cb0e8add7f3f750d"

PLAN_CHANGED_AT = {
    # round 16: trainHashed epochs restructured join-free; the query's
    # pre-change levels (and the memo-hit era's 0.9s values) are stale
    # (superseded below by the round-17 attribution pin, which is
    # strictly newer — kept for the methodology record)
    # "q167_train_gate": "50712e59de4e45fac8daae6b48cf5f3623e40829",

    # round 17: BPE merge training collapsed to a driver-side loop
    # (one collect instead of nMerges argmax jobs) — intrinsic cost
    # changed for the whole trio
    "q151_bpe_merges": "e8a62622841bdad4c62fe8eb4e18ebbbe81a258d",
    "q153_bpe_encode": "e8a62622841bdad4c62fe8eb4e18ebbbe81a258d",
    "q186_bpe_fit_by_lang": "e8a62622841bdad4c62fe8eb4e18ebbbe81a258d",

    # round 17: memo-family attribution pinned in the bench priority
    # block (payer -> riders). Every historical sample for these eight
    # is bimodal (payer vs rider mode depending on that round's
    # ordering), so the entire pre-pin history is invalid for BOTH
    # modes: the pinned payers' refs must come from pay-mode samples
    # only, the riders' from family-warm samples only.
    "q152_ensemble_neardup": PIN_COMMIT,
    "q155_ensemble_recall": PIN_COMMIT,
    "q162_train_quality": PIN_COMMIT,
    "q167_train_gate": PIN_COMMIT,
    "q174_eval_report": PIN_COMMIT,
    "q175_gate_select": PIN_COMMIT,
    "q176_select_gate": PIN_COMMIT,
    "q178_calibration": PIN_COMMIT,
}

_ancestry_cache: dict = {}


def predates(artifact_commit, change_commit):
    """True when artifact_commit is a PROPER ancestor of change_commit
    (i.e. the artifact was committed before the plan change landed)."""
    key = (artifact_commit, change_commit)
    if key not in _ancestry_cache:
        if artifact_commit == change_commit:
            _ancestry_cache[key] = False
        else:
            rc = subprocess.run(
                ["git", "merge-base", "--is-ancestor",
                 artifact_commit, change_commit],
                cwd=REPO).returncode
            _ancestry_cache[key] = rc == 0
    return _ancestry_cache[key]


def committed_clean_artifacts():
    """(commit-hash, artifact) for every complete certified-clean close."""
    revs = subprocess.run(
        ["git", "log", "--format=%H", "--", "bench_full.json"],
        cwd=REPO, capture_output=True, text=True).stdout.splitlines()
    out = []
    for line in revs:
        r = line.strip()
        if not r:
            continue
        try:
            raw = subprocess.run(
                ["git", "show", f"{r}:bench_full.json"],
                cwd=REPO, capture_output=True, text=True, check=True).stdout
            d = json.loads(raw)
        except Exception:
            continue
        if not str(d.get("sf", "")).endswith("0.1"):
            continue
        if d.get("failed") or d.get("skipped") or d.get("capped"):
            continue
        if d.get("degraded_window_queries") or d.get("tainted"):
            continue
        if len(d.get("queries") or {}) < 150:
            continue
        if len(d.get("vm_health_series") or []) < 10:
            continue
        out.append((r, d))
    return out


def p25(values):
    v = sorted(values)
    i = (len(v) - 1) * 0.25
    lo = int(i)
    return v[lo] if lo == i else v[lo] + (v[lo + 1] - v[lo]) * (i - lo)


def main() -> None:
    scaling_path = os.path.join(REPO, "BENCH_SCALING.json")
    scaling = json.load(open(scaling_path))

    samples: dict = {}
    arts = committed_clean_artifacts()
    for rev, d in arts:
        for k, v in (d.get("queries") or {}).items():
            if k in PLAN_CHANGED_AT and predates(rev, PLAN_CHANGED_AT[k]):
                continue
            try:
                v = float(v)
            except (TypeError, ValueError):
                continue
            if v > 0:
                samples.setdefault(k, []).append(v)

    for k, v in (scaling.get("queries") or {}).items():
        if isinstance(v, dict) and "sf0.1" in v:
            try:
                x = float(v["sf0.1"])
            except (TypeError, ValueError):
                continue
            if x > 0:
                samples.setdefault(k, []).append(x)

    scaling["warm_sf0.1"] = {
        k: round(p25(vs), 3) for k, vs in sorted(samples.items())}
    scaling["warm_sf0.1_note"] = (
        "per-query p25 across complete certified-clean sf0.1 closes + the "
        "scaling sweep; Bench flags sustained_degraded_queries above 2x "
        "this (tools/warm_ref.py; plan-changed queries drop pre-change "
        "history)")
    with open(scaling_path, "w") as f:
        json.dump(scaling, f, indent=1)
        f.write("\n")
    print(f"warm_sf0.1: {len(samples)} refs from {len(arts)} complete "
          f"clean closes written to {scaling_path}")


if __name__ == "__main__":
    main()
