#!/usr/bin/env python3
"""Regenerate the per-query WARM reference levels in BENCH_SCALING.json.

The bench's probe-series normalization catches degradation SPIKES
(nearest probe above the corroborated-floor band) but is blind to
SUSTAINED moderate degradation: a whole run at ~2x its true warm level
probes "flat" and passes as clean (the round-15 artifact of record
carried untouched queries at 2x their round-14 levels for exactly this
reason). The fix needs a per-query reference that does NOT come from
the run being judged — this script derives one as the per-query MIN
across the CLEAN reference population and writes it as "warm_sf0.1";
Bench then flags any query above 2x its reference as
sustained_degraded_queries (see Bench.sustainedDegraded).

Reference population — only runs that measure each query warm AND as
its own memo-payer (heavy-first ordering makes per-family training
cost attribution stable):
  - every COMMITTED bench_full.json version in git history whose
    taxonomy is empty (no failed/skipped/capped) and whose
    degraded_window_queries list is empty — the certified-clean closes;
  - the BENCH_SCALING per-query sf0.1 sweep rows (single-query runs).
Driver BENCH_r*.json stdout artifacts are deliberately EXCLUDED: many
were measured in degraded windows, and early rounds ordered queries so
that memo-sharing families attributed training cost differently
(q167's 0.9s there is a memo-hit, not a warm level).

Run after a certified-clean bench lands a new best level:
    python3 tools/warm_ref.py
Writes the "warm_sf0.1" map in place; every other key is preserved.
New queries with no committed clean history get no reference (and
therefore no flag) until their first clean close is committed.
"""
import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def committed_clean_artifacts():
    """Every committed bench_full.json version that is a clean close."""
    revs = subprocess.run(
        ["git", "log", "--format=%H", "--", "bench_full.json"],
        cwd=REPO, capture_output=True, text=True).stdout.split()
    out = []
    for r in revs:
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
        out.append(d)
    return out


def main() -> None:
    scaling_path = os.path.join(REPO, "BENCH_SCALING.json")
    scaling = json.load(open(scaling_path))

    best: dict = {}

    def offer(name: str, v) -> None:
        try:
            v = float(v)
        except (TypeError, ValueError):
            return
        if v <= 0:
            return
        if name not in best or v < best[name]:
            best[name] = v

    arts = committed_clean_artifacts()
    for d in arts:
        for k, v in (d.get("queries") or {}).items():
            offer(k, v)

    for k, v in (scaling.get("queries") or {}).items():
        if isinstance(v, dict) and "sf0.1" in v:
            offer(k, v["sf0.1"])

    scaling["warm_sf0.1"] = {k: round(best[k], 3) for k in sorted(best)}
    scaling["warm_sf0.1_note"] = (
        "per-query best level across committed certified-clean sf0.1 closes "
        "+ the per-query scaling sweep; Bench flags sustained_degraded_queries "
        "above 2x this (tools/warm_ref.py)")
    with open(scaling_path, "w") as f:
        json.dump(scaling, f, indent=1)
        f.write("\n")
    print(f"warm_sf0.1: {len(best)} refs from {len(arts)} clean closes "
          f"written to {scaling_path}")


if __name__ == "__main__":
    main()
