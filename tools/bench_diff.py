"""Round-over-round per-query bench triage (VERDICT r4 #5).

Usage: python tools/bench_diff.py OLD_BENCH_full.json NEW_BENCH_full.json [ratio]

Compares the per-query noise-controlled numbers of two bench runs on
their COMMON query set (median when the file has one — bench.py writes
`queries_median` since round 5 — else warm, else cold) and prints every
query whose ratio new/old exceeds the threshold (default 1.5), plus
totals. Exit code 0 always: the output is a triage worklist, not a
gate.
"""

from __future__ import annotations

import json
import sys


def _per_query(doc: dict) -> dict[str, float]:
    for key in ("queries_median", "queries_warm", "queries"):
        if key in doc and doc[key]:
            return {k: v for k, v in doc[key].items() if v >= 0}
    raise SystemExit("no per-query map found")


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    new_doc = json.load(open(new_path))
    old = _per_query(json.load(open(old_path)))
    new = _per_query(new_doc)
    # baseline-only queries (registry tag, carried in BENCH_full.json)
    # are intentionally-unscalable exact baselines: annotate, don't
    # triage them as regressions.
    baseline_only = set(new_doc.get("baseline_only", ()))
    common = sorted(set(old) & set(new))
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    tot_old = sum(old[q] for q in common)
    tot_new = sum(new[q] for q in common)
    print(
        f"common set: {len(common)} queries, {tot_old:.1f}s -> {tot_new:.1f}s "
        f"({tot_new / tot_old:.2f}x)"
    )
    if only_old:
        print(f"dropped queries ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"new queries ({len(only_new)}): {', '.join(only_new)}")
    rows = []
    for q in common:
        if old[q] <= 0:
            continue
        ratio = new[q] / old[q]
        if ratio >= thresh and new[q] - old[q] >= 0.2:  # ignore sub-noise abs deltas
            if q in baseline_only:
                print(
                    f"baseline-only (not triaged) {ratio:.2f}x {q}: "
                    f"{old[q]:.2f}s -> {new[q]:.2f}s"
                )
                continue
            rows.append((ratio, q, old[q], new[q]))
    for ratio, q, o, n in sorted(rows, reverse=True):
        print(f"REGRESSION {ratio:.2f}x {q}: {o:.2f}s -> {n:.2f}s")
    improved = [
        (new[q] / old[q], q, old[q], new[q])
        for q in common
        if old[q] > 0 and new[q] / old[q] <= 1 / thresh and old[q] - new[q] >= 0.2
    ]
    for ratio, q, o, n in sorted(improved)[:10]:
        print(f"improved {ratio:.2f}x {q}: {o:.2f}s -> {n:.2f}s")
    if not rows:
        print(f"no regressions >= {thresh}x")


if __name__ == "__main__":
    main()
