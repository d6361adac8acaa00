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
    _host_noise_verdict(json.load(open(old_path)), new_doc, old, new, common)


def _host_noise_verdict(
    old_doc: dict, new_doc: dict,
    old: dict[str, float], new: dict[str, float], common: list[str],
) -> None:
    """Structural host-variance triage (VERDICT r11 #6): a REAL
    regression is localized to the queries whose code changed, while a
    busy co-tenant inflates (almost) everything together. If >80% of
    the common set moved the same direction beyond ±10%, call it host
    noise and say so — the per-query REGRESSION lines above should
    then be read against the uniform factor, not at face value.
    Loadavg telemetry (bench.py `host.passes`) is printed alongside as
    corroboration when both files carry it."""
    sized = [q for q in common if old[q] >= 0.2 and old[q] > 0]
    if len(sized) < 20:
        return
    ratios = sorted(new[q] / old[q] for q in sized)
    n = len(ratios)
    med = ratios[n // 2]
    frac_up = sum(1 for r in ratios if r > 1.10) / n
    frac_down = sum(1 for r in ratios if r < 1 / 1.10) / n
    verdict = "no uniform drift"
    if frac_up > 0.80:
        verdict = (
            f"HOST-NOISE SUSPECTED: {frac_up:.0%} of {n} sized queries "
            f"inflated together (median {med:.2f}x) — treat per-query "
            "regressions as (ratio / uniform factor), or re-run on a "
            "quiet host"
        )
    elif frac_down > 0.80:
        verdict = (
            f"uniform speedup: {frac_down:.0%} of {n} sized queries "
            f"deflated together (median {med:.2f}x) — likely a quieter "
            "host, not a real win; compare medians across rounds"
        )
    print(
        f"host-variance: {verdict} "
        f"(up>{1.10}x: {frac_up:.0%}, down: {frac_down:.0%}, median {med:.2f}x)"
    )
    for tag, doc in (("old", old_doc), ("new", new_doc)):
        passes = doc.get("host", {}).get("passes") or []
        if passes:
            l0 = passes[0].get("loadavg_before")
            l1 = passes[-1].get("loadavg_after")
            print(f"host-loadavg {tag}: start {l0} end {l1}")


if __name__ == "__main__":
    main()
