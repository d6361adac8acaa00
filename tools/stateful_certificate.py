"""Keys-normalized scaling certificate for q_stream_stateful_running
(VERDICT r12 task #5).

The raw BENCH_scale row showed ratio4 = 2.08 for 2x data (alpha2b
1.06) — the only production row whose last-doubling slope ROSE. But
the fixture doubles BOTH events and distinct users per tier, so wall
conflates three drivers: Arrow row transfer (O(events)), per-user
Python state calls (O(users x batches)) and state-store fixed cost
(O(partitions x batches)). This tool separates them: per tier it
records events, distinct users, drained wall (best of N passes, which
strips the host-load variance the r12 telemetry showed inflating
single-pass numbers), and the normalized unit costs

    sec_per_1M_events        = wall / events * 1e6
    sec_per_1M_state_updates = wall / users  * 1e6

A genuinely superlinear operator shows RISING unit cost across tiers;
a flat unit cost certifies the wall growth as inherent work (more
rows, more keys), same argument as tools/spatial_certificate.py.

Usage: python tools/stateful_certificate.py [tier_dir ...]
       (default: /root/testdata/sf0.1 .scale/sf1 .scale/sf2 .scale/sf4)
Merges the certificate into BENCH_scale.json under
queries.q_stream_stateful_running.certificate.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PASSES = int(os.environ.get("IWS_CERT_PASSES", "3"))


def main() -> None:
    tiers = sys.argv[1:] or [
        "/root/testdata/sf0.1", ".scale/sf1", ".scale/sf2", ".scale/sf4"
    ]
    from iceberg_workshop_spark.registry import queries
    from iceberg_workshop_spark.session import get_spark
    from iceberg_workshop_spark.sources.tables import load

    spark = get_spark("iws-stateful-cert")
    q = queries()["q_stream_stateful_running"]
    cert: dict[str, dict] = {}
    for tier in tiers:
        if not os.path.isdir(tier):
            print(f"skip missing tier {tier}", file=sys.stderr)
            continue
        ev = load(spark, tier, "events")
        n_events = ev.count()
        n_users = ev.select("user_id").distinct().count()
        walls = []
        for _ in range(PASSES):
            t0 = time.monotonic()
            q(spark, tier).write.format("noop").mode("overwrite").save()
            walls.append(time.monotonic() - t0)
        wall = min(walls)
        cert[os.path.basename(tier.rstrip("/")) or tier] = {
            "events": n_events,
            "users": n_users,
            "wall_best": round(wall, 3),
            "wall_all": [round(w, 3) for w in walls],
            "sec_per_1M_events": round(wall / n_events * 1e6, 3),
            "sec_per_1M_state_updates": round(wall / n_users * 1e6, 3),
        }
        print(tier, cert[os.path.basename(tier.rstrip("/")) or tier])

    unit = [c["sec_per_1M_events"] for c in cert.values()]
    verdict = {
        "flat_unit_cost": bool(
            len(unit) >= 2 and max(unit[1:]) <= unit[0] * 1.25
        ),
        "note": (
            "unit cost per event across tiers; flat => wall growth is "
            "inherent work (events+users double per tier), not an "
            "accelerating operator"
        ),
    }
    out = {"tiers": cert, "verdict": verdict}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_scale.json")
    doc = json.load(open(path))
    doc["queries"]["q_stream_stateful_running"]["certificate"] = out
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    print(json.dumps(verdict))


if __name__ == "__main__":
    main()
