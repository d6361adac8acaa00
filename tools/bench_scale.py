"""Measure sf1/sf0.1 wall-clock ratios for the most expensive queries
(VERDICT r3 #4). Perfectly linear scaling on local[32] would be ~10x;
anything well beyond that needs a plan-level explanation in NOTES.md.

Writes BENCH_scale.json: {name: {sf01, sf1, ratio}}.

Usage: python tools/bench_scale.py [sf1_dir] [--only name1,name2]
                                   [--three sf2_dir]

``--only`` measures just the named queries and MERGES their rows into
the existing BENCH_scale.json (summary stats recomputed over the full
merged map) — for extending the tier without re-running it.

``--three sf2_dir`` adds a third measurement point (a 2x-of-sf1 tier,
built with ``IWS_SCALE_COPIES=20 python tools/gen_scale.py .scale/sf2``)
and records per-query growth exponents alpha10/alpha2 plus an
``accelerating`` flag — a two-point curve cannot distinguish linear
from superlinear growth.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = [
    # dedup family
    "q_llm_dedup_exact", "q_llm_dedup_near", "q_llm_dedup_minhash",
    "q_llm_dedup_simhash", "q_llm_dedup_prefix", "q_llm_dedup_clusters",
    "q_llm_dedup_apply", "q_llm_dedup_embed_lsh", "q_llm_semdedup",
    "q_llm_dedup_lines", "q_llm_boilerplate", "q_llm_chunk_pack_pipeline",
    # similarity / shuffle-heavy
    "q_llm_simsearch_ivf", "q_llm_global_shuffle", "q_graph_pagerank",
    "q_llm_simsearch_pq", "q_llm_mrl_truncation",
    "q_llm_ann_index_lifecycle",
    # DML / MERGE
    "q_dml_merge", "q_dml_delete_positional", "q_sql_merge_stmt",
    # streaming joins / agg
    "q_stream_stream_join", "q_stream_agg_watermark",
    # TPC-H heavies
    "q_join_q21_shape", "q_agg_q9_shape",
    # SQL front-end script replays + statement families (VERDICT r5
    # #5): parser/lifecycle/state-store paths where superlinear
    # surprises hide — each builds its tables at the target SF
    "q_sql_airlines_migration_script", "q_sql_hive_partitioning_script",
    "q_sql_iceberg_partitioning_script", "q_sql_partition_evolution_script",
    # round-13 byte-format round trips: write the whole orders table
    # bucketed/evolved, export metadata, reopen + adopt — the write
    # dominates, so data-linear scaling is the claim to check
    "q_iceberg_export_bucket", "q_iceberg_export_evolved",
    "q_iceberg_foreign_scan", "q_iceberg_changes",
    # round-14 byte-format surface: foreign changelog diffs manifest
    # entries at the endpoints (O(changed files)), metadata tables and
    # ref resolution are metadata-sized — sublinear is the claim
    "q_iceberg_changes_mor", "q_iceberg_metadata_tables",
    "q_iceberg_export_refs", "q_iceberg_foreign_append",
    "q_iceberg_foreign_delete", "q_iceberg_foreign_wap",
    "q_iceberg_foreign_evolve", "q_iceberg_foreign_expire",
    "q_iceberg_foreign_compact", "q_iceberg_foreign_posdelete",
    "q_iceberg_foreign_update",
    "q_sql_transform_ctas_script", "q_sql_expire_stmt",
    "q_sql_call_maintenance_stmt", "q_sql_insert_overwrite_stmt",
    "q_sql_cdc_wap", "q_sql_materialized_view",
    "q_sql_materialized_view_join", "q_sql_scripting",
    "q_sql_merge_evolution_stmt", "q_sql_write_ordered",
    "q_sql_merge_nmbs_stmt", "q_sql_call_rewrite_sort",
    "q_sql_metadata_tables", "q_sql_delete_stmt", "q_sql_analyze_stmt",
    "q_sql_delete_mor_stmt",
    # streaming drains (state store, dedup, upsert, sinks)
    "q_stream_tumbling", "q_stream_sliding", "q_stream_session",
    "q_stream_dedup_watermark", "q_stream_stateful_running",
    "q_stream_session_window", "q_stream_sink_icetbl",
    "q_stream_cdc_upsert", "q_stream_mv_refresh", "q_stream_state_reader",
    # merge-on-read DML at scale
    "q_dml_update_mor", "q_dml_merge_mor",
    # round-7 corpus-analysis additions (join/explode-heavy)
    "q_llm_source_overlap", "q_llm_ngram_novelty", "q_llm_pmi_pairs",
    "q_llm_dedup_bloom", "q_llm_multimodal_phash",
    "q_llm_importance_select",
    # round-8 additions: positional-shingle self-join, full-history
    # sessionization windows, OHLC rollup, REST-catalog round trip
    "q_llm_dedup_spans", "q_win_sessionize", "q_agg_ohlc",
    "q_catalog_rest",
    # late round-8 additions: oriented-wedge join, PassJoin blocking,
    # grid-bucketed spatial join — the superlinear-risk shapes
    "q_graph_triangles", "q_join_editdist", "q_join_spatial_radius",
    "q_llm_dedup_containment",
    # round-9: the scale-safe triangle and containment production paths
    "q_graph_triangles_approx", "q_llm_dedup_containment_prefix",
    # round-9 retrieval + statistics additions
    "q_llm_bm25_topk", "q_llm_hybrid_rrf", "q_llm_drift_ks",
    "q_win_cusum", "q_agg_mannwhitney", "q_stream_drift_window",
    "q_llm_drift_psi",
]


def main() -> None:
    args = list(sys.argv[1:])
    only: list[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = args[i + 1].split(",")
        del args[i : i + 2]
    # --three <sf2_dir>: ALSO measure each query at a 2x-of-sf1 tier
    # and record growth exponents — a two-point curve cannot tell
    # linear from superlinear (VERDICT r8 #5). alpha10 = log10 slope
    # of sf0.1→sf1; alpha2 = log2 slope of sf1→sf2; "accelerating"
    # means alpha2 meaningfully above alpha10.
    sf2_dir: str | None = None
    if "--three" in args:
        i = args.index("--three")
        sf2_dir = args[i + 1]
        del args[i : i + 2]
    # --four <sf4_dir>: a FOURTH point (2x of sf2, IWS_SCALE_COPIES=40)
    # for rows whose sf1→sf2 slope was steep-linear — one more doubling
    # distinguishes "linear with a big constant" from quietly
    # superlinear (VERDICT r10 #7). Requires --three.
    sf4_dir: str | None = None
    if "--four" in args:
        i = args.index("--four")
        sf4_dir = args[i + 1]
        del args[i : i + 2]
        if "--three" not in sys.argv:
            raise SystemExit("--four requires --three")
    sf1_dir = args[0] if args else ".scale/sf1"
    heavy = [n for n in HEAVY if only is None or n in only]
    from iceberg_workshop_spark.registry import queries
    from iceberg_workshop_spark.session import get_spark

    spark = get_spark("iws-bench-scale")
    qs = queries()

    def run(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # one throwaway pass at sf0.001 to warm JIT/codegen for every
    # measured query so cold-compile doesn't pollute the RATIO
    for name in heavy:
        try:
            run(name, "/root/testdata/sf0.001")
        except Exception as exc:  # noqa: BLE001
            print(f"# warm error {name}: {exc}", file=sys.stderr)

    import math

    out: dict[str, dict] = {}
    for name in heavy:
        try:
            t01 = run(name, "/root/testdata/sf0.1")
            t1 = run(name, sf1_dir)
            out[name] = {
                "sf01": t01,
                "sf1": t1,
                "ratio": round(t1 / t01, 2) if t01 > 0 else None,
            }
            if sf2_dir is not None:
                t2 = run(name, sf2_dir)
                row = out[name]
                row["sf2"] = t2
                row["ratio2"] = round(t2 / t1, 2) if t1 > 0 else None
                if t01 > 0 and t1 > 0 and t2 > 0:
                    row["alpha10"] = round(math.log10(t1 / t01), 2)
                    row["alpha2"] = round(math.log2(t2 / t1), 2)
                    # accelerating = the sf1→sf2 slope is meaningfully
                    # SUPERlinear AND above the earlier slope; a
                    # sublinear-to-linear transition (fixed overheads
                    # amortizing out) is healthy, not a red flag.
                    row["accelerating"] = bool(
                        row["alpha2"] > max(row["alpha10"], 1.0) + 0.25
                    )
                if sf4_dir is not None:
                    t4 = run(name, sf4_dir)
                    row["sf4"] = t4
                    row["ratio4"] = round(t4 / t2, 2) if t2 > 0 else None
                    if t1 > 0 and t2 > 0 and t4 > 0:
                        row["alpha2b"] = round(math.log2(t4 / t2), 2)
                        # acceleration now judged on the LAST doubling
                        row["accelerating"] = bool(
                            row["alpha2b"]
                            > max(row.get("alpha2", 0.0), 1.0) + 0.25
                        )
            print(name, out[name], flush=True)
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": str(exc)[:200]}
            print(name, "ERROR", str(exc)[:120], flush=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scale_path = os.path.join(root, "BENCH_scale.json")
    if only is not None and os.path.exists(scale_path):
        # extend-and-merge: keep existing rows, overwrite measured ones
        with open(scale_path) as fh:
            merged = json.load(fh).get("queries", {})
        merged.update(out)
        out = merged
    from iceberg_workshop_spark.registry import TAGS, load_all

    load_all()
    baseline_only = {n for n, t in TAGS.items() if "baseline-only" in t}
    ratios = [v["ratio"] for v in out.values() if v.get("ratio")]
    prod_ratios = [
        v["ratio"]
        for n, v in out.items()
        if v.get("ratio") and n not in baseline_only
    ]
    prev_triage = {}
    if os.path.exists(scale_path):
        with open(scale_path) as fh:
            prev_triage = json.load(fh).get("triage", {})
    summary = {
        "queries": out,
        "triage": prev_triage,
        "baseline_only": sorted(baseline_only & set(out)),
        "max_ratio": max(ratios) if ratios else None,
        "max_ratio_production": max(prod_ratios) if prod_ratios else None,
        "median_ratio": sorted(ratios)[len(ratios) // 2] if ratios else None,
        "n_errors": sum(1 for v in out.values() if "error" in v),
    }
    with open(scale_path, "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=True)
    print(json.dumps({k: summary[k] for k in ("max_ratio", "median_ratio", "n_errors")}))


if __name__ == "__main__":
    main()
