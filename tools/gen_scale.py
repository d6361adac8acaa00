"""Generate a 10x scale tier (sf1) from the driver's sf0.1 fixtures.

VERDICT r3 #4: every scale claim so far is a plan argument; this tier
exists to MEASURE the expensive queries at 10x and catch superlinear
surprises (CC iteration growth, LSH bucket skew) the plans can't show.

Each fact table is unioned 10x with per-copy key offsets. Content
perturbation keeps corpus statistics realistic instead of making every
row a 10-way duplicate:
- documents: every 7th token gets a per-copy suffix — same length and
  near-same token distribution, but each substitution corrupts the 5
  shingle windows covering it (~5/7 of all 5-grams), dropping
  cross-copy Jaccard to ~0.1, far below every dedup threshold. (A
  pure token ROTATION does NOT work: it preserves the shingle set up
  to the seam, making all 10 copies accidental 0.95-Jaccard
  near-duplicates — measured ratios then reflect an artifact
  10-way-dup corpus, not the operator.) The near-dup structure of
  each copy stays internal, so the dup RATE matches sf0.1;
- embeddings: vector rotated by copy index — norm preserved,
  decorrelated across copies;
- events/orders/lineitem/customer/part/supplier: key offsets only;
  timestamps unchanged (a time bucket holds 10x the rows — exactly
  what a scale-up does);
- region/nation: copied verbatim (dimensions don't scale).

Usage: python tools/gen_scale.py [out_dir]   (default .scale/sf1)
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("IWS_SCALE_SRC", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("IWS_SCALE_COPIES", "10"))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1"
    os.makedirs(out, exist_ok=True)
    from pyspark.sql import functions as F

    from iceberg_workshop_spark.session import get_spark

    spark = get_spark("iws-gen-scale")

    for t in ("region", "nation"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")

    def write(df, name):
        # single file per table, matching the fixture layout the
        # queries' file-count-sensitive paths expect
        df.coalesce(1).write.mode("overwrite").parquet(f"{out}/_{name}")
        part = [
            f for f in os.listdir(f"{out}/_{name}") if f.endswith(".parquet")
        ][0]
        shutil.move(f"{out}/_{name}/{part}", f"{out}/{name}.parquet")
        shutil.rmtree(f"{out}/_{name}")
        print(name, "written", flush=True)

    def replicate(name, key_cols, extra=None):
        base = spark.read.parquet(f"{SRC}/{name}.parquet")
        offs = {c: base.agg(F.max(c)).first()[0] + 1 for c in key_cols}
        parts = []
        for c in range(COPIES):
            p = base
            for col, off in offs.items():
                p = p.withColumn(col, F.col(col) + F.lit(c * off))
            if extra is not None:
                p = extra(p, c)
            parts.append(p)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        write(df, name)

    replicate("customer", ["c_custkey"])
    replicate("supplier", ["s_suppkey"])
    replicate("part", ["p_partkey"])
    replicate("orders", ["o_orderkey", "o_custkey"])
    replicate("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    replicate("events", ["event_id", "user_id"])

    def perturb_text(p, c):
        if c == 0:
            return p
        phase = c % 7
        return p.withColumn(
            "text",
            F.expr(
                "array_join(transform(split(text, ' '),"
                f" (t, i) -> CASE WHEN i % 7 = {phase}"
                f" THEN concat(t, '_x{c}') ELSE t END), ' ')"
            ),
        )

    replicate("documents", ["doc_id"], extra=perturb_text)

    def rot_vec(p, c):
        if c == 0:
            return p
        k = c % 8 + 1
        return p.withColumn(
            "embedding",
            F.expr(
                f"concat(slice(embedding, {k} + 1, 1000000),"
                f" slice(embedding, 1, {k}))"
            ),
        )

    replicate("embeddings", ["vec_id"], extra=rot_vec)
    print("done:", out)


if __name__ == "__main__":
    main()
