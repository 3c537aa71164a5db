#!/usr/bin/env python
"""Scale-ladder probe: measure how the heaviest queries scale with data.

The correctness gate runs at sf0.01 and the bench at sf0.1, but the design
target is a 1000-executor cluster over ~100 TB — so the load-bearing
question is not "how fast at sf0.1" but "what EXPONENT does runtime follow
as data grows". This probe builds K=2 and K=5 replicas of sf0.1 in /tmp
(~3M lineitem rows at K=5), times a representative set of the engine's
heaviest queries at each rung on the SAME local[32] box, and fits the
log-log slope. On fixed hardware a scan/shuffle-bound distributed plan
must come out ~linear (slope <= ~1.1); a superlinear slope is exactly the
signature of a scale-killer (pair blowup, driver-side accumulation,
per-round overhead growing with data) that small-SF timing hides.

Replication is DESIGNED to preserve each query's selectivity regime, so
the ladder measures the plan, not an artifact of copying:

- documents: replica r>0 rotates vowels (``translate``) — within-replica
  duplicate/near-dup structure is byte-preserved, while cross-replica
  shingle overlap collapses to ~0, so LSH/shingle pair counts scale K x,
  not K^2 x (straight copies would manufacture a quadratic pair graph and
  unfairly indict the dedup operators).
- embeddings: replica r>0 flips coordinate signs by a deterministic
  (r, dim) pattern — sign^2 = 1 keeps every within-replica dot product
  bit-identical, while cross-replica cosines decorrelate toward 0, so
  kNN/ANN candidate structure replicates instead of densifying.
- events: timestamps shift by r x (span + 1h) and user ids offset, so
  windows, sessions and join intervals replicate instead of merging.
- TPC-H keys offset consistently across customer/orders/lineitem/part/
  supplier; region/nation stay the 5/25-row dims they'd be at any SF.

Usage:  python scaling_probe.py [--replicas 2,5] [--samples 2]
Writes SCALING.json (raw) and prints the fitted table; SCALING.md is the
committed human-readable report.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark import (  # noqa: E402
    session,
)
from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.queries import (  # noqa: E402
    all_queries,
)
from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.sources.readers import (  # noqa: E402
    load_table,
)

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LADDER_ROOT = "/tmp/rtsm-scale"

# Heaviest + one representative per plan family (scan-agg, multi-join,
# window, sessionization, shingle pipeline, graph, vector, composite).
PROBE_QUERIES = [
    "rel_pricing_summary",      # scan + wide agg
    "rel_multiway_revenue",     # star joins
    "rel_topk_per_group",       # ranking window
    "monitor_cpu_mem_alerts",   # join + sliding window + CASE
    "monitor_sessionize",       # gap sessionization windows
    "dedup_exact",              # hash-agg dedup
    "dedup_minhash_lsh",        # shingle -> minhash -> band join -> verify
    "dedup_clusters",           # pair graph + connected components
    "text_dup_spans",           # shingle-level span dedup
    "sim_knn_join",             # LSH bucket join + per-query ranking
    "sim_ann_ivfpq",            # coarse quantize + ADC + exact refine
    "pipeline_training_prep",   # six-stage curation composite
]

_KEYED = {
    # table -> columns offset by r * KEY_OFFSET (consistent across tables)
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
KEY_OFFSET = 100_000_000

_VOWEL_ROTATIONS = ["aeiou", "eioua", "iouae", "ouaei", "uaeio"]
# Second bijection level for K>5: rotating a second, disjoint character
# class (applied for replica r // 5) composes with the vowel rotation
# (r % 5) into 25 distinct bijections — same preservation argument
# (bijections keep within-replica dup structure and edit distances
# exact; distinct compositions keep cross-replica overlap ~0). The
# second class must actually OCCUR in the column's alphabet: 'bcdfg'
# for document prose, 'strm#' for the key-derived "Customer#..." names
# (whose lowercase letters never include b/c/d/f/g).


def _rot(s: str, k: int) -> str:
    k %= len(s)
    return s[k:] + s[:k]


def _char_bijection(col, r: int, second_class: str = "bcdfg"):
    out = F.translate(col, "aeiou", _VOWEL_ROTATIONS[r % 5])
    # Third always-on class (r % 7): rotating consonants too keeps every
    # transform a per-word bijection (dup structure, quality gates, edit
    # distances all preserved within a replica) while replica texts
    # diverge more at the byte level. (r%5, r%7) is injective for
    # r < 35, so all 25 replicas stay distinct even before the r//5
    # class applies. NOTE: this does NOT decorrelate the a-hash stub
    # images — their 64-bit signature space saturates (~6k distinct
    # signatures regardless of corpus size on this word-soup byte
    # stream), so image-pair output grows ~quadratically at K>=5. That
    # is a measured property of the synthetic data's signature entropy,
    # recorded in SCALING.md, not a probe artifact a perturbation can
    # remove without breaking the text-side preservation guarantees.
    out = F.translate(out, "lmnprst", _rot("lmnprst", r % 7))
    if r >= 5:
        out = F.translate(out, second_class, _rot(second_class, r // 5))
    return out

# Words the rotation must NOT touch: the engine's quality gate counts
# STOPWORDS_EN hits and langid counts _LANG_MARKERS hits — rewriting them
# would flip gate decisions at K>1 and the ladder would measure the gate,
# not the plan (observed: pipeline_training_prep got FASTER with more data
# because every replica doc flunked the quality filter).
from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.text import (  # noqa: E402
    _LANG_MARKERS,
    STOPWORDS_EN,
)

_PRESERVED_WORDS = set(STOPWORDS_EN) | {
    w for ws in _LANG_MARKERS.values() for w in ws
}


def _replica(df, table: str, r: int):
    """One perturbed copy of ``df`` for replica index r (r=0 is identity)."""
    if r == 0:
        return df
    off = r * KEY_OFFSET
    if table in _KEYED:
        for c in _KEYED[table]:
            df = df.withColumn(c, F.col(c) + F.lit(off))
        if table == "customer":
            # c_name is key-derived text and feeds the edit-distance-1
            # fuzzy join. Copied verbatim it repeats K x (variant buckets
            # densify K^2 — measured slope 1.0, a probe artifact); the
            # per-replica character bijection preserves every
            # within-replica edit distance exactly (chars equal iff
            # images equal) while the rotated "Customer#" prefix puts
            # cross-replica names at distance >= 2, outside the join.
            df = df.withColumn(
                "c_name", _char_bijection(F.col("c_name"), r, second_class="strm#")
            )
        return df
    if table == "documents":
        # Per-WORD vowel rotation that leaves stopwords / language-marker
        # words untouched: quality_score's stopword ratio, langid's marker
        # hits, token counts, word lengths and lexical diversity (the
        # rotation is a bijection on words) are all preserved — so
        # quality/langid-gated pipelines see the SAME selectivity at every
        # rung — while content words rewrite, which collapses cross-replica
        # shingle overlap to ~0 (a straight copy would manufacture a K^2
        # near-dup pair graph; a whole-text rotation flunks every replica
        # out of the quality gate — both measured, both wrong).
        rotate = lambda w: F.when(  # noqa: E731
            w.isin(*sorted(_PRESERVED_WORDS)), w
        ).otherwise(_char_bijection(w, r))
        return (
            df.withColumn("doc_id", F.col("doc_id") + F.lit(off))
            .withColumn(
                "text",
                F.array_join(F.transform(F.split("text", " "), rotate), " "),
            )
        )
    if table == "embeddings":
        # sign pattern s(r, i) in {-1, +1}: murmur-hash parity on (r, i) —
        # NOT linear-congruential parity, which collapses to (i + r) % 2
        # and makes replicas r and r+2 bit-identical. s^2=1 preserves
        # every within-replica inner product exactly; independent-ish
        # patterns across replicas decorrelate cross-replica cosines.
        sign = lambda x, i: F.when(  # noqa: E731
            F.pmod(F.hash(i, F.lit(r)), F.lit(2)) == 0, x
        ).otherwise(-x)
        return df.withColumn("vec_id", F.col("vec_id") + F.lit(off)).withColumn(
            "embedding", F.transform("embedding", sign)
        )
    if table == "events":
        # ts may surface as TIMESTAMP_NTZ (no direct cast to long); go via
        # an LTZ cast, which is epoch-seconds under the session UTC tz.
        as_secs = lambda c: F.col(c).cast("timestamp_ltz").cast("long")  # noqa: E731
        span = df.agg(
            (F.max(as_secs("ts")) - F.min(as_secs("ts"))).alias("s")
        ).collect()[0]["s"]
        shift = r * (span + 3600)
        return (
            df.withColumn("event_id", F.col("event_id") + F.lit(off))
            .withColumn("user_id", F.col("user_id") + F.lit(off))
            .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {shift} SECOND"))
        )
    return df  # region/nation: fixed dims at every SF


def build_rung(spark: SparkSession, k: int) -> str:
    """Materialize the K-replica rung under /tmp (idempotent)."""
    if k > 25:
        raise ValueError("ladder supports K<=25 (5 vowel x 5 second-class rotations)")
    out = os.path.join(LADDER_ROOT, f"k{k}")
    marker = os.path.join(out, "_LADDER_SUCCESS")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    for table in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        base = load_table(spark, BASE_SF_DIR, table)
        if table in ("region", "nation"):
            df = base
        else:
            parts = [_replica(base, table, r) for r in range(k)]
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
        df.write.mode("overwrite").parquet(os.path.join(out, f"{table}.parquet"))
    open(marker, "w").close()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", default="2,5")
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--queries", default=",".join(PROBE_QUERIES))
    args = ap.parse_args()
    ks = [1] + [int(x) for x in args.replicas.split(",") if x]
    probe = [q for q in args.queries.split(",") if q]

    spark = session.get_spark(app_name="rtsm-scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    rungs = {1: BASE_SF_DIR}
    for k in ks:
        if k > 1:
            rungs[k] = build_rung(spark, k)

    def run_once(name: str, sf_dir: str) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Warmup compiles every plan shape once so codegen isn't charged to K=1.
    for name in probe:
        run_once(name, rungs[1])

    results: dict[str, dict] = {}
    for name in probe:
        times = {}
        for k in ks:
            s = [run_once(name, rungs[k]) for _ in range(args.samples)]
            times[k] = round(statistics.median(s), 3)
        # least-squares slope of log t vs log k over all rungs
        xs = [math.log(k) for k in ks]
        ys = [math.log(max(times[k], 1e-3)) for k in ks]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        denom = sum((x - mx) ** 2 for x in xs)
        slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom
        results[name] = {"times": times, "slope": round(slope, 3)}
        print(f"{name:28s} " + "  ".join(f"k{k}={times[k]:7.3f}s" for k in ks) + f"  slope={slope:0.3f}")

    # Merge into the committed report so partial re-probes (e.g. after an
    # optimization of one query) refresh only their own rows.
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALING.json")
    merged = {"base": BASE_SF_DIR, "ks": ks, "samples": args.samples, "results": {}}
    if os.path.exists(out_path):
        try:
            merged["results"] = json.load(open(out_path)).get("results", {})
        except (ValueError, OSError):
            pass
    merged["results"].update(results)
    # The header must describe the merged file, not just this run: partial
    # re-probes with a shorter --replicas list would otherwise shrink "ks"
    # while entries keep their longer ladders (ADVICE r11 #3). Record the
    # union of rungs actually present across all merged entries.
    merged["ks"] = sorted(
        {int(k) for row in merged["results"].values() for k in row.get("times", {})}
    ) or ks
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
