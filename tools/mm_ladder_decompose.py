"""Decompose the two steepest ladder rows (VERDICT r11 #4):
mm_image_dedup_clusters (slope 0.92) and pipeline_multimodal_prep
(0.827) — is the K=25 cost the decode/signature SCAN or the hamming
band JOIN (and is the join cost candidate-driven or true-output-driven)?

Prints per-rung: signature-stage seconds, pair-stage seconds (signature
included — the stage delta is the join cost), full-query seconds,
distinct-signature occupancy, band-candidate count, and true hamming<=6
pair count. Usage: python tools/mm_ladder_decompose.py [--ks 1,5,25]
[--regime grouped|id|both]

``--regime`` (ADVICE r12 #3): the r12 before/after comparison timed the
then-default id-level banding; the a-hash family has since shipped on
``group_signatures=True``, so re-running the committed tool must be able
to measure the plan the queries actually use. Default ``both`` times the
pair stage under each regime per rung (the full-query timings always
exercise whatever the registry queries ship with).
"""
import argparse
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark import (  # noqa: E402
    session,
)
from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators import (  # noqa: E402
    multimodal as mm,
)
from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.dedup import (  # noqa: E402
    hamming64_pairs,
)
from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.queries import (  # noqa: E402
    all_queries,
)
from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.sources import (  # noqa: E402
    load_table,
)
from scaling_probe import BASE_SF_DIR, build_rung  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="1,5,25")
    ap.add_argument("--regime", choices=("grouped", "id", "both"), default="both")
    args = ap.parse_args()
    ks = [int(x) for x in args.ks.split(",")]
    regimes = {
        "grouped": (True,),
        "id": (False,),
        "both": (True, False),
    }[args.regime]

    spark = session.get_spark(app_name="rtsm-mm-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    def noop(df) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for k in ks:
        sf_dir = BASE_SF_DIR if k == 1 else build_rung(spark, k)
        docs = load_table(spark, sf_dir, "documents")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            sig = mm.image_ahash(mm.attach_binary_payload(docs))
            # warmup: compile shapes once per rung
            noop(sig)
            t_sig = noop(sig)
            t_pairs = {}
            pairs = None
            for grouped in regimes:
                pairs = hamming64_pairs(
                    sig,
                    "doc_id",
                    max_hamming=6,
                    n_chunks=8,
                    group_signatures=grouped,
                )
                t_pairs["grouped" if grouped else "id"] = noop(pairs)
            t_full = noop(queries["mm_image_dedup_clusters"](spark, sf_dir))
            t_prep = noop(queries["pipeline_multimodal_prep"](spark, sf_dir))
            n_docs = docs.count()
            n_sigs = sig.select("sig_lo", "sig_hi").distinct().count()
            n_pairs = pairs.count()
        pair_str = " ".join(
            f"pairs[{regime}](sig+join)={t:.1f}s" for regime, t in t_pairs.items()
        )
        print(
            f"K={k:2d} docs={n_docs} distinct_sigs={n_sigs} "
            f"occupancy={n_docs / max(n_sigs, 1):.1f} "
            f"true_pairs={n_pairs} | sig={t_sig:.1f}s "
            f"{pair_str} clusters={t_full:.1f}s "
            f"mm_prep={t_prep:.1f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
