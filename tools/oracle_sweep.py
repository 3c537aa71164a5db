"""Wholesale single-session oracle sweep (the round-final record): every
registry query at $SPARK_GRAFT_SF_DIR (default sf0.1) — strict
driver-style value compare (sorted stringified rows, the hash surface)
+ assert_scale_safe on every plan (nested-loop check honors the
documented INTENTIONAL_NESTED_LOOP anchors). ~16 min for the full
registry on local[16]. Usage: python tools/oracle_sweep.py
[--queries name1,name2] (default: the whole registry — targeted
re-proofs reuse the same comparator instead of ad-hoc scripts)."""
import argparse
import os
import sys, time, warnings
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
import duckdb

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = (SparkSession.builder.master("local[16]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "12g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.plans.guard import assert_scale_safe
from tests.test_plans import INTENTIONAL_NESTED_LOOP

q, o = e.queries(), e.oracle_sql()
_ap = argparse.ArgumentParser()
_ap.add_argument("--queries", default="")
_names = [n for n in _ap.parse_args().queries.split(",") if n]
if _names:
    unknown = [n for n in _names if n not in q]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    q = {n: q[n] for n in _names}
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

ok = bad = err = 0
t_all = time.time()
for name in q:
    t0 = time.time()
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            sdf = q[name](spark, SF)
            assert_scale_safe(sdf, allow_nested_loop=name in INTENTIONAL_NESTED_LOOP)
            # Duplicate column names would make name-based alignment
            # arbitrary (ADVICE r11 #5) — refuse instead of guessing.
            scols = list(sdf.columns)
            if len(set(scols)) != len(scols):
                print(f"{name}: DUPLICATE SPARK COLUMNS {scols}", flush=True)
                bad += 1; continue
            srows = sorted(tuple(str(r[c]) for c in scols) for r in sdf.collect())
        res = con.execute(o[name]); dcols = [d[0] for d in res.description]
        if len(set(dcols)) != len(dcols) or set(dcols) != set(scols):
            print(f"{name}: SCHEMA MISMATCH {sorted(scols)} vs {sorted(dcols)}", flush=True)
            bad += 1; continue
        # Align DuckDB columns to the Spark column ORDER explicitly (not
        # an independent sort of each side), so a transposition between
        # same-typed columns cannot silently line up.
        pos = {c: i for i, c in enumerate(dcols)}
        idx = [pos[c] for c in scols]
        drows = sorted(tuple(str(row[i]) for i in idx) for row in res.fetchall())
        if srows == drows:
            ok += 1
            print(f"{name}: MATCH ({len(srows)} rows, {time.time()-t0:.1f}s)", flush=True)
        else:
            bad += 1
            print(f"{name}: VALUE MISMATCH ({len(srows)} vs {len(drows)} rows)", flush=True)
    except Exception as ex:
        err += 1
        print(f"{name}: ERROR {type(ex).__name__}: {str(ex).splitlines()[0][:120]}", flush=True)
print(f"SWEEP DONE: {ok} match, {bad} mismatch, {err} error of {len(q)} in {time.time()-t_all:.0f}s", flush=True)
