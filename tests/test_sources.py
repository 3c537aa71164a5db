"""Source/sink layout tests."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.sources.readers import (
    write_range_sorted,
)

from .conftest import SF_SMOKE


def test_range_sorted_layout_disjoint_files(spark, tmp_path):
    """write_range_sorted must produce files whose ts key ranges are
    pairwise disjoint (footer min/max proves a range reader can skip
    every non-overlapping file) and fully sorted within each file."""
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "ts", "value"
    )
    out = str(tmp_path / "range_sorted")
    write_range_sorted(ev, out, sort_cols=["ts"], n_files=8)

    ranges = []
    n_rows = 0
    for f in glob.glob(f"{out}/part-*.parquet"):
        pf = pq.ParquetFile(f)
        file_min = file_max = None
        prev_group_max = None
        for g in range(pf.metadata.num_row_groups):
            col = next(
                pf.metadata.row_group(g).column(i)
                for i in range(pf.metadata.row_group(g).num_columns)
                if pf.metadata.row_group(g).column(i).path_in_schema == "ts"
            )
            stats = col.statistics
            assert stats is not None and stats.has_min_max
            # row groups are internally ordered too (sortWithinPartitions)
            if prev_group_max is not None:
                assert stats.min >= prev_group_max
            prev_group_max = stats.max
            file_min = stats.min if file_min is None else min(file_min, stats.min)
            file_max = stats.max if file_max is None else max(file_max, stats.max)
            n_rows += pf.metadata.row_group(g).num_rows
        if file_min is not None:
            ranges.append((file_min, file_max))

    assert n_rows == ev.count()
    assert len(ranges) > 1  # range partitioning actually split the data
    ranges.sort()
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b, f"overlapping file ranges: {(lo_a, hi_a)} vs {(lo_b, hi_b)}"


def test_jsonl_roundtrip_and_corrupt_line_audit(spark, tmp_path):
    """S1 extension: explicit-schema JSONL source/sink. Round-trips the
    documents table losslessly, and a malformed line lands in
    _corrupt_record (audit-then-drop) instead of failing the scan or
    silently vanishing."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.sources import (
        load_table,
    )
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.sources.readers import (
        read_jsonl,
        write_jsonl,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out)
    back = read_jsonl(spark, out, docs.schema)
    want = sorted(tuple(r) for r in docs.collect())
    got = sorted(tuple(r) for r in back.collect())
    assert got == want

    # Corrupt line handling: append a garbage file into the directory.
    (tmp_path / "docs_jsonl" / "zz_garbage.json").write_text(
        '{"doc_id": 1, "text": "ok-line", "lang": "en", "source": "s", "n_chars": 7}\n'
        "{not json at all\n"
    )
    audit_schema = StructType(
        list(docs.schema.fields) + [StructField("_corrupt_record", StringType())]
    )
    # Spark disallows projecting ONLY _corrupt_record from a raw JSON
    # scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize full rows.
    rows = read_jsonl(spark, out, audit_schema).collect()
    n_bad = sum(1 for r in rows if r._corrupt_record is not None)
    assert n_bad == 1
    assert len(rows) - n_bad == docs.count() + 1
