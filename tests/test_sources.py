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
