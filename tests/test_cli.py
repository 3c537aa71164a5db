"""End-to-end CLI tests: the reference's main.py roles on our engine.

Covers the full swap-in path: reference-layout config.yaml parsing,
producer fan-out (--dry-run, no broker), landed-CSV analytics jobs
(spark-job1/2) writing reference-shaped alert CSVs.
"""

from __future__ import annotations

import os

from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark import (
    config as cfg,
)

from .fixtures import metrics_wide_df, narrow_splits

REF_YAML = """
team_number: 1
kafka:
  broker_ip: "10.0.0.1:9092"
  topics:
    cpu: "topic-cpu"
    mem: "topic-mem"
    net: "topic-net"
    disk: "topic-disk"
spark_jobs:
  window_duration: "30 seconds"
  slide_duration: "10 seconds"
alert_thresholds:
  cpu_pct: 94.35
  mem_pct: 78.06
  net_in: 4724.68
  disk_io: 4563.25
paths:
  data_file: "{data_file}"
  output_dir: "{output_dir}"
"""


def _write_config(tmp_path, data_file: str) -> str:
    out = tmp_path / "output"
    path = tmp_path / "config.yaml"
    path.write_text(REF_YAML.format(data_file=data_file, output_dir=str(out)))
    return str(path)


def test_from_yaml_reference_layout(tmp_path):
    path = _write_config(tmp_path, "/data/dataset.csv")
    config = cfg.from_yaml(path)
    assert config.kafka.broker == "10.0.0.1:9092"
    assert config.kafka.all_topics == ["topic-cpu", "topic-mem", "topic-net", "topic-disk"]
    assert config.window.duration == "30 seconds"
    assert config.thresholds.net_in == 4724.68
    assert config.paths.data_file == "/data/dataset.csv"


def test_producer_dry_run_and_spark_jobs(spark, tmp_path):
    import main as cli

    wide = metrics_wide_df(spark)
    data_file = str(tmp_path / "dataset_csv")
    wide.coalesce(1).write.csv(data_file, header=True)
    config_path = _write_config(tmp_path, data_file)
    config = cfg.from_yaml(config_path)

    # producer --dry-run: full fan-out transform, landed as parquet
    cli.main(["producer", "--config", config_path, "--dry-run"])
    wire = spark.read.parquet(os.path.join(config.paths.output_dir, "wire_messages"))
    assert wire.columns == ["topic", "value"]
    n_rows = wide.count()
    assert wire.count() == 4 * n_rows  # 4 messages per row, producer.py:68-77
    by_topic = {r["topic"]: r["count"] for r in wire.groupBy("topic").count().collect()}
    assert by_topic == {t: n_rows for t in config.kafka.all_topics}

    # consumer landing simulated from the same fixture (no broker): narrow CSVs
    cpu, mem, net, disk = narrow_splits(wide)
    for stem, df in [("cpu_data", cpu), ("mem_data", mem), ("net_data", net), ("disk_data", disk)]:
        df.coalesce(1).write.csv(
            os.path.join(config.paths.output_dir, stem), header=True, mode="overwrite"
        )

    cli.main(["spark-job1", "--config", config_path])
    job1 = spark.read.csv(
        os.path.join(config.paths.output_dir, "cpu_mem_alerts"), header=True
    )
    assert job1.columns == [
        "server_id", "window_start", "window_end", "avg_cpu", "avg_mem", "alert",
    ]
    assert job1.count() > 0
    labels = {r.alert for r in job1.select("alert").distinct().collect()}
    assert "High CPU + Memory stress" in labels and "OK" in labels

    cli.main(["spark-job2", "--config", config_path, "--parquet"])
    job2 = spark.read.parquet(os.path.join(config.paths.output_dir, "net_disk_alerts"))
    labels2 = {r.alert for r in job2.select("alert").distinct().collect()}
    assert "Network flood + Disk thrash suspected" in labels2
