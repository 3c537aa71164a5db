"""Multimodal plumbing: binary payload schema, Arrow batch shape, and
deterministic fake-decode values."""

from __future__ import annotations

import hashlib

from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators import (
    multimodal as mm,
)
from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.sources import (
    load_table,
)

from .conftest import SF_SMOKE


def test_payload_schema_and_checksum(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    wp = mm.attach_binary_payload(docs)
    assert dict(wp.dtypes)["payload"] == "binary"
    row = wp.orderBy("doc_id").first()
    text = docs.orderBy("doc_id").first().text
    assert bytes(row.payload) == text.encode("utf-8")
    assert row.meta.n_bytes == len(text.encode("utf-8"))
    assert row.meta.checksum == hashlib.md5(text.encode("utf-8")).hexdigest()


def test_decode_features_deterministic(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    feats = mm.decode_features(mm.attach_binary_payload(docs))
    assert feats.schema.simpleString() == (
        "struct<doc_id:bigint,payload_bytes:int,width:int,height:int,"
        "n_channels:int,mean_pixel:double>"
    )
    rows = {r.doc_id: r for r in feats.collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert len(rows) == len(texts)
    # replicate the fake decoder for one doc
    doc_id, text = next(iter(texts.items()))
    payload = text.encode("utf-8")
    r = rows[doc_id]
    assert r.payload_bytes == len(payload)
    assert r.width == 16 + len(payload) % 240
    assert r.height == 16 + sum(payload[:64]) % 240
    assert r.n_channels == 1 + payload[0] % 3
    assert r.mean_pixel == float(sum(payload[:64]) % 256)
    # stub seam is explicit
    import pytest

    with pytest.raises(NotImplementedError):
        mm.decode_image_real(b"\x89PNG")
