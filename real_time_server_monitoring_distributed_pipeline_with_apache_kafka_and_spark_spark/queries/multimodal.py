"""Multimodal-column queries: binary payload plumbing + stubbed decode."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as ops
from ..sources import load_table


def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata struct, projected flat for comparison."""
    docs = load_table(spark, sf_dir, "documents")
    with_payload = ops.attach_binary_payload(docs)
    return with_payload.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
        F.col("meta.mime").alias("mime"),
    )


def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction (deterministic fake
    decoder - see operators.multimodal). Rows-only driver check; values are
    pinned by tests/test_multimodal.py."""
    docs = load_table(spark, sf_dir, "documents")
    return ops.decode_features(ops.attach_binary_payload(docs))


QUERIES = {
    "mm_binary_meta": mm_binary_meta,
    "mm_decode_features": mm_decode_features,
}

ORACLES = {
    "mm_binary_meta": """
SELECT doc_id,
  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
  md5(text) AS checksum,
  'application/octet-stream' AS mime
FROM documents
""",
}
