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


def test_audio_rms_windows_semantics(spark):
    """Odd trailing byte ignored (not a full int16 sample); final partial
    window keeps its true n_samples; RMS equals the numpy model."""
    import numpy as np
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.multimodal import (
        audio_rms_windows,
    )

    # 2 docs: 70 samples (2 full windows + 6-sample partial, 1 odd byte
    # dangling) and 3 bytes (1 sample, 1 dangling)
    b1 = bytes(range(1, 142))  # 141 bytes -> 70 samples
    b2 = bytes([5, 1, 9])      # 3 bytes -> 1 sample
    df = spark.createDataFrame(
        [(1, bytearray(b1)), (2, bytearray(b2))], "doc_id long, payload binary"
    )
    got = {
        (r["doc_id"], r["window_idx"]): (r["n_samples"], r["rms"])
        for r in audio_rms_windows(df).collect()
    }
    s1 = np.frombuffer(b1[:140], dtype="<i2").astype(np.int64)
    assert len(got) == 4  # 3 windows for doc 1, 1 for doc 2
    assert got[(1, 0)][0] == 32 and got[(1, 2)][0] == 6
    for w in range(3):
        chunk = s1[w * 32 : (w + 1) * 32]
        assert got[(1, w)][1] == float(np.sqrt(int((chunk * chunk).sum()) / len(chunk)))
    s2 = np.frombuffer(b2[:2], dtype="<i2").astype(np.int64)
    assert got[(2, 0)] == (1, float(np.sqrt(int((s2 * s2).sum()) / 1)))


def test_image_ahash_known_bits_and_exact_dup(spark):
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.dedup import (
        hamming64_pairs,
    )
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.multimodal import (
        attach_binary_payload,
        image_ahash,
    )

    docs = spark.createDataFrame(
        [
            (1, "ab" * 40),   # alternating bytes: pixels b>mean on odd grid slots
            (2, "ab" * 50),   # same tiled 64-byte grid => identical hash
            (3, "zzzz"),      # uniform grid: strict threshold => all-zero sig
        ],
        "doc_id long, text string",
    )
    sig = {r.doc_id: r for r in image_ahash(attach_binary_payload(docs)).collect()}
    assert sig[3].sig_lo == 0 and sig[3].sig_hi == 0
    # 'ab'*N tiles to the same alternating 64-grid regardless of N.
    assert (sig[1].sig_lo, sig[1].sig_hi) == (sig[2].sig_lo, sig[2].sig_hi)
    # b (0x62) > mean(a,b) on odd positions: 0b1010.. pattern in both halves.
    assert sig[1].sig_lo == sum(1 << j for j in range(1, 32, 2))
    assert sig[1].sig_hi == sum(1 << j for j in range(1, 32, 2))
    pairs = hamming64_pairs(
        image_ahash(attach_binary_payload(docs)), max_hamming=6
    ).collect()
    assert [(p.a_id, p.b_id, p.hamming) for p in pairs] == [(1, 2, 0)]


def test_image_ahash_arrow_twin_is_output_identical(spark):
    """r12 (VERDICT r11 #2): the mapInArrow a-hash twin must be
    bit-identical to the mapInPandas production path on the same
    corpus — including NULL/empty payload degenerate rows — and its
    plan must carry a MapInArrow node (the raw-Arrow map surface the
    census watches), never a pandas conversion node."""
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.plans.inspect import (
        formatted_plan,
    )

    docs = spark.createDataFrame(
        [(1, "ab" * 40), (2, "ab" * 50), (3, "zzzz"), (4, ""), (5, None)],
        "doc_id long, text string",
    )
    wp = mm.attach_binary_payload(docs)
    arrow = mm.image_ahash_arrow(wp)
    plan = formatted_plan(arrow)
    assert "MapInArrow" in plan and "MapInPandas" not in plan
    got = sorted(map(tuple, arrow.collect()))
    twin = sorted(map(tuple, mm.image_ahash(wp).collect()))
    assert got == twin


def test_signature_saturation_guardrail_warns_on_stub_corpus(spark):
    """VERDICT r09 #1 pin: the stub-pixel synthetic corpus SATURATES the
    64-bit a-hash space (SCALING.md measured 6,015 distinct signatures at
    25k docs -> hamming<=6 pair output ~ N^2, ladder slopes 0.94/1.12), so
    at the ladder's corpus size the pre-flight guardrail MUST warn. The
    collision rate is estimated from a bounded md5-sampled probe (decode
    stays O(sample)), exactly as the registry queries wire it."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators import (
        dedup as d,
    )
    from .conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    probe = docs.orderBy(F.md5(F.col("doc_id").cast("string"))).limit(1024)
    sig = mm.image_ahash(mm.attach_binary_payload(probe))
    p_hat = d.estimate_signature_collision_rate(sig)
    assert p_hat > 1e-4, f"stub corpus collision rate {p_hat:.2e} not saturated?"
    with _pytest.warns(d.SignatureSaturationWarning):
        exp = d.warn_if_signature_space_saturated(sig, corpus_count=25_000)
    assert exp > 1.0


def test_signature_saturation_guardrail_silent_on_high_entropy(spark):
    """A HIGH-entropy 64-bit signature distribution (random sigs — what a
    real perceptual hash over real images produces) has hamming<=6 mass
    ~5e-12, so even at N=1e9 (100 TB of documents) the guardrail must
    stay silent: ~0.002 expected pairs/row, output linear."""
    import warnings

    import numpy as np

    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators import (
        dedup as d,
    )

    rng = np.random.default_rng(7)
    rows = [
        (i, int(rng.integers(0, 1 << 32)), int(rng.integers(0, 1 << 32)))
        for i in range(600)
    ]
    hs = spark.createDataFrame(rows, "doc_id: long, sig_lo: long, sig_hi: long")
    with warnings.catch_warnings():
        warnings.simplefilter("error", d.SignatureSaturationWarning)
        exp = d.warn_if_signature_space_saturated(hs, corpus_count=10**9)
    assert exp < 1.0


def test_signature_saturation_estimator_handles_empty_corpus(spark):
    """An empty/1-row corpus has no pairs: the estimator returns 0.0
    instead of crashing on a 0-d numpy shape, and the guardrail lets
    construction proceed silently (the noise-floor contract, mirrored)."""
    import warnings

    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators import (
        dedup as d,
    )

    empty = spark.createDataFrame([], "doc_id: long, sig_lo: long, sig_hi: long")
    assert d.estimate_signature_collision_rate(empty) == 0.0
    with warnings.catch_warnings():
        warnings.simplefilter("error", d.SignatureSaturationWarning)
        assert d.warn_if_signature_space_saturated(empty, corpus_count=0) == 0.0
