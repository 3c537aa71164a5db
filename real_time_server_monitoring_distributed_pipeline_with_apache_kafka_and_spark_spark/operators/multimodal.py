"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes never round-trip through Python row-at-a-time.

The decode itself is STUBBED (Pillow/librosa/av are not in this
environment): ``fake_decode_features`` derives deterministic pseudo-features
from the payload bytes so the Spark-side plumbing (schema, batching,
partitioning) is real and testable. Swap ``_decode_batch`` for a real
decoder when the libraries exist; ``decode_image_real`` raises
NotImplementedError to mark the seam.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, payload_bytes int, width int, height int, n_channels int, mean_pixel double"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal ingest: payload as opaque bytes + sidecar metadata.

    In a real pipeline the payload column comes from the source (parquet
    BINARY / Kafka value); here it's derived from text so the testdata can
    exercise it.

    Parallelism note: the downstream mapInPandas legs run at the scan's
    partitioning. With the STUB decoder a pre-emptive
    parallelize_if_narrow respread was MEASURED SLOWER at sf0.1 (silence
    trim 0.47s -> 1.08s — the byte math is too cheap to amortize a
    shuffle); when a REAL decoder lands at the decode_image_real seam,
    add the respread THERE, where per-row cost justifies it.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.md5(payload).alias("checksum"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def decode_image_real(payload: bytes):
    """Real image decode - requires Pillow, absent in this environment."""
    raise NotImplementedError(
        "image decode requires Pillow; this environment stubs it with "
        "fake_decode_features (deterministic pseudo-features)"
    )


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decoder: pseudo width/height/channels/mean derived
    from payload length and byte content. Stands in for PIL.Image.open."""
    lengths = pdf["payload"].map(len)
    first = pdf["payload"].map(lambda b: b[0] if len(b) else 0)
    checks = pdf["payload"].map(lambda b: sum(b[:64]))
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "payload_bytes": lengths.astype("int32"),
            "width": (16 + lengths % 240).astype("int32"),
            "height": (16 + checks % 240).astype("int32"),
            "n_channels": (1 + first % 3).astype("int32"),
            "mean_pixel": (checks % 256).astype("float64"),
        }
    )


def decode_features(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` keeps the decode embarrassingly parallel: each task
    decodes its partition's batches independently, no shuffle; at 100 TB
    this scales linearly with executors and the payload column is the only
    one transferred (column pruning).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf)

    return with_payload.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = "doc_id long, payload binary, out_w int, out_h int, n_bytes int"


def resize_images(with_payload: DataFrame, out_w: int = 32, out_h: int = 32) -> DataFrame:
    """Resize plumbing: 1:1 mapInPandas that rewrites the payload column.

    The real implementation decodes, resamples, and re-encodes per batch
    (PIL.Image.resize); the stub deterministically truncates/tiles bytes
    to out_w*out_h so batch shape, schema, and byte-column round-trip
    through Arrow are exercised for real. Narrow op: no shuffle, scales
    with executors."""
    target = out_w * out_h

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(
                lambda b: (b * (target // max(len(b), 1) + 1))[:target]
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "out_w": out_w,
                    "out_h": out_h,
                    "n_bytes": resized.map(len).astype("int32"),
                }
            )

    return with_payload.select("doc_id", "payload").mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary, frame_bytes int"


def sample_frames(
    with_payload: DataFrame, frame_size: int = 64, every_n: int = 4
) -> DataFrame:
    """Frame sampling plumbing: 1:N mapInPandas (one row per kept frame).

    Models video keyframe extraction: the payload is treated as a
    concatenated sequence of ``frame_size``-byte frames; every
    ``every_n``-th frame is emitted as its own row. The real
    implementation swaps the byte-slicing for av/ffmpeg demux — the
    Spark-side contract (row explosion inside the Arrow batch, binary
    output column, downstream per-frame decode) is identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(len(payload) // frame_size, 1)
                for fi in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(bytes(payload[fi * frame_size : (fi + 1) * frame_size]))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                    "frame_bytes": pd.Series([len(f) for f in frames], dtype="int32"),
                }
            )

    return with_payload.select("doc_id", "payload").mapInPandas(run, FRAME_SCHEMA)


AUDIO_RMS_SCHEMA = "doc_id long, window_idx int, n_samples int, rms double"


def audio_rms_windows(
    with_payload: DataFrame, window_samples: int = 32
) -> DataFrame:
    """Windowed RMS energy over an int16 little-endian PCM payload — the
    standard first feature of any audio pipeline (VAD, loudness
    normalization, silence trimming), and unlike the image decoders this
    is REAL math, not a stub: PCM is just integers, so numpy alone
    decodes it (``frombuffer``), no codec library needed.

    1:N row explosion in Arrow-batched ``mapInPandas`` (one row per
    ``window_samples`` window; the final partial window keeps its true
    ``n_samples``). A trailing odd byte is ignored (not a full sample).
    rms = sqrt(sum(sample^2)/n) with an exact int64 square-sum, so the
    only float ops are one divide + one sqrt — both IEEE-correctly
    rounded, which is what makes the output oracle-exact in DuckDB.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "window_idx": [], "n_samples": [], "rms": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                usable = len(payload) - (len(payload) % 2)
                samples = np.frombuffer(payload[:usable], dtype="<i2").astype(
                    np.int64
                )
                for w_idx in range(0, (len(samples) + window_samples - 1) // window_samples):
                    chunk = samples[w_idx * window_samples : (w_idx + 1) * window_samples]
                    ss = int((chunk * chunk).sum())
                    out["doc_id"].append(doc_id)
                    out["window_idx"].append(w_idx)
                    out["n_samples"].append(len(chunk))
                    out["rms"].append(float(np.sqrt(ss / len(chunk))))
            yield pd.DataFrame(out)

    return with_payload.select("doc_id", "payload").mapInPandas(
        run, schema=AUDIO_RMS_SCHEMA
    )


AHASH_SCHEMA = "doc_id long, sig_lo long, sig_hi long"


def image_ahash(with_payload: DataFrame, grid: int = 64) -> DataFrame:
    """Perceptual average-hash (aHash) per image: resize to an 8x8
    grayscale grid, threshold each pixel against the grid mean, pack the
    64 bits — the standard cheap image near-dup signature (robust to
    re-encoding/scaling, unlike byte checksums).

    Decode/resample is the deterministic environment stub (same policy as
    :func:`decode_features`): the payload tiles to ``grid`` bytes and
    each byte IS its pixel — pure byte arithmetic, which is what makes
    the full pipeline oracle-replayable in SQL. A real decoder swaps only
    the pixel extraction inside the Arrow batch loop (PIL open + resize
    + grayscale); the signature packing, schema, and downstream banded
    pair join are production-real.

    Bits land as two positive 32-bit halves (``sig_lo`` bits 0..31,
    ``sig_hi`` bits 32..63 — the simhash_signatures layout), so
    dedup.hamming64_pairs consumes the output directly and no int64
    sign games arise in either engine. Threshold is STRICT (pixel >
    mean): an exactly-uniform tile hashes to all-zeros in both engines.

    Narrow 1:1 mapInPandas: no shuffle, scales with executors; only
    (doc_id, payload) transfers (column pruning).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lo, hi = [], []
            for payload in pdf["payload"]:
                # NULL payload (e.g. NULL source text) hashes like an
                # empty one: all-zero signature — what the SQL oracle's
                # NULL-propagating CASE already yields, and what the
                # mapInArrow twin does.
                if payload is None:
                    payload = b""
                n = max(len(payload), 1)
                pixels = [payload[j % n] if len(payload) else 0 for j in range(grid)]
                mean = sum(pixels) / float(grid)
                lo_bits = 0
                hi_bits = 0
                for j, p in enumerate(pixels):
                    if p > mean:
                        if j < 32:
                            lo_bits |= 1 << j
                        else:
                            hi_bits |= 1 << (j - 32)
                lo.append(lo_bits)
                hi.append(hi_bits)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sig_lo": pd.Series(lo, dtype="int64"),
                    "sig_hi": pd.Series(hi, dtype="int64"),
                }
            )

    return with_payload.select("doc_id", "payload").mapInPandas(run, AHASH_SCHEMA)


def image_ahash_arrow(with_payload: DataFrame, grid: int = 64) -> DataFrame:
    """``mapInArrow`` twin of :func:`image_ahash` — defined
    output-identical (same stub pixel model, same strict > mean
    threshold, same two-halves bit packing), existing to exercise the
    Spark 4 raw-Arrow map surface the census watches (`MapInArrow`),
    exactly as ``text_chunk_udtf`` does for arrow-optimized UDTFs. The
    batch arrives as a ``pyarrow.RecordBatch`` — no pandas conversion
    on either side of the exchange, the one thing ``mapInPandas`` always
    pays — and the signature ints go back as a RecordBatch built from
    ``pa.array`` columns. The mapInPandas twin stays the production
    path (it shares code shape with every other multimodal leg); both
    share one DuckDB oracle. Same narrow 1:1 contract: no shuffle,
    (doc_id, payload) only."""
    import pyarrow as pa

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            payloads = batch.column(1)
            lo: list[int] = []
            hi: list[int] = []
            for scalar in payloads:
                raw = scalar.as_py()
                b = raw if raw is not None else b""
                n = max(len(b), 1)
                pixels = [b[j % n] if len(b) else 0 for j in range(grid)]
                mean = sum(pixels) / float(grid)
                lo_bits = 0
                hi_bits = 0
                for j, p in enumerate(pixels):
                    if p > mean:
                        if j < 32:
                            lo_bits |= 1 << j
                        else:
                            hi_bits |= 1 << (j - 32)
                lo.append(lo_bits)
                hi.append(hi_bits)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), pa.array(lo, pa.int64()), pa.array(hi, pa.int64())],
                names=["doc_id", "sig_lo", "sig_hi"],
            )

    return with_payload.select("doc_id", "payload").mapInArrow(run, AHASH_SCHEMA)


FRAME_FEATURE_SCHEMA = (
    "doc_id long, frame_idx int, sum_byte long, n_byte int, mean_byte double"
)


def frame_mean_features(frames: DataFrame) -> DataFrame:
    """Per-frame mean-byte feature over :func:`sample_frames` output —
    the cheap luminance proxy scene detection thresholds on. Like
    audio_rms_windows this is REAL math (bytes are the data; no codec),
    so the whole downstream pipeline stays oracle-replayable: mean =
    exact integer sum / count, one IEEE division.

    1:1 Arrow-batched mapInPandas; only (doc_id, frame_idx, frame)
    transfer."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sums = pdf["frame"].map(lambda b: int(sum(b)))
            lens = pdf["frame"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_idx": pdf["frame_idx"].astype("int32"),
                    "sum_byte": sums.astype("int64"),
                    "n_byte": lens.astype("int32"),
                    "mean_byte": (
                        sums.astype("float64") / lens.clip(lower=1)
                    ).astype("float64"),
                }
            )

    return frames.select("doc_id", "frame_idx", "frame").mapInPandas(
        run, FRAME_FEATURE_SCHEMA
    )


def scene_segments(
    features: DataFrame, threshold: float = 8.0
) -> DataFrame:
    """Scene segmentation over per-frame features: a new segment starts
    where the feature jumps by more than ``threshold`` vs the previous
    frame — the keyframe/shot-boundary pass of a video curation pipeline
    (dedup/caption one representative per scene, not per frame).

    lag + running-sum per doc (the gaps-and-islands shape, windows sorted
    within each doc's partition only), then one per-segment aggregate.
    The segment mean derives from the EXACT integer byte sums (one
    division at the end), not a float sum of per-frame means — so it is
    order-independent and oracle-hashable without rounding.
    Output: (doc_id, seg_idx, start_frame, n_frames, mean_feature).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    prev = F.lag("mean_byte").over(w)
    chg = F.when(
        prev.isNull() | (F.abs(F.col("mean_byte") - prev) > threshold), 1
    ).otherwise(0)
    runs = features.withColumn("_chg", chg).withColumn("seg_idx", F.sum("_chg").over(w))
    return runs.groupBy("doc_id", "seg_idx").agg(
        F.min("frame_idx").alias("start_frame"),
        F.count(F.lit(1)).alias("n_frames"),
        (F.sum("sum_byte").cast("double") / F.sum("n_byte")).alias("mean_feature"),
    )
