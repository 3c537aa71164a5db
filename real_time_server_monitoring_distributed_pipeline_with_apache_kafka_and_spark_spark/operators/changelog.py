"""Changelog operators: CDC latest-state merge and SCD2 interval builds.

The reference pipeline lands raw append-only event streams
(``consumers/consumer1.py`` writes every message as a new row) and leaves
"current state" questions to ad-hoc queries; these operators give the two
canonical derived views every warehouse ingest pipeline materializes from
such a log:

- **apply_changelog** (CDC merge / upsert-delete compaction): collapse an
  ordered changelog into the latest row per key, honoring tombstones. The
  MERGE INTO semantics of lakehouse tables, expressed as one
  ``max_by(struct(payload), struct(sequence))`` hash aggregation — partial
  aggregation runs map-side, so a key with a million updates sends ONE
  candidate row per input partition into the single shuffle. No window
  sort, no per-key sort at all; at 100 TB this is the difference between
  an agg that AQE can coalesce and a full log sort.
- **scd2_intervals** (slowly-changing-dimension type 2): compress a
  per-key attribute history into contiguous validity intervals
  ``[valid_from, valid_to)``. One shuffle on the key; run detection and
  interval edges are per-key window functions over the already-co-located
  sort, so the whole build is one exchange + one sort — the minimum for
  an order-dependent computation.

Both are deterministic for any changelog whose sequence columns are
unique per key (ties broken by the full sequence tuple), so results are
engine-reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def apply_changelog(
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
    keep_tombstones: bool = False,
) -> DataFrame:
    """Latest-wins CDC compaction: one surviving row per key, dropped if
    that row is a tombstone.

    ``seq_cols`` order the log within a key (e.g. ``["ts", "event_id"]``);
    the row with the greatest sequence tuple wins. Implementation is a
    single ``max_by`` aggregation over a packed payload struct — the
    orderable-struct comparison gives lexicographic tuple ordering on the
    JVM side, with map-side partial aggregation (each task reduces its
    slice of a key to one candidate before the shuffle). A window
    ``row_number() = 1`` formulation is equivalent but sorts every row of
    every key after the shuffle; this one never materializes a sort.

    Output columns: ``key_cols`` + all non-key columns of ``changes``
    (including ``op_col`` and ``seq_cols``), for the winning row only;
    keys whose winner has ``op_col == delete_op`` are omitted.

    ``keep_tombstones=True`` keeps the winning tombstone ROWS instead —
    the state-store compaction mode: latest-wins is associative, so
    ``apply_changelog(compacted ∪ later) == apply_changelog(full log)``,
    but ONLY if a compacted tombstone stays materialized (dropping it
    would let a late-arriving pre-delete row of the same key win a
    later merge and silently resurrect the key).
    """
    payload_cols = [c for c in changes.columns if c not in key_cols]
    seq = F.struct(*[F.col(c) for c in seq_cols])
    winner = changes.groupBy(*key_cols).agg(
        F.max_by(F.struct(*[F.col(c) for c in payload_cols]), seq).alias("_w")
    )
    out = winner.select(
        *key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload_cols]
    )
    if keep_tombstones:
        return out
    return out.filter(F.col(op_col) != delete_op)


def scd2_intervals(
    df: DataFrame,
    key_cols: list[str],
    attr_col: str,
    ts_col: str = "ts",
    seq_cols: list[str] | None = None,
) -> DataFrame:
    """SCD2 build: per key, contiguous runs of ``attr_col`` become rows
    ``(key, attr, valid_from, valid_to, run_events)`` with half-open
    validity (``valid_to`` is the next run's ``valid_from``; NULL for the
    current run).

    Change points are found with ``lag`` over the per-key order
    (``seq_cols``, default ``[ts_col]``); a running count of change
    points numbers the runs; a per-run aggregate and one more window
    (``lead`` over run starts) close the intervals. All three windows
    share the same partitioning key, so Catalyst plans ONE exchange and
    the sorts reuse the co-location.
    """
    seq_cols = seq_cols or [ts_col]
    order = [F.col(c) for c in seq_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changed = (
        F.lag(attr_col).over(w).isNull()
        | (F.lag(attr_col).over(w) != F.col(attr_col))
    ).cast("int")
    runs = (
        df.withColumn("_chg", changed)
        .withColumn("_run", F.sum("_chg").over(w))
        .groupBy(*key_cols, "_run")
        .agg(
            F.first(attr_col).alias(attr_col),
            F.min(ts_col).alias("valid_from"),
            F.count(F.lit(1)).alias("run_events"),
        )
    )
    w_runs = Window.partitionBy(*key_cols).orderBy("_run")
    return runs.select(
        *key_cols,
        attr_col,
        "valid_from",
        F.lead("valid_from").over(w_runs).alias("valid_to"),
        "run_events",
    )


def snapshot_diff(
    snap_a: DataFrame,
    snap_b: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff of two snapshots of the same keyed table — the data
    regression test between pipeline runs (did yesterday's rebuild add,
    drop, or silently mutate rows?) and the audit step before promoting a
    recomputed table over its predecessor.

    One full-outer shuffle join on the key, then pure row-local
    classification: ``added`` (key only in B), ``removed`` (key only in
    A), ``changed`` (key in both, any compare column differs under
    null-safe equality), ``unchanged``. Column values are compared
    DIRECTLY (``<=>``), never via a serialized checksum string — rendering
    doubles/decimals to text is engine- and locale-dependent, so a
    text-checksum diff can report phantom changes; native comparison
    cannot. Output: the key columns, ``change_type``, and both sides'
    compare columns (``<col>_a`` / ``<col>_b``) for changed-row triage.

    NULL join keys never compare equal (ANSI semantics), so a NULL-keyed
    row can't match its counterpart: it reports as one ``removed`` (the
    A copy) plus one ``added`` (the B copy), never ``unchanged``. Side
    presence is tracked with explicit marker columns — NOT key
    nullability — so those rows still classify by the side they actually
    came from.

    Scale: the join shuffles each side once on the key (sort-merge;
    AQE-skew-splittable); classification is a codegen'd projection. At
    100 TB prefer snapshots both bucketed/partitioned on the key so the
    exchange is pruned or co-located — the operator itself adds nothing
    beyond the one join.
    """
    a_key = [F.col(f"A.{k}").alias(f"_ka_{k}") for k in key_cols]
    b_key = [F.col(f"B.{k}").alias(f"_kb_{k}") for k in key_cols]
    cond = None
    for k in key_cols:
        eq = F.col(f"A.{k}") == F.col(f"B.{k}")
        cond = eq if cond is None else (cond & eq)
    snap_a = snap_a.withColumn("_in_a", F.lit(True))
    snap_b = snap_b.withColumn("_in_b", F.lit(True))
    joined = snap_a.alias("A").join(snap_b.alias("B"), cond, "full_outer").select(
        *a_key,
        *b_key,
        F.col("A._in_a").alias("_in_a"),
        F.col("B._in_b").alias("_in_b"),
        *[F.col(f"A.{c}").alias(f"{c}_a") for c in compare_cols],
        *[F.col(f"B.{c}").alias(f"{c}_b") for c in compare_cols],
    )
    in_a = F.col("_in_a").isNotNull()
    in_b = F.col("_in_b").isNotNull()
    same = None
    for c in compare_cols:
        eq = F.col(f"{c}_a").eqNullSafe(F.col(f"{c}_b"))
        same = eq if same is None else (same & eq)
    change_type = (
        F.when(~in_a, F.lit("added"))
        .when(~in_b, F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *[
            F.when(in_a, F.col(f"_ka_{k}"))
            .otherwise(F.col(f"_kb_{k}"))
            .alias(k)
            for k in key_cols
        ],
        change_type.alias("change_type"),
        *[F.col(f"{c}_a") for c in compare_cols],
        *[F.col(f"{c}_b") for c in compare_cols],
    )
