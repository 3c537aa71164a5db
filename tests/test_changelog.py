"""Operator tests: CDC changelog merge, SCD2 intervals, fuzzy self-join,
weighted sampling."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.changelog import (
    apply_changelog,
    scd2_intervals,
)
from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.joins import (
    fuzzy_self_join,
)
from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.text import (
    weighted_sample,
)

from .conftest import SF_SMOKE

_LOG_SCHEMA = "k string, seq int, tie int, payload string, op string"


def _log(spark, rows):
    return spark.createDataFrame(rows, _LOG_SCHEMA)


class TestApplyChangelog:
    def test_latest_wins_and_tombstones(self, spark):
        rows = [
            ("a", 1, 0, "a1", "U"),
            ("a", 2, 0, "a2", "U"),   # winner for a
            ("b", 1, 0, "b1", "U"),
            ("b", 2, 0, "b2", "D"),   # b deleted last -> omitted
            ("c", 5, 0, "c5", "D"),
            ("c", 6, 0, "c6", "U"),   # re-insert after tombstone survives
        ]
        out = apply_changelog(
            _log(spark, rows), key_cols=["k"], seq_cols=["seq", "tie"], op_col="op"
        )
        got = {r["k"]: r["payload"] for r in out.collect()}
        assert got == {"a": "a2", "c": "c6"}

    def test_tie_broken_by_full_sequence_tuple(self, spark):
        rows = [
            ("a", 1, 1, "lo", "U"),
            ("a", 1, 2, "hi", "U"),
        ]
        out = apply_changelog(
            _log(spark, rows), key_cols=["k"], seq_cols=["seq", "tie"], op_col="op"
        )
        assert [r["payload"] for r in out.collect()] == ["hi"]

    def test_matches_window_model_on_events(self, spark):
        """On real data: max_by aggregation == row_number()=1 window model."""
        ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        changes = ev.select(
            "user_id", "ts", "event_id", "event_type",
            F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        )
        got = apply_changelog(
            changes, key_cols=["user_id"], seq_cols=["ts", "event_id"], op_col="op"
        )
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
        want = (
            changes.withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") == 1) & (F.col("op") != "D"))
            .drop("rn")
        )
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0


class TestScd2Intervals:
    def test_small_fixture(self, spark):
        rows = [
            ("u", 1, 0, "x", "U"),
            ("u", 2, 0, "x", "U"),
            ("u", 3, 0, "y", "U"),
            ("u", 4, 0, "x", "U"),  # x recurs -> NEW run, not merged
        ]
        out = scd2_intervals(
            _log(spark, rows).drop("op"),
            key_cols=["k"], attr_col="payload", ts_col="seq", seq_cols=["seq", "tie"],
        ).orderBy("valid_from").collect()
        assert [(r["payload"], r["valid_from"], r["valid_to"], r["run_events"]) for r in out] == [
            ("x", 1, 3, 2),
            ("y", 3, 4, 1),
            ("x", 4, None, 1),
        ]

    def test_invariants_on_events(self, spark):
        ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        out = scd2_intervals(
            ev.select("user_id", "ts", "event_id", "event_type"),
            key_cols=["user_id"], attr_col="event_type",
            ts_col="ts", seq_cols=["ts", "event_id"],
        )
        rows = out.collect()
        n_events = ev.count()
        assert sum(r["run_events"] for r in rows) == n_events
        by_user: dict = {}
        for r in rows:
            by_user.setdefault(r["user_id"], []).append(r)
        n_open = 0
        for user_rows in by_user.values():
            user_rows.sort(key=lambda r: r["valid_from"])
            for a, b in itertools.pairwise(user_rows):
                # half-open intervals tile the key's history with no gaps
                assert a["valid_to"] == b["valid_from"]
                # consecutive runs carry DIFFERENT attribute values
                assert a["event_type"] != b["event_type"]
            assert user_rows[-1]["valid_to"] is None
            n_open += 1
        # exactly one open (current) interval per key
        assert n_open == len(by_user)


class TestFuzzySelfJoin:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        words = [
            "cat", "cut", "cast", "ct", "cats", "dog", "dig", "dug",
            "spark", "spork", "sparks", "park", "shark", "", "a", "b", "ab",
        ]
        return spark.createDataFrame(
            [(i, w) for i, w in enumerate(words)], "id bigint, w string"
        )

    def test_matches_bruteforce(self, corpus, spark):
        got = {
            (r["id_a"], r["id_b"])
            for r in fuzzy_self_join(corpus, "w", "id").collect()
        }
        rows = corpus.collect()

        def lev(s, t):
            if len(s) < len(t):
                s, t = t, s
            prev = list(range(len(t) + 1))
            for i, cs in enumerate(s, 1):
                cur = [i]
                for j, ctch in enumerate(t, 1):
                    cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cs != ctch)))
                prev = cur
            return prev[-1]

        want = {
            (a["id"], b["id"])
            for a, b in itertools.combinations(sorted(rows, key=lambda r: r["id"]), 2)
            if lev(a["w"], b["w"]) <= 1
        }
        assert got == want

    def test_distance_column_is_exact(self, corpus):
        for r in fuzzy_self_join(corpus, "w", "id").collect():
            assert r["distance"] <= 1

    def test_block_cols_restrict_and_null_blocks_never_pair(self, spark):
        """r15 (the ER blocking surface): with block_cols set, two rows
        pair only when EVERY block column is equal — cross-block pairs
        one edit apart must vanish, same-block behavior is unchanged,
        and a NULL block value never asserts a match. block_cols=None
        stays bit-identical to the text-only operator."""
        rows = [
            (0, "cat", "A", 1),   # pairs with 1 (same block, lev 1)
            (1, "cut", "A", 1),
            (2, "cot", "B", 1),   # lev 1 from both, different first block
            (3, "cap", "A", 2),   # lev 1 from 0, different second block
            (4, "car", None, 1),  # lev 1 from 0, NULL block -> never pairs
        ]
        df = spark.createDataFrame(rows, "id bigint, w string, blk string, seg int")
        blocked = {
            (r["id_a"], r["id_b"])
            for r in fuzzy_self_join(
                df, "w", "id", block_cols=["blk", "seg"]
            ).collect()
        }
        assert blocked == {(0, 1)}
        unblocked = {
            (r["id_a"], r["id_b"])
            for r in fuzzy_self_join(df, "w", "id").collect()
        }
        # text-only: exactly the 1-edit pairs (cut/cap etc. are 2 edits)
        assert unblocked == {(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (3, 4)}


class TestEntityResolution:
    def test_survivorship_golden_records(self, spark):
        """r15 composite: a hand-built 3-record chain (a~b, b~c within one
        block — transitivity must merge all three even though a~c is 2
        edits apart), a 1-edit pair split across blocks (must stay two
        entities), and singletons. Survivorship: oldest record's name,
        max balance, exact-decimal total."""
        import real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.queries.relational as rel

        rows = [
            # chain cluster in block (1, 'B1'): keys 10, 11, 12 —
            # Corp~Corps~Corpse is 1 edit per hop, Corp~Corpse is 2
            (10, "Acme Corp", 1, "B1", 100.50),
            (11, "Acme Corps", 1, "B1", 200.25),
            (12, "Acme Corpse", 1, "B1", 50.00),
            # 1-edit names, DIFFERENT nation -> separate entities
            (20, "Zeta Ltd", 1, "B1", 10.00),
            (21, "Zeta Ltd.", 2, "B1", 20.00),
            # singleton
            (30, "Solo Inc", 3, "B2", 5.75),
        ]
        df = spark.createDataFrame(
            rows,
            "c_custkey bigint, c_name string, c_nationkey bigint, "
            "c_mktsegment string, c_acctbal double",
        )
        import tempfile

        with tempfile.TemporaryDirectory() as tmp:
            df.write.parquet(f"{tmp}/customer.parquet")
            got = {
                r["entity_id"]: r
                for r in rel.rel_entity_resolution(spark, tmp).collect()
            }
        assert set(got) == {10, 20, 21, 30}
        g = got[10]
        assert g["n_members"] == 3
        assert g["name"] == "Acme Corp"  # min_by custkey: oldest record wins
        assert g["max_acctbal"] == 200.25
        assert abs(g["total_acctbal"] - 350.75) < 1e-9
        assert got[20]["n_members"] == 1 and got[21]["n_members"] == 1
        assert got[30]["n_members"] == 1 and got[30]["name"] == "Solo Inc"


class TestWeightedSample:
    def test_extremes_and_nesting(self, spark):
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        n = docs.count()
        assert weighted_sample(docs, F.lit(0)).count() == 0
        assert weighted_sample(docs, F.lit(1000)).count() == n
        k300 = {r["doc_id"] for r in weighted_sample(docs, F.lit(300)).collect()}
        k700 = {r["doc_id"] for r in weighted_sample(docs, F.lit(700)).collect()}
        # same salted uniform per row => lower-weight keeps nest in higher
        assert k300 <= k700
        assert len(k300) < len(k700) < n

    def test_partitioning_invariant(self, spark):
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        w = F.least(F.lit(999), F.col("n_chars"))
        a = {r["doc_id"] for r in weighted_sample(docs, w).collect()}
        b = {r["doc_id"] for r in weighted_sample(docs.repartition(13), w).collect()}
        assert a == b


class TestSnapshotDiff:
    def _frames(self, spark):
        from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.changelog import (
            snapshot_diff,
        )

        a = spark.createDataFrame(
            [(1, "x", 10.0), (2, "y", 20.0), (3, "z", None), (4, "w", 40.0)],
            "k long, s string, v double",
        )
        b = spark.createDataFrame(
            [(2, "y", 20.0), (3, "z", None), (4, "W", 40.0), (5, "n", 50.0)],
            "k long, s string, v double",
        )
        return snapshot_diff(a, b, ["k"], ["s", "v"])

    def test_classification(self, spark):
        got = {r["k"]: r["change_type"] for r in self._frames(spark).collect()}
        # 1 only in A; 5 only in B; 4 differs on s; 2 identical;
        # 3 has NULL v on BOTH sides — null-safe compare => unchanged,
        # the case a naive `=` comparison silently misclassifies.
        assert got == {
            1: "removed",
            5: "added",
            4: "changed",
            2: "unchanged",
            3: "unchanged",
        }

    def test_changed_rows_carry_both_sides(self, spark):
        row = self._frames(spark).filter(F.col("k") == 4).collect()[0]
        assert (row["s_a"], row["s_b"]) == ("w", "W")
        assert row["v_a"] == row["v_b"] == 40.0

    def test_null_to_value_is_changed(self, spark):
        from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.changelog import (
            snapshot_diff,
        )

        a = spark.createDataFrame([(1, None)], "k long, v string")
        b = spark.createDataFrame([(1, "now-set")], "k long, v string")
        row = snapshot_diff(a, b, ["k"], ["v"]).collect()[0]
        assert row["change_type"] == "changed"

    def test_composite_key(self, spark):
        from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.changelog import (
            snapshot_diff,
        )

        a = spark.createDataFrame([(1, "p", 5), (1, "q", 6)], "k long, sub string, v int")
        b = spark.createDataFrame([(1, "p", 5), (2, "p", 7)], "k long, sub string, v int")
        got = {
            (r["k"], r["sub"]): r["change_type"]
            for r in snapshot_diff(a, b, ["k", "sub"], ["v"]).collect()
        }
        assert got == {(1, "p"): "unchanged", (1, "q"): "removed", (2, "p"): "added"}

    def test_null_key_rows_classify_by_side(self, spark):
        """ANSI semantics: NULL keys never join, so a NULL-keyed row
        reports by the side it CAME FROM (removed for A, added for B) —
        presence is tracked by marker columns, not key nullability (a
        key-null test misreported A-side NULL keys as 'added')."""
        from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.changelog import (
            snapshot_diff,
        )

        a = spark.createDataFrame([(None, "old")], "k string, v string")
        b = spark.createDataFrame([(None, "new")], "k string, v string")
        got = sorted(
            (r["change_type"], r["v_a"], r["v_b"])
            for r in snapshot_diff(a, b, ["k"], ["v"]).collect()
        )
        assert got == [("added", None, "new"), ("removed", "old", None)]
