"""Driver-window freshness invariant (r06 process debt, VERDICT r05 #1-2).

The external correctness driver verifies only the FIRST ~50 registry
entries each round, so with 120+ registered queries a query's "driver
green" goes stale unless the window rotates. This test encodes the
rotation contract as an invariant over the PLANNED next window (the first
50 of ``_PRIORITY``), not just history:

    after the next round runs its window, no registered query's newest
    driver green may be more than MAX_AGE rounds old.

Equivalently: every query whose recorded newest green is already
``next_round - MAX_AGE`` or older MUST sit inside the planned window, and
every never-proven query must too. Capacity check included: the policy is
only satisfiable while ``registered <= WINDOW * (MAX_AGE + 1)``.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50

# Registry-capacity policy history: MAX_AGE 2 -> 3 in r07 (VERDICT r06 #2),
# 3 -> 4 in r09 (VERDICT r08 #2) — both DELIBERATE. At 169 registered
# queries the 50-row window's natural re-proof cycle is ceil(169/50) = 4
# rounds, which MAX_AGE=3 admitted with exactly ONE registration slot of
# headroom (cap 170) — any r09 addition broke the suite. MAX_AGE=4 sets
# capacity at WINDOW*(MAX_AGE+1) = 250 and HEADROOM_CAP = 212 (15%
# reserved headroom, enforced below). The staleness trade: a query's
# driver green may now be up to 4 rounds old before its mandatory
# re-proof. In practice staleness stays at the natural cycle length, not
# the cap, because since r09 queries/__init__.py COMPUTES the window
# oldest-green-first from the committed CORRECTNESS_r*.json history — the
# rotation can no longer drift from the policy by hand-editing error.
#
# FINAL-SIZE POLICY (r10, VERDICT r09 #5): the registry converges to at
# most HEADROOM_CAP = 212 entries — the cap is the declared final size,
# not a ceiling to race. At 175 registered after r09 the remaining 37
# slots are budgeted for genuinely NEW operator classes only (not
# variants of proven shapes), ~3-4 per round across the remaining
# rounds. If the cap is ever reached, the named consolidation candidates
# go first: the *_bucketed flagship twins (fold into a parametrized
# single slot once the zero-exchange plan pins no longer need separate
# driver rows) and the text_stratified_sample / _salted pair (same
# contract, different skew posture). MAX_AGE stays 4; raising it again
# would trade driver-proof freshness for capacity we do not need under
# this budget. (r14, VERDICT r13 #6: the full pre-ranked fold order —
# 5 slots of head-room — is written out in SURVEY §5.10.12; nothing
# folds until the cap actually binds.)
MAX_AGE = 4  # a green from round N satisfies compositions of rounds N..N+MAX_AGE
HEADROOM_FRACTION = 0.15


def _history() -> dict[int, dict]:
    # Same malformed-artifact tolerance as queries/__init__.py::_newest_green
    # (ADVICE r09 #3): a corrupt or non-dict artifact degrades to "absent",
    # so the freshness tests report staleness instead of crashing.
    out = {}
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        try:
            rows = json.load(open(f))
        except (OSError, ValueError):
            continue
        if isinstance(rows, dict):
            out[int(m.group(1))] = rows
    return out


def _newest_green(history: dict[int, dict]) -> dict[str, int]:
    newest: dict[str, int] = {}
    for rnd, rows in history.items():
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            # Green = full hash match, or the rows-only contract for
            # no-oracle sketches (driver ran it and got rows back).
            ok = row.get("hash_match") is True or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if ok:
                newest[name] = max(newest.get(name, -1), rnd)
    return newest


def test_planned_window_keeps_every_query_fresh():
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.queries import (
        _PRIORITY,
    )

    history = _history()
    assert history, "no CORRECTNESS_r*.json found — driver artifacts missing"
    newest = _newest_green(history)
    next_round = max(history) + 1
    window = set(_PRIORITY[:WINDOW])

    stale = []
    for q in _PRIORITY:
        effective = next_round if q in window else newest.get(q, -1)
        if effective < 0:
            stale.append(f"{q}: never driver-proven and NOT in the planned window")
        elif next_round - effective > MAX_AGE:
            stale.append(
                f"{q}: newest driver green r{newest[q]:02d} would be "
                f"{next_round - effective} rounds old after r{next_round:02d} "
                f"and it is not in the planned window"
            )
    assert not stale, (
        f"driver-window rotation debt at r{next_round:02d} "
        f"(lead _PRIORITY with these):\n" + "\n".join(stale)
    )


def test_registry_size_within_rotation_capacity():
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.queries import (
        _PRIORITY,
    )

    capacity = WINDOW * (MAX_AGE + 1)
    headroom_cap = int(capacity * (1 - HEADROOM_FRACTION))
    assert len(_PRIORITY) <= headroom_cap, (
        f"{len(_PRIORITY)} registered queries exceed the policy cap of "
        f"{headroom_cap} ({capacity}-query rotation capacity of a "
        f"{WINDOW}-row window at max age {MAX_AGE}, minus "
        f"{HEADROOM_FRACTION:.0%} reserved headroom); either raise MAX_AGE "
        "deliberately (documenting the staleness trade above) or stop "
        "registering new queries"
    )


def test_bench_headliners_are_registered_queries():
    """Every bench.py headliner must name a registered query — a rename
    or deregistration would otherwise surface only as a driver-side
    bench crash at round end."""
    import bench

    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.queries import (
        _PRIORITY,
    )

    missing = [q for q in bench.HEADLINE if q not in _PRIORITY]
    assert not missing, f"bench headliners not in the registry: {missing}"
    # frozen subtotal sets stay prefixes of the full list
    assert bench.HEADLINE[: len(bench.LEGACY9)] == bench.LEGACY9
    assert bench.HEADLINE[: len(bench.HEADLINE17)] == bench.HEADLINE17


def test_bench_line_fits_driver_budget_with_full_headline():
    """The driver records only the last 2000 chars of stdout and parses the
    final line; bench.py hard-exits when its (fully shed: no normalized
    block, empty recheck) line exceeds 1900 chars. r15 trimmed four
    headliners to fit that budget; r16 restored them by switching the
    emit to compact JSON separators (VERDICT r15 #2). Pin the arithmetic:
    the irreducible line — every headliner at a worst-plausible 99.99 s,
    all three frozen subtotals present — must fit, or a future headliner
    addition re-breaks the driver parse at round end, silently."""
    import json

    import bench

    timings = {name: 99.99 for name in bench.HEADLINE}
    line = json.dumps(
        {
            "metric": "headline_queries_total_runtime",
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "queries": timings,
            "sf": 0.1,
            "legacy9_total": 999.999,
            "headline17_total": 999.999,
            "headline24_total": 999.999,
            "recheck": {},
        },
        separators=(",", ":"),
    )
    assert len(line) <= 1900, (
        f"fully-shed bench line is {len(line)} chars with "
        f"{len(bench.HEADLINE)} headliners — the driver parse budget is "
        "1900; trim emission further before adding headliners"
    )


def test_suite_runner_covers_every_test_file():
    """tests/run_suite.sh partitions the suite into parallel pytest groups
    by EXPLICIT file list — a newly added test file that is not placed in
    a group would silently never run in the suite lane (found nearly-live
    in r07: test_streaming_stores.py split out of test_streaming.py had to
    be added to a group by hand). Pin: every tests/test_*.py appears in
    the runner exactly once — OR, since the r13 rebalance, in several
    groups whose SPARK_GRAFT_PARITY_SHARD specs form a COMPLETE cover
    (same n, shards 0..n-1): a duplicate without complete shards would
    either re-run tests (wasted wall) or, worse, a missing shard would
    silently never run part of the file."""
    script = open(os.path.join(REPO, "tests", "run_suite.sh")).read()
    listed = re.findall(r"tests/(test_\w+\.py)", script)
    on_disk = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(REPO, "tests", "test_*.py"))
    )
    missing = [f for f in on_disk if f not in listed]
    assert not missing, f"test files absent from run_suite.sh groups: {missing}"

    shard_m = re.search(r"\bshards=\(([^)]*)\)", script)
    shard_list = re.findall(r'"([^"]*)"', shard_m.group(1)) if shard_m else []
    env_m = re.search(r"\bshardenvs=\(([^)]*)\)", script)
    env_list = re.findall(r"SPARK_GRAFT_\w+", env_m.group(1)) if env_m else []
    # (spec, env) per group, per file. A spec only shards a file when its
    # env var actually applies to that file: FILE_SHARD shards every file
    # in the group; PARITY_SHARD shards ONLY test_oracle_parity.py (the
    # name-level shard inside the file) — r14 review: treating the two as
    # interchangeable let a parity-spec'd group masquerade as one half of
    # a FILE_SHARD cover.
    file_shards: dict[str, list[tuple[str, str, int]]] = {}
    group_files: dict[int, list[str]] = {}
    for num, body in re.findall(r'GROUP(\d+)="([^"]*)"', script, re.S):
        idx = int(num) - 1
        spec = shard_list[idx] if idx < len(shard_list) else ""
        env = env_list[idx] if idx < len(env_list) else ""
        group_files[idx] = re.findall(r"tests/(test_\w+\.py)", body)
        for f in group_files[idx]:
            applies = spec and (
                env == "SPARK_GRAFT_FILE_SHARD"
                or (env == "SPARK_GRAFT_PARITY_SHARD" and f == "test_oracle_parity.py")
            )
            file_shards.setdefault(f, []).append((spec if applies else "", env, idx))
    for f, entries in file_shards.items():
        specs = [s for s, _, _ in entries]
        if len(entries) == 1:
            # Single-listed: it must NOT be sharded, or part of the file
            # silently never runs (r14 review: the old pin skipped this).
            assert not specs[0], (
                f"{f} is listed once but sharded {specs[0]} — its other "
                "shards run nowhere"
            )
            continue
        parsed = sorted(tuple(int(x) for x in s.split("/")) for s in specs if s)
        assert len(parsed) == len(specs), (
            f"{f} listed in more than one group without applicable shard "
            f"specs (specs+envs: {entries})"
        )
        ns = {n for _, n in parsed}
        assert len(ns) == 1 and [s for s, _ in parsed] == list(range(parsed[0][1])), (
            f"{f}: shard specs {specs} do not form a complete 0..n-1 cover"
        )
        envs = {e for s, e, _ in entries if s}
        assert len(envs) == 1, (
            f"{f}: cover mixes shard env vars {envs} — the shards are not "
            "complements of the same partitioning"
        )
        # FILE_SHARD shards by COLLECTION INDEX across the whole group
        # (conftest): a 0..n-1 spec cover only covers the ITEMS if every
        # group in the cover collects the identical item sequence, i.e.
        # byte-identical file lists, order included (ADVICE r15 #1). A
        # reordered twin would drop some items into no shard while this
        # pin stayed green.
        if envs == {"SPARK_GRAFT_FILE_SHARD"}:
            lists = {i: group_files[i] for _, _, i in entries}
            first = next(iter(lists.values()))
            assert all(fl == first for fl in lists.values()), (
                f"{f}: FILE_SHARD cover groups {sorted(lists)} list "
                f"different file sequences — the index-based shards are "
                f"not complements: {lists}"
            )


def test_no_shadowed_test_definitions():
    """Python silently lets a later `def test_x` shadow an earlier one in
    the same module — the first body then NEVER runs (found live in r07:
    two test_streaming_session_window_matches_batch definitions). Pin
    against recurrence across the whole suite."""
    import collections

    bad = {}
    for path in glob.glob(os.path.join(REPO, "tests", "test_*.py")):
        names = re.findall(r"^def (test_\w+)", open(path).read(), re.M)
        dups = [n for n, c in collections.Counter(names).items() if c > 1]
        if dups:
            bad[os.path.basename(path)] = dups
    assert not bad, f"shadowed test definitions (first body never runs): {bad}"


def test_rotation_orders_oldest_green_first():
    """The computed window leads with live force-head pins, then
    never-proven queries, then oldest-green-first with registration
    order breaking ties (r09: rotation is computed, so the policy is
    testable as a function instead of audited by hand)."""
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.queries import (
        _rotated,
    )

    registered = ("a", "b", "c", "d", "e", "f")
    newest = {"a": 8, "b": 5, "c": 6, "e": 5}  # d, f never proven
    out = _rotated(registered, {}, newest)
    assert out == ("d", "f", "b", "e", "c", "a")


def test_rotation_force_head_pins_and_expires():
    """A force-head pin leads the window while the query's newest green
    predates the pinned round, and drops out (rejoining the age order)
    once a green from that round or later is recorded."""
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.queries import (
        _rotated,
    )

    registered = ("a", "b", "c")
    # a changed in round 9, last green r8 -> pinned first
    assert _rotated(registered, {"a": 9}, {"a": 8, "b": 5, "c": 6}) == ("a", "b", "c")
    # driver re-proved a in r9 -> pin expires, plain age order resumes
    assert _rotated(registered, {"a": 9}, {"a": 9, "b": 5, "c": 6}) == ("b", "c", "a")


def test_rotation_rejects_unregistered_pins():
    import pytest as _pytest

    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.queries import (
        _rotated,
    )

    with _pytest.raises(ValueError, match="not registered"):
        _rotated(("a",), {"zz": 9}, {})


def test_bench_recheck_melt_commits_min_median():
    """ADVICE r12 #2 pin: when the contention recheck's end-of-run
    retime MELTS a spike, the committed median must be the melted
    number (min of the two), not the contended one — a committed
    phantom inflates the next round's recheck baseline so a real
    regression up to its size would pass unflagged. A spike that
    PERSISTS keeps its (identical) number; untouched queries keep
    theirs."""
    import bench

    timings = {"a": 2.4, "b": 1.0, "c": 3.0}
    recheck = {
        "a": {"median": 2.4, "retime": 0.8, "prev": 0.9},  # melted
        "c": {"median": 3.0, "retime": 3.1, "prev": 1.9},  # persisted
    }
    bench.apply_recheck_melts(timings, recheck)
    assert timings == {"a": 0.8, "b": 1.0, "c": 3.0}
    # raw evidence stays intact for adjudication
    assert recheck["a"] == {"median": 2.4, "retime": 0.8, "prev": 0.9}
