#!/usr/bin/env bash
# Full-suite runner that fits a 10-minute wall-clock budget (VERDICT r06 #4).
#
# The suite is ~30 min of CPU across 880+ tests — too slow single-process
# (each pytest process holds ONE session-scoped local[8] SparkSession).
# pytest-xdist is not installed in this container, so parallelism is seven
# plain pytest processes over a fixed file partition, balanced by measured
# wall time. Rebalanced r13 (VERDICT r12 #4: the plans group had crept to
# 7:25): test_properties.py leaves the plans group, and the former long
# poles — test_oracle_parity.py (373 tests, 6:50) — splits in two via
# SPARK_GRAFT_PARITY_SHARD=s/n (index-interleaved parametrization shards
# inside the file). Streaming/stores groups spend most wall time waiting
# on micro-batch triggers, so the CPU-bound groups oversubscribe 32 cores
# only nominally. 7 x 8g driver heap fits the 128 GiB box.
#
# Usage (from the repo root):   bash tests/run_suite.sh
# Exit code 0 iff all seven groups pass. Logs land in /tmp/rtsm-suite-*.log.
set -u
cd "$(dirname "$0")/.."
export SPARK_GRAFT_DRIVER_MEM="${SPARK_GRAFT_DRIVER_MEM:-8g}"

GROUP1="tests/test_streaming.py"
GROUP2="tests/test_oracle_parity.py tests/test_reference_parity.py"
GROUP3="tests/test_oracle_parity.py"
GROUP4="tests/test_plans.py tests/test_skew.py"
GROUP5="tests/test_properties.py"
GROUP6="tests/test_caching.py tests/test_changelog.py tests/test_cli.py \
tests/test_dedup_similarity.py tests/test_freshness.py tests/test_joins.py \
tests/test_multimodal.py tests/test_profiling.py tests/test_scaling_probe.py \
tests/test_sources.py tests/test_text_ops.py"
GROUP7="tests/test_streaming_stores.py"

pids=()
names=(streaming oracle-a oracle-b plans properties misc stores)
groups=("$GROUP1" "$GROUP2" "$GROUP3" "$GROUP4" "$GROUP5" "$GROUP6" "$GROUP7")
shards=("" "0/2" "1/2" "" "" "" "")
for i in "${!groups[@]}"; do
    # shellcheck disable=SC2086  # word-splitting the file list is the point
    SPARK_GRAFT_PARITY_SHARD="${shards[$i]}" \
        python -m pytest ${groups[$i]} -q --no-header \
        > "/tmp/rtsm-suite-${names[$i]}.log" 2>&1 &
    pids+=($!)
done

rc=0
for i in "${!groups[@]}"; do
    if ! wait "${pids[$i]}"; then
        rc=1
        echo "GROUP ${names[$i]} FAILED — tail of /tmp/rtsm-suite-${names[$i]}.log:"
        tail -n 30 "/tmp/rtsm-suite-${names[$i]}.log"
    else
        tail -n 1 "/tmp/rtsm-suite-${names[$i]}.log" | sed "s/^/GROUP ${names[$i]}: /"
    fi
done
exit $rc
