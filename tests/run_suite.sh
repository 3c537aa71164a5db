#!/usr/bin/env bash
# Full-suite runner that fits a 10-minute wall-clock budget (VERDICT r06 #4).
#
# The suite is ~18 min of CPU across 350+ tests — too slow single-process
# (each pytest process holds ONE session-scoped local[8] SparkSession).
# pytest-xdist is not installed in this container, so parallelism is five
# plain pytest processes over a fixed file partition, balanced by measured
# wall time (the former long pole, test_streaming.py at 6:40, was split —
# its ~20 ingest-store legs now live in test_streaming_stores.py, which
# runs as its own group; measured concurrent group times are 2:30-4:50).
# Each process gets its own JVM at local[8]; streaming groups spend most
# wall time waiting on micro-batch triggers, so 5 x 8 threads on 32 cores
# oversubscribes only nominally. 5 x 8g driver heap fits the 128 GiB box.
#
# Usage (from the repo root):   bash tests/run_suite.sh
# Exit code 0 iff all five groups pass. Logs land in /tmp/rtsm-suite-*.log.
set -u
cd "$(dirname "$0")/.."
export SPARK_GRAFT_DRIVER_MEM="${SPARK_GRAFT_DRIVER_MEM:-8g}"

GROUP1="tests/test_streaming.py"
GROUP2="tests/test_oracle_parity.py tests/test_reference_parity.py"
GROUP3="tests/test_plans.py tests/test_properties.py tests/test_skew.py"
GROUP4="tests/test_caching.py tests/test_changelog.py tests/test_cli.py \
tests/test_dedup_similarity.py tests/test_freshness.py tests/test_joins.py \
tests/test_multimodal.py tests/test_profiling.py tests/test_scaling_probe.py \
tests/test_sources.py tests/test_text_ops.py"
GROUP5="tests/test_streaming_stores.py"

pids=()
names=(streaming oracle plans misc stores)
groups=("$GROUP1" "$GROUP2" "$GROUP3" "$GROUP4" "$GROUP5")
for i in "${!groups[@]}"; do
    # shellcheck disable=SC2086  # word-splitting the file list is the point
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
