"""Guards on the scale-ladder probe's perturbation family (r08).

SCALING.md's slopes are only as honest as the replica transforms'
preservation guarantees, so the guarantees themselves are pinned:

- every per-replica character transform is a BIJECTION on strings
  (within-replica duplicate structure and edit distances preserved
  exactly: chars equal iff images equal);
- all 25 replica transforms are pairwise distinct on representative
  content (cross-replica overlap collapses instead of densifying);
- stopwords / language-marker words pass through untouched (quality
  and langid gate selectivity identical at every rung);
- customer-name transforms keep cross-replica names at edit
  distance >= 2 (no manufactured fuzzy-join pairs).
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import scaling_probe as sp  # noqa: E402


def _apply_chars(word: str, r: int, second_class: str = "bcdfg") -> str:
    """Pure-Python replay of scaling_probe._char_bijection."""

    def translate(s: str, frm: str, to: str) -> str:
        return s.translate(str.maketrans(frm, to))

    out = translate(word, "aeiou", sp._VOWEL_ROTATIONS[r % 5])
    out = translate(out, "lmnprst", sp._rot("lmnprst", r % 7))
    if r >= 5:
        out = translate(out, second_class, sp._rot(second_class, r // 5))
    return out


ALPHABET = "abcdefghijklmnopqrstuvwxyz#0123456789"


@pytest.mark.parametrize("r", range(25))
def test_char_transform_is_a_bijection(r):
    images = [_apply_chars(c, r) for c in ALPHABET]
    assert len(set(images)) == len(ALPHABET), f"replica {r} merges characters"


def test_all_25_replica_transforms_are_distinct():
    probe = "spark table value stream batch big merge"
    images = {_apply_chars(probe, r) for r in range(25)}
    assert len(images) == 25


def test_transform_preserves_word_length():
    for r in range(25):
        for w in ("customer", "lineitem", "x", "part#42"):
            assert len(_apply_chars(w, r)) == len(w)


def test_stopwords_and_lang_markers_are_in_the_preserved_set():
    # The probe skips these at the WORD level; if the engine's lists
    # grow, the probe must re-import them (it does — this pins that the
    # import path still carries every gate-relevant word).
    from real_time_server_monitoring_distributed_pipeline_with_apache_kafka_and_spark_spark.operators.text import (
        _LANG_MARKERS,
        STOPWORDS_EN,
    )

    expect = set(STOPWORDS_EN) | {w for ws in _LANG_MARKERS.values() for w in ws}
    assert expect == sp._PRESERVED_WORDS


def test_customer_names_diverge_across_replicas():
    """Cross-replica c_name edit distance must exceed the fuzzy join's
    distance-1 match radius (the slope-1.0 artifact the probe fixed)."""

    def dist1_or_less(a: str, b: str) -> bool:
        if a == b:
            return True
        if len(a) != len(b):
            return abs(len(a) - len(b)) == 1 and (
                a in (b[:i] + b[i + 1 :] for i in range(len(b)))
                or b in (a[:i] + a[i + 1 :] for i in range(len(a)))
            )
        return sum(x != y for x, y in zip(a, b)) <= 1

    name = "Customer#000000123"
    images = [_apply_chars(name, r, second_class="strm#") for r in range(25)]
    for i in range(25):
        for j in range(i + 1, 25):
            assert not dist1_or_less(images[i], images[j]), (i, j)
