"""A33 spell correction: edit-distance kernel properties and probe
losslessness of the symmetric-delete candidate generation."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from localsearchengine_spark.operators.spell import edit_distance_le1

from tests.conftest import SF_DIR


def _lev(a: str, b: str) -> int:
    """Reference Levenshtein DP (test-only)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


_word = st.text(alphabet="abcdef_", min_size=0, max_size=8)


@settings(max_examples=300, deadline=None)
@given(_word, _word)
def test_edit_distance_le1_matches_dp(a, b):
    assert edit_distance_le1(a, b) == (_lev(a, b) <= 1)


@pytest.mark.parametrize(
    "a,b,expect",
    [
        ("spark", "spark", True),   # dist 0
        ("spark", "sparkk", True),  # insertion
        ("spark", "spak", True),    # deletion
        ("spark", "spork", True),   # substitution
        ("spark", "sprak", False),  # transposition = dist 2
        ("spark", "sp", False),
        ("", "a", True),
        ("", "ab", False),
    ],
)
def test_edit_distance_le1_cases(a, b, expect):
    assert edit_distance_le1(a, b) is expect


def test_spell_probe_lossless_vs_bruteforce(spark):
    """Symmetric-delete probe ≡ brute-force distance-≤1 scan of the whole
    dictionary, for every probe term (hit-rich, miss, and in-vocabulary)."""
    from localsearchengine_spark.operators.search import Index
    from localsearchengine_spark.plans.entry_helpers import ensure_spell_index

    index = Index(spark, ensure_spell_index(spark, SF_DIR))
    vocab = [
        (r["term"], int(r["df"]))
        for r in index._dataset("dictionary").to_table(
            columns=["term", "df"]
        ).to_pylist()
    ]
    for q in ["aig", "spark", "joun", "zzzzzz", "merg"]:
        brute = sorted(
            ((t, df) for t, df in vocab if edit_distance_le1(q, t)),
            key=lambda r: (-r[1], r[0]),
        )[:10]
        assert index.spell_correct(q, k=10) == brute, q


def test_spell_correct_empty_term_raises(spark):
    from localsearchengine_spark.operators.search import Index
    from localsearchengine_spark.plans.entry_helpers import ensure_spell_index

    index = Index(spark, ensure_spell_index(spark, SF_DIR))
    with pytest.raises(ValueError):
        index.spell_correct("")


def test_search_fuzzy_dismax_over_expansions(spark):
    """A35: 'sart' expands to {part, sort} on this corpus and the fuzzy
    score equals dis-max over that expansion group — strictly at most the
    plain-OR sum, and equal to search_dismax given the same groups."""
    from localsearchengine_spark.operators.search import Index
    from localsearchengine_spark.plans.entry_helpers import ensure_spell_index

    index = Index(spark, ensure_spell_index(spark, SF_DIR))
    exp = [t for t, _ in index.spell_correct("sart", k=16)]
    assert set(exp) == {"part", "sort"}
    fuzzy = index.search_fuzzy(["sart"], k=10)
    assert fuzzy == index.search_dismax([exp], k=10)
    or_scores = dict(index.search(["part", "sort"], k=10_000, mode="or"))
    assert fuzzy and all(s <= or_scores[d] + 1e-12 for d, s in fuzzy)


def test_search_fuzzy_exact_term_degenerates_to_self_group(spark):
    """A distance-0 in-vocabulary term with no other variants scores
    exactly like the plain disjunctive search for that term."""
    from localsearchengine_spark.operators.search import Index
    from localsearchengine_spark.plans.entry_helpers import ensure_spell_index

    index = Index(spark, ensure_spell_index(spark, SF_DIR))
    exp = [t for t, _ in index.spell_correct("customer", k=16)]
    assert exp == ["customer"]
    assert index.search_fuzzy(["customer"], k=10) == index.search(
        ["customer"], k=10, mode="or"
    )


def test_search_fuzzy_unknown_probe_empty(spark):
    from localsearchengine_spark.operators.search import Index
    from localsearchengine_spark.plans.entry_helpers import ensure_spell_index

    index = Index(spark, ensure_spell_index(spark, SF_DIR))
    assert index.search_fuzzy(["zzzzzz"], k=10) == []


def test_build_spell_index_tolerates_auto_shuffle_partitions(spark, tmp_path):
    """"spark.sql.shuffle.partitions" may be the non-numeric "auto" under
    some AQE configurations (this Spark build rejects setting it live, so the
    read is stubbed); the partition-count fallback must not raise."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from localsearchengine_spark.operators.spell import build_spell_index

    idx = tmp_path / "idx"
    (idx / "dictionary").mkdir(parents=True)
    pq.write_table(
        pa.table({"term": ["spark", "spork"], "df": pa.array([3, 1], pa.int64())}),
        str(idx / "dictionary" / "part-0.parquet"),
    )
    class _AutoConf:
        def __init__(self, real):
            self._real = real

        def get(self, key, default=None):
            if key == "spark.sql.shuffle.partitions":
                return "auto"
            return self._real.get(key, default)

    class _Proxy:
        def __init__(self, s):
            self._s = s
            self.conf = _AutoConf(s.conf)

        def __getattr__(self, name):
            return getattr(self._s, name)

    out = build_spell_index(_Proxy(spark), str(idx))
    assert spark.read.parquet(out).count() > 0
