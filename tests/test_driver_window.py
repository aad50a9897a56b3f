"""The driver-window contract (SURVEY.md §2 rotation policy): the external
harness verifies only the first 50 entries of queries() in registration
order, so the window composition is itself a correctness-bearing artifact —
pin it."""

from __future__ import annotations

import __spark_entry__ as E
from localsearchengine_spark.plans.relational import _DRIVER_CHECK_PRIORITY


def test_window_is_exactly_the_priority_list():
    names = list(E.queries())
    assert len(_DRIVER_CHECK_PRIORITY) == 50
    assert names[:50] == _DRIVER_CHECK_PRIORITY
    assert len(set(_DRIVER_CHECK_PRIORITY)) == 50  # no duplicates


def test_every_window_row_has_an_oracle():
    # rows-only rows (approx01) must never occupy a window slot a
    # hash-verifiable row could use
    osql = E.oracle_sql()
    missing = [n for n in _DRIVER_CHECK_PRIORITY if n not in osql]
    assert missing == []


def test_never_verified_rows_lead_the_window():
    """Policy: rows without a green CORRECTNESS_r* row in any prior round
    come first.  As of round 5 that is the 12-row round-4 tail plus the 8
    round-5 additions — slots 1-20."""
    never_verified = {
        # round-4 late tail
        "fts27_fuzzy_search", "samp05_temperature_mixing",
        "tx14_pii_redaction", "dd11_boilerplate_lines",
        "tr04_context_window_packing", "b32_correlated_subquery",
        "sim05_mmr_rerank", "b33_window_time_range", "tx15_text_normalize",
        "st05_stream_static_join", "sk04_bloom_semijoin",
        "tr05_role_transitions",
        # round-5 additions
        "st06_stream_stream_interval_join", "b34_grouped_agg_udaf",
        "st07_stream_stream_outer_join", "tx16_zipf_topk",
        "samp06_fixed_sample", "tr06_role_token_stats",
        "pp01_pretrain_pipeline", "st08_stream_session_window",
    }
    assert set(_DRIVER_CHECK_PRIORITY[:20]) == never_verified


def test_rows_past_the_window_are_replica_covered():
    """Every registered row — in or out of the window — must carry either
    an oracle or be an intentional rows-only row, so the local replica
    (tests/test_partb_oracle.py) covers it each run."""
    qs, osql = E.queries(), E.oracle_sql()
    rows_only = {n for n in qs if n not in osql}
    assert rows_only == {"approx01_count_distinct"}
