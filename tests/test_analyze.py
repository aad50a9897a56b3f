"""A3/A13 tokenizer unit tests (SURVEY.md §5: edge cases)."""

from __future__ import annotations

import pandas as pd

from localsearchengine_spark.config import BM25Config
from localsearchengine_spark.functions.analyze import (
    term_freq_frame,
    tokenize_pandas,
    tokenize_text,
)


def test_basic():
    assert tokenize_text("Hello, World! foo_bar 42") == ["hello", "world", "foo_bar", "42"]


def test_edges():
    assert tokenize_text("") == []
    assert tokenize_text(None) == []
    assert tokenize_text("...!!!---") == []
    assert tokenize_text("a") == ["a"]
    # unicode: non-ascii letters are delimiters under the default pattern
    assert tokenize_text("café naïve") == ["caf", "na", "ve"]


def test_pandas_matches_pure():
    texts = ["The quick brown fox", "", "x  y\tz", "a-b_c", None]
    ser = tokenize_pandas(pd.Series(texts))
    for i, t in enumerate(texts):
        assert list(ser.iloc[i]) == tokenize_text(t)


def test_term_freq_frame():
    out = term_freq_frame(pd.Series(["a b a", "", "b b b"]))
    got = {(int(r.row), r.term): (int(r.tf), int(r.dl)) for r in out.itertuples()}
    assert got == {(0, "a"): (2, 3), (0, "b"): (1, 3), (2, "b"): (3, 3)}


def test_config_pattern():
    cfg = BM25Config(lowercase=False, token_pattern=r"[A-Za-z]+")
    assert tokenize_text("Ab cD 12", cfg) == ["Ab", "cD"]
