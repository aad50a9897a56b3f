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


def test_arrow_and_pandas_kernels_agree():
    """The Arrow RE2 split path must be row-for-row identical to the findall
    reference on punctuation runs, unicode, empties, and None."""
    import pandas as pd

    from localsearchengine_spark.config import BM25Config
    from localsearchengine_spark.functions.analyze import (
        _term_freq_frame_pandas,
        doc_lengths,
        term_freq_frame,
    )

    texts = pd.Series(
        [
            "Hello, World!  hello_world 123",
            "...___...",
            "",
            None,
            "café über ¡hola! 中文 mixed_ascii",
            "  leading and trailing  ",
            "a a a b",
        ]
    )
    cfg = BM25Config()
    fast = term_freq_frame(texts, cfg).sort_values(["row", "term"]).reset_index(drop=True)
    ref = _term_freq_frame_pandas(texts, cfg).sort_values(["row", "term"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(fast[["row", "term", "tf", "dl"]], ref[["row", "term", "tf", "dl"]])
    import numpy as np

    from localsearchengine_spark.functions.analyze import tokenize_pandas

    assert np.array_equal(
        doc_lengths(texts, cfg),
        tokenize_pandas(texts, cfg).str.len().to_numpy(dtype="int64"),
    )


def test_non_class_pattern_falls_back():
    import pandas as pd

    from localsearchengine_spark.config import BM25Config
    from localsearchengine_spark.functions.analyze import separator_pattern, term_freq_frame

    cfg = BM25Config(token_pattern=r"[a-z]+(?:'[a-z]+)?")
    assert separator_pattern(cfg) is None
    out = term_freq_frame(pd.Series(["it's a test"]), cfg)
    assert set(out["term"]) == {"it's", "a", "test"}


def test_term_freq_arrow_matches_frame():
    """The Arrow-native emit kernel must produce exactly the same
    (row, term, tf, dl[, positions]) content as the pandas reference
    kernel, on both the class-pattern hot path and the findall fallback."""
    import numpy as np
    import pyarrow as pa

    from localsearchengine_spark.config import BM25Config
    from localsearchengine_spark.functions.analyze import (
        term_freq_arrow,
        term_freq_frame,
    )

    texts = pd.Series(
        [
            "Spark SQL engine runs fast",
            "", None, "   ", "a a a b",
            "punct!!! and--dashes__ok 123 mixed42x",
            "the quick the quick the",
        ]
    )
    for cfg in (BM25Config(), BM25Config(token_pattern=r"[a-z]+\d*")):
        for with_pos in (False, True):
            exp = term_freq_frame(texts, cfg, with_positions=with_pos)
            got = term_freq_arrow(pa.array(texts, type=pa.string()), cfg, with_positions=with_pos)
            if not len(exp):
                assert got is None
                continue
            def canon(rows):
                return sorted(rows)
            exp_rows = list(
                zip(exp["row"].tolist(), exp["term"].tolist(), exp["tf"].tolist(), exp["dl"].tolist())
            )
            got_rows = list(
                zip(got["row"].tolist(), got["term"].to_pylist(), got["tf"].tolist(), got["dl"].tolist())
            )
            assert canon(exp_rows) == canon(got_rows), (cfg.token_pattern, with_pos)
            if with_pos:
                exp_pos = {
                    (r, t): list(p)
                    for r, t, p in zip(exp["row"], exp["term"], exp["pos"])
                }
                off, flat = got["pos_off"], got["pos_flat"]
                got_pos = {
                    (r, t): flat[off[i]:off[i + 1]].tolist()
                    for i, (r, t) in enumerate(zip(got["row"].tolist(), got["term"].to_pylist()))
                }
                assert exp_pos.keys() == got_pos.keys()
                assert all(list(exp_pos[k]) == got_pos[k] for k in exp_pos)
