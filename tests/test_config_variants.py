"""SURVEY.md §2.4 contract: matching the reference when it appears must be a
CONFIG FLIP, not a re-architecture — every reference-sensitive knob (idf
variant, k1, b) must stay rank-identical to the independent oracle when
changed.  Builds a small index per configuration and checks the golden
queries on all three query paths."""

from __future__ import annotations

import pytest

from localsearchengine_spark.build import build_index
from localsearchengine_spark.config import BM25Config, BuildConfig
from localsearchengine_spark.operators.search import Index
from localsearchengine_spark.sources.fixtures import golden_queries
from tests.oracle import oracle_search


@pytest.mark.parametrize(
    "cfg",
    [
        BM25Config(idf_variant="rsj"),
        BM25Config(idf_variant="plain"),
        BM25Config(k1=0.9, b=0.4),
        BM25Config(k1=2.0, b=1.0, idf_variant="plain"),
    ],
    ids=["rsj", "plain", "k1_0.9_b_0.4", "k1_2_b_1_plain"],
)
def test_rank_identity_under_config_flips(spark, transcripts_small, tmp_path, cfg):
    path, pdf = transcripts_small
    idx = str(tmp_path / "idx")
    build_index(
        spark, path, idx,
        BuildConfig(bm25=cfg, num_partitions=8, hot_df_threshold=300),
    )
    index = Index(spark, idx)
    docs = list(enumerate(pdf["text"].tolist()))
    # every 5th query: covers single-, two-, and three-term golden queries
    for q in golden_queries()[::5]:
        for mode in ("and", "or", "wand"):
            omode = "or" if mode == "wand" else mode
            exp = oracle_search(
                docs, q["terms"], k=q["k"], mode=omode,
                k1=cfg.k1, b=cfg.b, idf_variant=cfg.idf_variant,
            )
            got = index.search(q["terms"], k=q["k"], mode=mode)
            assert [d for d, _ in got] == [d for d, _ in exp], (cfg, q, mode)
            for (_, gs), (_, es) in zip(got, exp):
                assert abs(gs - es) < 1e-9
