"""Mechanism tests for the training-data pipeline operators
(plans/training_data.py) — the DuckDB parity check lives in
test_partb_oracle.py; these verify algorithmic properties the oracle
comparison alone would not pin down."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from localsearchengine_spark.plans.relational import SPARK_QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def test_minhash_lsh_matches_exact_jaccard(spark):
    """DD3 (signatures → band buckets → verify) must find exactly the pairs
    the exact shingle-join (DD5 at the same threshold) finds — LSH recall 1
    on this corpus, candidate verification kills false positives."""
    from localsearchengine_spark.plans import training_data as td

    lsh = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in td.dd03(spark, SF_DIR).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in td.dd05(spark, SF_DIR)
        .filter(f"jaccard >= {td._MH_THRESHOLD}")
        .collect()
    }
    assert lsh == exact and len(lsh) > 0


def test_ann_lsh_scores_exact_and_sorted(spark):
    """SIM2: approximate candidate generation, but the cosines it reports
    must equal brute force for those ids, descending with vec_id tiebreak."""
    rows = SPARK_QUERIES["sim02_ann_lsh"](spark, SF_DIR).collect()
    assert 0 < len(rows) <= 10
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).collect()
    }
    q = emb[0]
    keys = [(-r["cos"], r["vec_id"]) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        v = emb[r["vec_id"]]
        cos = float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        assert abs(cos - r["cos"]) < 1e-6


def test_frame_sample_shape(spark):
    from localsearchengine_spark.plans import training_data as td

    df = SPARK_QUERIES["mm02_frame_sample"](spark, SF_DIR)
    n_docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).count()
    rows = df.collect()
    assert len(rows) == n_docs * td._MM2_FRAMES
    assert {r["frame_idx"] for r in rows} == set(range(td._MM2_FRAMES))
    assert all(len(r["features"]) == 2 for r in rows)


def test_positional_fingerprint_is_order_sensitive(spark, tmp_path):
    """Same token multiset, different order ⇒ different fp (a bag-of-words
    hash would collide); identical text ⇒ identical fp."""
    docs = pa.Table.from_pylist(
        [
            {"doc_id": 0, "text": "alpha beta gamma", "lang": "en", "source": "s", "n_chars": 16},
            {"doc_id": 1, "text": "gamma beta alpha", "lang": "en", "source": "s", "n_chars": 16},
            {"doc_id": 2, "text": "alpha beta gamma", "lang": "en", "source": "s", "n_chars": 16},
        ]
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r["fp"]
        for r in SPARK_QUERIES["tx03_positional_fingerprint"](spark, str(tmp_path)).collect()
    }
    assert out[0] == out[2] and out[0] != out[1]


def test_simhash_similar_docs_have_close_hashes(spark, tmp_path):
    """Near-identical texts differ in few simhash bits; unrelated texts in
    many — the property that makes simhash a near-dup filter."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = pa.Table.from_pylist(
        [
            {"doc_id": 0, "text": base, "lang": "en", "source": "s", "n_chars": 1},
            {"doc_id": 1, "text": base + " tail", "lang": "en", "source": "s", "n_chars": 1},
            {"doc_id": 2, "text": "completely different words here entirely unrelated content stream", "lang": "en", "source": "s", "n_chars": 1},
        ]
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    h = {
        r["doc_id"]: int(r["simhash"])
        for r in SPARK_QUERIES["dd04_simhash"](spark, str(tmp_path)).collect()
    }
    near = bin(h[0] ^ h[1]).count("1")
    far = bin(h[0] ^ h[2]).count("1")
    assert near < far and near <= 12
