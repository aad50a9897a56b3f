"""pp01 end-to-end pipeline: the driver corpus is clean, so each stage is
proven NON-HOLLOW here with planted defects — one document per gate, each
dropped at exactly the intended stage, plus a normalize+dedup pair the
clean corpus cannot exercise.  (Cross-engine parity at corpus scale is
covered by tests/test_partb_oracle.py.)"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from localsearchengine_spark.plans.pipeline import pp01


def _write_docs(tmp_path, texts: list[str]) -> str:
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def test_pipeline_each_gate_drops_its_planted_defect(spark, tmp_path):
    clean = "alpha beta gamma delta epsilon zeta"  # 6 tokens, all unique
    texts = [
        clean,                                   # 0: survives
        "\t Alpha beta gamma  delta epsilon zeta ",  # 1: normalizes == doc 0 → deduped
        "too short",                             # 2: ntok < 5
        "spam ham " * 6,                         # 3: dup-2gram frac ≥ 0.1
        "unique one two three four five six",    # 4: survives
    ]
    out = {r["doc_id"]: r for r in pp01(spark, _write_docs(tmp_path, texts)).collect()}
    assert set(out) == {0, 4}
    # the mangled clone deduped against doc 0, not the other way round
    assert out[0]["content_hash"] is not None
    assert out[0]["n_tokens"] == 6
    assert all(r["split"] in ("train", "val", "test") for r in out.values())


def test_pipeline_boilerplate_flood_drops_chrome_doc(spark, tmp_path):
    # Five distinct chrome lines, each in ≥ 3 docs and > 4% of the corpus
    # (so each is boilerplate); body docs carry ONE of them (1/4 of their
    # lines ≤ 30% — they survive) while the flooded doc is 5/6 chrome
    # (> 30% — it drops).  Distinct flavors keep the flooded doc's 2-grams
    # unique, so it provably drops at the BOILERPLATE gate, not the
    # repetition gate.
    flavors = [f"nav{j} bar{j}" for j in range(5)]
    body = [
        f"{flavors[i % 5]} body{i} text{i} plus{i} words{i} more{i} stuff{i}"
        for i in range(30)
    ]
    flooded = " ".join(flavors) + " extra unique"  # 6 lines, 5 boilerplate
    texts = body + [flooded]
    out = {r["doc_id"] for r in pp01(spark, _write_docs(tmp_path, texts)).collect()}
    assert out == set(range(30))  # the flooded doc (id 30) dropped


def test_pipeline_dedup_keeps_smallest_doc_id(spark, tmp_path):
    texts = ["same text here five tokens ok", "same text here five tokens ok",
             "other text here five tokens ok"]
    rows = pp01(spark, _write_docs(tmp_path, texts)).collect()
    assert sorted(r["doc_id"] for r in rows) == [0, 2]
