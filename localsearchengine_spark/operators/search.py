"""A13–A16, A18, A19 — query analysis, dictionary lookup, posting fetch +
decode, conjunctive intersection, exhaustive BM25 scoring, top-k.

Interactive queries run driver-local over decoded NumPy arrays (SURVEY.md
§3.2): a top-10 over a handful of terms must not pay Spark job-launch
latency.  Posting fetch IS a Spark scan with predicate pushdown on ``term``
(parquet row-group pruning + column pruning), so only the queried terms'
compressed blocks cross the wire.  The distributed paths live in
``batch_query.py`` (A20).

Determinism contract (SURVEY.md §2.4): float64 everywhere; per-doc score is
the sum of term contributions in **sorted term order**; ties broken by
doc_id ascending.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
from pyspark.sql import SparkSession

from localsearchengine_spark.config import BM25Config, BuildConfig
from localsearchengine_spark.functions.analyze import tokenize_text
from localsearchengine_spark.functions.bm25 import tf_norm_np
from localsearchengine_spark.operators import codec
from localsearchengine_spark.operators.wand import wand_topk
from localsearchengine_spark.utils import read_json


@dataclass
class TermPostings:
    term: str
    doc_ids: np.ndarray      # int64, sorted ascending
    tf_norm: np.ndarray      # float64 — tf/(tf + k1*(1-b+b*dl/avgdl))
    idf: float
    block_starts: np.ndarray  # int64 offsets into doc_ids
    block_max_doc: np.ndarray  # int64 per block
    block_max_tfn: np.ndarray  # float64 per block

    @property
    def max_score(self) -> float:
        return float(self.idf * (self.block_max_tfn.max() if len(self.block_max_tfn) else 0.0))


class Index:
    """Read-side handle over a built index directory."""

    def __init__(self, spark: SparkSession | None, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        meta = read_json(os.path.join(index_dir, "meta.json"))
        if meta.get("status") != "complete":
            raise RuntimeError(f"index at {index_dir} is not complete")
        self.conf = BuildConfig.from_json(meta["config"])
        self.cfg: BM25Config = self.conf.bm25
        self.n_docs = int(meta["n_docs"])
        self.avgdl = float(meta["avgdl"])
        self.meta = meta
        self._cache: dict[str, TermPostings | None] = {}

    # ---- A14: dictionary lookup -------------------------------------------
    def lookup(self, terms: list[str]) -> dict[str, dict]:
        import pyarrow.dataset as ds

        data = ds.dataset(os.path.join(self.index_dir, "dictionary"), format="parquet")
        tbl = data.to_table(filter=ds.field("term").isin(list(set(terms))))
        return {r["term"]: r for r in tbl.to_pylist()}

    # ---- A15: posting fetch + decode --------------------------------------
    # Interactive queries deliberately bypass Spark job launch (SURVEY.md
    # §3.2): a pyarrow dataset scan applies the same parquet predicate
    # pushdown + column pruning the JVM scan would, at sub-ms latency.
    # The distributed batch path (A20, batch_query.py) uses the Spark scan.
    def fetch_postings(self, terms: list[str]) -> dict[str, TermPostings]:
        import pyarrow.dataset as ds

        terms = sorted(set(terms))
        need = [t for t in terms if t not in self._cache]
        if need:
            data = ds.dataset(os.path.join(self.index_dir, "postings"), format="parquet")
            tbl = data.to_table(
                columns=["term", "salt", "df", "blocks"],
                filter=ds.field("term").isin(need),
            )
            by_term: dict[str, list] = {}
            for r in tbl.to_pylist():
                by_term.setdefault(r["term"], []).append(r)
            for t in need:
                trs = by_term.get(t)
                if not trs:
                    self._cache[t] = None
                    continue
                trs.sort(key=lambda r: r["salt"])  # salt buckets are doc_id ranges
                blocks = [b for r in trs for b in r["blocks"]]
                doc_ids, tfs, dls = codec.decode_blocks(blocks)
                df_total = int(sum(r["df"] for r in trs))
                starts = (
                    np.cumsum([0] + [b["n"] for b in blocks[:-1]]).astype(np.int64)
                    if blocks
                    else np.empty(0, dtype=np.int64)
                )
                self._cache[t] = TermPostings(
                    term=t,
                    doc_ids=doc_ids,
                    tf_norm=tf_norm_np(tfs, dls, self.avgdl, self.cfg),
                    idf=self.cfg.idf(df_total, self.n_docs),
                    block_starts=starts,
                    block_max_doc=np.asarray(
                        [b["max_doc_id"] for b in blocks], dtype=np.int64
                    ),
                    block_max_tfn=np.asarray(
                        [b["tf_norm_max"] for b in blocks], dtype=np.float64
                    ),
                )
        return {t: self._cache[t] for t in terms if self._cache.get(t) is not None}

    # ---- A13 + A16/A17/A18 + A19: search ----------------------------------
    def search(self, query: str | list[str], k: int = 10, mode: str = "and"):
        """→ list[(doc_id, score)] — score desc, doc_id asc tie-break.

        mode="and"  — conjunctive posting intersection (A16), reference
                      default per BASELINE.json:6 "posting-list intersection"
        mode="or"   — exhaustive disjunctive BM25 (A18)
        mode="wand" — block-max WAND (A17); exact same top-k as "or"
        """
        terms = tokenize_text(query, self.cfg) if isinstance(query, str) else list(query)
        terms = sorted(set(terms))
        post = self.fetch_postings(terms)
        missing = [t for t in terms if t not in post]
        if mode == "and" and missing:
            return []
        plists = [post[t] for t in terms if t in post]
        if not plists:
            return []
        if mode == "and":
            return _and_topk(plists, k, self.cfg)
        if mode == "or":
            return _or_topk(plists, k, self.cfg)
        if mode == "wand":
            return wand_topk(plists, k, self.cfg)
        raise ValueError(f"unknown mode: {mode}")


def _score_at(plists, ids: np.ndarray, cfg: BM25Config) -> np.ndarray:
    """Σ_t idf·(k1+1)·tf_norm for docs `ids`, summed in sorted term order.
    plists must already be in sorted term order."""
    scores = np.zeros(len(ids), dtype=np.float64)
    for p in plists:  # sorted term order — fixed summation order
        if len(p.doc_ids) == 0:
            continue
        pos = np.searchsorted(p.doc_ids, ids)
        pos_c = np.minimum(pos, len(p.doc_ids) - 1)
        hit = p.doc_ids[pos_c] == ids
        scores += np.where(hit, p.idf * (cfg.k1 + 1.0) * p.tf_norm[pos_c], 0.0)
    return scores


def _topk(ids: np.ndarray, scores: np.ndarray, k: int) -> list[tuple[int, float]]:
    """A19 — k best by (score desc, doc_id asc); ids are unique."""
    if len(ids) == 0:
        return []
    order = np.lexsort((ids, -scores))[:k]
    return [(int(ids[i]), float(scores[i])) for i in order]


def _and_topk(plists, k: int, cfg: BM25Config) -> list[tuple[int, float]]:
    """A16 — intersect rarest-first via vectorized binary search (the NumPy
    equivalent of galloping intersection), then score survivors only."""
    order = sorted(plists, key=lambda p: len(p.doc_ids))
    ids = order[0].doc_ids
    for p in order[1:]:
        if len(ids) == 0:
            return []
        pos = np.searchsorted(p.doc_ids, ids)
        pos_c = np.minimum(pos, len(p.doc_ids) - 1)
        ids = ids[p.doc_ids[pos_c] == ids]
    return _topk(ids, _score_at(plists, ids, cfg), k)


def _or_topk(plists, k: int, cfg: BM25Config) -> list[tuple[int, float]]:
    """A18 — exhaustive disjunctive scoring (the oracle path WAND must match)."""
    ids = np.unique(np.concatenate([p.doc_ids for p in plists]))
    return _topk(ids, _score_at(plists, ids, cfg), k)
