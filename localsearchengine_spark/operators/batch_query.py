"""A20 — distributed evaluation of a whole query set.

BASELINE.json:2's metric is a *match rate over a query set*; at 10^12-turn
scale the postings for a large query batch don't fit one driver, so this path
keeps everything in DataFrames:

    postings (term-filtered parquet scan, pushdown)
      → mapInPandas decode (Arrow-batched varint+delta → long form)
      → broadcast-join the exploded query set + per-term idf
      → JVM Column-expression BM25 contribution  (whole-stage codegen)
      → groupBy(query_id, doc_id) partial-agg sum  [the only big shuffle]
      → AND filter (nt == n_terms) → per-query top-k window

The per-term idf/df comes from the dictionary (driver-side lookup — the
query set's term list is small by definition), so no second big join.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from localsearchengine_spark.operators import codec
from localsearchengine_spark.operators.search import Index

DECODED_SCHEMA = "term string, doc_id long, tf long, dl long"


def decode_postings_df(spark: SparkSession, index_dir: str, terms: list[str]) -> DataFrame:
    """Term-filtered postings scan → decoded long form, distributed.

    Besides the pushed term filter, the scan is pre-pruned to the partition
    files the dictionary maps the terms to (per-file pid stats make the
    pushed pid filter skip whole row groups; merged segments carry pid -1
    and skip the pruning)."""
    rows = spark.read.parquet(os.path.join(index_dir, "postings"))
    from localsearchengine_spark.sources import io as lse_io

    dic_ds = lse_io.open_dataset(os.path.join(index_dir, "dictionary"))
    if "pids" in dic_ds.schema.names:  # legacy indexes predate the pid map
        import pyarrow.dataset as ds

        dic = dic_ds.to_table(
            columns=["term", "pids"],
            filter=ds.field("term").isin(sorted(set(terms))),
        )
        pids = sorted({int(p) for ps in dic["pids"].to_pylist() for p in ps})
        if pids and all(p >= 0 for p in pids):
            rows = rows.filter(F.col("pid").isin(pids))
    rows = (
        rows.filter(F.col("term").isin(sorted(set(terms))))
        .select("term", "blocks")
    )

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            outs = []
            for term, blocks in zip(pdf["term"], pdf["blocks"]):
                d, t, L = codec.decode_blocks(list(blocks))
                outs.append(
                    pd.DataFrame(
                        {"term": np.repeat(term, len(d)), "doc_id": d, "tf": t, "dl": L}
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return rows.mapInPandas(decode, schema=DECODED_SCHEMA)


# AND queries whose rarest term has df below the selectivity cutoff are
# pre-filtered with that term's (small) posting list before the big shuffle —
# the classic rare∧hot search shape then shuffles df_rare rows per query
# instead of Σ df_t.  Queries with no selective term skip the filter (the
# candidate set would be as large as the thing it filters).  The cutoff
# derives from corpus stats (round-2 verdict #5): a term is "rare" when it
# matches ≤5% of the corpus, capped so a huge corpus doesn't call a
# 100M-doc posting list rare.
_SELECTIVE_DF_CAP = 1_000_000


def _selective_df(n_docs: int) -> int:
    return min(_SELECTIVE_DF_CAP, max(1, n_docs // 20))


def run_queries(
    spark: SparkSession,
    index: Index,
    queries: list[dict],
    mode: str = "and",
) -> DataFrame:
    """queries: [{"query_id": int, "terms": [str], "k": int}] →
    DataFrame(query_id long, rank long, doc_id long, score double)."""
    cfg = index.cfg
    all_terms = sorted({t for q in queries for t in q["terms"]})
    dic = index.lookup(all_terms)

    qrows = []
    for qd in queries:
        terms = sorted(set(qd["terms"]))
        n_present = sum(1 for t in terms if t in dic)
        for t in terms:
            if t in dic:
                qrows.append(
                    (
                        int(qd["query_id"]),
                        t,
                        float(cfg.idf(dic[t]["df"], index.n_docs)),
                        int(len(terms)),
                        int(n_present),
                        int(qd.get("k", 10)),
                    )
                )
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, rank long, doc_id long, score double"
        )
    qdf = spark.createDataFrame(
        qrows, "query_id long, term string, idf double, n_terms long, n_present long, k long"
    )

    decoded = decode_postings_df(spark, index.index_dir, all_terms)

    # rare-term semi-join pre-filter (AND only): candidates from a second,
    # term-pushdown-pruned scan of just the rare posting lists
    cand = None
    if mode == "and":
        rare_rows = []
        cutoff = _selective_df(index.n_docs)
        for qd in queries:
            terms = sorted(set(qd["terms"]))
            present = [(int(dic[t]["df"]), t) for t in terms if t in dic]
            if len(present) >= 2 and min(present)[0] <= cutoff:
                rare_rows.append((int(qd["query_id"]), min(present)[1]))
        if rare_rows:
            rare_df = spark.createDataFrame(rare_rows, "query_id long, term string")
            rare_terms = sorted({t for _, t in rare_rows})
            # .distinct(): correctness of the left-join flag below requires
            # unique (query_id, doc_id) candidates; a healthy index never
            # yields duplicates, but a corrupt or externally-produced segment
            # with duplicate postings must filter, not inflate, scores
            # (cheap — bounded by the rare terms' df).
            cand = (
                decode_postings_df(spark, index.index_dir, rare_terms)
                .join(F.broadcast(rare_df), "term")
                .select("query_id", "doc_id")
                .distinct()
            )
            filtered_qids = {qid for qid, _ in rare_rows}

    from localsearchengine_spark.functions.bm25 import tf_norm_column

    contrib = (
        F.col("idf")
        * F.lit(cfg.k1 + 1.0)
        * tf_norm_column(F.col("tf"), F.col("dl"), F.lit(index.avgdl), cfg.k1, cfg.b)
    )
    joined = decoded.join(F.broadcast(qdf), "term").select(
        "query_id", "doc_id", "term", "n_terms", "n_present", "k", contrib.alias("contrib")
    )
    if cand is not None:
        # one pass over the decoded scan: rows of filtered queries survive
        # only when the (query, doc) pair appears in the rare-term
        # candidate set (a left join + flag — NOT two filter branches
        # unioned, which would execute the decode scan twice)
        in_f = F.col("query_id").isin([int(q) for q in filtered_qids])
        cand_flag = cand.withColumn("cand_hit", F.lit(1))
        joined = (
            joined.join(cand_flag, ["query_id", "doc_id"], "left")
            .filter(~in_f | F.col("cand_hit").isNotNull())
            .drop("cand_hit")
        )
    # Fixed-order summation (the §2.4 determinism contract): per (query,
    # doc), contributions are sorted by term and folded left-to-right, so
    # the float64 score is bit-identical across parallelism levels and to
    # the driver-local paths.  The collected list is bounded by the query's
    # term count (small by definition), so per-group state stays tiny.
    scored = (
        joined
        .groupBy("query_id", "doc_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "contrib"))),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("score"),
            F.count(F.lit(1)).alias("nt"),
            F.first("n_terms").alias("n_terms"),
            F.first("n_present").alias("n_present"),
            F.first("k").alias("k"),
        )
    )
    if mode == "and":
        # conjunctive: doc must contain every query term, and every query
        # term must exist in the corpus (matches the driver-local AND path)
        scored = scored.filter(
            (F.col("nt") == F.col("n_terms")) & (F.col("n_present") == F.col("n_terms"))
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "score")
        .orderBy("query_id", "rank")
    )
