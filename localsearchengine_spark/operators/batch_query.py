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


def _postings_scan(spark: SparkSession, index_dir: str, terms: list[str]) -> DataFrame:
    """Term-filtered postings scan (compressed blocks, not yet decoded).

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
    return rows.filter(F.col("term").isin(sorted(set(terms)))).select("term", "blocks")


def decode_postings_df(spark: SparkSession, index_dir: str, terms: list[str]) -> DataFrame:
    """Term-filtered postings scan → decoded long form, distributed."""
    rows = _postings_scan(spark, index_dir, terms)

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


def decode_postings_pruned(
    spark: SparkSession, index_dir: str, spec: dict
) -> DataFrame:
    """Block-skipping decode (round-2 verdict #2): the per-block
    ``tf_norm_max`` / ``max_doc_id`` struct fields already in the scan gate
    which blocks are varint-decoded at all.

    ``spec``: term → (tau, inverse, docs) where
      * ``tau``     — tf_norm_max threshold; ``None`` keeps every block,
                      else keep blocks with tf_norm_max > tau (or ≤ tau when
                      ``inverse`` — the exact complement, so a two-phase
                      caller decodes every block exactly once);
      * ``docs``    — optional sorted int64 array; a block is decoded only
                      if its (prev_block_max, max_doc_id] range contains one
                      of these docIDs, and decoded rows are filtered to them
                      (blocks are self-contained and ascending within a
                      (term, salt) row, so prev-block max bounds the range).
    """
    terms = sorted(spec)
    rows = _postings_scan(spark, index_dir, terms)
    bc = spark.sparkContext.broadcast(spec)

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sp = bc.value
        for pdf in it:
            if pdf.empty:
                continue
            outs = []
            for term, blocks in zip(pdf["term"], pdf["blocks"]):
                tau, inverse, docs = sp[term]
                blist = list(blocks)
                if not blist:
                    continue
                nb = len(blist)
                if tau is not None:
                    tfn = np.fromiter(
                        (b["tf_norm_max"] for b in blist), dtype=np.float64, count=nb
                    )
                    keep = (tfn <= tau) if inverse else (tfn > tau)
                else:
                    keep = np.ones(nb, dtype=bool)
                if docs is not None:
                    m = np.fromiter(
                        (b["max_doc_id"] for b in blist), dtype=np.int64, count=nb
                    )
                    prev = np.concatenate(([np.int64(-1)], m[:-1]))
                    keep &= np.searchsorted(docs, m, side="right") > np.searchsorted(
                        docs, prev, side="right"
                    )
                kept = [b for b, kk in zip(blist, keep) if kk]
                if not kept:
                    continue
                d, t, L = codec.decode_blocks(kept)
                if docs is not None and len(docs):
                    pos = np.minimum(np.searchsorted(docs, d), len(docs) - 1)
                    sel = docs[pos] == d
                    d, t, L = d[sel], t[sel], L[sel]
                    if not len(d):
                        continue
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


_EPS = 1e-10
# survivor sets larger than this fall back to the unpruned path (the driver
# collect + per-term broadcast must stay bounded; correctness never depends
# on pruning)
_SURVIVOR_CAP = 200_000
# auto-dispatch crossover: the pruned OR path trades one extra Spark job +
# a driver survivor collect for decoding fewer posting rows.  Measured on
# the 240k-doc bench corpus (BENCH.md round 3): 57% fewer decoded rows but
# ~9s of fixed orchestration cost — a loss when the full decode is only
# ~4M rows, a win when decode dominates.  Below this estimated posting
# volume the single-job generic path is faster; above it pruning pays.
_PRUNE_MIN_POSTINGS = 20_000_000


def plan_or_pruning(index: Index, queries: list[dict], dic: dict):
    """Driver-side MaxScore plan for a disjunctive (OR) batch — metadata
    only, from the dictionary (df, max_tf_norm) plus one θ seed per query.

    Per query q (Turtle & Flood 1995 MaxScore over the batch):
      * θ_q  — exact k-th best score of q's highest-impact term alone
        (wand._seed_theta: best-block-first with early stop, so only a few
        blocks of one term are decoded driver-side; a lower bound of the
        final k-th score since every idf here is positive);
      * non-essential terms — the ub-ascending prefix with Σub ≤ θ_q − ε: a
        doc found ONLY in them cannot reach q's top-k;
      * per-term block threshold τ_t (for terms essential somewhere) — a
        block of t is skippable when even its best tf_norm plus every other
        term's upper bound cannot beat θ_q for ANY query t is essential in:
        τ_t = min_q (θ_q − ε − Σ_{t'∈q,t'≠t} ub_{t'}) / scale_t.

    Returns None when pruning is unsound (non-positive idf flips the bound
    directions) or pointless (no queries).  Otherwise a dict with
      decoded_terms — essential for ≥1 query: scanned in phase 1 with τ;
      probe_terms   — non-essential everywhere: never scanned in phase 1;
      tau           — per decoded term;
      qmeta         — per query (qid, k, rem_slack, theta) where rem_slack
        bounds every contribution phase 1 can miss for that query: Σ ub of
        its probe terms + Σ scale·min(τ,max_tfn) of its decoded terms with
        τ>0 (blocks below τ were skipped).
    """
    from localsearchengine_spark.operators.wand import _seed_theta

    cfg = index.cfg
    k1p1 = cfg.k1 + 1.0
    scale = {t: cfg.idf(r["df"], index.n_docs) * k1p1 for t, r in dic.items()}
    if not dic or min(scale.values()) <= 0.0:
        return None
    ub = {t: scale[t] * float(r["max_tf_norm"]) for t, r in dic.items()}

    qinfos = []
    for qd in queries:
        present = sorted(t for t in set(qd["terms"]) if t in dic)
        if not present:
            continue
        k = int(qd.get("k", 10))
        t0 = max(present, key=lambda t: ub[t])
        p0 = index.fetch_postings([t0]).get(t0)
        theta = _seed_theta(p0, scale[t0], k) if p0 is not None else float("-inf")
        noness: set[str] = set()
        if theta > float("-inf"):
            cum = 0.0
            for t in sorted(present, key=lambda t: ub[t]):
                if cum + ub[t] <= theta - _EPS:
                    cum += ub[t]
                    noness.add(t)
                else:
                    break
        qinfos.append(
            {
                "qid": int(qd["query_id"]),
                "k": k,
                "present": present,
                "ess": [t for t in present if t not in noness],
                "theta": theta,
            }
        )
    if not qinfos:
        return None
    decoded_terms = sorted({t for qi in qinfos for t in qi["ess"]})
    probe_set = {t for qi in qinfos for t in qi["present"]} - set(decoded_terms)
    tau: dict[str, float] = {}
    for t in decoded_terms:
        vals = []
        for qi in qinfos:
            if t in qi["ess"]:
                if qi["theta"] == float("-inf"):
                    vals = [float("-inf")]
                    break
                others = sum(ub[t2] for t2 in qi["present"] if t2 != t)
                vals.append((qi["theta"] - _EPS - others) / scale[t])
        tau[t] = min(vals)
    qmeta = []
    for qi in qinfos:
        rem = sum(ub[t] for t in qi["present"] if t in probe_set)
        slack = sum(
            scale[t] * min(tau[t], float(dic[t]["max_tf_norm"]))
            for t in qi["present"]
            if t in tau and tau[t] > 0.0
        )
        qmeta.append((qi["qid"], qi["k"], float(rem + slack), float(qi["theta"])))
    return {
        "qinfos": qinfos,
        "decoded_terms": decoded_terms,
        "probe_terms": sorted(probe_set),
        "tau": tau,
        "qmeta": qmeta,
    }


def _contrib_col(index: Index):
    from localsearchengine_spark.functions.bm25 import tf_norm_column

    cfg = index.cfg
    return (
        F.col("idf")
        * F.lit(cfg.k1 + 1.0)
        * tf_norm_column(F.col("tf"), F.col("dl"), F.lit(index.avgdl), cfg.k1, cfg.b)
    )


def _local_topk(scored: DataFrame) -> DataFrame:
    """Partition-local per-query top-k pre-reduce before the global ranking
    window.  The window's partitionBy(query_id) funnels EVERY scored doc of
    a query onto one reducer — at 10^12-doc scale a hot query is a straggler
    by construction.  The global top-k is a subset of the union of each
    partition's per-query top-k, so keeping only k rows per (query,
    input-partition) first bounds the skewed shuffle to k·P rows per query
    while leaving every surviving row's score untouched (no recompute — the
    determinism contract is unaffected).  Input/output columns:
    (query_id, doc_id, score, k)."""
    cols = ["query_id", "doc_id", "score", "k"]

    def prune(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(
                ["query_id", "score", "doc_id"], ascending=[True, False, True]
            )
            keep = (
                pdf.groupby("query_id", sort=False).cumcount().to_numpy()
                < pdf["k"].to_numpy()
            )
            yield pdf[keep]

    return scored.select(*cols).mapInPandas(
        prune, schema="query_id long, doc_id long, score double, k long"
    )


def _rank_topk(scored: DataFrame) -> DataFrame:
    """(query_id, doc_id, score, k) → per-query (rank ≤ k) rows, rank over
    (score desc, doc_id asc), after the partition-local pre-reduce."""
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        _local_topk(scored)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "score")
        .orderBy("query_id", "rank")
    )


def _fold_and_rank(contribs: DataFrame) -> DataFrame:
    """Fixed-order summation (§2.4 determinism contract) + per-query top-k:
    per (query, doc), contributions sort by term and fold left-to-right, so
    the float64 score is bit-identical across parallelism levels and to the
    driver-local paths."""
    scored = contribs.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        ).alias("score"),
        F.first("k").alias("k"),
    )
    return _rank_topk(scored)


def _run_queries_or_pruned(
    spark: SparkSession, index: Index, queries: list[dict], dic: dict, qdf: DataFrame
) -> DataFrame | None:
    """Distributed block-max/MaxScore OR evaluation — exact, two phases:

    Phase 1 decodes only terms essential for ≥1 query, skipping blocks below
    their τ threshold, and sums per-(query,doc) PARTIAL scores.  Survivors
    are the docs whose optimistic bound (partial + everything phase 1 could
    have missed) reaches a pessimistic k-th-score floor (max of the θ seed
    and the k-th best partial); every true top-k doc provably survives, and
    the survivor set is near-k-sized per query.  Phase 2 then computes EXACT
    scores from scratch for survivors only: one decode over every query
    term, restricted to blocks containing a survivor and filtered to
    survivor docs — O(survivors) work, and trivially produces each
    (term, doc) contribution exactly once for the fixed-order fold.
    (Re-deriving survivor scores is cheaper than persisting phase 1's
    contribution rows for reuse: the survivor set is tiny, and phase 1's
    output can stay an un-materialized one-pass aggregation input.)

    Falls back (returns None) on non-positive idf or oversized survivor
    sets.  At 10^12-doc scale the θ seed's driver-side posting fetch should
    switch to per-block range reads; noted in SURVEY §8 terms.
    """
    plan = plan_or_pruning(index, queries, dic)
    if plan is None:
        return None
    tau = plan["tau"]

    spec1 = {t: (tau[t], False, None) for t in plan["decoded_terms"]}
    part = (
        decode_postings_pruned(spark, index.index_dir, spec1)
        .join(F.broadcast(qdf), "term")
        .select("query_id", "doc_id", _contrib_col(index).alias("contrib"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("partial"))
    )
    qmeta = spark.createDataFrame(
        plan["qmeta"], "query_id long, k long, rem_slack double, theta double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("partial"), F.asc("doc_id"))
    part = part.withColumn("rn", F.row_number().over(w)).join(
        F.broadcast(qmeta), "query_id"
    )
    kth = part.filter(F.col("rn") == F.col("k")).select(
        "query_id", F.col("partial").alias("kth_partial")
    )
    surv_rows = (
        part.join(F.broadcast(kth), "query_id", "left")
        .withColumn(
            "floor",
            F.greatest(
                F.coalesce(F.col("kth_partial"), F.lit(float("-inf"))), F.col("theta")
            ),
        )
        .filter(F.col("partial") + F.col("rem_slack") >= F.col("floor") - F.lit(_EPS))
        .select("query_id", "doc_id")
        .collect()
    )
    if len(surv_rows) > _SURVIVOR_CAP:
        return None

    surv_by_q: dict[int, list[int]] = {}
    for r in surv_rows:
        surv_by_q.setdefault(int(r["query_id"]), []).append(int(r["doc_id"]))
    docs_by_term: dict[str, set] = {}
    for qi in plan["qinfos"]:
        s = surv_by_q.get(qi["qid"])
        if not s:
            continue
        for t in qi["present"]:
            docs_by_term.setdefault(t, set()).update(s)
    if not docs_by_term:
        return spark.createDataFrame(
            [], "query_id long, rank long, doc_id long, score double"
        )
    spec2 = {
        t: (None, False, np.asarray(sorted(d), dtype=np.int64))
        for t, d in docs_by_term.items()
    }
    contribs = (
        decode_postings_pruned(spark, index.index_dir, spec2)
        .join(F.broadcast(qdf), "term")
        .select("query_id", "doc_id", "term", "k", _contrib_col(index).alias("contrib"))
    )
    surv_df = spark.createDataFrame(
        [(int(r["query_id"]), int(r["doc_id"])) for r in surv_rows],
        "query_id long, doc_id long",
    )
    contribs = contribs.join(F.broadcast(surv_df), ["query_id", "doc_id"], "left_semi")
    return _fold_and_rank(contribs)


def run_queries(
    spark: SparkSession,
    index: Index,
    queries: list[dict],
    mode: str = "and",
    prune: bool | None = None,
) -> DataFrame:
    """queries: [{"query_id": int, "terms": [str], "k": int}] →
    DataFrame(query_id long, rank long, doc_id long, score double).

    ``prune`` — block-max/MaxScore pruning for OR batches: True forces it,
    False disables it, None (default) engages it only when the estimated
    posting volume (Σ df over the batch's terms) exceeds the measured
    crossover where decode savings beat the extra orchestration cost."""
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

    if mode == "or" and prune is not False:
        est_postings = sum(int(r["df"]) for r in dic.values())
        if prune is True or est_postings >= _PRUNE_MIN_POSTINGS:
            pruned = _run_queries_or_pruned(spark, index, queries, dic, qdf)
            if pruned is not None:
                return pruned

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

    contrib = _contrib_col(index)
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
    return _rank_topk(scored)
