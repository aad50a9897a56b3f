"""A20 — distributed evaluation of a whole query set.

BASELINE.json:2's metric is a *match rate over a query set*; at 10^12-turn
scale the postings for a large query batch don't fit one driver, so this path
keeps everything in DataFrames:

    postings (term-filtered parquet scan, pushdown)
      → mapInArrow decode (contiguous varint streams → long form)
      → broadcast-join the exploded query set + per-term idf
      → JVM Column-expression BM25 contribution  (whole-stage codegen)
      → groupBy(query_id, doc_id) partial-agg sum  [the only big shuffle]
      → AND filter (nt == n_terms) → per-query top-k window

The per-term idf/df comes from the dictionary (driver-side lookup — the
query set's term list is small by definition), so no second big join.
"""

from __future__ import annotations

import os

import numpy as np
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


DECODED_POS_SCHEMA = DECODED_SCHEMA + ", pos array<long>"


def _decode_arrow(rows: DataFrame, with_pos: bool = False) -> DataFrame:
    """(term, blocks) → decoded long form via an Arrow-NATIVE kernel.
    With ``with_pos``, each posting's within-doc position run rides along
    as an array column (posting i owns tf[i] flat positions).

    mapInArrow keeps the compressed block structs as Arrow buffers — per
    RecordBatch, the per-block metadata becomes NumPy views and each varint
    stream is ONE contiguous buffer slice decoded in a single vectorized
    LEB128 pass (concatenated varint streams are themselves a valid
    stream; blocks are self-contained, so `docids_from_deltas` restores
    absolutes across block boundaries).  The earlier mapInPandas kernel
    converted every block struct to a Python dict first — measured as the
    dominant cost of the decode stage, dwarfing the actual varint work."""
    from localsearchengine_spark.operators.search import _binary_offsets

    def decode(batches):
        import pyarrow as pa

        for rb in batches:
            if rb.num_rows == 0:
                continue
            cols = {n: rb.column(i) for i, n in enumerate(rb.schema.names)}
            la = cols["blocks"]
            row_off = la.offsets.to_numpy().astype(np.int64)
            flat = la.values
            blk_lo, blk_hi = int(row_off[0]), int(row_off[-1])
            if blk_hi == blk_lo:
                continue
            n_all = flat.field("n").to_numpy().astype(np.int64)[blk_lo:blk_hi]
            total = int(n_all.sum())
            streams = {}
            for name in ("doc", "tf", "dl") + (("pos",) if with_pos else ()):
                ba = flat.field(f"{name}_bytes")
                boffs = _binary_offsets(ba)
                data = ba.buffers()[2]
                streams[name] = bytes(data[boffs[blk_lo] : boffs[blk_hi]])
            deltas = codec.decode_varints(streams["doc"], total)
            doc_ids = codec.docids_from_deltas(deltas, n_all)
            tfs = codec.decode_varints(streams["tf"], total).astype(np.int64)
            dls = codec.decode_varints(streams["dl"], total).astype(np.int64)
            cs = np.concatenate(([0], np.cumsum(n_all)))
            per_row = cs[row_off - blk_lo][1:] - cs[row_off - blk_lo][:-1]
            term_idx = np.repeat(np.arange(rb.num_rows, dtype=np.int64), per_row)
            arrays = [
                cols["term"].take(pa.array(term_idx)),
                pa.array(doc_ids, type=pa.int64()),
                pa.array(tfs, type=pa.int64()),
                pa.array(dls, type=pa.int64()),
            ]
            names = ["term", "doc_id", "tf", "dl"]
            if with_pos:
                pos_flat = codec.decode_varints(
                    streams["pos"], int(tfs.sum())
                ).astype(np.int64)
                tf_cum = np.concatenate(([0], np.cumsum(tfs))).astype(np.int32)
                arrays.append(
                    pa.ListArray.from_arrays(
                        pa.array(tf_cum), pa.array(pos_flat, type=pa.int64())
                    )
                )
                names.append("pos")
            yield pa.RecordBatch.from_arrays(arrays, names)

    return rows.select("term", "blocks").mapInArrow(
        decode, schema=DECODED_POS_SCHEMA if with_pos else DECODED_SCHEMA
    )


def _drop_deleted(df: DataFrame, spark: SparkSession, index_dir: str) -> DataFrame:
    """A22: exclude tombstoned docs from a decoded postings DataFrame.  The
    tombstone files are read as a distributed scan (never collected); the
    anti-join broadcasts because a live tombstone set is small relative to
    the corpus by design — compaction is the pressure valve."""
    from localsearchengine_spark.sources import io as lse_io

    tdir = os.path.join(index_dir, "tombstones")
    if not lse_io.path_exists(tdir):
        return df
    ts = spark.read.parquet(tdir).select("doc_id").distinct()
    return df.join(F.broadcast(ts), "doc_id", "left_anti")


def decode_postings_df(spark: SparkSession, index_dir: str, terms: list[str]) -> DataFrame:
    """Term-filtered postings scan → decoded long form, distributed;
    tombstoned docs excluded."""
    return _drop_deleted(
        _decode_arrow(_postings_scan(spark, index_dir, terms)), spark, index_dir
    )


def facet_counts(
    spark: SparkSession,
    index,
    terms: list[str],
    facet_df: DataFrame,
    facet_col: str,
    mode: str = "and",
) -> DataFrame:
    """A25: distributed faceted search — per facet value, the count of ALL
    docs matching the query (full recall, not top-k: facets summarize the
    whole result set, so the driver-local heap path doesn't apply).

    Shape for scale: the decode touches only the query terms' postings
    (term + pid pruned scan); the match test is one hash aggregate on
    doc_id whose partial (map-side) combine collapses each doc's ≤|terms|
    rows before the shuffle; the facet join is doc_id-keyed against the
    metadata table (matched ids ≪ corpus, AQE picks the strategy) and the
    final groupBy emits one row per facet value.  No collect anywhere.
    """
    terms = sorted(set(terms))
    decoded = decode_postings_df(spark, index.index_dir, terms)
    # one row per (term, doc) by index construction → count(*) == distinct terms
    per_doc = decoded.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nt"))
    if mode == "and":
        per_doc = per_doc.filter(F.col("nt") == len(terms))
    elif mode != "or":
        raise ValueError(f"unknown mode: {mode}")
    return (
        per_doc.select("doc_id")
        .join(facet_df.select("doc_id", facet_col), "doc_id")
        .groupBy(facet_col)
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def filter_blocks_tau(
    rows: DataFrame, spark: SparkSession, tau: dict[str, float], inverse: bool = False
) -> DataFrame:
    """JVM-side block-max pruning (round-2 verdict #2): drop whole blocks by
    their persisted ``tf_norm_max`` BEFORE their bytes ever reach a Python
    worker — a Catalyst higher-order `filter` over the block array against a
    broadcast per-term threshold.  ``inverse`` keeps the exact complement
    (tf_norm_max ≤ τ), so a two-phase caller touches every block once.

    This is the load-bearing design point: skipping inside the Python
    kernel saves only the (cheap, vectorized) varint decode while still
    paying Arrow→Python conversion per block; filtering in the JVM means a
    skipped block is never serialized out of the scan at all."""
    tau_df = spark.createDataFrame(
        [(t, float(v)) for t, v in tau.items()], "term string, tau double"
    )
    if inverse:
        pred = lambda b: b["tf_norm_max"] <= F.col("tau")  # noqa: E731
    else:
        pred = lambda b: b["tf_norm_max"] > F.col("tau")  # noqa: E731
    return (
        rows.join(F.broadcast(tau_df), "term")
        .withColumn("blocks", F.filter("blocks", pred))
        .drop("tau")
        .filter(F.size("blocks") > 0)
    )


def filter_blocks_docs(
    rows: DataFrame, spark: SparkSession, docs_by_term: dict
) -> DataFrame:
    """JVM-side survivor-range pruning: keep block i of a (term, salt) row
    only if some target docID lands in its (prev_block_max, max_doc_id]
    range (blocks are ascending and self-contained within a row).  The
    per-term sorted docID list rides in as a broadcast array column; the
    whole test stays in whole-stage codegen.  Rows for non-target docs that
    share a kept block still decode — callers drop them with their
    downstream (query_id, doc_id) semi-join."""
    docs_df = spark.createDataFrame(
        [(t, [int(x) for x in sorted(d)]) for t, d in docs_by_term.items()],
        "term string, sdocs array<bigint>",
    )
    return (
        rows.join(F.broadcast(docs_df), "term")
        .withColumn(
            "blocks",
            F.filter(
                "blocks",
                lambda b, i: F.exists(
                    F.col("sdocs"),
                    lambda s: (s <= b["max_doc_id"])
                    & (
                        s
                        > F.when(i == F.lit(0), F.lit(-1)).otherwise(
                            F.element_at(F.col("blocks"), i)["max_doc_id"]
                        )
                    ),
                ),
            ),
        )
        .drop("sdocs")
        .filter(F.size("blocks") > 0)
    )


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
    (query_id, doc_id, score, k).

    Arrow-native kernel (same reasoning as `_decode_arrow`): the original
    mapInPandas version spent its time in Arrow→pandas conversion plus
    pandas sort_values/groupby — profiled as the dominant stage of the
    whole OR batch at 2.4M docs.  One numpy lexsort + a vectorized
    per-group cumcount does the identical cut (top-k per (query, Arrow
    batch), ties by doc_id asc) with none of that overhead."""
    cols = ["query_id", "doc_id", "score", "k"]

    def prune(batches):
        import pyarrow as pa

        for rb in batches:
            if rb.num_rows == 0:
                continue
            names = rb.schema.names
            col = {n: rb.column(i) for i, n in enumerate(names)}
            qid = col["query_id"].to_numpy(zero_copy_only=False)
            doc = col["doc_id"].to_numpy(zero_copy_only=False)
            score = col["score"].to_numpy(zero_copy_only=False)
            k = col["k"].to_numpy(zero_copy_only=False)
            order = np.lexsort((doc, -score, qid))
            qs = qid[order]
            idx = np.arange(len(qs), dtype=np.int64)
            group_start = np.maximum.accumulate(
                np.where(np.concatenate(([True], qs[1:] != qs[:-1])), idx, 0)
            )
            cumcount = idx - group_start
            keep = order[cumcount < k[order]]
            yield rb.take(pa.array(np.sort(keep)))

    return scored.select(*cols).mapInArrow(
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

    phase1 = _drop_deleted(
        _decode_arrow(
            filter_blocks_tau(
                _postings_scan(spark, index.index_dir, plan["decoded_terms"]), spark, tau
            )
        ),
        spark,
        index.index_dir,
    )
    # (phase 2 needs no explicit tombstone filter: its contributions are
    # semi-joined to phase-1 survivors, which already exclude deleted docs)
    part = (
        phase1.join(F.broadcast(qdf), "term")
        .select("query_id", "doc_id", _contrib_col(index).alias("contrib"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("partial"))
    )
    qmeta = spark.createDataFrame(
        plan["qmeta"], "query_id long, k long, rem_slack double, theta double"
    )
    part = part.join(F.broadcast(qmeta), "query_id")
    # k-th best partial per query WITHOUT a full window: the naive
    # row_number() over partitionBy(query_id) funnels every partial of a
    # query onto one reducer (the exact straggler _local_topk exists for),
    # so pre-reduce to k rows per (query, partition) first — the k-th best
    # global partial is invariant under that cut.  Both consumers of `part`
    # (this and the survivor filter below) read the same groupBy exchange,
    # which AQE reuses rather than re-decoding phase 1.
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    kth = (
        _local_topk(part.select("query_id", "doc_id", F.col("partial").alias("score"), "k"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == F.col("k"))
        .select("query_id", F.col("score").alias("kth_partial"))
    )
    surv = (
        part.join(F.broadcast(kth), "query_id", "left")
        .withColumn(
            "floor",
            F.greatest(
                F.coalesce(F.col("kth_partial"), F.lit(float("-inf"))), F.col("theta")
            ),
        )
        .filter(F.col("partial") + F.col("rem_slack") >= F.col("floor") - F.lit(_EPS))
        .select("query_id", "doc_id")
    )
    # Gate the cap executor-side BEFORE any driver materialization: a
    # pathological batch must never ship an unbounded survivor set to the
    # driver.  limit(cap+1) short-circuits the count; persist so the
    # subsequent bounded collect reuses the computed partitions.
    surv = surv.persist()
    try:
        if surv.limit(_SURVIVOR_CAP + 1).count() > _SURVIVOR_CAP:
            return None
        surv_rows = surv.collect()
    finally:
        surv.unpersist()

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
    contribs = (
        _decode_arrow(
            filter_blocks_docs(
                _postings_scan(spark, index.index_dir, sorted(docs_by_term)),
                spark,
                docs_by_term,
            )
        )
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
    doc_filter: DataFrame | None = None,
) -> DataFrame:
    """queries: [{"query_id": int, "terms": [str], "k": int}] →
    DataFrame(query_id long, rank long, doc_id long, score double).

    ``doc_filter`` — optional one-column (doc_id) DataFrame restricting
    RESULTS to those docs (metadata-filtered search, e.g. "only docs where
    lang='en'"): a semi-join on the decoded scan, so the filter set never
    leaves the executors and can be arbitrarily large (any Catalyst
    predicate over any table that yields docIDs).  Scoring stats (N, avgdl,
    idf) stay whole-corpus — a result filter is not a corpus deletion (A22
    is).  Forces the single-job path: the pruned plan's θ seed comes from
    unfiltered driver-side postings and could over-prune filtered results.

    A query dict may carry ``"exclude": [terms...]`` — the query language's
    negative path (fts11) distributed: the query's results drop docs
    containing any excluded term, via a per-query (query_id, doc_id)
    anti-join built from the excluded terms' own pushdown decode.  Like the
    driver-local path, exclusion never changes the positive terms' idf or
    scores.  Also forces the single-job path.

    ``prune`` — block-max/MaxScore pruning for OR batches: True engages the
    two-phase plan (exactness driver-gated by fts08), anything else takes
    the single-job path.  Auto-engaging by estimated posting volume was
    measured OFF twice (BENCH.md round 3): with the JVM block filter and
    the Arrow-native decode kernel the decode work pruning saves is no
    longer the bottleneck, and the two-phase plan's second postings scan +
    second shuffle round lost at BOTH 4M postings (5.5s vs 10.8s) and 40M
    postings (41.7s vs 87.6s), the gap growing with scale.  The pruned
    plan's remaining value is as the decode-volume bound for IO-bound
    stores where a skipped block is an unread byte range — re-measure
    there before re-enabling any auto dispatch."""
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

    excl_rows = []
    excl_dic = {}
    if any(q.get("exclude") for q in queries):
        excl_terms = sorted({t for q in queries for t in q.get("exclude", [])})
        excl_dic = index.lookup(excl_terms)
        excl_rows = [
            (int(q["query_id"]), t)
            for q in queries
            for t in sorted(set(q.get("exclude", [])))
            if t in excl_dic  # an absent excluded term excludes nothing
        ]

    if mode == "or" and prune is True and doc_filter is None and not excl_rows:
        pruned = _run_queries_or_pruned(spark, index, queries, dic, qdf)
        if pruned is not None:
            return pruned

    decoded = decode_postings_df(spark, index.index_dir, all_terms)
    if doc_filter is not None:
        decoded = decoded.join(
            doc_filter.select("doc_id").distinct(), "doc_id", "left_semi"
        )

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
    if excl_rows:
        excl_qdf = spark.createDataFrame(excl_rows, "query_id long, term string")
        excl_pairs = (
            decode_postings_df(
                spark, index.index_dir, sorted({t for _, t in excl_rows})
            )
            .join(F.broadcast(excl_qdf), "term")
            .select("query_id", "doc_id")
        )
        joined = joined.join(excl_pairs, ["query_id", "doc_id"], "left_anti")
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


def run_phrase_queries(
    spark: SparkSession, index: Index, queries: list[dict]
) -> DataFrame:
    """Distributed PHRASE batch (the query language's positional path at
    A20 scale): queries = [{"query_id": int, "phrase": [term, ...], "k"}]
    → DataFrame(query_id long, rank long, doc_id long, score double).

    Fully declarative after the positional decode — phrase adjacency is a
    Catalyst higher-order fold, never Python: ``run`` starts as the first
    term's position array and each later term t_j keeps only start
    positions p with p+j ∈ pos(t_j) (`F.filter` + `F.exists`, whole-stage
    codegen; position runs are tf-sized, so the nested scan is tiny).
    Matching docs then score through the standard pipeline — BM25 over the
    phrase's member terms (same semantics as the driver-local
    `_structured_search` and the fts04 oracle), fixed-order fold, per-query
    top-k.  Each adjacency step is an equi-join on doc_id between two
    term-filtered slices of the same pushdown scan, so per-step input is
    bounded by the rarer term's postings."""
    if not index.conf.store_positions:
        raise ValueError(
            "phrase batch on an index built without positions "
            "(BuildConfig.store_positions=True)"
        )
    empty = "query_id long, rank long, doc_id long, score double"
    all_terms = sorted({t for q in queries for t in q["phrase"]})
    dic = index.lookup(all_terms)
    decoded = _drop_deleted(
        _decode_arrow(
            _postings_scan(spark, index.index_dir, all_terms), with_pos=True
        ),
        spark,
        index.index_dir,
    )

    parts = []
    qrows = []
    for qd in queries:
        ph = list(qd["phrase"])
        if not ph or any(t not in dic for t in ph):
            continue  # a missing member term can never match an exact phrase
        qid, k = int(qd["query_id"]), int(qd.get("k", 10))
        cur = decoded.filter(F.col("term") == ph[0]).select(
            "doc_id", F.col("pos").alias("run")
        )
        for j, t in enumerate(ph[1:], start=1):
            nxt = decoded.filter(F.col("term") == t).select(
                "doc_id", F.col("pos").alias(f"p{j}")
            )
            pj = F.col(f"p{j}")
            step = F.lit(j).cast("long")
            cur = (
                cur.join(nxt, "doc_id")
                .select(
                    "doc_id",
                    F.filter(
                        "run", lambda p: F.exists(pj, lambda x: x == p + step)
                    ).alias("run"),
                )
                .filter(F.size("run") > 0)
            )
        parts.append(
            cur.select(F.lit(qid).cast("long").alias("query_id"), "doc_id")
        )
        for t in sorted(set(ph)):
            qrows.append((qid, t, float(index.cfg.idf(dic[t]["df"], index.n_docs)), k))
    if not parts:
        return spark.createDataFrame([], empty)
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.unionByName(p)
    qdf = spark.createDataFrame(qrows, "query_id long, term string, idf double, k long")
    contribs = (
        decoded.select("term", "doc_id", "tf", "dl")
        .join(F.broadcast(qdf), "term")
        .join(cand, ["query_id", "doc_id"], "left_semi")
        .select("query_id", "doc_id", "term", "k", _contrib_col(index).alias("contrib"))
    )
    return _fold_and_rank(contribs)
