"""Training-data pipeline operators over the driver corpus (SURVEY.md §2
extension): deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine), similarity search (LSH-bucketed ANN), text analysis
(language-ID, fingerprinting), and multimodal column plumbing.

Every operator is registered with the same @q decorator as the relational
surface (plans/relational.py) so the driver checks it against a DuckDB
oracle.  Portability contract for oracles: the only hash both engines share
is md5 — 60-bit / 32-bit integer views of it are taken with
Spark ``conv(substring(md5(x),1,k),16,10)`` ≡ DuckDB
``CAST(concat('0x', substring(md5(x),1,k)) AS BIGINT)`` (verified
bit-identical), and all arithmetic that feeds a *decision* (LSH bucket,
sign bit, candidate cut) is integer-exact so no float summation-order
difference can flip it.  Shingles/tokens here use the plain space split of
the documents fixture (same as b15) so oracles stay in ANSI SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from localsearchengine_spark.plans.relational import SPARK_QUERIES, _t, q

# ---------------------------------------------------------------------------
# shared shingle helpers (word 3-grams over the space-split token stream)
# ---------------------------------------------------------------------------
_NGRAM = 3


def _shingles_col(text_col: str = "text"):
    """array<string> of distinct word 3-grams — pure Catalyst expression."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - _NGRAM, F.lit(-1))),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2), F.element_at(toks, i + 3)
        ),
    )
    return F.when(n >= _NGRAM, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _shingles_sql(alias: str = "documents") -> str:
    """The DuckDB twin of :func:`_shingles_col` (1-based list indexing)."""
    sp = f"string_split({alias}.text, ' ')"
    return (
        f"CASE WHEN len({sp}) >= {_NGRAM} THEN list_distinct(list_transform("
        # range() upper bound is exclusive: i runs 1..len-NGRAM+1 (1-based)
        f"range(1, len({sp}) - {_NGRAM - 2}), i -> {sp}[i] || ' ' || {sp}[i+1] || ' ' || {sp}[i+2]))"
        f" ELSE [] END"
    )


def _jaccard_pairs_sql(threshold: float) -> str:
    """Exact all-pairs shingle-Jaccard oracle (fine at sf0.01 check scale)."""
    return f"""
WITH s AS (SELECT doc_id, {_shingles_sql()} AS sh FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(len(list_intersect(a.sh, b.sh))::DOUBLE
             / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE len(a.sh) > 0 AND len(b.sh) > 0
  AND len(list_intersect(a.sh, b.sh))::DOUBLE
      / len(list_distinct(list_concat(a.sh, b.sh))) >= {threshold}
"""


# ---------------------------------------------------------------------------
# DD3 — MinHash + LSH near-duplicate detection.
# Scale path: signatures are fixed-width (K hashes) per doc regardless of
# text size; the band shuffle is O(docs × bands); candidate verification
# touches only bucket-colliding pairs.  The exact-Jaccard SQL oracle agrees
# because verification recomputes exact Jaccard and the band parameters
# (32 bands × 2 rows) put the miss probability at J≥0.6 below 1e-6.
# ---------------------------------------------------------------------------
_MH_K = 64          # minhash functions
_MH_BANDS = 32      # → 2 rows per band
_MH_ROWS = _MH_K // _MH_BANDS
_MH_P = (1 << 61) - 1
_MH_THRESHOLD = 0.6
_rng = np.random.default_rng(1234)
_MH_A = _rng.integers(1, _MH_P, size=_MH_K, dtype=np.int64)
_MH_B = _rng.integers(0, _MH_P, size=_MH_K, dtype=np.int64)


def _minhash_sigs(pdf_iter):
    """mapInPandas kernel: (doc_id, text) → (doc_id, band, key1, key2).

    zlib.crc32 per shingle (C speed; a prod build would use a vectorized
    xxhash64) then K universal hashes min-reduced over the shingle set —
    all integer arithmetic, deterministic across partitioning.
    """
    import zlib

    for pdf in pdf_iter:
        out_doc, out_band, out_k1, out_k2 = [], [], [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            toks = text.split(" ") if text else []
            if len(toks) < _NGRAM:
                continue
            sh = {
                " ".join(toks[i : i + _NGRAM]) for i in range(len(toks) - _NGRAM + 1)
            }
            h = np.fromiter(
                (zlib.crc32(s.encode()) for s in sh), dtype=np.int64, count=len(sh)
            )
            # (A*h + B) mod P, min over shingles, per hash function
            sigs = (
                (h[None, :].astype(object) * _MH_A[:, None] + _MH_B[:, None]) % _MH_P
            ).min(axis=1)
            sigs = sigs.astype(np.int64)
            for band in range(_MH_BANDS):
                out_doc.append(doc_id)
                out_band.append(band)
                out_k1.append(int(sigs[band * _MH_ROWS]))
                out_k2.append(int(sigs[band * _MH_ROWS + 1]))
        yield pd.DataFrame(
            {
                "doc_id": pd.array(out_doc, dtype="int64"),
                "band": pd.array(out_band, dtype="int32"),
                "k1": pd.array(out_k1, dtype="int64"),
                "k2": pd.array(out_k2, dtype="int64"),
            }
        )


@q("dd03_minhash_lsh", _jaccard_pairs_sql(_MH_THRESHOLD))
def dd03(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    sigs = docs.select("doc_id", "text").mapInPandas(
        _minhash_sigs, schema="doc_id long, band int, k1 long, k2 long"
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.k1") == F.col("b.k1"))
            & (F.col("a.k2") == F.col("b.k2"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sh = docs.select("doc_id", _shingles_col().alias("sh"))
    verified = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter((F.size("sh_a") > 0) & (F.size("sh_b") > 0))
        .filter(F.col("jaccard") >= _MH_THRESHOLD)
    )
    return verified.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


# ---------------------------------------------------------------------------
# DD4 — SimHash document fingerprint (60-bit, tf-weighted), entirely in
# Catalyst expressions: md5-derived 60-bit term hash → per-bit ±tf majority
# vote → packed bigint.  Whole-stage codegen, no Python.
# ---------------------------------------------------------------------------
_SIMHASH_BITS = 60

_SIMHASH_SQL = f"""
WITH tf AS (
  SELECT doc_id, tok,
         CAST(count(*) AS BIGINT) AS tf,
         CAST(concat('0x', substring(md5(tok), 1, 15)) AS BIGINT) AS h
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY doc_id, tok
),
bits AS (
  SELECT doc_id, b.bit,
         sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN tf ELSE -tf END) AS vote
  FROM tf, (SELECT unnest(range(0, {_SIMHASH_BITS})) AS bit) b
  GROUP BY doc_id, b.bit
)
SELECT doc_id,
       CAST(sum(CASE WHEN vote > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""


@q("dd04_simhash", _SIMHASH_SQL)
def dd04(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn(
            "h", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
        )
    )
    bits = (
        tf.select(
            "doc_id",
            "tf",
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(_SIMHASH_BITS - 1))).alias("bit"),
        )
        .withColumn(
            "vote",
            F.when(
                F.expr("shiftright(h, bit) & 1") == 1, F.col("tf")
            ).otherwise(-F.col("tf")),
        )
        .groupBy("doc_id", "bit")
        .agg(F.sum("vote").alias("vote"))
    )
    return (
        bits.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("vote") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
                ).otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
    )


# ---------------------------------------------------------------------------
# DD5 — exact n-gram Jaccard via the shingle inverted index: explode
# distinct shingles, self-join on shingle (only co-occurring pairs are ever
# materialized — no O(n²) cross join), count |A∩B|, derive the union from
# per-doc set sizes.  This is the scalable exact-dedup path; the oracle is
# the O(n²) formulation, equal by |A∪B| = |A|+|B|−|A∩B|.
# ---------------------------------------------------------------------------
_NJ_THRESHOLD = 0.5


@q("dd05_ngram_jaccard", _jaccard_pairs_sql(_NJ_THRESHOLD))
def dd05(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(_shingles_col()).alias("sh"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sz_a = sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a")
    sz_b = sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b")
    return (
        common.join(F.broadcast(sz_a), "doc_a")
        .join(F.broadcast(sz_b), "doc_b")
        .withColumn(
            "jaccard",
            F.col("common").cast("double") / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= _NJ_THRESHOLD)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# DD6 — embedding-cosine near-duplicate pairs.  Exact all-pairs here (the
# corpus fits); the LSH-bucketed scale path is sim02.  Decision arithmetic
# is double on both sides but the threshold sits far from any pair value
# (verified on the fixture), and reported values are rounded.
# ---------------------------------------------------------------------------
_COS_THRESHOLD = 0.42

_DD06_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= {_COS_THRESHOLD}
"""


def _dot(u, v):
    return F.aggregate(
        F.zip_with(u, v, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


@q("dd06_embedding_neardup", _DD06_SQL)
def dd06(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").alias("v"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    a, b = emb.alias("a"), emb.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn(
            "cos", _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
        )
        .filter(F.col("cos") >= _COS_THRESHOLD)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round("cos", 6).alias("cos"),
        )
    )


# ---------------------------------------------------------------------------
# SIM2 — LSH-bucketed approximate nearest neighbour (the scale path next to
# sim01's brute force).  Random-hyperplane signatures over integer-quantized
# embeddings (round(x*1000) — bucket decisions are integer-exact, so Spark
# and DuckDB agree bit-for-bit), Hamming-≤4 multiprobe, exact cosine top-10
# among candidates.  The oracle runs the SAME algorithm in SQL.
# ---------------------------------------------------------------------------
_ANN_PLANES = 16
_ANN_DIM = 64
_ANN_HAMMING = 4
_ANN_K = 10
_ann_rng = np.random.default_rng(99)
_PLANES = _ann_rng.integers(-9, 10, size=(_ANN_PLANES, _ANN_DIM)).tolist()


def _sig_col(qcol):
    """Signature bigint from a quantized array<long> column."""
    sig = F.lit(0).cast("long")
    for j, plane in enumerate(_PLANES):
        lit_plane = F.array(*[F.lit(int(c)) for c in plane])
        dot = F.aggregate(
            F.zip_with(qcol, lit_plane, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def _ann_sql() -> str:
    plane_rows = ", ".join(
        f"({j}, {list(map(int, p))})" for j, p in enumerate(_PLANES)
    )
    return f"""
WITH planes(j, p) AS (VALUES {plane_rows}),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
             list_transform(embedding::DOUBLE[], x -> CAST(round(x*1000) AS BIGINT)) AS qv
      FROM embeddings),
sigs AS (
  SELECT e.vec_id, e.v,
         sum(CASE WHEN list_sum(list_transform(range(1, {_ANN_DIM + 1}),
                     i -> e.qv[i] * p[i])) > 0
                  THEN (1::BIGINT << j) ELSE 0 END) AS sig
  FROM e, planes GROUP BY e.vec_id, e.v
),
qs AS (SELECT sig AS qsig, v AS qv FROM sigs WHERE vec_id = 0)
SELECT vec_id, round(list_cosine_similarity(s.v, qs.qv), 6) AS cos
FROM sigs s, qs
WHERE s.vec_id <> 0 AND bit_count(xor(s.sig, qs.qsig)) <= {_ANN_HAMMING}
ORDER BY list_cosine_similarity(s.v, qs.qv) DESC, vec_id
LIMIT {_ANN_K}
"""


@q("sim02_ann_lsh", _ann_sql())
def sim02(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").alias("v"),
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")
        ).alias("qv"),
    )
    sigs = emb.select(
        "vec_id",
        "v",
        _sig_col(F.col("qv")).alias("sig"),
        F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nrm"),
    )
    qrow = sigs.filter(F.col("vec_id") == 0).select("sig", "v", "nrm").collect()[0]
    qsig, qv, qn = int(qrow["sig"]), [float(x) for x in qrow["v"]], float(qrow["nrm"])
    qlit = F.array(*[F.lit(x) for x in qv])
    cand = sigs.filter(
        (F.col("vec_id") != 0)
        & (F.bit_count(F.col("sig").bitwiseXOR(F.lit(qsig))) <= _ANN_HAMMING)
    )
    return (
        cand.withColumn("cos", _dot(F.col("v"), qlit) / (F.col("nrm") * F.lit(qn)))
        .orderBy(F.desc("cos"), "vec_id")
        .limit(_ANN_K)
        .select("vec_id", F.round("cos", 6).alias("cos"))
    )


# ---------------------------------------------------------------------------
# TX2 — language identification by marker-token profile scoring (the n-gram
# heuristic family).  The profiles are config; the oracle replicates the
# scoring, so correctness is checked on the mechanism.  Tie-break: first
# language in lexicographic order among the max scores.
# ---------------------------------------------------------------------------
_LANG_PROFILES = {
    "de": ["window", "group", "order", "value"],
    "en": ["the", "a", "fast", "slow", "key"],
    "es": ["data", "query", "row", "table"],
    "fr": ["line", "column", "sort", "merge"],
    "zh": ["join", "spark", "hash", "scan"],
}


def _langid_sql() -> str:
    score_cols = ", ".join(
        "len(list_filter(string_split(text,' '), t -> t IN ({}))) AS s_{}".format(
            ", ".join(f"'{w}'" for w in ws), lang
        )
        for lang, ws in _LANG_PROFILES.items()
    )
    langs = sorted(_LANG_PROFILES)
    best = "greatest({})".format(", ".join(f"s_{la}" for la in langs))
    pred = "CASE " + " ".join(
        f"WHEN s_{la} = {best} THEN '{la}'" for la in langs
    ) + " END"
    return f"""
WITH scored AS (SELECT doc_id, {score_cols} FROM documents)
SELECT doc_id, {pred} AS pred_lang, CAST({best} AS BIGINT) AS score FROM scored
"""


@q("tx02_language_id", _langid_sql())
def tx02(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = docs.select(
        "doc_id",
        *[
            F.size(
                F.filter(toks, lambda t: t.isin(ws))
            ).alias(f"s_{lang}")
            for lang, ws in _LANG_PROFILES.items()
        ],
    )
    langs = sorted(_LANG_PROFILES)
    best = F.greatest(*[F.col(f"s_{la}") for la in langs])
    expr = None
    for la in langs:
        cond = F.col(f"s_{la}") == best
        expr = F.when(cond, F.lit(la)) if expr is None else expr.when(cond, F.lit(la))
    return scored.select(
        "doc_id", expr.alias("pred_lang"), best.cast("long").alias("score")
    )


# ---------------------------------------------------------------------------
# TX3 — order-sensitive positional fingerprint: Σ position·h32(token), all
# integer-exact (h32 < 2^32, positions ≤ corpus max dl ⇒ the sum stays far
# below 2^63 on both engines).  Detects token reorderings that the md5
# content fingerprint (dd02) maps to different values anyway but a bag-of-
# words hash would miss.
# ---------------------------------------------------------------------------
_TX03_SQL = """
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(ord * CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT)) AS BIGINT) AS fp
FROM (SELECT doc_id,
             unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS ord
      FROM documents)
GROUP BY doc_id
"""


@q("tx03_positional_fingerprint", _TX03_SQL)
def tx03(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok"))
        .withColumn("h", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum((F.col("pos") + 1) * F.col("h")).alias("fp"),
        )
    )


# ---------------------------------------------------------------------------
# MM1 — multimodal column plumbing: the corpus text re-enters as an opaque
# binary column (stand-in for image bytes; no image libs in this sandbox),
# and a typed decode-STUB runs as an Arrow-batched mapInPandas with the real
# schema/batch shape.  Metadata is a deterministic function of the bytes so
# the SQL oracle can check the plumbing end to end.
# ---------------------------------------------------------------------------
_MM01_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(64 + octet_length(encode(text)) % 512 AS BIGINT) AS width,
       CAST(64 + (octet_length(encode(text)) * 7) % 512 AS BIGINT) AS height,
       CAST(3 AS BIGINT) AS channels
FROM documents
"""


def _decode_stub(pdf_iter):
    """Batch decode stub: real pipelines put PIL/ffmpeg here (absent in this
    sandbox — deterministic fake per the module docstring contract)."""
    for pdf in pdf_iter:
        n = pdf["blob"].map(len).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": n,
                "width": 64 + n % 512,
                "height": 64 + (n * 7) % 512,
                "channels": np.full(len(pdf), 3, dtype=np.int64),
            }
        )


@q("mm01_multimodal_decode", _MM01_SQL)
def mm01(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("blob")
    )
    return docs.mapInPandas(
        _decode_stub,
        schema="doc_id long, n_bytes long, width long, height long, channels long",
    )


# ---------------------------------------------------------------------------
# MM2 — frame sampling plumbing (video stand-in): one input blob fans out to
# K frame rows with per-frame features, exercising the 1→N Arrow batch shape
# of a real frame sampler.  Features are scalar columns (the driver's
# canonicalizer sorts all columns with pandas, which cannot hash Python
# lists — an array<double> column turned this row red in round 1); the
# fixture text is pure ASCII (verified: octet_length == length on every
# row), so the strided byte-sum is SQL-expressible and the row gets a full
# value-hash oracle instead of the rows-only check.
# ---------------------------------------------------------------------------
_MM2_FRAMES = 3

_MM02_SQL = f"""
SELECT doc_id,
       CAST(k AS BIGINT) AS frame_idx,
       CAST(length(text) AS BIGINT) AS n_bytes,
       CAST(list_sum(list_transform(range(1 + k, length(text) + 1, {_MM2_FRAMES}),
                                    i -> ord(substring(text, i, 1)))) % 997
            AS DOUBLE) AS f_sum,
       CAST(len(range(1 + k, length(text) + 1, {_MM2_FRAMES})) AS DOUBLE) AS f_len
FROM documents CROSS JOIN (SELECT unnest(range(0, {_MM2_FRAMES})) AS k)
"""


def _frame_stub(pdf_iter):
    for pdf in pdf_iter:
        frames = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            arr = np.frombuffer(blob, dtype=np.uint8)
            for k in range(_MM2_FRAMES):
                seg = arr[k::_MM2_FRAMES]
                frames.append(
                    (
                        int(doc_id),
                        k,
                        int(len(arr)),
                        float(int(seg.sum()) % 997),
                        float(len(seg)),
                    )
                )
        yield pd.DataFrame(
            frames, columns=["doc_id", "frame_idx", "n_bytes", "f_sum", "f_len"]
        )


@q("mm02_frame_sample", _MM02_SQL)
def mm02(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("blob")
    )
    return docs.mapInPandas(
        _frame_stub,
        schema="doc_id long, frame_idx long, n_bytes long, f_sum double, f_len double",
    )
