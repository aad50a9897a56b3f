"""A33 — spell correction / did-you-mean via symmetric deletes.

Candidate generation follows the symmetric-delete (SymSpell) scheme — a
public algorithm (Garbe, 2012): for every dictionary term ``t`` persist
``{t} ∪ del1(t)`` (the term plus each single-character deletion) as a
``spellings`` index component.  A query term ``q`` probes with its own
``{q} ∪ del1(q)``; a dictionary term within Levenshtein distance ≤ 1
ALWAYS shares a variant with the probe set (dist 0: ``t = q``; insertion
in ``q``: ``t ∈ del1(q)``; deletion: ``q ∈ del1(t)``; substitution: the
deletion at the edited position is shared), so the probe is lossless.
Shared variants can also surface distance-2 terms (e.g. transpositions);
an exact O(|t|) distance-≤1 verify on the small candidate set keeps the
result exact.

Scale shape: the build is one narrow Spark job over the dictionary
(``term, df`` only) — a per-row ``transform`` explodes |t|+1 variants,
written range-partitioned + sorted by ``variant`` so the query-time probe
is a parquet stats-pruned point scan (same access pattern as the
dictionary term range scan, A23/A31).  At a 10^9-term vocabulary the
spellings table is ~|t|+1 ≈ 10× the dictionary — still tiny next to
postings — and lookups stay driver-local sub-ms.  Nothing here touches
postings; the component is optional and built on demand.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SPELLINGS_SUBDIR = "spellings"


def build_spell_index(
    spark: SparkSession, index_dir: str, n_partitions: int | None = None
) -> str:
    """Build the symmetric-delete ``spellings`` component for an index.

    Reads only (term, df) from the dictionary, emits one row per variant
    in ``{t} ∪ del1(t)``, and writes range-partitioned + sorted by
    ``variant`` so point probes prune on parquet min/max statistics.
    Idempotent (mode=overwrite); returns the component path.
    """
    out = os.path.join(index_dir, SPELLINGS_SUBDIR)
    dic = spark.read.parquet(os.path.join(index_dir, "dictionary")).select(
        "term", F.col("df").cast("long").alias("df")
    )
    term = F.col("term")
    del1 = F.transform(
        F.sequence(F.lit(1), F.length(term)),
        # drop character i (1-based): prefix [1, i-1] + suffix [i+1, end]
        lambda i: F.concat(
            term.substr(F.lit(1), i - 1), term.substr(i + 1, F.length(term) - i)
        ),
    )
    variants = dic.select(
        F.explode(F.array_union(F.array(term), del1)).alias("variant"),
        term.alias("term"),
        "df",
    )
    # "spark.sql.shuffle.partitions" may be the non-numeric "auto" under
    # some AQE configurations — fall back to the cluster's parallelism.
    try:
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    except ValueError:
        shuffle_parts = spark.sparkContext.defaultParallelism
    nparts = n_partitions or max(1, shuffle_parts // 4)
    (
        variants.repartitionByRange(nparts, "variant")
        .sortWithinPartitions("variant")
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def edit_distance_le1(a: str, b: str) -> bool:
    """Exact Levenshtein(a, b) ≤ 1 in O(len) — the verify step that makes
    symmetric-delete candidate generation exact."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:  # exactly one substitution?
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:  # normalize: a is the shorter string
        a, b, la, lb = b, a, lb, la
    i = 0  # b = a with one insertion: walk past the single gap
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def spell_candidates(
    index, term: str, k: int = 10
) -> list[tuple[str, int]]:
    """Dictionary terms within edit distance ≤ 1 of ``term``, ranked by the
    integer-exact (df desc, term asc) pair, top ``k``.  Requires the
    ``spellings`` component (:func:`build_spell_index`).

    Driver-local like the other interactive lookups (SURVEY.md §3.2): the
    probe set is |q|+1 strings, the scan is stats-pruned, and the verify
    runs over a handful of candidate rows.
    """
    import pyarrow.dataset as ds

    if not term:
        raise ValueError("empty query term")
    probes = sorted({term} | {term[:i] + term[i + 1 :] for i in range(len(term))})
    tbl = index._dataset(SPELLINGS_SUBDIR).to_table(
        columns=["term", "df"], filter=ds.field("variant").isin(probes)
    )
    cands = {(r["term"], int(r["df"])) for r in tbl.to_pylist()}
    hits = [(t, df) for t, df in cands if edit_distance_le1(term, t)]
    hits.sort(key=lambda r: (-r[1], r[0]))
    return hits[:k]
