"""Independent brute-force BM25 oracle (FIXTURES.md §3, SURVEY.md §0.2).

Deliberately shares NO code with the engine: plain ``re`` + ``collections``
loops, no NumPy vectorization tricks, no imports from
``localsearchengine_spark`` except the frozen config *values* passed in.
"""

from __future__ import annotations

import math
import re
from collections import Counter


def oracle_search(
    docs: list[tuple[int, str]],
    terms: list[str],
    k: int = 10,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    idf_variant: str = "lucene",
    mode: str = "and",
) -> list[tuple[int, float]]:
    """docs: [(doc_id, text)] — returns [(doc_id, score)] top-k,
    score desc then doc_id asc."""
    tokenized = {}
    for doc_id, text in docs:
        tokenized[doc_id] = re.findall(r"[0-9a-z_]+", (text or "").lower())
    n_docs = len(docs)
    total = sum(len(t) for t in tokenized.values())
    avgdl = total / n_docs

    q = sorted(set(terms))
    dfs = {}
    for t in q:
        dfs[t] = sum(1 for toks in tokenized.values() if t in set(toks))

    def idf(df):
        if idf_variant == "lucene":
            return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        if idf_variant == "rsj":
            return math.log((n_docs - df + 0.5) / (df + 0.5))
        return math.log(n_docs / df)

    results = []
    for doc_id, toks in tokenized.items():
        cnt = Counter(toks)
        tfs = {t: cnt.get(t, 0) for t in q}
        if mode == "and" and any(v == 0 for v in tfs.values()):
            continue
        if all(v == 0 for v in tfs.values()):
            continue
        dl = len(toks)
        score = 0.0
        for t in q:  # sorted term order — same summation order as the engine
            tf = tfs[t]
            if tf == 0:
                continue
            if dfs[t] == 0:
                continue
            tf_norm = tf / (tf + k1 * (1.0 - b + b * dl / avgdl))
            score += idf(dfs[t]) * (k1 + 1.0) * tf_norm
        results.append((doc_id, score))
    results.sort(key=lambda x: (-x[1], x[0]))
    return results[:k]
