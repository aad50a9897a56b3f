"""A17 — block-max WAND top-k (Broder et al. CIKM 2003; Ding & Suel SIGIR
2011).  BASELINE.json:6: "top-k retrieval uses posting-list intersection with
block-max WAND pruning".

Exact: returns the identical top-k (docIDs and float64 scores) as the
exhaustive disjunctive scorer (search._or_topk) — verified by the
WAND==exhaustive equivalence tests.  This is *our* query-time optimizer
(SURVEY.md §4): Catalyst cannot prune inside posting lists, so pruning lives
here, below the DataFrame layer, driven by per-block ``tf_norm_max`` bounds
persisted at build time (codec.encode_blocks).

A conservative 1e-10 margin on the skip threshold keeps pruning decisions
safe against float summation-order effects (bounds are per-term exact upper
bounds; only their *sum* could round below the true score's sum).
"""

from __future__ import annotations

import heapq

import numpy as np

from localsearchengine_spark.config import BM25Config

_EPS = 1e-10


def wand_topk(plists, k: int, cfg: BM25Config) -> list[tuple[int, float]]:
    """plists: list[TermPostings] in sorted term order (search.py)."""
    terms = [p for p in plists if len(p.doc_ids) > 0]
    if not terms or k <= 0:
        return []
    n = len(terms)
    scale = [float(p.idf * (cfg.k1 + 1.0)) for p in terms]  # same op order as oracle
    term_ub = [scale[i] * float(terms[i].block_max_tfn.max()) for i in range(n)]
    ptr = [0] * n
    alive = list(range(n))
    heap: list[tuple[float, int]] = []  # (score, -doc_id); root = current worst

    def theta() -> float:
        return heap[0][0] if len(heap) >= k else float("-inf")

    while alive:
        alive.sort(key=lambda t: terms[t].doc_ids[ptr[t]])
        th = theta()
        # --- pivot selection: smallest doc where Σ term UBs could beat θ ---
        acc = 0.0
        pivot_i = -1
        for j, t in enumerate(alive):
            acc += term_ub[t]
            if acc > th + _EPS or th == float("-inf"):
                pivot_i = j
                break
        if pivot_i < 0:
            break  # no doc can beat θ anymore
        pivot_doc = int(terms[alive[pivot_i]].doc_ids[ptr[alive[pivot_i]]])

        first = alive[0]
        if int(terms[first].doc_ids[ptr[first]]) == pivot_doc:
            # all involved terms aligned at pivot → block-max check (BMW)
            involved = [t for t in alive if int(terms[t].doc_ids[ptr[t]]) <= pivot_doc]
            bm = 0.0
            block_ends = []
            for t in involved:
                p = terms[t]
                bi = int(np.searchsorted(p.block_max_doc, pivot_doc, side="left"))
                bi = min(bi, len(p.block_max_doc) - 1)
                bm += scale[t] * float(p.block_max_tfn[bi])
                block_ends.append(int(p.block_max_doc[bi]))
            if th != float("-inf") and bm <= th - _EPS:
                # skip: jump past the shallowest block boundary (NextShallow)
                nxt = min(block_ends) + 1
                if pivot_i + 1 < len(alive):
                    t_next = alive[pivot_i + 1]
                    nxt = min(nxt, int(terms[t_next].doc_ids[ptr[t_next]]))
                nxt = max(nxt, pivot_doc + 1)
                _advance_all(terms, ptr, alive, involved, nxt)
            else:
                # evaluate pivot_doc exactly, summed in sorted term order
                contribs = []
                for t in range(n):
                    p = terms[t]
                    if ptr[t] < len(p.doc_ids) and int(p.doc_ids[ptr[t]]) == pivot_doc:
                        contribs.append((p.term, scale[t] * float(p.tf_norm[ptr[t]])))
                contribs.sort(key=lambda x: x[0])
                score = 0.0
                for _, c in contribs:
                    score += c
                if len(heap) < k:
                    heapq.heappush(heap, (score, -pivot_doc))
                elif score > heap[0][0]:
                    heapq.heapreplace(heap, (score, -pivot_doc))
                _advance_all(terms, ptr, alive, alive, pivot_doc + 1)
        else:
            # advance the term with the largest posting list among those
            # strictly before the pivot (fewest future alignments lost);
            # strictness guarantees progress — a term already at the pivot
            # would not move under searchsorted(side="left")
            before = [t for t in alive if int(terms[t].doc_ids[ptr[t]]) < pivot_doc]
            t_adv = max(before, key=lambda t: len(terms[t].doc_ids))
            _advance_one(terms, ptr, t_adv, pivot_doc)
            alive = [t for t in alive if ptr[t] < len(terms[t].doc_ids)]
            continue
        alive = [t for t in alive if ptr[t] < len(terms[t].doc_ids)]

    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    return [(int(-nd), float(s)) for s, nd in out]


def _advance_one(terms, ptr, t, target_doc: int) -> None:
    # binary search on the unread suffix (galloping-equivalent skip, helped
    # further by whole-block max_doc_id metadata living in the same arrays)
    p = terms[t]
    ptr[t] = ptr[t] + int(np.searchsorted(p.doc_ids[ptr[t]:], target_doc, side="left"))


def _advance_all(terms, ptr, alive, involved, target_doc: int) -> None:
    for t in involved:
        if ptr[t] < len(terms[t].doc_ids) and int(terms[t].doc_ids[ptr[t]]) < target_doc:
            _advance_one(terms, ptr, t, target_doc)
