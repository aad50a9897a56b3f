"""Deterministic synthesis of the transcripts corpus and golden query set.

The input table shape is mandated by BASELINE.json:15 (``input_hint``):
``transcripts(conv_id string, turn_idx int32, role string, text string,
tool string, ts timestamp)``.  The reference's own corpus/query set is
unrecoverable in this sandbox (SURVEY.md §0), so this module synthesizes a
byte-stable stand-in (seed=42, single fixed draw order — FIXTURES.md §2) with
an intentionally Zipf-skewed vocabulary so hot-term salting (A7) is exercised.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42

# ~40 base terms, Zipf s≈1.1 — same vocabulary family as documents.parquet
BASE_VOCAB = [
    "the", "spark", "join", "merge", "small", "query", "index", "data",
    "table", "scan", "filter", "shuffle", "sort", "build", "read", "write",
    "turn", "tool", "user", "agent", "search", "term", "doc", "score",
    "rank", "block", "delta", "varint", "salt", "skew", "plan", "stage",
    "task", "batch", "arrow", "pandas", "column", "row", "hash", "cache",
]

ROLES_TOOL = ["bash", "search", "edit", "read"]


def _zipf_probs(n: int, s: float = 1.1) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1, dtype=np.float64) ** s
    return w / w.sum()


def make_transcripts(n_turns: int, seed: int = SEED) -> pd.DataFrame:
    """Deterministic transcripts frame (FIXTURES.md §2)."""
    rng = np.random.default_rng(seed)

    # conversation lengths: geometric mean 8, clipped [1, 64]
    lens: list[int] = []
    total = 0
    while total < n_turns:
        ln = int(np.clip(rng.geometric(1.0 / 8.0), 1, 64))
        ln = min(ln, n_turns - total)
        lens.append(ln)
        total += ln
    lens_arr = np.asarray(lens, dtype=np.int64)
    n_convs = len(lens_arr)

    conv_ids = np.repeat(
        np.asarray([f"conv{i:08d}" for i in range(n_convs)], dtype=object), lens_arr
    )
    turn_idx = np.concatenate([np.arange(ln, dtype=np.int32) for ln in lens_arr])

    # roles: alternate user/assistant; 10% of turns become tool turns
    is_tool = rng.random(n_turns) < 0.10
    tool_kind = rng.integers(0, len(ROLES_TOOL), size=n_turns)
    base_role = np.where(turn_idx % 2 == 0, "user", "assistant")
    role = np.where(is_tool, "tool", base_role).astype(object)
    tool = np.where(
        is_tool, np.asarray(ROLES_TOOL, dtype=object)[tool_kind], ""
    ).astype(object)

    # text: 8..96 Zipf tokens per turn
    n_tokens = rng.integers(8, 97, size=n_turns)
    probs = _zipf_probs(len(BASE_VOCAB))
    flat = rng.choice(np.asarray(BASE_VOCAB, dtype=object), size=int(n_tokens.sum()), p=probs)
    bounds = np.cumsum(n_tokens)[:-1]
    texts = [" ".join(chunk) for chunk in np.split(flat, bounds)]

    # long-tail rare terms: term{r:05d}, each in 1..3 turns (df coverage)
    n_rare = max(1, n_turns // 20)
    for r in range(n_rare):
        k = 1 + (r % 3)
        docs = rng.choice(n_turns, size=k, replace=False)
        tok = f"term{r:05d}"
        for d in docs:
            texts[int(d)] = texts[int(d)] + " " + tok

    ts = pd.Timestamp("2025-01-01T00:00:00") + pd.to_timedelta(
        np.arange(n_turns, dtype=np.int64) * 7, unit="s"
    )

    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx.astype(np.int32),
            "role": role,
            "text": np.asarray(texts, dtype=object),
            "tool": tool,
            "ts": ts,
        }
    )


def write_transcripts_parquet(pdf: pd.DataFrame, path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            pa.field("conv_id", pa.string(), nullable=False),
            pa.field("turn_idx", pa.int32(), nullable=False),
            pa.field("role", pa.string()),
            pa.field("text", pa.string()),
            pa.field("tool", pa.string()),
            pa.field("ts", pa.timestamp("us")),
        ]
    )
    # small row groups: a parquet file is only splittable at row-group
    # boundaries, so a single-group file caps every downstream scan at
    # parallelism 1 regardless of spark.sql.files.maxPartitionBytes
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
        path,
        row_group_size=32768,
    )


def golden_queries(seed: int = SEED, k: int = 10) -> list[dict]:
    """50 seeded queries (FIXTURES.md §3): 20 single-term (10 hot / 10 rare),
    20 two-term AND, 10 three-term AND.  Expected results come from the
    independent pandas oracle in tests (no shared code with the engine)."""
    rng = np.random.default_rng(seed + 1)
    queries: list[dict] = []
    qid = 0
    for i in range(10):  # hot single
        queries.append({"query_id": qid, "terms": [BASE_VOCAB[i]], "k": k})
        qid += 1
    for i in range(10):  # rare single
        queries.append({"query_id": qid, "terms": [f"term{(i * 7) % 97:05d}"], "k": k})
        qid += 1
    for _ in range(20):  # two-term
        a, b = rng.choice(len(BASE_VOCAB), size=2, replace=False)
        queries.append(
            {"query_id": qid, "terms": sorted([BASE_VOCAB[a], BASE_VOCAB[b]]), "k": k}
        )
        qid += 1
    for _ in range(10):  # three-term
        idx = rng.choice(len(BASE_VOCAB), size=3, replace=False)
        queries.append(
            {"query_id": qid, "terms": sorted(BASE_VOCAB[i] for i in idx), "k": k}
        )
        qid += 1
    return queries
