"""A8 codec properties (SURVEY.md §5: hypothesis round-trips + bound checks)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from localsearchengine_spark.operators import codec


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.asarray(vals, dtype=np.uint64)
    assert np.array_equal(codec.decode_varints(codec.encode_varints(arr), len(arr)), arr)


@given(
    st.lists(st.integers(min_value=1, max_value=10**7), min_size=1, max_size=500),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=100, deadline=None)
def test_block_roundtrip(deltas, block_size):
    doc_ids = np.cumsum(np.asarray(deltas, dtype=np.int64))  # strictly increasing
    rng = np.random.default_rng(7)
    tfs = rng.integers(1, 50, size=len(doc_ids)).astype(np.int64)
    dls = rng.integers(1, 200, size=len(doc_ids)).astype(np.int64)
    blocks = codec.encode_blocks(
        doc_ids, tfs, dls, block_size=block_size, k1=1.2, b=0.75, avgdl=50.0
    )
    d, t, L = codec.decode_blocks(blocks)
    assert np.array_equal(d, doc_ids)
    assert np.array_equal(t, tfs)
    assert np.array_equal(L, dls)
    # block metadata invariants: max_doc_id exact, tf_norm_max is an upper bound
    pos = 0
    for blk in blocks:
        seg = slice(pos, pos + blk.n)
        assert blk.max_doc_id == int(doc_ids[seg][-1])
        tfn = tfs[seg] / (tfs[seg] + 1.2 * (1 - 0.75 + 0.75 * dls[seg] / 50.0))
        assert blk.tf_norm_max >= tfn.max() - 1e-15
        pos += blk.n
    assert pos == len(doc_ids)


def test_empty():
    assert codec.encode_varints(np.empty(0, dtype=np.uint64)) == b""
    assert len(codec.decode_varints(b"", 0)) == 0
    assert codec.encode_blocks(
        np.empty(0), np.empty(0), np.empty(0), block_size=128, k1=1.2, b=0.75, avgdl=10
    ) == []
    d, t, L = codec.decode_blocks([])
    assert len(d) == 0 and len(t) == 0 and len(L) == 0


def test_big_doc_ids():
    # 10^12-turn design scale: doc_ids near 2^40+ must round-trip
    doc_ids = np.asarray([10**12, 10**12 + 1, 10**12 + 10**9], dtype=np.int64)
    tfs = np.asarray([1, 2, 3], dtype=np.int64)
    dls = np.asarray([10, 20, 30], dtype=np.int64)
    blocks = codec.encode_blocks(doc_ids, tfs, dls, block_size=2, k1=1.2, b=0.75, avgdl=20.0)
    d, t, L = codec.decode_blocks(blocks)
    assert np.array_equal(d, doc_ids)
