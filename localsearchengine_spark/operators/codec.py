"""A8 — delta+varint block compression of sorted docID postings.

BASELINE.json:6 mandates "delta+varint block compression of sorted docID
postings".  This module is pure NumPy (vectorized LEB128) so it runs inside
the Arrow-batched ``applyInPandas``/``mapInPandas`` build stage (SURVEY.md
§3.1 step 7) with no per-row Python.

Block layout (per posting-list block of up to ``block_size`` postings):
  n            int32   postings in this block
  max_doc_id   int64   last (max) doc_id — enables whole-block skipping (A16/A17)
  tf_norm_max  float64 max over docs of tf/(tf + k1*(1-b+b*dl/avgdl)) —
                       block-max score bound = idf * (k1+1) * tf_norm_max
                       (Ding & Suel, SIGIR 2011)
  doc_bytes    binary  LEB128 varints of doc_id deltas (first = absolute)
  tf_bytes     binary  LEB128 varints of term frequencies
  dl_bytes     binary  LEB128 varints of document lengths (stored per posting
                       so query-time scoring needs no doc-table join — an
                       impact-style space/shuffle tradeoff, SURVEY.md §7.4)

Blocks are self-contained (the first doc_id of each block is stored absolute,
not as a delta from the previous block) so salted sub-postings and segments
can be concatenated in doc_id-range order without re-encoding (A7/A10).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

_MASK7 = np.uint64(0x7F)
_SHIFT7 = np.uint64(7)


def encode_varints_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Vectorized LEB128 encode of a uint64 array → (stream, per-value byte
    lengths).  The lengths let callers slice the concatenated stream at any
    value boundary (e.g. per block) without re-encoding."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b"", np.empty(0, dtype=np.int64)
    out = np.zeros((n, 10), dtype=np.uint8)
    lengths = np.zeros(n, dtype=np.int64)
    cur = v.copy()
    for i in range(10):
        byte = (cur & _MASK7).astype(np.uint8)
        cur >>= _SHIFT7
        more = cur > 0
        out[:, i] = byte | (more.astype(np.uint8) << 7)
        lengths = np.where((lengths == 0) & ~more, i + 1, lengths)
        if not more.any():
            break
    mask = np.arange(10) < lengths[:, None]
    return out[mask].tobytes(), lengths


def encode_varints(values: np.ndarray) -> bytes:
    """Vectorized LEB128 encode of a uint64 array."""
    return encode_varints_with_lengths(values)[0]


def decode_varints(buf: bytes, count: int) -> np.ndarray:
    """Vectorized LEB128 decode → uint64 array of ``count`` values."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    if len(ends) != count:
        raise ValueError(f"varint stream has {len(ends)} values, expected {count}")
    starts = np.empty(count, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    group = np.repeat(np.arange(count), np.diff(np.concatenate(([-1], ends))))
    pos = np.arange(len(b)) - starts[group]
    vals7 = (b & np.uint8(0x7F)).astype(np.uint64) << (pos.astype(np.uint64) * _SHIFT7)
    values = np.zeros(count, dtype=np.uint64)
    np.add.at(values, group, vals7)
    return values


class Block(NamedTuple):
    n: int
    max_doc_id: int
    tf_norm_max: float
    # max_tf/min_dl make a valid (looser) score bound recomputable under a
    # *changed* avgdl without decoding — tf_norm is monotone ↑ in tf and
    # ↓ in dl, so bound(max_tf, min_dl, avgdl') ≥ every doc's tf_norm.
    # Segment merge (A10) uses this to stay declarative (no re-encode).
    max_tf: int
    min_dl: int
    doc_bytes: bytes
    tf_bytes: bytes
    dl_bytes: bytes
    # varints of within-document token positions, ascending, concatenated
    # per posting (tf positions each); b"" when the index stores none
    pos_bytes: bytes = b""


def encode_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    *,
    block_size: int,
    k1: float,
    b: float,
    avgdl: float,
    positions: np.ndarray | None = None,
) -> list[Block]:
    """Sorted (strictly increasing) doc_ids + parallel tf/dl → blocks.

    ``positions`` (optional): flat ascending within-doc token positions,
    concatenated per posting — posting i owns positions[Σtf[:i] : Σtf[:i+1]].
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    dls = np.ascontiguousarray(dls, dtype=np.int64)
    n = len(doc_ids)
    if n == 0:
        return []
    # ONE varint pass per stream for the whole list (not per 128-entry
    # block): per-value byte lengths give the block boundaries inside each
    # concatenated stream, so blocking is pure slicing.  Hot posting lists
    # previously paid ~3 small-array NumPy calls per block — the dominant
    # per-call overhead of the encode stage at millions of blocks.
    starts = np.arange(0, n, block_size)
    ends = np.append(starts[1:], n)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = doc_ids[0]
    deltas[1:] = np.diff(doc_ids).astype(np.uint64)
    deltas[starts] = doc_ids[starts].astype(np.uint64)  # block-local absolutes
    tf_f = tfs.astype(np.float64)
    tf_norm = tf_f / (tf_f + k1 * (1.0 - b + b * dls.astype(np.float64) / avgdl))

    def stream_cuts(values: np.ndarray, cut_idx: np.ndarray):
        buf, lens = encode_varints_with_lengths(values)
        byte_off = np.concatenate(([0], np.cumsum(lens)))
        return buf, byte_off[cut_idx]

    doc_buf, doc_cut = stream_cuts(deltas, np.append(starts, n))
    tf_buf, tf_cut = stream_cuts(tfs.astype(np.uint64), np.append(starts, n))
    dl_buf, dl_cut = stream_cuts(dls.astype(np.uint64), np.append(starts, n))
    pos_buf, pos_cut = b"", None
    if positions is not None:
        tf_cum = np.concatenate(([0], np.cumsum(tfs)))
        pos_buf, pos_cut = stream_cuts(
            np.ascontiguousarray(positions, dtype=np.uint64),
            tf_cum[np.append(starts, n)],
        )
    max_doc = doc_ids[ends - 1]
    tfn_max = np.maximum.reduceat(tf_norm, starts)
    tf_max = np.maximum.reduceat(tfs, starts)
    dl_min = np.minimum.reduceat(dls, starts)
    blocks: list[Block] = []
    for i in range(len(starts)):
        blocks.append(
            Block(
                n=int(ends[i] - starts[i]),
                max_doc_id=int(max_doc[i]),
                tf_norm_max=float(tfn_max[i]),
                max_tf=int(tf_max[i]),
                min_dl=int(dl_min[i]),
                doc_bytes=doc_buf[doc_cut[i]:doc_cut[i + 1]],
                tf_bytes=tf_buf[tf_cut[i]:tf_cut[i + 1]],
                dl_bytes=dl_buf[dl_cut[i]:dl_cut[i + 1]],
                pos_bytes=(
                    pos_buf[pos_cut[i]:pos_cut[i + 1]] if pos_cut is not None else b""
                ),
            )
        )
    return blocks


def decode_blocks(blocks: list) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_blocks` → (doc_ids, tfs, dls) int64 arrays.

    Accepts :class:`Block` tuples or any objects/dicts with the same fields
    (e.g. Spark Row structs).
    """
    doc_parts: list[np.ndarray] = []
    tf_parts: list[np.ndarray] = []
    dl_parts: list[np.ndarray] = []
    for blk in blocks:
        if isinstance(blk, dict):
            n, dob, tfb, dlb = blk["n"], blk["doc_bytes"], blk["tf_bytes"], blk["dl_bytes"]
        else:
            n, dob, tfb, dlb = blk.n, blk.doc_bytes, blk.tf_bytes, blk.dl_bytes
        deltas = decode_varints(bytes(dob), n)
        doc_parts.append(np.cumsum(deltas.astype(np.int64)))
        tf_parts.append(decode_varints(bytes(tfb), n).astype(np.int64))
        dl_parts.append(decode_varints(bytes(dlb), n).astype(np.int64))
    if not doc_parts:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    return (
        np.concatenate(doc_parts),
        np.concatenate(tf_parts),
        np.concatenate(dl_parts),
    )


def docids_from_deltas(vals: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenated per-block delta streams → absolute doc_ids in one pass.

    Each block's first value is stored absolute (blocks are self-contained),
    so a global cumsum needs only the previous block's running total
    subtracted back out — a segmented cumsum with no Python per block.

    The running total grows as n_blocks × avg_doc_id: at the 10^12-turn
    design scale a long posting list with large doc_ids (e.g. a salted
    stopword concatenated at fetch) can push it past 2^63, where np.cumsum
    wraps silently.  A cheap float64 bound detects that case and falls back
    to per-block cumsums (each block's own sum is ≤ max doc_id < 2^63 by
    construction, so the fallback cannot overflow).
    """
    if float(vals.astype(np.float64).sum()) > float(2**62):
        out = np.empty(len(vals), dtype=np.int64)
        starts = np.cumsum(counts) - counts
        for s, n in zip(starts, counts):
            out[s : s + n] = np.cumsum(vals[s : s + n].astype(np.int64))
        return out
    c = np.cumsum(vals.astype(np.int64))
    starts = np.cumsum(counts) - counts
    prev = np.where(starts > 0, c[np.maximum(starts - 1, 0)], 0)
    return c - np.repeat(prev, counts)


class StreamBlocks:
    """Arrow-native posting-list storage: per stream, ONE contiguous byte
    buffer plus per-block offsets (straight from the parquet BinaryArray
    layout, one memcpy per salt row).  decode of the whole list is a single
    LEB128 pass per stream — concatenated varint streams are themselves a
    valid varint stream — instead of a NumPy call per 128-entry block.
    """

    __slots__ = ("counts", "bufs", "offs")

    def __init__(self, counts: np.ndarray, bufs: dict, offs: dict):
        self.counts = counts  # int64 per block
        self.bufs = bufs      # stream name -> bytes (concatenated blocks)
        self.offs = offs      # stream name -> int64 offsets (len blocks+1)

    def __len__(self) -> int:
        return len(self.counts)

    def decode_all(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        total = int(self.counts.sum())
        deltas = decode_varints(self.bufs["doc"], total)
        return (
            docids_from_deltas(deltas, self.counts),
            decode_varints(self.bufs["tf"], total).astype(np.int64),
            decode_varints(self.bufs["dl"], total).astype(np.int64),
        )

    def decode_block(self, i: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        n = int(self.counts[i])
        out = []
        for name in ("doc", "tf", "dl"):
            o = self.offs[name]
            out.append(decode_varints(self.bufs[name][o[i]:o[i + 1]], n))
        doc = np.cumsum(out[0].astype(np.int64))
        return doc, out[1].astype(np.int64), out[2].astype(np.int64)


def decode_block_positions(pos_bytes: bytes, tfs: np.ndarray) -> list[np.ndarray]:
    """pos_bytes of one block + its per-posting tf array → per-posting
    ascending position arrays."""
    total = int(tfs.sum())
    flat = decode_varints(bytes(pos_bytes), total).astype(np.int64)
    return np.split(flat, np.cumsum(tfs)[:-1])
