"""A4–A9, A12 — posting emission, salted shuffle build, block compression,
segment write, per-partition metrics.

BASELINE.json:6 mandates: "per-turn posting emission", "a shuffle-partitioned
posting-list build with salted repartitioning for hot terms", "delta+varint
block compression of sorted docID postings persisted as ... segments",
"explicit skew diagnostics and per-partition build metrics".

Dataflow (SURVEY.md §3.1):

    docs(doc_id, text)
      → mapInArrow term_freq_arrow           [Arrow batch, no per-row Python,
        no pandas construction — RecordBatches in and out]
      → (term, salt, doc_id, tf, dl)         salt: hot terms get doc_id-range
                                             buckets so sub-postings are
                                             disjoint + ordered (A7)
      → filter pmod(hash(term,salt),P) ∈ pending   [resume pruning, A11]
      → repartition(P, term, salt) → sortWithinPartitions(term, salt)
        [packed rows: one per (term,salt,batch) — doc_id order is restored
        inside the encode task with a near-linear merge]
      → mapInPandas: stream runs, encode blocks (codec, A8), task writes its
        own parquet segment + manifest marker atomically  [per-partition
        lineage: a killed job leaves completed partitions durable]

The task-side write is the lineage mechanism: shuffle partition id is the
deterministic function pmod(murmur3(term,salt), P), so a resumed build prunes
already-completed partitions *before* the exchange with a cheap filter and
reproduces the identical partition assignment.

Hot-term salting: salt = floor(doc_id * S_t / N) with S_t = ceil(df_t /
hot_df_threshold) — contiguous doc_id ranges, so the final posting list for a
term is the concatenation of its salt rows in salt order (no k-way merge
needed), and per-task group state is bounded by ~hot_df_threshold postings
(SURVEY.md §7.4-2).
"""

from __future__ import annotations

import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from localsearchengine_spark.config import BuildConfig
from localsearchengine_spark.operators import codec
from localsearchengine_spark.utils import atomic_write_json

# One emitted row per (term, salt) PER ARROW BATCH, with the batch's
# postings packed into array columns — the map-side combine that keeps the
# build's one big shuffle at ~vocab×batches rows instead of one row per
# posting (30×+ fewer rows, no per-posting UnsafeRow overhead, and the JVM
# sort runs on the packed rows).  Postings are re-sorted by doc_id inside
# the encode task, so the final blocks are bit-identical to a per-posting
# shuffle regardless of batch boundaries or parallelism.
EMIT_SCHEMA = (
    "term string, salt int, doc_ids array<long>, tfs array<long>, dls array<long>"
)
EMIT_SCHEMA_POS = EMIT_SCHEMA + ", pos array<long>"
# salts are capped at 4096 buckets (stats_hot_scan), so this packs a
# (term_code, salt) pair into one sortable int64 group key
_SALT_CAP = 4096

def postings_arrow_schema():
    import pyarrow as pa

    block = pa.struct(
        [
            pa.field("n", pa.int32()),
            pa.field("max_doc_id", pa.int64()),
            pa.field("tf_norm_max", pa.float64()),
            pa.field("max_tf", pa.int64()),
            pa.field("min_dl", pa.int64()),
            pa.field("doc_bytes", pa.binary()),
            pa.field("tf_bytes", pa.binary()),
            pa.field("dl_bytes", pa.binary()),
            pa.field("pos_bytes", pa.binary()),
        ]
    )
    return pa.schema(
        [
            pa.field("term", pa.string()),
            pa.field("salt", pa.int32()),
            pa.field("df", pa.int64()),
            pa.field("cf", pa.int64()),
            pa.field("max_tf_norm", pa.float64()),
            pa.field("n_blocks", pa.int64()),
            pa.field("pid", pa.int32()),
            pa.field("blocks", pa.list_(block)),
        ]
    )


# empty string can never be a real term (token_pattern requires ≥1 char),
# so it is a safe in-band carrier for the per-batch corpus-stats partials.
_STATS_SENTINEL = ""


def stats_hot_scan(docs: DataFrame, conf: BuildConfig) -> tuple[int, int, dict[str, int]]:
    """A5 + A7 pass 1 + A12, fused: ONE tokenize pass over the corpus.

    Each Arrow batch emits partial aggregates — ``(term, df_part)`` for the
    batch's distinct (doc, term) pairs plus one sentinel row carrying the
    batch's ``(n_docs, n_tokens)`` — so the shuffle moves per-batch vocab
    rows, not exploded postings, and a single small hash-aggregate action
    yields exact corpus stats AND the exact hot-term document frequencies.

    → (n_docs, total_tokens, {hot_term: n_salt_buckets})
    """
    cfg = conf.bm25

    def partials(it):
        import pyarrow as pa

        from localsearchengine_spark.functions.analyze import term_freq_arrow

        for batch in it:
            if batch.num_rows == 0:
                continue
            res = term_freq_arrow(batch.column(0), cfg)
            if res is None:
                # token-less batch still counts toward N
                terms, dfp = pa.array([], type=pa.string()), np.empty(0, np.int64)
                n_tok = 0
            else:
                # per-batch df per unique term in one bincount over codes
                dfp_all = np.bincount(res["codes"], minlength=len(res["uniq"]))
                nz = np.flatnonzero(dfp_all)
                terms = pa.array(res["uniq"][nz], type=pa.string())
                dfp = dfp_all[nz].astype(np.int64)
                n_tok = int(res["tf"].sum())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.concat_arrays([terms, pa.array([_STATS_SENTINEL], type=pa.string())]),
                    pa.array(np.concatenate((dfp, [0])), type=pa.int64()),
                    pa.array(
                        np.concatenate((np.zeros(len(dfp), np.int64), [batch.num_rows]))
                    ),
                    pa.array(np.concatenate((np.zeros(len(dfp), np.int64), [n_tok]))),
                ],
                ["term", "df_part", "n_docs", "n_tokens"],
            )

    emitted = docs.select("text").mapInArrow(
        partials, schema="term string, df_part long, n_docs long, n_tokens long"
    )
    rows = (
        emitted.groupBy("term")
        .agg(
            F.sum("df_part").alias("df"),
            F.sum("n_docs").alias("nd"),
            F.sum("n_tokens").alias("tk"),
        )
        .filter(
            (F.col("term") == _STATS_SENTINEL) | (F.col("df") > conf.hot_df_threshold)
        )
        .collect()
    )
    n_docs, total_tokens, hot = 0, 0, {}
    for r in rows:
        if r["term"] == _STATS_SENTINEL:
            n_docs, total_tokens = int(r["nd"]), int(r["tk"])
        else:
            s_t = int(np.ceil(r["df"] / conf.hot_df_threshold))
            # num_salts caps the per-term fan-out (bounds shuffle group
            # count; a capped bucket may then exceed hot_df_threshold).
            # _SALT_CAP is a hard ceiling: the emit stage packs (term,
            # salt) into code*_SALT_CAP+salt, so a salt ≥ _SALT_CAP would
            # alias a different term's group
            cap = min(conf.num_salts, _SALT_CAP) if conf.num_salts > 0 else _SALT_CAP
            hot[r["term"]] = int(min(s_t, cap))
    return n_docs, total_tokens, hot


def emit_postings(
    docs: DataFrame,
    conf: BuildConfig,
    hot_salts: dict[str, int],
    n_total: int,
    doc_id_base: int = 0,
) -> DataFrame:
    """A4 — fused tokenize + per-turn tf emission (one Arrow pass, no
    (doc,term) shuffle: tf is computed within the row's own batch)."""
    cfg = conf.bm25
    sc = docs.sparkSession.sparkContext
    hot_bc = sc.broadcast(hot_salts)
    n_total = int(n_total)
    base = int(doc_id_base)

    with_pos = bool(conf.store_positions)

    def emit(it):
        import pyarrow as pa

        from localsearchengine_spark.functions.analyze import term_freq_arrow

        hot = hot_bc.value
        for batch in it:
            if batch.num_rows == 0:
                continue
            res = term_freq_arrow(
                batch.column(batch.schema.get_field_index("text")),
                cfg,
                with_positions=with_pos,
            )
            if res is None:
                continue
            all_ids = batch.column(
                batch.schema.get_field_index("doc_id")
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            doc_ids = all_ids[res["row"]]
            n = len(doc_ids)
            codes = res["codes"]
            salts = np.zeros(n, dtype=np.int64)
            if hot:
                # hot lookup once per UNIQUE term, then a fancy-index —
                # not a Python call per posting row
                s_uniq = np.fromiter(
                    (hot.get(t, 0) for t in res["uniq"]),
                    dtype=np.int64,
                    count=len(res["uniq"]),
                )
                s_t = s_uniq[codes]
                m = s_t > 1
                if m.any():
                    salts[m] = (doc_ids[m] - base) * s_t[m] // n_total
                if salts.max(initial=0) >= _SALT_CAP:
                    raise ValueError(
                        f"salt bucket ≥ {_SALT_CAP} would alias another "
                        "term's group key (stats_hot_scan must clamp)"
                    )
            # pack the batch per (term, salt): one output row per group,
            # postings sorted by doc_id inside each group
            key = codes * _SALT_CAP + salts
            order = np.lexsort((doc_ids, key))
            ks = key[order]
            first = np.empty(n, dtype=bool)
            first[0] = True
            np.not_equal(ks[1:], ks[:-1], out=first[1:])
            gstarts = np.flatnonzero(first)
            goff = np.append(gstarts, n).astype(np.int32)
            gcodes = (ks[gstarts] // _SALT_CAP).astype(np.int64)
            gsalts = (ks[gstarts] % _SALT_CAP).astype(np.int32)
            dict_arr = pa.array(res["uniq"], type=pa.string())
            tf_ord = res["tf"][order]
            arrays = [
                dict_arr.take(pa.array(gcodes)),
                pa.array(gsalts, type=pa.int32()),
                pa.ListArray.from_arrays(
                    pa.array(goff), pa.array(doc_ids[order], type=pa.int64())
                ),
                pa.ListArray.from_arrays(
                    pa.array(goff), pa.array(tf_ord, type=pa.int64())
                ),
                pa.ListArray.from_arrays(
                    pa.array(goff), pa.array(res["dl"][order], type=pa.int64())
                ),
            ]
            names = ["term", "salt", "doc_ids", "tfs", "dls"]
            if with_pos:
                from localsearchengine_spark.operators.merge import reorder_positions

                flat = reorder_positions(
                    res["pos_flat"], res["pos_off"][:-1].astype(np.int64),
                    res["tf"], order,
                )
                pos_cum = np.concatenate(([0], np.cumsum(tf_ord)))
                arrays.append(
                    pa.ListArray.from_arrays(
                        pa.array(pos_cum[goff].astype(np.int32)),
                        pa.array(flat, type=pa.int64()),
                    )
                )
                names.append("pos")
            yield pa.RecordBatch.from_arrays(arrays, names)

    return docs.select("doc_id", "text").mapInArrow(
        emit, schema=EMIT_SCHEMA_POS if with_pos else EMIT_SCHEMA
    )


def build_posting_partitions(
    emitted: DataFrame,
    *,
    conf: BuildConfig,
    avgdl: float,
    num_partitions: int,
    postings_dir: str,
    manifest_dir: str,
    build_id: str,
    pending: list[int] | None = None,
) -> list[dict]:
    """A6+A8+A9+A12 — the shuffle-partitioned build.  Returns the manifest
    rows of the partitions processed in this job (tasks also persist them)."""
    P = num_partitions
    cfg = conf.bm25
    block_size = conf.block_size
    df = emitted
    if pending is not None:
        if not pending:
            return []
        df = df.filter(
            F.pmod(F.hash(F.col("term"), F.col("salt")), F.lit(P)).isin(
                [int(p) for p in pending]
            )
        )
    df = (
        df.repartition(P, "term", "salt")
        .sortWithinPartitions("term", "salt")
        .withColumn("pid", F.spark_partition_id())
    )

    k1, b = cfg.k1, cfg.b

    def build(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa
        import pyarrow.parquet as pq

        t0 = time.time()
        schema = postings_arrow_schema()
        pid = None
        writer = None
        tmp_path = None
        rows_buf: list[dict] = []
        n_postings = 0
        n_rows = 0
        top: list[tuple[int, str]] = []
        cur_key: tuple[str, int] | None = None
        cur_docs: list[np.ndarray] = []
        cur_tfs: list[np.ndarray] = []
        cur_dls: list[np.ndarray] = []
        cur_pos: list[np.ndarray] = []

        def flush_rows(force: bool = False):
            nonlocal rows_buf, writer
            if writer is None or (not rows_buf) or (len(rows_buf) < 512 and not force):
                return
            writer.write_table(pa.Table.from_pylist(rows_buf, schema=schema))
            rows_buf = []

        def end_run():
            nonlocal cur_key, cur_docs, cur_tfs, cur_dls, cur_pos, n_rows, top
            if cur_key is None:
                return
            d = np.concatenate(cur_docs)
            t = np.concatenate(cur_tfs)
            L = np.concatenate(cur_dls)
            # packed chunks arrive in arbitrary batch order — re-sort the
            # group's postings by doc_id (each chunk is already sorted, so
            # mergesort is near-linear); final blocks are bit-identical to
            # a per-posting shuffle regardless of batching or parallelism
            order = np.argsort(d, kind="mergesort")
            pos = None
            if cur_pos:
                flat = np.concatenate(cur_pos)
                starts = np.cumsum(t) - t
                from localsearchengine_spark.operators.merge import reorder_positions

                pos = reorder_positions(flat, starts, t, order)
            d, t, L = d[order], t[order], L[order]
            if len(d) > 1 and (np.diff(d) <= 0).any():
                raise ValueError(
                    f"duplicate doc_id in posting group {cur_key!r}"
                )
            blocks = codec.encode_blocks(
                d, t, L, block_size=block_size, k1=k1, b=b, avgdl=avgdl,
                positions=pos,
            )
            rows_buf.append(
                {
                    "term": cur_key[0],
                    "salt": int(cur_key[1]),
                    "df": int(len(d)),
                    "cf": int(t.sum()),
                    "max_tf_norm": float(max(blk.tf_norm_max for blk in blocks)),
                    "n_blocks": len(blocks),
                    "pid": pid,
                    "blocks": [blk._asdict() for blk in blocks],
                }
            )
            n_rows += 1
            top.append((len(d), cur_key[0]))
            if len(top) > 64:
                top.sort(reverse=True)
                del top[8:]
            cur_key, cur_docs, cur_tfs, cur_dls, cur_pos = None, [], [], [], []
            flush_rows()

        for pdf in it:
            if pdf.empty:
                continue
            if pid is None:
                pid = int(pdf["pid"].iloc[0])
                os.makedirs(postings_dir, exist_ok=True)
                tmp_path = os.path.join(
                    postings_dir, f".part-{pid:05d}.parquet.tmp-{os.getpid()}"
                )
                writer = pq.ParquetWriter(tmp_path, schema)
            terms = pdf["term"].to_numpy()
            salts = pdf["salt"].to_numpy()
            docs_col = pdf["doc_ids"].to_numpy()
            tfs_col = pdf["tfs"].to_numpy()
            dls_col = pdf["dls"].to_numpy()
            pos_col = pdf["pos"].to_numpy() if "pos" in pdf.columns else None
            for i in range(len(pdf)):
                key = (terms[i], int(salts[i]))
                if cur_key is not None and key != cur_key:
                    end_run()
                if cur_key is None:
                    cur_key = key
                chunk = np.asarray(docs_col[i], dtype=np.int64)
                n_postings += len(chunk)
                cur_docs.append(chunk)
                cur_tfs.append(np.asarray(tfs_col[i], dtype=np.int64))
                cur_dls.append(np.asarray(dls_col[i], dtype=np.int64))
                if pos_col is not None:
                    cur_pos.append(np.asarray(pos_col[i], dtype=np.int64))
        end_run()
        if writer is not None:
            flush_rows(force=True)
            writer.close()
            final = os.path.join(postings_dir, f"part-{pid:05d}.parquet")
            os.replace(tmp_path, final)
            nbytes = os.path.getsize(final)
            top.sort(reverse=True)
            manifest = {
                "build_id": build_id,
                "stage": "postings",
                "pid": pid,
                "postings": int(n_postings),
                "terms": int(n_rows),
                "bytes": int(nbytes),
                "elapsed_s": round(time.time() - t0, 3),
                "top_terms": [[t, int(n)] for n, t in top[:5]],
            }
            atomic_write_json(
                os.path.join(manifest_dir, f"postings-{pid:05d}.json"), manifest
            )
            yield pd.DataFrame([{k: str(v) for k, v in manifest.items()}])

    out = df.mapInPandas(
        build,
        schema="build_id string, stage string, pid string, postings string, "
        "terms string, bytes string, elapsed_s string, top_terms string",
    )
    return [r.asDict() for r in out.collect()]


def skew_report(manifest_rows: list[dict]) -> dict:
    """A12 — skew diagnostics: max/median partition load from the manifest."""
    if not manifest_rows:
        return {"partitions": 0}
    loads = sorted(int(r["postings"]) for r in manifest_rows)
    med = loads[len(loads) // 2] or 1
    return {
        "partitions": len(loads),
        "postings_total": int(sum(loads)),
        "postings_max": int(loads[-1]),
        "postings_median": int(med),
        "skew_ratio_max_over_median": round(loads[-1] / med, 3),
    }


_DICT_DRIVER_MAX_ROWS = 5_000_000


def write_dictionary(spark, postings_dir: str, dict_dir: str) -> None:
    """A14 support — dictionary = per-term (df, cf, max_tf_norm, n_rows,
    n_blocks) over the postings metadata columns (the heavy ``blocks``
    column is never read: per-row block counts are persisted at build).

    Adaptive execution: a small vocabulary aggregates driver-side in one
    pyarrow scan (no Spark job — the common case at bench scale and for
    per-segment dictionaries); a large vocabulary (10^12-turn corpora have
    vocabularies far beyond driver memory) falls back to a distributed
    column-pruned groupBy."""
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq

    data = ds.dataset(postings_dir, format="parquet")
    if data.count_rows() <= _DICT_DRIVER_MAX_ROWS:
        tbl = data.to_table(
            columns=["term", "df", "cf", "max_tf_norm", "n_blocks", "pid"]
        )
        agg = (
            tbl.to_pandas()
            .groupby("term", sort=False)
            .agg(
                df=("df", "sum"),
                cf=("cf", "sum"),
                max_tf_norm=("max_tf_norm", "max"),
                n_rows=("term", "size"),
                n_blocks=("n_blocks", "sum"),
                pids=("pid", lambda x: sorted(set(int(v) for v in x))),
            )
            .reset_index()
        )
        os.makedirs(dict_dir, exist_ok=True)
        import pyarrow as pa

        tmp = os.path.join(dict_dir, f".dict.parquet.tmp-{os.getpid()}")
        pq.write_table(pa.Table.from_pandas(agg, preserve_index=False), tmp)
        os.replace(tmp, os.path.join(dict_dir, "part-00000.parquet"))
        for f in os.listdir(dict_dir):
            if f.startswith("part-") and f != "part-00000.parquet":
                os.remove(os.path.join(dict_dir, f))
        return
    (
        spark.read.parquet(postings_dir)
        .groupBy("term")
        .agg(
            F.sum("df").alias("df"),
            F.sum("cf").alias("cf"),
            F.max("max_tf_norm").alias("max_tf_norm"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_blocks").alias("n_blocks"),
            F.sort_array(F.collect_set("pid")).alias("pids"),
        )
        .write.mode("overwrite")
        .parquet(dict_dir)
    )
