"""Local replica of the driver's DuckDB-oracle harness (__spark_entry__.py):
for every queries() entry with an oracle_sql(), run both at SF_DIR and
compare row count + column names + order-insensitive values exactly.

Stricter than a hash: mismatching cells are printed, which is how new Part-B
queries get debugged before the driver sees them.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def _query_names():
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    return sorted(qs), qs, oracles


NAMES, _QS, _ORACLES = _query_names()


@pytest.mark.parametrize("name", NAMES)
def test_query_vs_oracle(spark, name):
    fn = _QS[name]
    got = fn(spark, SF_DIR).toPandas()
    sql = _ORACLES.get(name)
    if sql is None:
        assert got is not None  # rows-only check, like the driver's
        return
    con = _duck(SF_DIR)
    exp = con.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    g, e = _normalize(got), _normalize(exp)
    for c in g.columns:
        gv, ev = g[c], e[c]
        if gv.dtype.kind == "f" or ev.dtype.kind == "f":
            pd.testing.assert_series_equal(
                gv.astype(float), ev.astype(float), check_names=False,
                rtol=0, atol=0, obj=f"{name}.{c}",
            )
        else:
            assert gv.astype(str).tolist() == ev.astype(str).tolist(), (
                f"{name}.{c}: first diffs "
                f"{[(a, b) for a, b in zip(gv.tolist(), ev.tolist()) if str(a) != str(b)][:5]}"
            )
