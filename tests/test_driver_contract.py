"""Driver-contract pre-flight: every queries() entry runs; every oracle_sql()
twin agrees (row count + column names + order-insensitive values) — the same
comparison the driver records in CORRECTNESS_r{N}.json, run at sf0.001 for
speed (the driver uses sf0.01; scripts/check_oracles.py covers that)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.6g}"
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns == [
        "cluster_id", "n_files", "n_repos", "rep_path"]


def test_every_query_has_callable_and_runs(spark):
    qs = entrymod.queries()
    assert len(qs) >= 10
    for name, fn in qs.items():
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_oracle_agreement(spark, oracle_con, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    cur = oracle_con.execute(entrymod.oracle_sql()[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row counts differ"
    assert _normalize(srows, scols) == _normalize(orows, ocols), (
        f"{name}: values differ"
    )


def test_oracle_keys_subset_of_queries():
    qs = set(entrymod.queries())
    assert set(entrymod.oracle_sql()) <= qs
