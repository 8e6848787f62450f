"""Driver-contract shape checks + fast oracle parity at sf0.001.

The full sf0.01 gate is tools/verify_local.py (and the driver itself);
this keeps a fast representative subset inside pytest so regressions in
either the Spark plans or the oracle SQL fail the suite.
"""

import hashlib

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"

PARITY_KEYS = [
    "q_scan_project",
    "q_term_tf",
    "q_adjacency_list",
    "q_pagerank_contribs",
    "q_window_rank",
    "q_exact_dedup_prefix",
    "q_knn_cosine",
    "q_pricing_summary",
    "q_grouping_sets",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    tables = "region nation customer supplier part orders lineitem events documents embeddings"
    for t in tables.split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _norm(v):
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        return repr(round(float(v), 9))
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def _hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode() + b"\n")
    return h.hexdigest()


# queries deliberately shipped without an oracle — every other declared
# query MUST have one (this list is the gate's weaker-check budget; any
# unintended addition fails the suite)
ROWS_ONLY = {
    # q_pagerank_converged graduated in round 5: its oracle unrolls the
    # capped chain and evaluates the min-10/<=0.2/cap-50 stop rule in SQL
    "q_approx_distinct",     # HLL, approximate by construction
    "q_approx_quantiles",    # sketch, approximate by construction
}


def test_contract_shape():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    # every key is a callable
    assert all(callable(f) for f in qs.values())
    # the no-oracle set is exactly the declared rows-only allowlist
    assert set(qs) - set(oracles) == ROWS_ONLY
    # no orphaned oracles, no empty SQL
    assert all(isinstance(sql, str) and sql.strip() for sql in oracles.values())


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["term", "doc_id", "score"]


@pytest.mark.parametrize("key", PARITY_KEYS)
def test_oracle_parity(spark, duck, key):
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    sdf = qs[key](spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(oracles[key])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows)
    assert _hash(sdf.columns, srows) == _hash(dcols, drows)
