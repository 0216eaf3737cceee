"""Every oracle_sql() statement must parse AND bind in DuckDB against
the real testdata schemas — a cheap guard for the generated chained-CTE
oracles (louvain/leiden/yens/... are machine-generated; a bad splice
would otherwise only surface in the driver's correctness run).

EXPLAIN plans the query (parser + binder + optimizer) without executing
it, so even the 300 KB multi-level oracles bind in seconds.
"""

import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return c


def test_every_oracle_binds(con):
    import __ray_entry__ as harness

    oracles = harness.oracle_sql()
    queries = harness.queries()
    # contract: every oracle key has a matching query
    assert set(oracles) <= set(queries)
    failed = {}
    for name, sql in oracles.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001 — collect all failures
            failed[name] = str(e).splitlines()[0][:160]
    assert not failed, f"oracles failed to bind: {failed}"
