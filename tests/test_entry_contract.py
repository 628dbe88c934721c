"""Driver-contract sanity: registry shape + oracle SQL parses in DuckDB."""

import duckdb
import pytest

import __spark_entry__ as entry_mod


def test_registry_shapes():
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert len(qs) >= 25
    # every oracle key has a query
    assert set(osql) <= set(qs)
    # EVERY query has an oracle (round 3: the spectral rows assert their
    # SQL-checkable contracts — no rows-only entries remain)
    assert set(qs) == set(osql)
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in osql.items():
        assert isinstance(sql, str) and sql.strip().upper().startswith(("SELECT", "WITH")), name


def test_oracle_sql_parses_in_duckdb():
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'")
    for name, sql in entry_mod.oracle_sql().items():
        try:
            con.sql("EXPLAIN " + sql)
        except Exception as e:
            pytest.fail(f"oracle {name} does not parse: {e}")
