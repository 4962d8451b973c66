"""Driver-contract stability: entry() schema, queries()/oracle_sql()
key alignment, and SQL-dialect sanity of every oracle (parsed by DuckDB
without touching Spark)."""

import duckdb
import pytest

pyspark = pytest.importorskip("pyspark")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def test_oracle_keys_subset_of_queries():
    import __spark_entry__ as e
    qs, os_ = set(e.queries()), set(e.oracle_sql())
    assert os_ <= qs, f"orphan oracles: {os_ - qs}"
    # rows-only entries are deliberate and documented
    assert qs - os_ == set()  # every query is value-oracled


def test_oracles_are_valid_duckdb_sql():
    import __spark_entry__ as e
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'/root/testdata/sf0.001/{t}.parquet'")
    for name, sql in e.oracle_sql().items():
        try:
            con.execute(sql).fetchall()
        except Exception as ex:  # pragma: no cover
            pytest.fail(f"oracle {name} failed in DuckDB: {ex}")


def test_entry_schema_is_stable():
    """The driver smoke-checks entry() for ≥0 rows and a stable schema;
    pin the column names so refactors can't silently change them."""
    from html_parser_spark.plans.pipeline import configure
    import __spark_entry__ as e
    spark = configure(cpus=2)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        df = e.entry(spark)
        assert [f.name for f in df.schema.fields] == [
            "url", "text", "encoding", "quirks_mode", "n_errors",
            "html_bytes", "n_spans"]
        assert df.limit(3).count() > 0
    finally:
        spark.stop()
