"""JDBC helper unit tests: pin the pushed-down SQL strings and reader
configuration (the part of S1/S2/S3/S6 that is this repo's logic rather
than Spark's). The live round-trip against embedded Derby is
tests/test_jdbc_roundtrip.py."""

from datetime import datetime

from pw_etl_scrumptious_squad_spark.sources import jdbc


def test_cdc_subquery_matches_reference_predicate():
    q = jdbc.cdc_subquery(
        "sales_order",
        datetime(2023, 1, 1, 10, 0, 0),
        datetime(2023, 2, 2, 11, 30, 0),
    )
    assert q == (
        '(SELECT * FROM "sales_order" '
        'WHERE "created_at" > {ts \'2023-01-01 10:00:00\'} '
        'OR "last_updated" > {ts \'2023-02-02 11:30:00\'}) AS cdc_src'
    )


def test_cdc_subquery_accepts_preformatted_strings():
    q = jdbc.cdc_subquery("t", "2024-05-05 00:00:00", "2024-05-06 00:00:00")
    assert "\"created_at\" > {ts '2024-05-05 00:00:00'}" in q
    assert "\"last_updated\" > {ts '2024-05-06 00:00:00'}" in q


def test_discover_tables_subquery_scopes_schema_and_base_tables():
    q = jdbc.discover_tables_subquery("warehouse")
    assert "table_schema = 'warehouse'" in q
    assert "table_type = 'BASE TABLE'" in q
    assert q.startswith("(SELECT table_name FROM information_schema.tables")


def test_config_defaults():
    cfg = jdbc.JdbcConfig(url="jdbc:postgresql://h/db", user="u", password="p")
    assert cfg.driver == "org.postgresql.Driver"
    assert cfg.schema == "public"


def test_sql_builders_reject_injection_shapes():
    import pytest
    from datetime import datetime

    from pw_etl_scrumptious_squad_spark.sources import jdbc

    # identifiers: quotes, spaces, semicolons, parens all refused
    for bad in ["t; DROP TABLE x", "t'--", "t t", "t(", "schema'; --"]:
        with pytest.raises(ValueError):
            jdbc.cdc_subquery(bad, "2023-01-01", "2023-01-01")
        with pytest.raises(ValueError):
            jdbc.discover_tables_subquery(bad)
    # timestamps: only ISO shapes pass; quote-breaking strings refused
    with pytest.raises(ValueError):
        jdbc.cdc_subquery("t", "2023-01-01' OR '1'='1", "2023-01-01")
    ok = jdbc.cdc_subquery(
        "sales_order", datetime(2023, 1, 1, 10, 30), "2023-02-02 11:30:00"
    )
    assert "sales_order" in ok and "2023-01-01 10:30:00" in ok
    # schema-qualified tables still pass
    assert '"oltp"."sales_order"' in jdbc.cdc_subquery(
        "oltp.sales_order", "2023-01-01", "2023-01-01"
    )
