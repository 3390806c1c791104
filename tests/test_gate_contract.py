"""Gate contract: every catalog query's final projection must be scalar and
canonicalizer-safe. The driver's correctness gate hashes results through a
pandas canonicalizer that (a) crashes on array/map/struct cells (unhashable
list) and (b) disagrees with itself on Decimal-vs-float repr even when the
values are equal. So: no ArrayType/MapType/StructType/DecimalType in any
``queries()`` output schema — serialize arrays to strings, emit money as
ROUND(double, n)."""

import pytest
from pyspark.sql import types as T

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
BANNED = (T.ArrayType, T.MapType, T.StructType, T.DecimalType)


@pytest.fixture(scope="module")
def catalog_schemas(spark):
    out = {}
    for name, fn in sorted(entrymod.queries().items()):
        out[name] = fn(spark, SF).schema
    return out


def test_no_gate_unsafe_output_types(catalog_schemas):
    offenders = {
        name: [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in schema.fields
            if isinstance(f.dataType, BANNED)
        ]
        for name, schema in catalog_schemas.items()
    }
    offenders = {k: v for k, v in offenders.items() if v}
    assert offenders == {}, f"gate-unsafe output columns: {offenders}"


def test_every_query_names_match_oracle(catalog_schemas):
    # driver compares columns sorted by name; a query/oracle naming drift
    # fails the gate even with identical values, so pin the name sets here
    import duckdb

    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    mismatches = {}
    for name, sql in sorted(oracles.items()):
        cur = con.execute(f"SELECT * FROM ({sql}) LIMIT 0")
        dcols = sorted(d[0] for d in cur.description)
        scols = sorted(catalog_schemas[name].fieldNames())
        if dcols != scols:
            mismatches[name] = (scols, dcols)
    assert mismatches == {}, f"column-name drift vs oracle: {mismatches}"
