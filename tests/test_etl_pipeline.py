"""End-to-end batch ETL over a parquet OLTP snapshot (reference model:
test/test_end_to_end.py — full E->T->L, then a second incremental cycle)."""

from pw_etl_scrumptious_squad_spark.plans import etl
from pw_etl_scrumptious_squad_spark.schemas import STAR_COLUMNS
from pw_etl_scrumptious_squad_spark.sources import parquet as lake


def test_run_batch_etl(spark, totesys, tmp_path):
    source = str(tmp_path / "oltp")
    staging = str(tmp_path / "staging")
    warehouse = str(tmp_path / "warehouse")
    state = str(tmp_path / "state.parquet")
    for name, df in totesys.items():
        lake.write_table(df, source, name)

    star = etl.run_batch_etl(spark, source, staging, warehouse, state)
    assert sorted(star) == sorted(STAR_COLUMNS)

    # staged deltas exist for every seeded table (first cycle = full extract)
    assert lake.table_exists(staging, "sales_order")

    # warehouse round-trip preserves schema + rows; facts are partitioned by
    # created_date (read back includes the partition column)
    fact = lake.read_table(spark, warehouse, "fact_sales_order")
    assert fact.count() == 6
    assert sorted(fact.columns) == sorted(STAR_COLUMNS["fact_sales_order"])
    dim = lake.read_table(spark, warehouse, "dim_staff")
    assert [r["staff_id"] for r in dim.orderBy("staff_id").collect()] == [1, 2, 3]

    # second cycle: no new OLTP rows -> extract stages nothing new, transforms
    # still rebuild dims (the reference re-pushes full dims each run)
    deltas = etl.extract(spark, source, staging, state)
    assert deltas == {}
