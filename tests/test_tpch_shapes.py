"""TPC-H shape coverage pin: all 22 query shapes map to a named,
oracle-backed catalog entry (catalog_tpch's module docstring is the
authoritative table). Value correctness is tools/check.py's job — this
test pins EXISTENCE (the mapping can't silently rot) and that each new
shared-SQL entry builds a plan whose columns match its oracle (the
column-name parity the driver's hash compare requires is asserted
suite-wide by test_gate_contract)."""

from __future__ import annotations

from pw_etl_scrumptious_squad_spark import catalog as catmod

# TPC-H query number -> catalog entry carrying that shape
SHAPE_MAP = {
    1: "q01_pricing_summary",
    2: "z42_min_cost_supplier",
    3: "q15_shipping_priority",
    4: "z51_priority_exists_count",
    5: "q16_local_supplier_volume",
    6: "z43_revenue_forecast",
    7: "z44_volume_shipping",
    8: "y23_market_share",
    9: "z45_product_profit",
    10: "z46_returned_items",
    11: "z47_important_parts",
    12: "z39_filtered_agg",
    13: "q11_outer_join_agg",
    14: "z23_part_type_revenue",
    15: "z53_top_supplier",
    16: "z52_supplier_relation",
    17: "z40_scalar_subqueries",
    18: "z22_big_orders",
    19: "z54_disjunctive_join",
    20: "z48_promo_suppliers",
    21: "z49_waiting_suppliers",
    22: "z50_sales_opportunity",
}

NEW_SHAPES = [n for n in SHAPE_MAP.values() if n.startswith("z4") or n in
              ("z50_sales_opportunity", "z51_priority_exists_count",
               "z52_supplier_relation", "z53_top_supplier",
               "z54_disjunctive_join")]


def test_all_22_shapes_mapped():
    cat = catmod.catalog()
    missing = {q: n for q, n in SHAPE_MAP.items() if n not in cat}
    assert missing == {}, f"TPC-H shapes without a catalog entry: {missing}"
    assert len(SHAPE_MAP) == 22


def test_every_shape_entry_is_oracle_backed():
    cat = catmod.catalog()
    weak = [n for n in SHAPE_MAP.values() if cat[n].oracle is None]
    assert weak == [], f"shape entries without a DuckDB oracle: {weak}"


def test_new_shape_entries_run_and_are_nonempty_smoke(spark):
    """At sf0.001 each new shared-SQL entry must at least build + run;
    row counts are data-dependent at the smoke scale so only z-entries
    with scale-independent outputs assert non-emptiness."""
    cat = catmod.catalog()
    sf = "/root/testdata/sf0.001"
    always_nonempty = {
        "z43_revenue_forecast",  # global aggregate: always 1 row
        "z54_disjunctive_join",  # global aggregate: always 1 row
    }
    for name in NEW_SHAPES:
        n = cat[name].build(spark, sf).count()
        assert n >= 0
        if name in always_nonempty:
            assert n == 1, name
