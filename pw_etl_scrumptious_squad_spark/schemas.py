"""Explicit StructType schemas for every table the engine touches.

The reference discovers schemas dynamically (``information_schema`` +
``cursor.description`` — reference ``src/extract.py:81-84,100``); we declare
them up front (FIXTURES.md) so parquet scans prune columns, JDBC reads don't
round-trip type inference, and the 100 TB path never pays a sampling pass.
A discovery path for parity with ``get_titles`` lives in ``sources/jdbc.py``.

Types follow SURVEY.md §1.2: integer->IntegerType (LongType for surrogate
keys at scale), text->StringType, numeric->DecimalType(10,2),
timestamp->TimestampNTZType, boolean->BooleanType. Spark has no TimeType, so
warehouse ``time`` columns are 'HH:mm:ss' strings (matches the reference,
which stores the string produced by splitting the timestamp —
``src/transform.py:171-176``).
"""

from __future__ import annotations

from pyspark.sql import types as T

_TS = T.TimestampNTZType()
_DEC = T.DecimalType(10, 2)


def _audit() -> list[T.StructField]:
    # Every OLTP table carries CDC watermark columns (setup_test_db.sql:16-17).
    return [
        T.StructField("created_at", _TS),
        T.StructField("last_updated", _TS),
    ]


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


# ---------------------------------------------------------------------------
# OLTP source tables ("totesys", 11 tables — setup_test_db.sql:7-124)
# ---------------------------------------------------------------------------

ADDRESS = T.StructType(
    [
        _f("address_id", T.IntegerType(), False),
        _f("address_line_1", T.StringType()),
        _f("address_line_2", T.StringType()),
        _f("district", T.StringType()),
        _f("city", T.StringType()),
        _f("postal_code", T.StringType()),
        _f("country", T.StringType()),
        _f("phone", T.StringType()),
        *_audit(),
    ]
)

COUNTERPARTY = T.StructType(
    [
        _f("counterparty_id", T.IntegerType(), False),
        _f("counterparty_legal_name", T.StringType()),
        _f("legal_address_id", T.IntegerType()),
        _f("commercial_contact", T.StringType()),
        _f("delivery_contact", T.StringType()),
        *_audit(),
    ]
)

CURRENCY = T.StructType(
    [
        _f("currency_id", T.IntegerType(), False),
        _f("currency_code", T.StringType()),
        *_audit(),
    ]
)

DEPARTMENT = T.StructType(
    [
        _f("department_id", T.IntegerType(), False),
        _f("department_name", T.StringType()),
        _f("location", T.StringType()),
        _f("manager", T.StringType()),
        *_audit(),
    ]
)

DESIGN = T.StructType(
    [
        _f("design_id", T.IntegerType(), False),
        _f("design_name", T.StringType()),
        _f("file_location", T.StringType()),
        _f("file_name", T.StringType()),
        *_audit(),
    ]
)

PAYMENT_TYPE = T.StructType(
    [
        _f("payment_type_id", T.IntegerType(), False),
        _f("payment_type_name", T.StringType()),
        *_audit(),
    ]
)

PAYMENT = T.StructType(
    [
        _f("payment_id", T.IntegerType(), False),
        _f("transaction_id", T.IntegerType()),
        _f("counterparty_id", T.IntegerType()),
        _f("payment_amount", _DEC),
        _f("currency_id", T.IntegerType()),
        _f("payment_type_id", T.IntegerType()),
        _f("paid", T.BooleanType()),
        _f("payment_date", T.StringType()),  # date-as-text in OLTP DDL
        _f("company_ac_number", T.IntegerType()),
        _f("counterparty_ac_number", T.IntegerType()),
        *_audit(),
    ]
)

PURCHASE_ORDER = T.StructType(
    [
        _f("purchase_order_id", T.IntegerType(), False),
        _f("staff_id", T.IntegerType()),
        _f("counterparty_id", T.IntegerType()),
        _f("item_code", T.StringType()),
        _f("item_quantity", T.IntegerType()),
        _f("item_unit_price", _DEC),
        _f("currency_id", T.IntegerType()),
        _f("agreed_delivery_date", T.StringType()),
        _f("agreed_payment_date", T.StringType()),
        _f("agreed_delivery_location_id", T.IntegerType()),
        *_audit(),
    ]
)

SALES_ORDER = T.StructType(
    [
        _f("sales_order_id", T.IntegerType(), False),
        _f("design_id", T.IntegerType()),
        _f("staff_id", T.IntegerType()),
        _f("counterparty_id", T.IntegerType()),
        _f("units_sold", T.IntegerType()),
        _f("unit_price", _DEC),
        _f("currency_id", T.IntegerType()),
        _f("agreed_delivery_date", T.StringType()),
        _f("agreed_payment_date", T.StringType()),
        _f("agreed_delivery_location_id", T.IntegerType()),
        *_audit(),
    ]
)

STAFF = T.StructType(
    [
        _f("staff_id", T.IntegerType(), False),
        _f("first_name", T.StringType()),
        _f("last_name", T.StringType()),
        _f("department_id", T.IntegerType()),
        _f("email_address", T.StringType()),
        *_audit(),
    ]
)

TRANSACTION = T.StructType(
    [
        _f("transaction_id", T.IntegerType(), False),
        _f("transaction_type", T.StringType()),
        _f("sales_order_id", T.IntegerType()),  # nullable by design
        _f("purchase_order_id", T.IntegerType()),  # nullable by design
        *_audit(),
    ]
)

OLTP_SCHEMAS: dict[str, T.StructType] = {
    "address": ADDRESS,
    "counterparty": COUNTERPARTY,
    "currency": CURRENCY,
    "department": DEPARTMENT,
    "design": DESIGN,
    "payment_type": PAYMENT_TYPE,
    "payment": PAYMENT,
    "purchase_order": PURCHASE_ORDER,
    "sales_order": SALES_ORDER,
    "staff": STAFF,
    "transaction": TRANSACTION,
}

# ---------------------------------------------------------------------------
# Star-schema output column contracts (setup_test_warehouse.sql:8-80;
# builders reference src/transform.py:46-235). Kept as ordered column lists —
# the builders return DataFrames whose schema must match these exactly.
# ---------------------------------------------------------------------------

STAR_COLUMNS: dict[str, list[str]] = {
    "dim_date": [
        "date_id", "year", "month", "day",
        "day_of_week", "day_name", "month_name", "quarter",
    ],
    "dim_staff": [
        "staff_id", "first_name", "last_name",
        "department_name", "location", "email_address",
    ],
    "dim_location": [
        "location_id", "address_line_1", "address_line_2", "district",
        "city", "postal_code", "country", "phone",
    ],
    "dim_currency": ["currency_id", "currency_code", "currency_name"],
    "dim_design": ["design_id", "design_name", "file_location", "file_name"],
    "dim_counterparty": [
        "counterparty_id", "counterparty_legal_name",
        "counterparty_legal_address_line_1", "counterparty_legal_address_line_2",
        "counterparty_legal_district", "counterparty_legal_city",
        "counterparty_legal_postal_code", "counterparty_legal_country",
        "counterparty_legal_phone_number",
    ],
    "dim_transaction": [
        "transaction_id", "transaction_type", "sales_order_id", "purchase_order_id",
    ],
    "dim_payment_type": ["payment_type_id", "payment_type_name"],
    "fact_sales_order": [
        "sales_order_id", "created_date", "created_time", "last_updated_date",
        "last_updated_time", "sales_staff_id", "counterparty_id", "units_sold",
        "unit price",  # literal space — warehouse contract setup_test_warehouse.sql:74
        "currency_id", "design_id", "agreed_payment_date", "agreed_delivery_date",
        "agreed_delivery_location_id",
    ],
    "fact_purchase_order": [
        "purchase_order_id", "created_date", "created_time", "last_updated_date",
        "last_updated_time", "staff_id", "counterparty_id", "item_code",
        "item_quantity", "item_unit_price", "currency_id", "agreed_delivery_date",
        "agreed_payment_date", "agreed_delivery_location_id",
    ],
    "fact_payment": [
        "payment_id", "created_date", "created_time", "last_updated_date",
        # the reference misnames the time column "last_updated" (transform.py:225,
        # pinned by test_transform.py:178); we keep the intended name and
        # document the divergence (SURVEY.md §7.3).
        "last_updated_time", "transaction_id", "counterparty_id",
        "payment_amount", "currency_id", "payment_type_id", "paid", "payment_date",
    ],
}

# ---------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md) — declared so reads never infer.
# ---------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [_f("r_regionkey", T.IntegerType(), False), _f("r_name", T.StringType())]
    ),
    "nation": T.StructType(
        [
            _f("n_nationkey", T.IntegerType(), False),
            _f("n_name", T.StringType()),
            _f("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            _f("c_custkey", T.LongType(), False),
            _f("c_name", T.StringType()),
            _f("c_nationkey", T.IntegerType()),
            _f("c_acctbal", T.DoubleType()),
            _f("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            _f("s_suppkey", T.LongType(), False),
            _f("s_name", T.StringType()),
            _f("s_nationkey", T.IntegerType()),
            _f("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            _f("p_partkey", T.LongType(), False),
            _f("p_name", T.StringType()),
            _f("p_brand", T.StringType()),
            _f("p_type", T.StringType()),
            _f("p_size", T.IntegerType()),
            _f("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            _f("o_orderkey", T.LongType(), False),
            _f("o_custkey", T.LongType()),
            _f("o_orderstatus", T.StringType()),
            _f("o_totalprice", T.DoubleType()),
            _f("o_orderdate", _TS),
            _f("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            _f("l_orderkey", T.LongType(), False),
            _f("l_partkey", T.LongType()),
            _f("l_suppkey", T.LongType()),
            _f("l_linenumber", T.IntegerType()),
            _f("l_quantity", T.DoubleType()),
            _f("l_extendedprice", T.DoubleType()),
            _f("l_discount", T.DoubleType()),
            _f("l_tax", T.DoubleType()),
            _f("l_returnflag", T.StringType()),
            _f("l_linestatus", T.StringType()),
            _f("l_shipdate", _TS),
        ]
    ),
    "events": T.StructType(
        [
            _f("event_id", T.LongType(), False),
            _f("ts", _TS),
            _f("user_id", T.LongType()),
            _f("event_type", T.StringType()),
            _f("value", T.DoubleType()),
            _f("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            _f("doc_id", T.LongType(), False),
            _f("text", T.StringType()),
            _f("lang", T.StringType()),
            _f("source", T.StringType()),
            _f("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            _f("vec_id", T.LongType(), False),
            _f("embedding", T.ArrayType(T.FloatType())),
            _f("label", T.IntegerType()),
        ]
    ),
}
