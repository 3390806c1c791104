"""Pluggable secret providers (reference pull_secrets,
src/extract.py:23-50): provider units + the full live-JDBC ETL lifecycle
running with credentials that came from a NON-env provider."""

import datetime as dt

import pytest

from pw_etl_scrumptious_squad_spark.sources import jdbc as J
from pw_etl_scrumptious_squad_spark.sources import secrets as S

REF_SECRET = {
    "user": "etl_user",
    "password": "pw!",
    "database": "totesys",
    "host": "db.internal",
    "port": "5432",
}


def test_in_memory_provider_and_missing_id():
    p = S.InMemorySecretProvider({"source_DB": REF_SECRET})
    assert p.get("source_DB")["user"] == "etl_user"
    with pytest.raises(S.SecretNotFoundError, match="doesn't exist"):
        p.get("nope")


def test_env_provider_reference_fallback_shape():
    env = {
        "SOURCE_DB_USER": "u",
        "SOURCE_DB_PASSWORD": "p",
        "SOURCE_DB_HOST": "h",
        "SOURCE_DB_PORT": "5432",
        "SOURCE_DB_DATABASE": "d",
    }
    p = S.EnvSecretProvider(env)
    got = p.get("source_DB")
    assert got == {
        "user": "u", "password": "p", "database": "d",
        "host": "h", "port": "5432",
    }
    with pytest.raises(S.SecretNotFoundError):
        p.get("warehouse_DB")


def test_json_file_provider_rereads_rotations(tmp_path):
    import json

    f = tmp_path / "secrets.json"
    f.write_text(json.dumps({"source_DB": REF_SECRET}))
    p = S.JsonFileSecretProvider(str(f))
    assert p.get("source_DB")["host"] == "db.internal"
    rotated = dict(REF_SECRET, password="new")
    f.write_text(json.dumps({"source_DB": rotated}))
    assert p.get("source_DB")["password"] == "new"  # no restart needed
    with pytest.raises(S.SecretNotFoundError):
        p.get("other")


def test_jdbc_config_from_secret_reference_shape():
    p = S.InMemorySecretProvider({"source_DB": REF_SECRET})
    cfg = S.jdbc_config_from_secret(p, "source_DB")
    assert cfg.url == "jdbc:postgresql://db.internal:5432/totesys"
    assert cfg.user == "etl_user" and cfg.password == "pw!"
    # a secret with a full url wins over the template; overrides pass through
    p2 = S.InMemorySecretProvider(
        {"wh": {"user": "a", "password": "b", "url": "jdbc:derby:/x/wh"}}
    )
    cfg2 = S.jdbc_config_from_secret(
        p2, "wh", driver="org.apache.derby.jdbc.EmbeddedDriver",
        schema="APP",
    )
    assert cfg2.url == "jdbc:derby:/x/wh"
    assert cfg2.driver == "org.apache.derby.jdbc.EmbeddedDriver"
    assert cfg2.schema == "APP"


@pytest.mark.extended  # ~32 s; default tier: the env-provider config
# tests above and the live-JDBC lifecycle in test_jdbc_roundtrip
def test_etl_lifecycle_under_non_env_provider(spark, totesys, tmp_path):
    """The reference's prod path: configs resolved through a secret
    provider (not env), then the live-JDBC lifecycle end-to-end —
    extract from the 'OLTP' Derby, star transform, load into the
    'warehouse' Derby."""
    from pw_etl_scrumptious_squad_spark.plans import etl

    provider = S.InMemorySecretProvider(
        {
            "source_DB": {
                "user": "app", "password": "",
                "url": f"jdbc:derby:{tmp_path}/oltp;create=true",
            },
            "warehouse_DB": {
                "user": "app", "password": "",
                "url": f"jdbc:derby:{tmp_path}/wh;create=true",
            },
        }
    )
    derby = dict(
        driver="org.apache.derby.jdbc.EmbeddedDriver",
        schema="APP",
        discover_sql=J.DISCOVER_TABLES_SQL_DERBY,
    )
    src = S.jdbc_config_from_secret(provider, "source_DB", **derby)
    wh = S.jdbc_config_from_secret(provider, "warehouse_DB", **derby)
    for name, df in totesys.items():
        J.append_table(df, src, name, num_partitions=1)
    star = etl.run_batch_etl_jdbc(
        spark, src, wh, str(tmp_path / "staging"), str(tmp_path / "state")
    )
    assert len(star) == 11
    fact = J.read_table(spark, wh, "APP.fact_sales_order")
    assert fact.count() == totesys["sales_order"].count()
