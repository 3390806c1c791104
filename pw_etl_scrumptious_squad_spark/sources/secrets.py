"""Pluggable secret providers (reference ``pull_secrets``,
``src/extract.py:23-50`` / ``src/load.py:18-31``).

The reference reads warehouse credentials from AWS SecretsManager in
production and from a ``.env`` file in tests — a two-provider split baked
into each function. Here the split is a seam: anything with a
``get(secret_id) -> dict`` method is a provider, and
:func:`jdbc_config_from_secret` turns the reference's secret shape
(``user/password/database/host/port``) into a ready
:class:`~pw_etl_scrumptious_squad_spark.sources.jdbc.JdbcConfig`. Built-ins:

- :class:`InMemorySecretProvider` — tests / programmatic injection.
- :class:`EnvSecretProvider` — ``<PREFIX>_<FIELD>`` environment
  variables, the reference's dotenv fallback.
- :class:`JsonFileSecretProvider` — one JSON object per secret id in a
  file; the ``.env``-file analogue with structured values.
- Cloud hook: subclass and implement ``get`` with your SDK — e.g. the
  reference's SecretsManager provider is ::

      class SecretsManagerProvider:
          def __init__(self):
              import boto3  # not shipped in this sandbox
              self._c = boto3.client("secretsmanager")
          def get(self, secret_id):
              import json
              r = self._c.get_secret_value(SecretId=secret_id)
              return json.loads(r["SecretString"])

Missing secrets raise :class:`SecretNotFoundError` (the reference raises
ValueError on ResourceNotFoundException — same contract, typed).
"""

from __future__ import annotations

import json
import os
from typing import Protocol

from pw_etl_scrumptious_squad_spark.sources.jdbc import JdbcConfig


class SecretNotFoundError(KeyError):
    """Raised when a provider has no secret under the requested id."""


class SecretProvider(Protocol):
    def get(self, secret_id: str) -> dict: ...


class InMemorySecretProvider:
    def __init__(self, secrets: dict[str, dict]):
        self._secrets = dict(secrets)

    def get(self, secret_id: str) -> dict:
        try:
            return dict(self._secrets[secret_id])
        except KeyError:
            raise SecretNotFoundError(
                f"secret id {secret_id!r} doesn't exist"
            ) from None


class EnvSecretProvider:
    """Secrets as environment variables: secret id ``source_DB`` with
    fields user/password/... reads ``SOURCE_DB_USER``,
    ``SOURCE_DB_PASSWORD``, ... (non-alnum chars in the id become
    underscores). Only the fields present in the environment appear in
    the returned dict; an id with NO matching variables is missing."""

    FIELDS = ("user", "password", "database", "host", "port", "url", "driver")

    def __init__(self, environ: dict[str, str] | None = None):
        self._env = os.environ if environ is None else environ

    def get(self, secret_id: str) -> dict:
        prefix = "".join(
            c if c.isalnum() else "_" for c in secret_id
        ).upper()
        out = {
            f: self._env[f"{prefix}_{f.upper()}"]
            for f in self.FIELDS
            if f"{prefix}_{f.upper()}" in self._env
        }
        if not out:
            raise SecretNotFoundError(
                f"secret id {secret_id!r} doesn't exist (no {prefix}_*"
                " environment variables)"
            )
        return out


class JsonFileSecretProvider:
    """``{"<secret_id>": {...fields...}, ...}`` in a JSON file — the
    structured ``.env``-file analogue; re-read per get so rotations
    land without a restart."""

    def __init__(self, path: str):
        self._path = path

    def get(self, secret_id: str) -> dict:
        with open(self._path, encoding="utf-8") as f:
            data = json.load(f)
        if secret_id not in data:
            raise SecretNotFoundError(
                f"secret id {secret_id!r} doesn't exist in {self._path}"
            )
        return dict(data[secret_id])


def jdbc_config_from_secret(
    provider: SecretProvider,
    secret_id: str,
    *,
    url_template: str = "jdbc:postgresql://{host}:{port}/{database}",
    **overrides,
) -> JdbcConfig:
    """Build a :class:`JdbcConfig` from a secret in the reference's shape
    (``user/password/database/host/port`` — ``src/extract.py:36-49``).
    A secret carrying a full ``url`` field wins over the template;
    ``overrides`` (driver, schema, discover_sql, ...) pass through to
    the config, so a Derby/test warehouse only swaps those."""
    s = provider.get(secret_id)
    url = s.get("url") or url_template.format(**s)
    kwargs = {"url": url, "user": s["user"], "password": s["password"]}
    kwargs.update(overrides)
    return JdbcConfig(**kwargs)
