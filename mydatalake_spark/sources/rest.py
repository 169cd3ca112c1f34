"""REST API raw-zone source (driver-side fetch → DataFrame).

Reference parity: ``APIIngestor.get_data`` GETs ``{url}/{endpoint}``
with header auth and decorates the JSON payload with ``loaded_at`` and
``asset_type`` before writing raw files (reference raw/ingestors.py:30-42).

Rebuild shape: fetching stays driver-side (an external API is not a
distributable scan), but lands straight into a DataFrame via
``spark.createDataFrame`` so the raw zone can be any Spark sink. The
HTTP transport is injectable — tests pass a fake fetcher; production
passes ``urllib``-based ``http_get_json``. At scale, per-entity fetch
fan-out belongs in the orchestrator (many small raw jobs), never in
executors.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession

Fetcher = Callable[[str, dict[str, str]], dict[str, Any]]


def http_get_json(url: str, headers: dict[str, str]) -> dict[str, Any]:
    """Default transport (stdlib only — no external HTTP deps)."""
    import urllib.request

    req = urllib.request.Request(url, headers=headers)
    with urllib.request.urlopen(req, timeout=60) as resp:  # noqa: S310
        return json.loads(resp.read().decode("utf-8"))


@dataclass
class RestSource:
    """GET {base_url}/{endpoint} → decorated record batch → DataFrame."""

    base_url: str
    headers: dict[str, str]
    fetcher: Fetcher = http_get_json

    def fetch(self, endpoint: str, asset_type: str) -> dict[str, Any]:
        """One decorated payload (reference raw/ingestors.py:30-38)."""
        payload = self.fetcher(f"{self.base_url}/{endpoint}", self.headers)
        payload["loaded_at"] = datetime.now(timezone.utc).isoformat()
        payload["asset_type"] = asset_type
        return payload

    def to_dataframe(
        self,
        spark: SparkSession,
        payloads: list[dict[str, Any]],
        schema=None,
    ) -> DataFrame:
        """Record batches → DataFrame.

        JSON-encodes payloads and parses with ``from_json`` under the
        declared schema (nested struct/array payloads type correctly —
        the shape of reference bronze/tickers/tickers.yml:82-135);
        without a schema, falls back to the JSON reader's inference
        over a one-column dataset.
        """
        from pyspark.sql import functions as F

        lines = [(json.dumps(p),) for p in payloads]
        raw = spark.createDataFrame(lines, "value string")
        if schema is not None:
            return raw.select(
                F.from_json("value", schema).alias("r")
            ).select("r.*")
        return spark.read.json(raw.rdd.map(lambda r: r.value))
