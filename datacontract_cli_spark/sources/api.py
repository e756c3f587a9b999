"""HTTP API server source: GET → temp JSON file → spark.read.json.

Mirrors the reference's api server type (datacontract/engines/
data_contract_test.py:261-288): the payload is fetched driver-side (it's a
control-plane-sized document, not the data lake), written to a temp file,
and read through the normal JSON reader so every downstream check works
unchanged. Uses urllib (stdlib) — no extra dependency.
"""

from __future__ import annotations

import json
import os
import tempfile
import urllib.request
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession


def fetch_to_tempfile(url: str, headers: Optional[Dict[str, str]] = None,
                      timeout: int = 30) -> str:
    req = urllib.request.Request(url, headers=headers or {})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        payload = resp.read()
    fd, path = tempfile.mkstemp(suffix=".json", prefix="dcspark_api_")
    with os.fdopen(fd, "wb") as f:
        # array-shaped payloads become NDJSON so the plain reader handles them
        try:
            doc = json.loads(payload)
        except ValueError:
            f.write(payload)
            return path
        if isinstance(doc, list):
            for row in doc:
                f.write(json.dumps(row).encode() + b"\n")
        else:
            f.write(json.dumps(doc).encode() + b"\n")
    return path


def read_api_json(spark: SparkSession, url: str,
                  headers: Optional[Dict[str, str]] = None,
                  schema=None) -> DataFrame:
    path = fetch_to_tempfile(url, headers)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
