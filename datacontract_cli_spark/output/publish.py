"""Publish a Run's test results to an HTTP endpoint.

Mirrors the reference's publish step (integration/entropy_data.py:12-55,
invoked from data_contract.py:201-203): POST the Run as JSON with an
x-api-key header, log success/failure onto the Run, never raise. stdlib
urllib instead of requests (not guaranteed in this environment)."""

from __future__ import annotations

import json
import logging
import urllib.error
import urllib.request
from typing import Optional

from datacontract_cli_spark.model.run import Run

logger = logging.getLogger(__name__)


def publish_test_results(
    run: Run,
    publish_url: str,
    api_key: Optional[str] = None,
    timeout: float = 10.0,
) -> bool:
    """POST the run to ``publish_url``. Returns True on HTTP 200; on any
    failure logs an error on the run and returns False (a publish failure
    must never fail the validation itself)."""
    try:
        if run.dataContractId is None:
            raise ValueError("Cannot publish run results for unknown data contract ID")
        body = run.to_json().encode("utf-8")
        req = urllib.request.Request(
            publish_url,
            data=body,
            method="POST",
            headers={
                "Content-Type": "application/json",
                **({"x-api-key": api_key} if api_key else {}),
            },
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            if resp.status != 200:
                run.log_error(f"Error publishing test results to {publish_url}: "
                              f"HTTP {resp.status}")
                return False
        run.log_info("Published test results successfully")
        return True
    except urllib.error.HTTPError as e:
        run.log_error(f"Error publishing test results to {publish_url}: "
                      f"HTTP {e.code} {e.read().decode(errors='replace')[:200]}")
        return False
    except Exception as e:  # noqa: BLE001 — publish must never crash the run
        run.log_error(f"Failed publishing test results. Error: {e}")
        return False


def publish_data_contract(
    contract_dict: dict,
    host: str,
    api_key: Optional[str] = None,
    timeout: float = 10.0,
) -> bool:
    """PUT the contract document to ``{host}/api/datacontracts/{id}``
    (reference: integration/entropy_data.py:58-86 — the `publish` command's
    registry upload). Returns True on HTTP 200; never raises."""
    try:
        cid = contract_dict.get("id")
        if not cid:
            raise ValueError("cannot publish a contract without an id")
        url = f"{host.rstrip('/')}/api/datacontracts/{cid}"
        req = urllib.request.Request(
            url,
            data=json.dumps(contract_dict).encode("utf-8"),
            method="PUT",
            headers={
                "Content-Type": "application/json",
                **({"x-api-key": api_key} if api_key else {}),
            },
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            if resp.status != 200:
                logger.error("Error publishing data contract: HTTP %s", resp.status)
                return False
        return True
    except Exception as e:  # noqa: BLE001 — CLI surfaces the failure via exit code
        logger.error("Failed publishing data contract: %s", e)
        return False
