"""Drop-in style facade: the reference's primary Python entry point is
``DataContract(data_contract_file=..., spark=session).test()``
(datacontract/data_contract.py:26-72,143). This facade gives users of the
reference CLI the same call shape on top of the Spark engine.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession

from datacontract_cli_spark.engine.executor import SparkContractEngine
from datacontract_cli_spark.model.contract import load_contract, load_contract_str
from datacontract_cli_spark.model.run import Run
from datacontract_cli_spark.output import writers


class DataContractRunner:
    """Reference-shaped facade (named to avoid clashing with the contract
    dataclass; ``from datacontract_cli_spark.api import DataContractRunner
    as DataContract`` gives the literal reference name)."""

    def __init__(
        self,
        data_contract_file: Optional[str] = None,
        data_contract_str: Optional[str] = None,
        spark: Optional[SparkSession] = None,
        server: Optional[str] = None,
        schema_name: str = "all",
        include_failed_samples: bool = False,
        filter: Optional[str] = None,  # noqa: A002 — reference arg name
        tables: Optional[Dict[str, DataFrame]] = None,
        publish_url: Optional[str] = None,
        api_key: Optional[str] = None,
    ):
        if data_contract_file is None and data_contract_str is None:
            raise ValueError("provide data_contract_file or data_contract_str")
        if data_contract_file is not None:
            with open(data_contract_file, "r", encoding="utf-8") as f:
                self.contract_source: Optional[str] = f.read()
        else:
            self.contract_source = data_contract_str
        self.contract = load_contract_str(self.contract_source)
        if spark is None:
            from datacontract_cli_spark.session import get_spark
            spark = get_spark()
        self.spark = spark
        self.server = server
        self.schema_name = schema_name
        self.include_failed_samples = include_failed_samples
        self.filters: Optional[List[str]] = [filter] if filter else None
        self.tables = tables
        self.publish_url = publish_url
        self.api_key = api_key

    def test(self) -> Run:
        engine = SparkContractEngine(
            self.spark, include_failed_samples=self.include_failed_samples
        )
        tables = self.tables
        if tables is None and self.contract.server(self.server) is None:
            # dataframe-style usage: models must exist as temp views
            tables = {
                obj.table: self.spark.table(obj.table)
                for obj in self.contract.schema_objects
            }
        run = engine.test(
            self.contract,
            tables=tables,
            server=self.server,
            schema_name=self.schema_name,
            filters=self.filters,
        )
        # reference Run lifecycle: publish results when a URL is configured
        # (data_contract.py:201-203) — publish failure never fails the test
        if self.publish_url is not None:
            from datacontract_cli_spark.output.publish import publish_test_results
            publish_test_results(run, self.publish_url, api_key=self.api_key)
        return run

    def lint(self) -> List[str]:
        """Document-level problems: JSON-Schema validation of the contract
        itself (reference lint/resolve.py:441-466) plus structural warnings."""
        problems: List[str] = []
        source = getattr(self, "contract_source", None)
        if source is not None:
            from datacontract_cli_spark.model.lint import lint_str
            problems.extend(lint_str(source))
        if not self.contract.schema_objects:
            problems.append("contract has no schema objects")
        for obj in self.contract.schema_objects:
            if not obj.properties:
                problems.append(f"schema object '{obj.name}' has no properties")
        return problems

    @staticmethod
    def pretty(run: Run) -> str:
        return writers.console_table(run)
