"""Single format->exporter dispatch shared by the CLI and the REST API —
two parallel if/elif tables drifted immediately (the API lacked half the
formats), so both now route through this registry.

``export_contract(contract, fmt, schema_name="all", server=None,
template=None, base=None)`` returns the exported text (bytes for the
binary excel format) or raises ValueError for unknown formats / bad
arguments.
"""

from __future__ import annotations

import json
from typing import Optional

from datacontract_cli_spark.model.contract import DataContract


def _single_model(contract: DataContract, schema_name: str, fmt: str) -> str:
    if schema_name not in (None, "all"):
        return schema_name
    if len(contract.schema_objects) == 1:
        return contract.schema_objects[0].name
    raise ValueError(f"{fmt} export needs --schema <model> "
                     f"({len(contract.schema_objects)} models in contract)")


def export_contract(contract: DataContract, fmt: str,
                    schema_name: str = "all",
                    server: Optional[str] = None,
                    template: Optional[str] = None,
                    base: Optional[str] = None) -> str:
    from datacontract_cli_spark import export as _export

    if fmt == "odcs":
        return _export.to_odcs_yaml(contract)
    if fmt == "jsonschema":
        return json.dumps(_export.to_jsonschema_dict(contract, schema_name), indent=2)
    if fmt == "sql":
        return _export.to_sql_ddl(contract, schema_name)
    if fmt == "avro":
        return json.dumps(_export.to_avro_schema(contract, schema_name), indent=2)
    if fmt == "spark":
        objs = [o for o in contract.schema_objects
                if schema_name == "all" or o.name == schema_name]
        return "\n".join(_export.to_spark_schema(o).simpleString() for o in objs)
    if fmt == "sodacl":
        from datacontract_cli_spark.export_sodacl import to_sodacl_yaml
        return to_sodacl_yaml(contract, schema_name)
    if fmt == "dbt":
        from datacontract_cli_spark.export_dbt import to_dbt_models_yaml
        return to_dbt_models_yaml(contract, server)
    if fmt == "dbt-sources":
        from datacontract_cli_spark.export_dbt import to_dbt_sources_yaml
        return to_dbt_sources_yaml(contract, server)
    if fmt == "dbt-staging":
        from datacontract_cli_spark.export_dbt import to_dbt_staging_sql
        return to_dbt_staging_sql(contract, _single_model(contract, schema_name, fmt))
    if fmt == "html":
        from datacontract_cli_spark.export_docs import to_html
        return to_html(contract)
    if fmt == "markdown":
        from datacontract_cli_spark.export_docs import to_markdown
        return to_markdown(contract)
    if fmt == "mermaid":
        from datacontract_cli_spark.export_docs import to_mermaid
        return to_mermaid(contract) or ""
    if fmt == "great-expectations":
        from datacontract_cli_spark.export_code import to_great_expectations
        return to_great_expectations(contract, _single_model(contract, schema_name, fmt))
    if fmt == "pydantic":
        from datacontract_cli_spark.export_code import to_pydantic
        return to_pydantic(contract)
    if fmt == "sqlalchemy":
        from datacontract_cli_spark.export_code import to_sqlalchemy
        return to_sqlalchemy(contract)
    if fmt == "dbml":
        from datacontract_cli_spark.export_code import to_dbml
        return to_dbml(contract)
    if fmt == "protobuf":
        from datacontract_cli_spark.export_code import to_protobuf
        return to_protobuf(contract)
    if fmt == "go":
        from datacontract_cli_spark.export_code import to_go
        return to_go(contract)
    if fmt == "bigquery":
        from datacontract_cli_spark.export_code import to_bigquery_json
        return to_bigquery_json(contract, _single_model(contract, schema_name, fmt),
                                server)
    if fmt == "dcs":
        from datacontract_cli_spark.export_code import to_dcs_yaml
        return to_dcs_yaml(contract)
    if fmt == "iceberg":
        from datacontract_cli_spark.export_code import to_iceberg_json
        return to_iceberg_json(contract, schema_name)
    if fmt == "dqx":
        from datacontract_cli_spark.export_code import to_dqx_yaml
        return to_dqx_yaml(contract, schema_name)
    if fmt == "data-caterer":
        from datacontract_cli_spark.export_code import to_data_caterer_yaml
        return to_data_caterer_yaml(contract, server)
    if fmt == "avro-idl":
        from datacontract_cli_spark.export_code import to_avro_idl
        return to_avro_idl(contract)
    if fmt == "rdf":
        from datacontract_cli_spark.export_code import to_rdf_turtle
        return to_rdf_turtle(contract, base)
    if fmt == "excel":
        from datacontract_cli_spark.export_excel import to_excel_bytes
        return to_excel_bytes(contract)
    if fmt == "custom":
        from datacontract_cli_spark.export_code import to_custom_jinja
        if not template:
            raise ValueError("--format custom requires --template")
        return to_custom_jinja(contract, template, schema_name)
    raise ValueError(f"unsupported export format: {fmt}")


EXPORT_FORMATS = [
    "odcs", "jsonschema", "sql", "avro", "spark", "sodacl", "dbt",
    "dbt-sources", "dbt-staging", "html", "markdown", "mermaid",
    "great-expectations", "pydantic", "sqlalchemy", "dbml", "protobuf",
    "go", "bigquery", "dcs", "custom", "iceberg", "dqx", "data-caterer",
    "avro-idl", "rdf", "excel",
]
