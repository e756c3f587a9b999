"""Remote definition inlining (reference lint/resolve.py:144-305 semantics)
and the API (HTTP) server source (engines/data_contract_test.py:261-288)."""

import json
import textwrap
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from datacontract_cli_spark.model.contract import load_contract_str
from datacontract_cli_spark.model.definitions import (
    DefinitionResolutionError,
    clear_definition_cache,
)


@pytest.fixture(autouse=True)
def _fresh_cache():
    clear_definition_cache()
    yield
    clear_definition_cache()


def _contract_yaml(def_url: str, extra_prop: str = "") -> str:
    return textwrap.dedent(f"""
        apiVersion: v3.1.0
        kind: DataContract
        id: def-test
        version: 1.0.0
        schema:
          - name: orders
            properties:
              - name: order_id
                {extra_prop}
                authoritativeDefinitions:
                  - type: definition
                    url: {def_url}
    """)


DEFINITION = {
    "name": "shared_order_id",
    "logicalType": "string",
    "required": True,
    "description": "shared definition",
    "logicalTypeOptions": {"pattern": "^ORD-[0-9]+$"},
    "properties": [{"name": "should_not_merge"}],
}


def test_file_url_definition_resolves_and_merges(tmp_path):
    p = tmp_path / "def.json"
    p.write_text(json.dumps(DEFINITION))
    c = load_contract_str(_contract_yaml(f"file://{p}"), inline_references=True)
    [prop] = c.schema_objects[0].properties
    assert prop.name == "order_id"                 # name never merges
    assert prop.logical_type == "string"
    assert prop.required is True
    assert prop.description == "shared definition"
    assert prop.options.get("pattern") == "^ORD-[0-9]+$"
    assert prop.properties is None                 # properties never merge


def test_inline_values_win(tmp_path):
    p = tmp_path / "def.json"
    p.write_text(json.dumps(DEFINITION))
    c = load_contract_str(
        _contract_yaml(str(p), extra_prop="description: author wins"),
        inline_references=True)
    [prop] = c.schema_objects[0].properties
    assert prop.description == "author wins"       # author-set field preserved
    assert prop.required is True                   # unset field merged


def test_broken_reference_rejects_contract(tmp_path):
    with pytest.raises(DefinitionResolutionError):
        load_contract_str(_contract_yaml(str(tmp_path / "missing.json")),
                          inline_references=True)


def test_malformed_definition_rejects_contract(tmp_path):
    p = tmp_path / "def.json"
    p.write_text("[1, 2, 3]")
    with pytest.raises(DefinitionResolutionError):
        load_contract_str(_contract_yaml(str(p)), inline_references=True)


def test_success_only_cache(tmp_path):
    p = tmp_path / "def.json"
    # failure is NOT cached: first attempt fails, creating the file fixes it
    with pytest.raises(DefinitionResolutionError):
        load_contract_str(_contract_yaml(str(p)), inline_references=True)
    p.write_text(json.dumps(DEFINITION))
    c = load_contract_str(_contract_yaml(str(p)), inline_references=True)
    assert c.schema_objects[0].properties[0].required is True
    # success IS cached: mutating the file does not change the result
    p.write_text(json.dumps(dict(DEFINITION, required=False)))
    c2 = load_contract_str(_contract_yaml(str(p)), inline_references=True)
    assert c2.schema_objects[0].properties[0].required is True


def test_nested_and_items_references_resolve(tmp_path):
    p = tmp_path / "def.json"
    p.write_text(json.dumps({"logicalType": "integer", "required": True}))
    contract = textwrap.dedent(f"""
        apiVersion: v3.1.0
        kind: DataContract
        id: def-nested
        version: 1.0.0
        schema:
          - name: t
            properties:
              - name: obj
                logicalType: object
                properties:
                  - name: inner
                    authoritativeDefinitions:
                      - {{type: definition, url: {p}}}
              - name: arr
                logicalType: array
                items:
                  name: element
                  authoritativeDefinitions:
                    - {{type: definition, url: {p}}}
    """)
    c = load_contract_str(contract, inline_references=True)
    obj, arr = c.schema_objects[0].properties
    assert obj.properties[0].logical_type == "integer"
    assert arr.items.logical_type == "integer" and arr.items.required


def test_semantics_precedence_over_definition(tmp_path):
    sem = tmp_path / "sem.json"
    sem.write_text(json.dumps({"logicalType": "string", "description": "from-semantics"}))
    d = tmp_path / "def.json"
    d.write_text(json.dumps({"logicalType": "integer", "description": "from-definition"}))
    contract = textwrap.dedent(f"""
        apiVersion: v3.1.0
        kind: DataContract
        id: def-prec
        version: 1.0.0
        schema:
          - name: t
            properties:
              - name: x
                authoritativeDefinitions:
                  - {{type: definition, url: {d}}}
                  - {{type: semantics, url: {sem}}}
    """)
    c = load_contract_str(contract, inline_references=True)
    assert c.schema_objects[0].properties[0].description == "from-semantics"


# ---------------------------------------------------------------------------
# API server source
# ---------------------------------------------------------------------------

@pytest.fixture()
def api_server():
    state = {"auth": None}
    rows = [{"order_id": "A1", "amount": 10},
            {"order_id": "A2", "amount": 20},
            {"order_id": None, "amount": 30}]

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            state["auth"] = self.headers.get("Authorization")
            if self.path.endswith("/fail"):
                self.send_response(500)
                self.end_headers()
                return
            body = "\n".join(json.dumps(r) for r in rows).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield server.server_port, state
    server.shutdown()


API_CONTRACT = """
apiVersion: v3.1.0
kind: DataContract
id: api-test
version: 1.0.0
servers:
  - server: api
    type: api
    location: http://127.0.0.1:{port}/orders
schema:
  - name: orders
    properties:
      - name: order_id
        logicalType: string
        required: true
      - name: amount
        logicalType: integer
"""


def test_api_server_source_end_to_end(spark, api_server, monkeypatch):
    from datacontract_cli_spark.engine.executor import SparkContractEngine
    from datacontract_cli_spark.model.run import ResultEnum

    port, state = api_server
    monkeypatch.setenv("DATACONTRACT_API_HEADER_AUTHORIZATION", "Bearer tok")
    contract = load_contract_str(API_CONTRACT.format(port=port))
    run = SparkContractEngine(spark).test(contract)
    assert state["auth"] == "Bearer tok"
    check = run.check("orders__order_id__field_required")
    assert check.result is ResultEnum.failed       # one null order_id
    assert check.diagnostics["value"] == 1
    assert run.check("orders__amount__field_type").result is ResultEnum.passed


def test_api_server_connection_error_is_run_error(spark, api_server):
    from datacontract_cli_spark.engine.executor import SparkContractEngine
    from datacontract_cli_spark.model.run import ResultEnum

    port, _ = api_server
    contract = load_contract_str(
        API_CONTRACT.format(port=port).replace("/orders", "/fail"))
    run = SparkContractEngine(spark).test(contract)
    assert run.result is ResultEnum.error


def test_load_contract_from_url(tmp_path):
    """Contracts load from http(s) URLs (reference lint/urls.py lane):
    200 -> parsed contract (with the api-key header when configured),
    404 -> error, never an empty contract."""
    import http.server
    import os
    import threading

    import pytest as _pytest

    from datacontract_cli_spark.model.contract import load_contract

    yaml_text = (
        "apiVersion: v3.1.0\nkind: DataContract\nid: url-contract\n"
        "version: 1.0.0\nstatus: active\nschema:\n  - name: t\n"
        "    properties:\n      - name: id\n        logicalType: integer\n")
    seen = {}

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            seen["accept"] = self.headers.get("accept")
            seen["x-api-key"] = self.headers.get("x-api-key")
            if self.path == "/dc.yaml":
                body = yaml_text.encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

    server = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.server_port}"
    try:
        os.environ["DATACONTRACT_API_KEY"] = "sekrit"
        contract = load_contract(f"{base}/dc.yaml")
        assert contract.id == "url-contract"
        assert seen["accept"] == "application/yaml"
        assert seen["x-api-key"] == "sekrit"
        with _pytest.raises(ValueError, match="cannot read data contract"):
            load_contract(f"{base}/missing.yaml")
    finally:
        os.environ.pop("DATACONTRACT_API_KEY", None)
        server.shutdown()
