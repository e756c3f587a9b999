"""REST API entry point (reference: datacontract/api.py — FastAPI app with
POST /test, /lint, /changelog, /export). FastAPI is not in this image, so
the same surface is served by a stdlib http.server handler:

- POST /lint       body: contract YAML -> {"result", "checks": [messages]}
- POST /export?format=X[&schema=...]  body: contract YAML -> exported text
- POST /changelog  body: {"v1": yaml, "v2": yaml} -> {"summary", "entries"}
- POST /test[?server=...&schema=...]  body: contract YAML -> the Run as
  JSON. The SparkSession is created lazily on the first /test call and
  reused (the reference equally reuses one engine process).

Request bodies are size-capped; unknown paths return 404; handler errors
return 400 with the message — the server never dies on a bad contract.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

_MAX_BODY = 16 * 1024 * 1024


class _ApiState:
    def __init__(self, master: Optional[str] = None):
        self.master = master
        self._spark = None
        self._lock = threading.Lock()

    def spark(self):
        with self._lock:
            if self._spark is None:
                from datacontract_cli_spark.session import get_spark
                self._spark = get_spark("datacontract-api", master=self.master)
            return self._spark


def _export_text(contract, fmt: str, schema_name: str) -> str:
    from datacontract_cli_spark import export as _export

    if fmt == "odcs":
        return _export.to_odcs_yaml(contract)
    if fmt == "jsonschema":
        return json.dumps(_export.to_jsonschema_dict(contract, schema_name), indent=2)
    if fmt == "sql":
        return _export.to_sql_ddl(contract, schema_name)
    if fmt == "avro":
        return json.dumps(_export.to_avro_schema(contract, schema_name), indent=2)
    if fmt == "sodacl":
        from datacontract_cli_spark.export_sodacl import to_sodacl_yaml
        return to_sodacl_yaml(contract, schema_name)
    if fmt == "dbt":
        from datacontract_cli_spark.export_dbt import to_dbt_models_yaml
        return to_dbt_models_yaml(contract)
    if fmt == "html":
        from datacontract_cli_spark.export_docs import to_html
        return to_html(contract)
    if fmt == "markdown":
        from datacontract_cli_spark.export_docs import to_markdown
        return to_markdown(contract)
    if fmt == "mermaid":
        from datacontract_cli_spark.export_docs import to_mermaid
        return to_mermaid(contract) or ""
    if fmt == "dcs":
        from datacontract_cli_spark.export_code import to_dcs_yaml
        return to_dcs_yaml(contract)
    raise ValueError(f"unsupported export format: {fmt}")


def make_handler(state: _ApiState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet by default
            pass

        def _reply(self, status: int, body: str,
                   content_type: str = "application/json") -> None:
            data = body.encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _body(self) -> str:
            length = int(self.headers.get("Content-Length", 0))
            if length > _MAX_BODY:
                raise ValueError("request body too large")
            return self.rfile.read(length).decode("utf-8")

        def do_POST(self):  # noqa: N802 — http.server API
            from datacontract_cli_spark.model.contract import load_contract_str

            url = urlparse(self.path)
            params = {k: v[0] for k, v in parse_qs(url.query).items()}
            try:
                if url.path == "/lint":
                    from datacontract_cli_spark.model.lint import lint_str
                    errors = lint_str(self._body())
                    self._reply(200, json.dumps({
                        "result": "failed" if errors else "passed",
                        "checks": errors,
                    }))
                elif url.path == "/export":
                    contract = load_contract_str(self._body())
                    fmt = params.get("format", "odcs")
                    text = _export_text(contract, fmt,
                                        params.get("schema", "all"))
                    self._reply(200, text, content_type="text/plain; charset=utf-8")
                elif url.path == "/changelog":
                    from datacontract_cli_spark.changelog import diff_contracts
                    import yaml as _yaml
                    payload = json.loads(self._body())
                    result = diff_contracts(_yaml.safe_load(payload["v1"]),
                                            _yaml.safe_load(payload["v2"]))
                    self._reply(200, json.dumps({
                        "summary": [{"path": e.path, "changeType": e.type.value}
                                    for e in result.summary],
                        "entries": [{"path": e.path, "changeType": e.type.value,
                                     "old_value": e.old_value,
                                     "new_value": e.new_value}
                                    for e in result.entries],
                    }, default=str))
                elif url.path == "/test":
                    from datacontract_cli_spark.engine.executor import SparkContractEngine
                    contract = load_contract_str(self._body())
                    engine = SparkContractEngine(
                        state.spark(),
                        include_failed_samples=params.get(
                            "include_failed_samples", "") == "true")
                    run = engine.test(contract,
                                      server=params.get("server"),
                                      schema_name=params.get("schema", "all"))
                    self._reply(200, run.to_json())
                else:
                    self._reply(404, json.dumps({"error": "not found"}))
            except Exception as e:  # bad contract/request — never kill the server
                self._reply(400, json.dumps({"error": str(e)}))

    return Handler


def serve(host: str = "127.0.0.1", port: int = 4242,
          master: Optional[str] = None, threaded: bool = True) -> HTTPServer:
    """Build the server (call ``serve_forever`` yourself, or use
    :func:`main` for the blocking CLI entry)."""
    cls = ThreadingHTTPServer if threaded else HTTPServer
    return cls((host, port), make_handler(_ApiState(master=master)))


def main(host: str = "127.0.0.1", port: int = 4242,
         master: Optional[str] = None) -> None:
    server = serve(host, port, master)
    print(f"datacontract api listening on http://{host}:{server.server_port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
