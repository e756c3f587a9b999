"""HTTP publish of test results against a live local endpoint — the
reference's publish step (integration/entropy_data.py:12-55) re-expressed
with stdlib urllib."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from datacontract_cli_spark.model.run import Check, ResultEnum, Run
from datacontract_cli_spark.output.publish import publish_test_results


@pytest.fixture()
def http_capture():
    captured = {}

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            captured["path"] = self.path
            captured["api_key"] = self.headers.get("x-api-key")
            captured["content_type"] = self.headers.get("Content-Type")
            length = int(self.headers.get("Content-Length", 0))
            captured["body"] = json.loads(self.rfile.read(length))
            status = 500 if self.path.endswith("/fail") else 200
            self.send_response(status)
            self.end_headers()
            self.wfile.write(b"{}")

        def do_PUT(self):
            self.do_POST()

        def log_message(self, *a):  # silence
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield server.server_port, captured
    server.shutdown()


def _run():
    run = Run(dataContractId="pub-test", dataContractVersion="1.0.0")
    run.checks.append(Check(key="k", category="schema", type="row_count",
                            name="rows", model="m", result=ResultEnum.passed))
    return run.finish()


def test_publish_success(http_capture):
    port, captured = http_capture
    run = _run()
    ok = publish_test_results(run, f"http://127.0.0.1:{port}/api/test-results",
                              api_key="secret")
    assert ok is True
    assert captured["api_key"] == "secret"
    assert captured["content_type"] == "application/json"
    assert captured["body"]["dataContractId"] == "pub-test"
    assert captured["body"]["checks"][0]["result"] == "passed"
    assert any("Published test results successfully" == l.message for l in run.logs)


def test_publish_http_error_logged_not_raised(http_capture):
    port, _ = http_capture
    run = _run()
    ok = publish_test_results(run, f"http://127.0.0.1:{port}/fail")
    assert ok is False
    assert any(l.level == "error" and "publishing" in l.message.lower() for l in run.logs)


def test_publish_unreachable_logged_not_raised():
    run = _run()
    ok = publish_test_results(run, "http://127.0.0.1:1/nothing", timeout=0.5)
    assert ok is False
    assert any(l.level == "error" for l in run.logs)


def test_publish_requires_contract_id():
    run = Run()
    run.finish()
    assert publish_test_results(run, "http://127.0.0.1:9/x") is False
    assert any("unknown data contract ID" in l.message for l in run.logs)


def test_publish_data_contract_put(http_capture):
    from datacontract_cli_spark.output.publish import publish_data_contract

    port, captured = http_capture
    doc = {"id": "my-contract", "kind": "DataContract", "version": "1.0.0"}
    ok = publish_data_contract(doc, f"http://127.0.0.1:{port}", api_key="k1")
    assert ok
    assert captured["path"] == "/api/datacontracts/my-contract"
    assert captured["api_key"] == "k1"
    assert captured["body"]["id"] == "my-contract"
    assert not publish_data_contract({}, f"http://127.0.0.1:{port}")


def test_cli_publish(http_capture, tmp_path, capsys):
    from datacontract_cli_spark.cli import main

    port, captured = http_capture
    p = tmp_path / "c.yaml"
    p.write_text("apiVersion: v3.1.0\nkind: DataContract\nid: pub-c\n"
                 "version: 1.0.0\nschema: []\n")
    rc = main(["publish", str(p), "--host", f"http://127.0.0.1:{port}"])
    assert rc == 0
    assert captured["path"] == "/api/datacontracts/pub-c"
    rc = main(["publish", str(tmp_path / "missing.yaml"),
               "--host", f"http://127.0.0.1:{port}"])
    assert rc == 1
