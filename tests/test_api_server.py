"""REST API entry point (reference datacontract/api.py semantics) served by
the stdlib handler — exercised against a LIVE local server: lint, export,
changelog, test (with a dataframe server bound to temp views on the shared
session), and error behavior."""

import json
import threading
import urllib.request

import pytest

from datacontract_cli_spark import api as api_mod

CONTRACT = """
apiVersion: v3.1.0
kind: DataContract
id: api-live
version: 1.0.0
status: active
servers:
  - server: df
    type: dataframe
schema:
  - name: api_orders
    properties:
      - name: id
        logicalType: integer
        required: true
        primaryKey: true
      - name: status
        logicalType: string
        logicalTypeOptions:
          enum: [open, closed]
"""


@pytest.fixture()
def live_api(spark):
    from http.server import ThreadingHTTPServer

    # the /test lane must reuse the test session (no second JVM)
    state = api_mod._ApiState()
    state._spark = spark
    server = ThreadingHTTPServer(("127.0.0.1", 0), api_mod.make_handler(state))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def _post(url: str, body: str):
    req = urllib.request.Request(url, data=body.encode(), method="POST")
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, resp.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_api_lint(live_api):
    status, body = _post(f"{live_api}/lint", CONTRACT)
    assert status == 200
    doc = json.loads(body)
    assert doc["result"] == "passed" and doc["checks"] == []
    status, body = _post(f"{live_api}/lint", "schema: {not: [valid")
    assert status in (200, 400)


def test_api_export(live_api):
    status, body = _post(f"{live_api}/export?format=jsonschema", CONTRACT)
    assert status == 200
    assert "id" in json.loads(body)["properties"]
    status, body = _post(f"{live_api}/export?format=mermaid", CONTRACT)
    assert status == 200 and body.startswith("erDiagram")
    status, body = _post(f"{live_api}/export?format=nope", CONTRACT)
    assert status == 400


def test_api_changelog(live_api):
    v2 = CONTRACT.replace("version: 1.0.0", "version: 2.0.0")
    status, body = _post(f"{live_api}/changelog",
                         json.dumps({"v1": CONTRACT, "v2": v2}))
    assert status == 200
    doc = json.loads(body)
    assert doc["summary"] == [{"path": "version", "changeType": "Updated"}]


def test_api_test_endpoint(live_api, spark):
    rows = [(1, "open"), (2, "closed"), (3, "bogus"), (None, "open")]
    spark.createDataFrame(rows, "id int, status string") \
        .createOrReplaceTempView("api_orders")
    status, body = _post(f"{live_api}/test?server=df", CONTRACT)
    assert status == 200
    doc = json.loads(body)
    assert doc["result"] == "failed"
    by_key = {c["key"]: c for c in doc["checks"]}
    assert by_key["api_orders__id__field_required"]["result"] == "failed"
    assert by_key["api_orders__status__field_enum"]["result"] == "failed"


def test_api_unknown_path_and_bad_contract(live_api):
    status, _ = _post(f"{live_api}/nope", "x")
    assert status == 404
    status, body = _post(f"{live_api}/test", "]not yaml[")
    assert status == 400
    assert "error" in json.loads(body)


def _post_headers(url: str, body: str, headers: dict):
    req = urllib.request.Request(url, data=body.encode(), method="POST",
                                 headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, resp.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_api_rejects_non_local_host_and_origin(live_api):
    # ADVICE r4: DNS-rebinding / CSRF guard on the loopback-bound server
    status, body = _post_headers(f"{live_api}/lint", CONTRACT,
                                 {"Host": "evil.example.com"})
    assert status == 403 and "forbidden" in body
    status, body = _post_headers(f"{live_api}/lint", CONTRACT,
                                 {"Origin": "https://evil.example.com"})
    assert status == 403 and "cross-site" in body
    # a local Origin (same-origin fetch from the editor UI) stays allowed
    origin = live_api  # http://127.0.0.1:<port>
    status, _ = _post_headers(f"{live_api}/lint", CONTRACT,
                              {"Origin": origin})
    assert status == 200


def test_api_credential_headers_scoped_to_request(live_api, spark, tmp_path):
    # verdict r4 #8 (reference api.py config_from_headers): a
    # datacontract-* header becomes a request-scoped env credential visible
    # to the engine's source lane, and is gone after the request.
    import os
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    seen_auth = []

    class DataHandler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def do_GET(self):
            seen_auth.append(self.headers.get("Authorization"))
            payload = b'[{"id": 1, "status": "open"}]'
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    data_srv = ThreadingHTTPServer(("127.0.0.1", 0), DataHandler)
    threading.Thread(target=data_srv.serve_forever, daemon=True).start()
    try:
        contract = CONTRACT.replace(
            "  - server: df\n    type: dataframe",
            f"  - server: upstream\n    type: api\n"
            f"    location: http://127.0.0.1:{data_srv.server_port}/data")
        assert "DATACONTRACT_API_HEADER_AUTHORIZATION" not in os.environ
        status, body = _post_headers(
            f"{live_api}/test?server=upstream", contract,
            {"datacontract-api-header-authorization": "Bearer sekrit-123"})
        assert status == 200
        run = json.loads(body)
        assert run["result"] in ("passed", "failed")
        assert seen_auth and seen_auth[0] == "Bearer sekrit-123"
        # scoped: the credential does not outlive the request
        assert "DATACONTRACT_API_HEADER_AUTHORIZATION" not in os.environ
        # and never appears in the response payload
        assert "sekrit-123" not in body
    finally:
        data_srv.shutdown()
