"""`datacontract edit` — live local editor server: index page, bundled
assets (with traversal guard), single-file API (403 on other files),
health/config, and the piggy-backed /lint test-runner endpoint.

Reference: datacontract/command_edit.py (create_app, file API, asset
serving, same-origin test runner).
"""

import json
import threading
import urllib.error
import urllib.request
from pathlib import Path

import pytest

from datacontract_cli_spark import editor as editor_mod
from datacontract_cli_spark.api import _ApiState

CONTRACT = """\
apiVersion: v3.1.0
kind: DataContract
id: edit-live
version: 1.0.0
status: active
schema:
  - name: t
    properties:
      - name: id
        logicalType: integer
"""


@pytest.fixture()
def live_editor(tmp_path):
    path = tmp_path / "contract.yaml"
    path.write_text(CONTRACT)
    handler = editor_mod.make_editor_handler(_ApiState(), path)
    from http.server import ThreadingHTTPServer
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}", path
    server.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.read().decode(), r.headers.get("Content-Type", "")


def test_index_page(live_editor):
    base, _ = live_editor
    status, body, ctype = _get(base + "/")
    assert status == 200 and ctype.startswith("text/html")
    assert "contract.yaml" in body
    assert '/editor/editor.js' in body and '/editor/editor.css' in body
    assert '/api/files/contract.yaml' in body


def test_assets_served_with_content_type(live_editor):
    base, _ = live_editor
    status, body, ctype = _get(base + "/editor/editor.css")
    assert status == 200 and "text/css" in ctype and "--accent" in body
    status, body, ctype = _get(base + "/editor/editor.js")
    assert status == 200 and "javascript" in ctype and "DC_EDITOR" in body


def test_asset_traversal_guarded(live_editor):
    base, _ = live_editor
    for evil in ("/editor/../editor.py", "/editor/..%2Feditor.py",
                 "/editor/nope.js"):
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(base + evil)
        assert e.value.code == 404


def test_file_api_read_and_write(live_editor):
    base, path = live_editor
    status, body, ctype = _get(base + "/api/files/contract.yaml")
    assert status == 200 and body == CONTRACT and "text/yaml" in ctype

    req = urllib.request.Request(
        base + "/api/files/contract.yaml", method="PUT",
        data=(CONTRACT + "# edited\n").encode())
    with urllib.request.urlopen(req, timeout=10) as r:
        assert json.loads(r.read())["success"] is True
    assert path.read_text().endswith("# edited\n")


def test_file_api_forbids_other_files(live_editor):
    base, _ = live_editor
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base + "/api/files/other.yaml")
    assert e.value.code == 403
    req = urllib.request.Request(base + "/api/files/other.yaml",
                                 method="PUT", data=b"x")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 403


def test_rebinding_guard_on_editor_get_and_put(live_editor):
    # ADVICE r4: a remote page using DNS rebinding sends a non-local Host —
    # the file GET/PUT surface must refuse it
    base, path = live_editor
    before = path.read_text()
    for method, data in (("GET", None), ("PUT", b"pwned: true\n")):
        req = urllib.request.Request(base + "/api/files/contract.yaml",
                                     method=method, data=data,
                                     headers={"Host": "evil.example.com"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=10)
        assert e.value.code == 403
    assert path.read_text() == before  # the PUT never landed


def test_health_and_config(live_editor):
    base, path = live_editor
    assert json.loads(_get(base + "/api/health")[1])["status"] == "ok"
    cfg = json.loads(_get(base + "/api/config")[1])
    assert cfg["mode"] == "CLI" and cfg["filename"] == "contract.yaml"
    assert cfg["filepath"] == str(path)


def test_editor_doubles_as_test_runner(live_editor):
    # the REST surface (here: /lint) rides along on the same server, so the
    # editor's Run-test button hits its own origin (reference :286-288)
    base, _ = live_editor
    req = urllib.request.Request(base + "/lint", method="POST",
                                 data=CONTRACT.encode())
    with urllib.request.urlopen(req, timeout=10) as r:
        assert json.loads(r.read())["result"] == "passed"


def test_main_initializes_missing_file(tmp_path, monkeypatch, capsys):
    # non-interactive init lane: missing file -> template written, then serve;
    # stub serve_forever so main returns immediately
    class _Stub:
        server_port = 9
        def serve_forever(self):
            raise KeyboardInterrupt
        def shutdown(self):
            pass
    monkeypatch.setattr(editor_mod, "serve_editor",
                        lambda *a, **k: _Stub())
    target = tmp_path / "new.yaml"
    assert editor_mod.main(str(target)) == 0
    assert "kind: DataContract" in target.read_text()
    assert editor_mod.main(str(tmp_path / "bad.txt")) == 1
