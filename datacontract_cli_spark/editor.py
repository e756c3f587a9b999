"""`datacontract edit`: a local web editor for one contract file.

Mirrors the reference's edit command (datacontract/command_edit.py:81-382):
the server renders an editor page for exactly one local YAML file, serves
the editor assets itself from a bundled directory under ``/editor/...``
(same-origin, offline — the reference does this because Monaco's web
workers refuse cross-origin construction; we keep the layout), exposes the
single-file API ``GET/PUT /api/files/{filename}`` (403 for any other
filename), ``GET /api/health`` and ``GET /api/config``, and doubles as the
editor's test runner by reusing the REST surface (`POST /lint`, `/test`,
`/export`, `/changelog` from :mod:`datacontract_cli_spark.api`).

Divergences, both deliberate: the bundled assets are a small self-authored
textarea editor rather than the reference's vendored datacontract-editor
npm build (we don't ship third-party bundles), and a missing file is
initialized non-interactively from the init template (the reference
prompts; this CLI is non-interactive throughout).
"""

from __future__ import annotations

import json
import mimetypes
import os
from http.server import HTTPServer, ThreadingHTTPServer
from pathlib import Path
from typing import Optional
from urllib.parse import quote, unquote, urlparse

from datacontract_cli_spark.api import _ApiState, make_handler

EDITOR_ASSETS_PATH = "/editor"
BUNDLED_EDITOR_ASSETS_DIR = Path(__file__).parent / "editor_assets"


def _generate_index_html(filename: str) -> str:
    """The editor page: load the YAML from the local file API, write it back
    on save, run lint/test against this server's own endpoints."""
    cfg = json.dumps({"filename": filename,
                      "fileApi": f"/api/files/{quote(filename)}"})
    return f"""<!doctype html>
<html lang="en">
  <head>
    <meta charset="UTF-8" />
    <meta name="viewport" content="width=device-width, initial-scale=1.0" />
    <title>{filename} - Data Contract Editor</title>
    <link href="{EDITOR_ASSETS_PATH}/editor.css" rel="stylesheet">
  </head>
  <body>
    <header>
      <h1>{filename}</h1>
      <div class="spacer"></div>
      <button id="lint">Lint</button>
      <button id="test">Run test</button>
      <button id="cancel">Cancel</button>
      <button id="save" class="primary">Save</button>
    </header>
    <main>
      <textarea id="yaml" spellcheck="false"></textarea>
      <div id="side">
        <h2>Problems</h2><div id="problems"></div>
        <h2>Test results</h2><pre id="results"></pre>
      </div>
    </main>
    <div id="notices"></div>
    <script>window.DC_EDITOR = {cfg};</script>
    <script src="{EDITOR_ASSETS_PATH}/editor.js"></script>
  </body>
</html>
"""


def make_editor_handler(state: _ApiState, file_path: Path,
                        assets_dir: Path = BUNDLED_EDITOR_ASSETS_DIR):
    """Handler = the REST API handler (POST /lint /test /export /changelog)
    plus the editor's GET/PUT surface."""
    Base = make_handler(state)
    filename = file_path.name

    class EditorHandler(Base):
        def _check_filename(self, requested: str) -> bool:
            # only the file passed to `datacontract edit` is accessible
            if requested != filename:
                self._reply(403, json.dumps({
                    "error": "Access denied. Only the specified target "
                             "file can be accessed."}))
                return False
            return True

        def do_GET(self):  # noqa: N802 — http.server API
            if not self._guard():  # DNS-rebinding guard (shared with POST)
                return
            url = urlparse(self.path)
            path = url.path
            try:
                if path == "/":
                    self._reply(200, _generate_index_html(filename),
                                content_type="text/html; charset=utf-8")
                elif path.startswith(EDITOR_ASSETS_PATH + "/"):
                    self._serve_asset(path[len(EDITOR_ASSETS_PATH) + 1:])
                elif path == "/api/health":
                    self._reply(200, json.dumps({"status": "ok"}))
                elif path == "/api/config":
                    self._reply(200, json.dumps({
                        "mode": "CLI", "filename": filename,
                        "filepath": str(file_path)}))
                elif path.startswith("/api/files/"):
                    requested = unquote(path[len("/api/files/"):])
                    if self._check_filename(requested):
                        self._reply(200, file_path.read_text(encoding="utf-8"),
                                    content_type="text/yaml; charset=utf-8")
                else:
                    self._reply(404, json.dumps({"error": "not found"}))
            except Exception as e:  # never kill the server on a bad request
                self._reply(400, json.dumps({"error": str(e)}))

        def do_PUT(self):  # noqa: N802
            if not self._guard():  # CSRF/rebinding guard on writes
                return
            url = urlparse(self.path)
            try:
                if url.path.startswith("/api/files/"):
                    requested = unquote(url.path[len("/api/files/"):])
                    if self._check_filename(requested):
                        file_path.write_text(self._body(), encoding="utf-8")
                        self._reply(200, json.dumps({
                            "success": True, "filename": filename}))
                else:
                    self._reply(404, json.dumps({"error": "not found"}))
            except Exception as e:
                self._reply(400, json.dumps({"error": str(e)}))

        def _serve_asset(self, asset_path: str) -> None:
            # the canonical path must stay within the assets directory
            # (reference command_edit.py:221-231)
            if ".." in asset_path or asset_path.startswith("/"):
                self._reply(404, json.dumps({"error": "not found"}))
                return
            root = os.path.realpath(assets_dir)
            target = os.path.realpath(os.path.join(root, asset_path))
            if not target.startswith(root + os.sep) or not os.path.isfile(target):
                self._reply(404, json.dumps(
                    {"error": f"Editor asset not found: {asset_path}"}))
                return
            content_type = (mimetypes.guess_type(target)[0]
                            or "application/octet-stream")
            with open(target, "rb") as f:
                data = f.read()
            self.send_response(200)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    return EditorHandler


def serve_editor(file_path: Path, host: str = "127.0.0.1", port: int = 4243,
                 master: Optional[str] = None,
                 threaded: bool = True) -> HTTPServer:
    """Build the editor server (call ``serve_forever`` yourself)."""
    cls = ThreadingHTTPServer if threaded else HTTPServer
    handler = make_editor_handler(_ApiState(master=master),
                                  Path(file_path).resolve())
    return cls((host, port), handler)


def main(location: str = "datacontract.yaml", host: str = "127.0.0.1",
         port: int = 4243, master: Optional[str] = None,
         open_browser: bool = False) -> int:
    from datacontract_cli_spark.cli import _INIT_TEMPLATE

    file_path = Path(location).resolve()
    if file_path.suffix not in (".yaml", ".yml"):
        print("error: file must be a YAML file (.yaml or .yml)")
        return 1
    if not file_path.exists():
        file_path.parent.mkdir(parents=True, exist_ok=True)
        file_path.write_text(_INIT_TEMPLATE, encoding="utf-8")
        print(f"data contract written to {location}")

    server = serve_editor(file_path, host=host, port=port, master=master)
    url = f"http://{'localhost' if host == '127.0.0.1' else host}:{server.server_port}"
    print(f"Editing: {file_path}")
    print(f"Data Contract Editor running at {url}")
    print("Press Ctrl+C to stop")
    if open_browser:
        import webbrowser
        webbrowser.open(url)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return 0
