// Minimal data-contract editor client. The page passes {filename, fileApi}
// via window.DC_EDITOR. Save writes back through PUT /api/files/<name>;
// Lint / Test post the buffer to the server's own /lint and /test
// endpoints (the same stdlib REST surface `datacontract api` serves).
(function () {
  const cfg = window.DC_EDITOR;
  const yamlEl = document.getElementById("yaml");
  const problemsEl = document.getElementById("problems");
  const resultsEl = document.getElementById("results");

  function notify(kind, message) {
    const el = document.createElement("div");
    el.className = "notice " + kind;
    el.textContent = message;
    document.getElementById("notices").appendChild(el);
    setTimeout(() => el.remove(), 4000);
  }

  async function load() {
    const r = await fetch(cfg.fileApi);
    if (!r.ok) throw new Error("Failed to load file: " + r.statusText);
    yamlEl.value = await r.text();
  }

  async function save() {
    const r = await fetch(cfg.fileApi, {
      method: "PUT",
      headers: { "Content-Type": "text/yaml" },
      body: yamlEl.value,
    });
    if (!r.ok) { notify("error", "Failed to save " + cfg.filename); return; }
    notify("success", "Saved " + cfg.filename);
  }

  async function cancel() {
    try { await load(); notify("info", "Discarded changes, reloaded " + cfg.filename); }
    catch (e) { notify("error", "Failed to reload: " + e.message); }
  }

  async function lint() {
    problemsEl.textContent = "linting…";
    const r = await fetch("/lint", { method: "POST", body: yamlEl.value });
    const data = await r.json();
    if (!r.ok) { problemsEl.textContent = data.error || "lint failed"; return; }
    problemsEl.innerHTML = "";
    if (!data.checks.length) { problemsEl.textContent = "no problems"; return; }
    for (const p of data.checks) {
      const li = document.createElement("div");
      li.className = "problem";
      li.textContent = p;
      problemsEl.appendChild(li);
    }
  }

  async function runTest() {
    resultsEl.textContent = "running…";
    const r = await fetch("/test", { method: "POST", body: yamlEl.value });
    const data = await r.json();
    if (!r.ok) { resultsEl.textContent = data.error || "test failed"; return; }
    const lines = (data.checks || []).map(
      (c) => c.result + "  " + c.key + (c.reason ? "  — " + c.reason : "")
    );
    resultsEl.textContent = "result: " + data.result + "\n" + lines.join("\n");
  }

  document.getElementById("save").addEventListener("click", save);
  document.getElementById("cancel").addEventListener("click", cancel);
  document.getElementById("lint").addEventListener("click", lint);
  document.getElementById("test").addEventListener("click", runTest);
  load().catch((e) => {
    document.body.textContent = "Failed to load " + cfg.filename + ": " + e.message;
  });
})();
