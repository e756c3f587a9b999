"""CLI-level tests (reference layer 4: stdout + exit codes)."""

import json
import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(__file__)
REPO = os.path.dirname(HERE)
FIXTURE = os.path.join(HERE, "fixtures", "orders_diag")


def _prepare(tmp_path):
    shutil.copy(os.path.join(FIXTURE, "orders.csv"), tmp_path / "orders.csv")
    contract = open(os.path.join(FIXTURE, "datacontract.yaml")).read().replace(
        "{dir}", str(tmp_path)).replace("orders.csv", "{model}.csv")
    path = tmp_path / "contract.yaml"
    path.write_text(contract)
    return str(path)


def test_cli_test_exit_code_and_output(tmp_path):
    contract = _prepare(tmp_path)
    out_json = tmp_path / "results.json"
    proc = subprocess.run(
        [sys.executable, "-m", "datacontract_cli_spark", "test", contract,
         "--master", "local[2]", "--output", str(out_json)],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert proc.returncode == 1, proc.stdout + proc.stderr  # data has violations
    assert "Run result: failed" in proc.stdout
    results = json.loads(out_json.read_text())
    assert results["result"] == "failed"
    assert any(c["type"] == "field_max_length" and c["result"] == "failed"
               for c in results["checks"])


def test_cli_junit_output(tmp_path):
    contract = _prepare(tmp_path)
    out = tmp_path / "results.xml"
    proc = subprocess.run(
        [sys.executable, "-m", "datacontract_cli_spark", "test", contract,
         "--master", "local[2]", "--output", str(out), "--output-format", "junit"],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert proc.returncode == 1
    text = out.read_text()
    assert text.startswith("<?xml")
    assert "<failure" in text


def test_cli_lint(tmp_path):
    contract = _prepare(tmp_path)
    proc = subprocess.run(
        [sys.executable, "-m", "datacontract_cli_spark", "lint", contract],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert proc.returncode == 0
    assert "OK: 1 schema object(s), 3 properties" in proc.stdout


def test_cli_init(tmp_path, capsys, monkeypatch):
    from datacontract_cli_spark.cli import main
    from datacontract_cli_spark.model.lint import lint_str

    target = tmp_path / "datacontract.yaml"
    assert main(["init", str(target)]) == 0
    assert target.exists()
    assert lint_str(target.read_text()) == []  # template lints clean
    # refuses overwrite without the flag
    assert main(["init", str(target)]) == 1
    assert main(["init", str(target), "--overwrite"]) == 0
    # template copy
    src = tmp_path / "tpl.yaml"
    src.write_text("apiVersion: v3.1.0\nkind: DataContract\nid: x\nversion: 1.0.0\n")
    out2 = tmp_path / "c2.yaml"
    assert main(["init", str(out2), "--template", str(src)]) == 0
    assert out2.read_text().startswith("apiVersion")


def test_cli_catalog(tmp_path, capsys, monkeypatch):
    from datacontract_cli_spark.cli import main

    (tmp_path / "a.yaml").write_text(
        "apiVersion: v3.1.0\nkind: DataContract\nid: contract-a\n"
        "name: Contract A\nversion: 1.0.0\n"
        "schema:\n  - name: t1\n    properties:\n      - name: x\n"
        "        logicalType: string\n")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "b.yaml").write_text(
        "apiVersion: v3.1.0\nkind: DataContract\nid: contract-b\n"
        "version: 2.0.0\nschema:\n  - name: t2\n    properties: []\n")
    (tmp_path / "broken.yaml").write_text("]не yaml[")
    monkeypatch.chdir(tmp_path)
    assert main(["catalog", "--files", "*.yaml", "--output", "cat/"]) == 0
    out = capsys.readouterr().out
    assert "Skipped" in out  # broken file skipped, not fatal
    index = (tmp_path / "cat" / "index.html").read_text()
    assert "contract-a" in index and "contract-b" in index
    assert "a.html" in index and "b.html" in index
    page = (tmp_path / "cat" / "a.html").read_text()
    assert "<title>Contract A</title>" in page and "t1" in page


def test_cli_import_odcs_normalizes_legacy_dcs(tmp_path, capsys):
    """import --format dcs/odcs: the DCS->ODCS normalization lane."""
    from datacontract_cli_spark.cli import main

    p = tmp_path / "legacy.yaml"
    p.write_text(
        "dataContractSpecification: 1.1.0\n"
        "id: legacy-1\n"
        "info: {title: Legacy, version: 2.0.0}\n"
        "models:\n"
        "  t:\n"
        "    fields:\n"
        "      a: {type: bigint, required: true}\n")
    assert main(["import", "--format", "dcs", "--source", str(p)]) == 0
    out = capsys.readouterr().out
    assert "kind: DataContract" in out
    assert "logicalType: integer" in out      # bigint normalized
    assert "physicalType: bigint" in out      # raw type preserved
    assert main(["import", "--format", "odcs", "--source",
                 str(tmp_path / "none.yaml")]) == 1


def test_cli_curate_end_to_end(tmp_path):
    import json
    import subprocess
    import sys

    import duckdb

    src = str(tmp_path / "docs")
    out = str(tmp_path / "curated")
    duckdb.sql(
        "COPY (SELECT * FROM '/root/testdata/sf0.001/documents.parquet') "
        f"TO '{src}.parquet' (FORMAT PARQUET)")
    r = subprocess.run(
        [sys.executable, "-m", "datacontract_cli_spark", "curate",
         "--source", src + ".parquet", "--output", out,
         "--min-tokens", "5", "--split", '{"train":0.8,"valid":0.2}',
         "--pack-budget", "256", "--report"],
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "curated corpus written" in r.stdout
    stages = json.loads(r.stderr.strip().splitlines()[-1])
    assert stages[0]["stage"] == "input"
    got = duckdb.sql(
        f"SELECT count(*) n, count(DISTINCT split) s, "
        f"count(DISTINCT bin_id) b FROM '{out}/*/*.parquet'").fetchone()
    assert got[0] > 0 and got[1] == 2 and got[2] > 1


def test_cli_test_by_slice(tmp_path):
    contract = _prepare(tmp_path)
    proc = subprocess.run(
        [sys.executable, "-m", "datacontract_cli_spark", "test", contract,
         "--master", "local[2]", "--by", "order_id"],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert proc.returncode == 1, proc.stdout + proc.stderr
    assert "per-slice verdicts — orders by order_id:" in proc.stdout
    # order_id=2 has the bad-email row; its invalid-count slice must FAIL
    lines = [l for l in proc.stdout.splitlines() if "order_id=2" in l]
    assert any(l.strip().startswith("FAIL") for l in lines), proc.stdout
    assert "slice-checks failing" in proc.stdout
    # an unknown slice column degrades gracefully, not a crash
    proc2 = subprocess.run(
        [sys.executable, "-m", "datacontract_cli_spark", "test", contract,
         "--master", "local[2]", "--by", "nope"],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert proc2.returncode == 1
    assert "not in model" in proc2.stderr
