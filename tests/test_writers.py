import xml.etree.ElementTree as ET

from datacontract_cli_spark.model.run import Check, ResultEnum, Run
from datacontract_cli_spark.output import writers


def _run():
    r = Run(dataContractId="x", dataContractVersion="1")
    r.checks = [
        Check(key="a__f__t", category="schema", type="field_required", name="n1",
              model="a", field="f", result=ResultEnum.passed),
        Check(key="a__g__t", category="schema", type="field_enum", name="n2",
              model="a", field="g", result=ResultEnum.failed, reason="bad"),
        Check(key="b__h__t", category="quality", type="row_count", name="n3",
              model="b", result=ResultEnum.error, reason="boom"),
    ]
    return r.finish()


def test_console_table_sorted_worst_first():
    text = writers.console_table(_run())
    lines = [l for l in text.splitlines() if l.startswith("|")][1:]  # skip header
    assert "error" in lines[0]
    assert "failed" in lines[1]
    assert "passed" in lines[2]
    assert "Run result: error" in text


def test_junit_mapping():
    xml = writers.write_junit(_run())
    root = ET.fromstring(xml)
    suite = root.find("testsuite")
    assert suite.get("tests") == "3"
    assert suite.get("failures") == "1"
    assert suite.get("errors") == "1"
    cases = suite.findall("testcase")
    kinds = {c.get("name").split(":")[0]: [e.tag for e in c] for c in cases}
    assert kinds["a__f__t"] == []
    assert kinds["a__g__t"] == ["failure"]
    assert kinds["b__h__t"] == ["error"]


def test_exit_code():
    assert writers.exit_code(_run()) == 1
    ok = Run()
    ok.checks = [Check(key="k", category="schema", type="t", name="n",
                       result=ResultEnum.passed)]
    assert writers.exit_code(ok.finish()) == 0


def test_json_roundtrip():
    import json
    d = json.loads(writers.write_json(_run()))
    assert d["result"] == "error"
    assert len(d["checks"]) == 3
