"""Layer-1 unit tests: the check compiler, pure Python, no Spark."""

import os

from datacontract_cli_spark.checks.compile import compile_checks, prepare_query
from datacontract_cli_spark.checks.spec import MetricType, Op, Threshold
from datacontract_cli_spark.model.contract import QualityRule, load_contract

HERE = os.path.dirname(__file__)


def _contract():
    return load_contract(os.path.join(HERE, "fixtures", "transcripts_contract.yaml"))


def test_compile_check_inventory():
    checks = compile_checks(_contract(), None)
    keys = [c.key for c in checks]
    assert "transcripts__conv_id__field_is_present" in keys
    assert "transcripts__conv_id__field_type" in keys
    assert "transcripts__conv_id__field_required" in keys
    assert "transcripts__conv_id__field_regex" in keys
    assert "transcripts__turn_idx__field_minimum" in keys
    assert "transcripts__role__field_enum" in keys
    assert "transcripts__text__field_max_length" in keys
    assert "transcripts__primary_key_unique" in keys
    assert "transcripts__row_count" in keys
    # composite PK => no per-field field_primary_key_unique
    assert "transcripts__conv_id__field_primary_key_unique" not in keys
    assert len(checks) == 22


def test_composite_pk_columns_ordered_by_position():
    checks = compile_checks(_contract(), None)
    pk = next(c for c in checks if c.type == "primary_key_unique")
    assert pk.columns == ["conv_id", "turn_idx"]
    assert pk.metric is MetricType.DUPLICATE_COUNT
    assert pk.threshold.op is Op.EQ and pk.threshold.value == 0


def test_default_dimensions_assigned():
    checks = compile_checks(_contract(), None)
    by_key = {c.key: c for c in checks}
    assert by_key["transcripts__conv_id__field_required"].dimension == "completeness"
    assert by_key["transcripts__role__field_enum"].dimension == "conformity"
    assert by_key["transcripts__primary_key_unique"].dimension == "uniqueness"


def test_threshold_semantics():
    assert Threshold(Op.EQ, 0).passes(0)
    assert not Threshold(Op.EQ, 0).passes(1)
    assert not Threshold(Op.EQ, 0).passes(None)
    assert Threshold(Op.BETWEEN, 1, 3).passes(2)
    assert not Threshold(Op.NOT_BETWEEN, 1, 3).passes(2)
    assert Threshold(Op.GT, 5).describe() == "> 5"
    assert Threshold(Op.BETWEEN, 1, 3).describe() == "between 1 and 3"


def test_prepare_query_placeholders():
    q = QualityRule(type="sql", query="SELECT count(*) FROM {model} WHERE ${field} IS NULL")
    out = prepare_query(q, "orders", "email", None)
    assert out == "SELECT count(*) FROM orders WHERE email IS NULL"
    # quoted placeholders lose their quotes
    q2 = QualityRule(type="sql", query="SELECT '{model}'.x FROM \"{table}\"")
    assert prepare_query(q2, "t1", None, None) == "SELECT t1.x FROM t1"


def test_percent_unit_check():
    q = QualityRule(metric="nullValues", must_be_le=5, unit="percent")
    from datacontract_cli_spark.checks.compile import is_percent_unit

    assert is_percent_unit(q)
    assert not is_percent_unit(QualityRule(metric="nullValues", must_be_le=5))


def test_threshold_eq_ne_numeric_string_coercion():
    # YAML `mustBe: 1e12` parses as the STRING '1e12'; == on a float is
    # False without a TypeError, so EQ/NE need their own coercion
    from datacontract_cli_spark.checks.spec import Op, Threshold
    assert Threshold(Op.EQ, "1e12").passes(1e12)
    assert not Threshold(Op.NE, "1e12").passes(1e12)
    assert Threshold(Op.NE, "1e12").passes(5.0)
    # genuine string comparison still works
    assert Threshold(Op.EQ, "abc").passes("abc")
    assert not Threshold(Op.EQ, "abc").passes("xyz")
    # non-numeric string vs number stays unequal
    assert not Threshold(Op.EQ, "abc").passes(3.0)
