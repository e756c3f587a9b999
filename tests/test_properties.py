"""Property-based tests (hypothesis) for the pure driver-side machinery."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from datacontract_cli_spark.checks.spec import Op, Threshold
from datacontract_cli_spark.checks.types import categories_compatible, normalize_type_name
from datacontract_cli_spark.operators.drift import psi_from_fractions
from datacontract_cli_spark.operators.tdigest import TDigest

finite = st.floats(allow_nan=False, allow_infinity=False, width=32)


@given(st.floats(allow_nan=False), st.floats(allow_nan=False))
def test_threshold_eq_ne_complementary(v, a):
    assert Threshold(Op.EQ, v).passes(a) != Threshold(Op.NE, v).passes(a)


@given(st.floats(allow_nan=False), st.floats(allow_nan=False), st.floats(allow_nan=False))
def test_threshold_between_consistent(lo, hi, a):
    lo, hi = min(lo, hi), max(lo, hi)
    b = Threshold(Op.BETWEEN, lo, hi).passes(a)
    nb = Threshold(Op.NOT_BETWEEN, lo, hi).passes(a)
    assert b != nb
    assert b == (lo <= a <= hi)


@given(st.text(max_size=40))
def test_normalize_never_raises_and_stays_in_categories(raw):
    out = normalize_type_name(raw)
    assert out is None or out in {
        "string", "integer", "number", "boolean", "timestamp", "date", "time",
        "object", "array",
    }


@given(st.sampled_from(["integer", "number"]), st.sampled_from(["integer", "number"]))
def test_integer_number_always_compatible(a, b):
    assert categories_compatible(a, b)


@given(st.dictionaries(st.text(min_size=1, max_size=5),
                       st.floats(min_value=0.001, max_value=1.0), min_size=1, max_size=8))
def test_psi_identity_is_zero(freqs):
    total = sum(freqs.values())
    norm = {k: v / total for k, v in freqs.items()}
    assert abs(psi_from_fractions(norm, dict(norm))) < 1e-9


@given(st.dictionaries(st.text(min_size=1, max_size=5),
                       st.floats(min_value=0.001, max_value=1.0), min_size=2, max_size=8),
       st.dictionaries(st.text(min_size=1, max_size=5),
                       st.floats(min_value=0.001, max_value=1.0), min_size=2, max_size=8))
def test_psi_nonnegative_and_finite(f1, f2):
    n1, n2 = sum(f1.values()), sum(f2.values())
    a = {k: v / n1 for k, v in f1.items()}
    b = {k: v / n2 for k, v in f2.items()}
    v = psi_from_fractions(a, b)
    assert math.isfinite(v)
    assert v > -1e-9  # PSI of normalized distributions is >= 0


@settings(max_examples=25, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6), min_size=10, max_size=2000))
def test_tdigest_quantiles_within_range_and_ordered(values):
    d = TDigest.of(np.asarray(values))
    qs = [d.quantile(q) for q in (0.1, 0.5, 0.9)]
    assert qs == sorted(qs)
    assert min(values) - 1e-6 <= qs[0] and qs[-1] <= max(values) + 1e-6


@settings(max_examples=20, deadline=None)
@given(st.lists(st.floats(min_value=0, max_value=1e4), min_size=20, max_size=1000),
       st.lists(st.floats(min_value=0, max_value=1e4), min_size=20, max_size=1000))
def test_tdigest_merge_weight_conserved(a, b):
    d = TDigest.of(np.asarray(a)).merge(TDigest.of(np.asarray(b)))
    assert abs(d.total_weight - (len(a) + len(b))) < 1e-6
