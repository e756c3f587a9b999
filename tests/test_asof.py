import datetime as dt

import pytest

from datacontract_cli_spark.operators.asof import asof_join, asof_join_pandas


@pytest.fixture(scope="module")
def frames(spark):
    trades = spark.createDataFrame(
        [("A", 10, 100.0), ("A", 20, 101.0), ("A", 35, 102.0),
         ("B", 15, 50.0), ("B", 5, 49.0)],
        "sym string, t bigint, trade_px double",
    )
    quotes = spark.createDataFrame(
        [("A", 8, 99.5), ("A", 19, 100.5), ("A", 30, 101.5),
         ("B", 10, 48.5)],
        "sym string, t bigint, quote_px double",
    )
    return trades, quotes


EXPECTED = {
    ("A", 10): 99.5, ("A", 20): 100.5, ("A", 35): 101.5,
    ("B", 15): 48.5, ("B", 5): None,
}


def test_asof_join_window_strategy(frames):
    trades, quotes = frames
    out = asof_join(trades, quotes, on="t", by="sym")
    got = {(r["sym"], r["t"]): r["quote_px"] for r in out.collect()}
    assert got == EXPECTED
    assert out.count() == trades.count()  # left join: every trade survives


def test_asof_join_pandas_strategy(frames):
    trades, quotes = frames
    out = asof_join_pandas(trades, quotes, on="t", by="sym")
    got = {(r["sym"], r["t"]): r["quote_px"] for r in out.collect()}
    assert got == EXPECTED


def test_asof_join_no_by(spark):
    left = spark.createDataFrame([(10,), (25,)], "t bigint")
    right = spark.createDataFrame([(5, "x"), (20, "y")], "t bigint, v string")
    out = asof_join(left, right, on="t")
    got = {r["t"]: r["v"] for r in out.collect()}
    assert got == {10: "x", 25: "y"}


def test_asof_exact_timestamp_matches_take_right(spark):
    # right.on == left.on counts as "at or before"
    left = spark.createDataFrame([("A", 10)], "sym string, t bigint")
    right = spark.createDataFrame([("A", 10, 1.5)], "sym string, t bigint, v double")
    out = asof_join(left, right, on="t", by="sym").collect()
    assert out[0]["v"] == 1.5


def test_salted_equivalence(spark):
    """asof_join_salted must produce exactly the window formulation's rows
    (incl. null right-values carried across bucket boundaries)."""
    import random

    from datacontract_cli_spark.operators.asof import asof_join, asof_join_salted

    random.seed(11)
    lrows = [(f"u{random.randint(0, 15)}", float(random.randint(0, 500)), i)
             for i in range(1500)]
    rrows, seen = [], set()
    for _ in range(500):
        key = (f"u{random.randint(0, 15)}", float(random.randint(0, 500)))
        if key in seen:
            continue
        seen.add(key)
        rrows.append((*key, None if random.random() < 0.15 else random.random()))
    L = spark.createDataFrame(lrows, "user string, t double, lid int")
    R = spark.createDataFrame(rrows, "user string, t double, val double")
    a = asof_join(L, R, on="t", by="user").orderBy("lid").collect()
    b = asof_join_salted(L, R, on="t", by="user", n_buckets=7).orderBy("lid").collect()
    assert a == b
    # degenerate cases: single bucket, empty right side
    c = asof_join_salted(L, R, on="t", by="user", n_buckets=1).orderBy("lid").collect()
    assert a == c
    empty = asof_join_salted(L, R.filter("1=0"), on="t", by="user").collect()
    assert all(r["val"] is None for r in empty) and len(empty) == 1500


def test_salted_no_by(spark):
    from datacontract_cli_spark.operators.asof import asof_join, asof_join_salted
    L = spark.createDataFrame([(float(i), i) for i in range(50)], "t double, lid int")
    R = spark.createDataFrame([(10.0, 1.0), (30.0, 2.0)], "t double, val double")
    a = asof_join(L, R, on="t").orderBy("lid").collect()
    b = asof_join_salted(L, R, on="t", n_buckets=4).orderBy("lid").collect()
    assert a == b


def test_asof_forward_and_tolerance_match_pandas(spark):
    """Differential oracle: pandas merge_asof over the same frames for every
    (direction, tolerance) combination."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n_l, n_r = 400, 150
    lp = pd.DataFrame({
        "user_id": rng.integers(0, 10, n_l),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 100_000, n_l), unit="s"),
    }).sort_values(["ts"]).reset_index(drop=True)
    lp["row_id"] = range(n_l)
    rp = pd.DataFrame({
        "user_id": rng.integers(0, 10, n_r),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 100_000, n_r), unit="s"),
        "val": rng.integers(0, 1000, n_r).astype("float64"),
    }).sort_values(["ts"]).reset_index(drop=True)

    left = spark.createDataFrame(lp)
    right = spark.createDataFrame(rp)
    for direction in ("backward", "forward"):
        for tol in (None, 3600.0):
            got = asof_join(left, right, on="ts", by="user_id",
                                 value_cols=["val"], direction=direction,
                                 tolerance_seconds=tol)
            gmap = {r["row_id"]: r["val"] for r in got.collect()}
            want = pd.merge_asof(
                lp.sort_values("ts"), rp.sort_values("ts"), on="ts",
                by="user_id", direction=direction,
                tolerance=None if tol is None else pd.Timedelta(seconds=tol))
            for _, row in want.iterrows():
                g = gmap[row["row_id"]]
                w = None if pd.isna(row["val"]) else row["val"]
                assert g == w, (direction, tol, row["row_id"], g, w)


def test_asof_rejects_unknown_direction(spark):
    from pyspark.sql import functions as F
    df = spark.range(1).select(F.col("id"), F.current_timestamp().alias("ts"))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        asof_join(df, df, on="ts", direction="nearest")
