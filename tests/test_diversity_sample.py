"""Sign-bucket diversity sampling."""

from pyspark.sql import functions as F

from datacontract_cli_spark.operators.sampling import diversity_sample, sign_bucket


def test_sign_bucket_bits(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -1.0, 2.0]), (2, [-1.0, 1.0, 0.0])],
        "id long, v array<double>")
    rows = {r["id"]: r["b"] for r in
            df.select("id", sign_bucket(F.col("v"), 3).alias("b")).collect()}
    assert rows[1] == 0b101  # bits: v[0]>0, v[2]>0
    assert rows[2] == 0b010  # only v[1]>0 (0.0 is not > 0)


def test_diversity_sample_quota_and_determinism(spark):
    # 40 vectors in one dense region (same orthant) + 2 outliers: the dense
    # region must be capped at the quota, outliers always survive
    rows = [(i, [1.0, 1.0, float(i % 7 + 1)]) for i in range(40)]
    rows += [(100, [-1.0, -1.0, -1.0]), (101, [-1.0, 1.0, -5.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = diversity_sample(df, "embedding", "vec_id", quota=5, nbits=3)
    by_bucket = {}
    for r in out.collect():
        by_bucket.setdefault(r["bucket"], []).append(r["vec_id"])
    dense = by_bucket[0b111]
    assert len(dense) == 5           # capped
    assert sorted(by_bucket[0b000]) == [100]
    assert sorted(by_bucket[0b010]) == [101]
    # deterministic under different partitioning
    again = diversity_sample(df.repartition(7), "embedding", "vec_id",
                             quota=5, nbits=3)
    assert sorted(r["vec_id"] for r in again.collect()) == \
        sorted(r["vec_id"] for r in out.collect())
