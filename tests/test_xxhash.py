"""xxhash64 parity with Spark's JVM implementation (seed 42) — the bucket
pruning at query time depends on this being bit-exact."""

import random
import string

from pyspark.sql import functions as F


def test_xxhash64_matches_spark(spark):
    from femto_spark.xxhash import xxhash64

    rng = random.Random(7)
    samples = ["", "a", "the", "merge", "t00042", "naïve café 東京"]
    samples += [
        "".join(rng.choices(string.ascii_lowercase + string.digits, k=rng.randint(1, 40)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in samples:
        assert xxhash64(s.encode("utf-8")) == got[s], s


def test_term_bucket_matches_spark(spark):
    from femto_spark.xxhash import term_bucket

    terms = ["the", "data", "merge", "zzz", "t00001"]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {
        r["term"]: r["b"]
        for r in df.select(
            "term", F.pmod(F.xxhash64("term"), F.lit(16)).cast("int").alias("b")
        ).collect()
    }
    for t in terms:
        assert term_bucket(t, 16) == got[t], t


def test_murmur3_hash_long_matches_spark(spark):
    """steering.hash_long must equal F.hash on a single BIGINT column —
    exact shuffle steering depends on it."""
    from pyspark.sql import functions as F

    from femto_spark.index.steering import hash_long

    vals = [0, 1, -1, 42, 2**33, -(2**40), 123456789012345, -987654321,
            2**63 - 1, -(2**63)]
    rows = {
        r["v"]: r["h"]
        for r in spark.createDataFrame([(v,) for v in vals], "v long")
        .select("v", F.hash("v").alias("h"))
        .collect()
    }
    for v in vals:
        assert hash_long(v) == rows[v], v


def test_steering_values_land_exactly(spark):
    """repartition(n, steer_col) must place pid i's rows in partition i."""
    from pyspark.sql import functions as F

    from femto_spark.index.steering import steering_values

    n = 24
    magics = steering_values(n)
    df = spark.range(n).select(F.col("id").cast("int").alias("pid"))
    steer = F.element_at(
        F.array(*[F.lit(int(m)).cast("long") for m in magics]),
        F.col("pid") + 1,
    )
    parts = (
        df.withColumn("_steer", steer)
        .repartition(n, "_steer")
        .withColumn("part", F.spark_partition_id())
        .collect()
    )
    assert all(r["pid"] == r["part"] for r in parts)
