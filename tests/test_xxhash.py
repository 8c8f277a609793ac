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
