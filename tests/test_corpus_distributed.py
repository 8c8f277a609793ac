"""generate_pages_distributed: counter-based RNG ⇒ identical rows under
any partitioning (the property the scaling benchmark's corpus relies on)."""


def test_distributed_generator_partition_invariant(spark):
    from femto_spark.corpus import generate_pages_distributed

    a = {
        r["doc_id"]: (r["url"], r["text"], r["lang"])
        for r in generate_pages_distributed(spark, 300, seed=42).collect()
    }
    # different parallelism / partition count must not change content
    b_df = generate_pages_distributed(spark, 300, seed=42)
    b = {
        r["doc_id"]: (r["url"], r["text"], r["lang"])
        for r in b_df.repartition(3).collect()
    }
    assert a == b
    assert len(a) == 300
    # zipf skew present: t00000 much more frequent than t05000
    hot = sum(t[1].count("t00000 ") for t in a.values())
    cold = sum(t[1].count("t05000 ") for t in a.values())
    assert hot > 20 * max(cold, 1)


def test_distributed_generator_seed_sensitivity(spark):
    from femto_spark.corpus import generate_pages_distributed

    a = generate_pages_distributed(spark, 50, seed=42).collect()
    b = generate_pages_distributed(spark, 50, seed=43).collect()
    ta = {r["doc_id"]: r["text"] for r in a}
    tb = {r["doc_id"]: r["text"] for r in b}
    assert any(ta[i] != tb[i] for i in ta)
