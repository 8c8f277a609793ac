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


def test_read_fasta_and_zero_delimited(spark, tmp_path):
    fasta = tmp_path / "seqs.fa"
    fasta.write_text(
        ">seq1 first sequence\nACGT\nACGT\n>seq2\nTTTT\n>seq3 third one\nGG\nGG\nGG\n"
    )
    from femto_spark.corpus import read_fasta, read_zero_delimited

    rows = {
        r["seq_id"]: (r["description"], r["sequence"])
        for r in read_fasta(spark, str(fasta)).collect()
    }
    assert rows == {
        "seq1": ("first sequence", "ACGTACGT"),
        "seq2": ("", "TTTT"),
        "seq3": ("third one", "GGGGGG"),
    }

    zpath = tmp_path / "recs.bin"
    zpath.write_bytes(b"alpha doc\x00beta doc\x00\x00gamma\x00")
    recs = [r["record"] for r in read_zero_delimited(spark, str(zpath)).collect()]
    assert sorted(recs) == ["alpha doc", "beta doc", "gamma"]
