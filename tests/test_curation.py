"""Semantic checks for the curation surface (plans/curation.py) beyond
the automatic DuckDB parity in test_oracle_parity.py: the parity test
proves Spark == oracle; these prove the shared semantics are the
*intended* ones (counts actually fire, bounds hold, invariants hold)."""

from __future__ import annotations

from pyspark.sql import functions as F

from project2_bigdata_spark.plans import REGISTRY


def _run(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


def test_pii_redact_actually_redacts(spark, sf_dir):
    df = _run("pii_redact", spark, sf_dir).cache()
    agg = df.agg(
        F.sum("n_emails").alias("e"),
        F.sum("n_ipv4").alias("i"),
        F.sum("n_phones").alias("p"),
    ).first()
    # synthesized PII fires on doc_id % 7 / % 11 / % 13 — all three
    # detectors must observe at least one hit each
    assert agg["e"] > 0 and agg["i"] > 0 and agg["p"] > 0
    # a doc with synthesized PII must hash differently from its clean twin
    clean = df.filter(
        (F.col("n_emails") == 0) & (F.col("n_ipv4") == 0) & (F.col("n_phones") == 0)
    ).count()
    assert 0 < clean < df.count()
    df.unpersist()


def test_span_dedup_finds_exact_dup_docs(spark, sf_dir):
    """Exact duplicate documents (which dedup_exact proves exist) share
    every 10-word span, so span-level dedup must flag spans — and every
    flagged span must appear in >= 2 distinct docs."""
    spans = _run("span_dedup_crossdoc", spark, sf_dir)
    dup_docs = (
        _run("dedup_exact", spark, sf_dir).filter(F.col("n_copies") > 1).count()
    )
    if dup_docs > 0:
        assert spans.count() > 0
    assert spans.filter(F.col("n_docs") < 2).count() == 0


def test_temperature_sample_monotone_rates(spark, sf_dir):
    rows = _run("temperature_sample", spark, sf_dir).collect()
    by_lang = {r["lang"]: r for r in rows}
    # the largest language gets the base rate 0.5; smaller languages get
    # strictly-higher rates; realized keep fraction tracks the rate
    biggest = max(rows, key=lambda r: r["n_in"])
    assert abs(biggest["rate"] - 0.5) < 1e-9
    for r in rows:
        assert 0.5 <= r["rate"] <= 1.0
        if r["n_in"] < biggest["n_in"]:
            assert r["rate"] > biggest["rate"]
        # binomial(n, rate) should land within a generous 5-sigma band
        import math

        sigma = math.sqrt(r["n_in"] * r["rate"] * (1 - r["rate"])) or 1.0
        assert abs(r["n_kept"] - r["n_in"] * r["rate"]) <= 5 * sigma + 1
    assert set(by_lang) == {"en", "fr", "de", "es", "zh"}


def test_hash_split_partitions_the_corpus(spark, sf_dir):
    from project2_bigdata_spark.catalog import table

    df = _run("hash_split_assign", spark, sf_dir).cache()
    total = table(spark, sf_dir, "documents").count()
    # splits partition the corpus exactly (no doc lost or double-assigned)
    assert df.agg(F.sum("n_docs")).first()[0] == total
    splits = {r["split"] for r in df.select("split").distinct().collect()}
    assert splits == {"train", "val", "test"}
    # train must dominate (240/256 expected)
    per = df.groupBy("split").agg(F.sum("n_docs").alias("n")).collect()
    n = {r["split"]: r["n"] for r in per}
    assert n["train"] > 10 * max(n["val"], n["test"])
    df.unpersist()


def test_embedding_quantize_bounds(spark, sf_dir):
    df = _run("embedding_quantize", spark, sf_dir).cache()
    # int8 range respected, dim matches the corpus, error bounded by
    # (scale/2)^2 per element
    bad = df.filter((F.col("q_min") < -127) | (F.col("q_max") > 127)).count()
    assert bad == 0
    assert df.filter(F.col("dim") != 64).count() == 0
    over = df.filter(
        F.col("mse") > (F.col("scale_r") / 2) * (F.col("scale_r") / 2) + 1e-9
    ).count()
    assert over == 0
    df.unpersist()


def test_top_bigrams_shape(spark, sf_dir):
    df = _run("top_bigrams", spark, sf_dir).cache()
    # exactly 5 ranks per language, ranks are 1..5, counts non-increasing
    per = df.groupBy("lang").agg(
        F.count("*").alias("k"),
        F.min("rnk").alias("lo"),
        F.max("rnk").alias("hi"),
    )
    assert per.filter((F.col("k") != 5) | (F.col("lo") != 1) | (F.col("hi") != 5)).count() == 0
    rows = df.orderBy("lang", "rnk").collect()
    for a, b in zip(rows, rows[1:]):
        if a["lang"] == b["lang"]:
            assert a["n"] >= b["n"]
    df.unpersist()


def test_snapshot_diff_classification(spark, sf_dir):
    from project2_bigdata_spark.catalog import table

    df = _run("snapshot_diff", spark, sf_dir).cache()
    # inserted ⇔ no old spend; unchanged ⇔ old == new exactly
    assert df.filter(
        (F.col("change_type") == "inserted") & F.col("old_spend").isNotNull()
    ).count() == 0
    assert df.filter(
        (F.col("change_type") == "unchanged")
        & (F.col("old_spend") != F.col("new_spend"))
    ).count() == 0
    assert df.filter(
        (F.col("change_type") == "updated")
        & (F.col("old_spend") == F.col("new_spend"))
    ).count() == 0
    # every customer with a pre-1998 order is classified exactly once
    o = table(spark, sf_dir, "orders")
    expect = o.filter(F.col("o_orderdate") < "1998-01-01").select("o_custkey").distinct().count()
    assert df.count() == expect
    df.unpersist()


def test_key_skew_profile_top10(spark, sf_dir):
    df = _run("key_skew_profile", spark, sf_dir)
    rows = df.orderBy("rnk").collect()
    assert [r["rnk"] for r in rows] == list(range(1, 11))
    for a, b in zip(rows, rows[1:]):
        assert a["n_orders"] >= b["n_orders"]
    assert all(0 < r["share"] < 1 for r in rows)


def test_bigram_score_docs_and_bounds(spark, sf_dir):
    """One row per multi-token doc; smoothed conditional probabilities
    are < 1 so every logprob is negative; n_bigrams = n_tokens - 1."""
    from project2_bigdata_spark.catalog import table

    df = _run("bigram_logprob_score", spark, sf_dir)
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_toks")
    )
    joined = df.join(d, "doc_id").collect()
    assert len(joined) == d.filter(F.col("n_toks") >= 2).count()
    for r in joined:
        assert r.n_bigrams == r.n_toks - 1
        assert r.avg_logprob < 0.0


def test_contrastive_negatives_shape(spark, sf_dir):
    """Exactly 4 negatives per anchor, all in-range, never the anchor
    itself, and the draw is deterministic across runs."""
    from project2_bigdata_spark.catalog import table

    df = _run("contrastive_negatives", spark, sf_dir)
    n = table(spark, sf_dir, "embeddings").count()
    rows = df.collect()
    assert len(rows) == 4 * n
    per_anchor = {}
    for r in rows:
        assert 0 <= r.neg_id < n
        assert r.neg_id != r.vec_id
        assert (r.neg_label == r.anchor_label) == r.label_collision
        per_anchor.setdefault(r.vec_id, set()).add(r.k)
    assert all(ks == {0, 1, 2, 3} for ks in per_anchor.values())


def test_split_leakage_detects_cross_split_twin(spark, tmp_path):
    """The sf testdata happens to contain no cross-split exact twins, so
    the parity test only proves the zero case; this constructs a
    train/val twin and checks the leak actually fires."""
    import hashlib

    def assigned(i: int) -> str:
        h = hashlib.md5(f"split:{i}".encode()).hexdigest()[:2]
        return "train" if h < "f0" else ("val" if h < "f8" else "test")

    pick = {}
    for i in range(4096):
        pick.setdefault(assigned(i), i)
        if len(pick) == 3:
            break
    rows = [
        (pick["train"], "the shared secret text", "en", "srcA", 22),
        (pick["val"], "the shared secret text", "en", "srcB", 22),
        (pick["test"], "something else entirely", "en", "srcC", 23),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars int"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.split: r for r in _run("split_leakage", spark, str(tmp_path)).collect()}
    assert out["val"].n_docs == 1 and out["val"].n_leaked == 1
    assert out["val"].leak_rate == 1.0
    assert out["test"].n_docs == 1 and out["test"].n_leaked == 0
    assert out["test"].leak_rate == 0.0


def test_split_divergence_train_is_zero(spark, sf_dir):
    out = {r.split: r for r in _run("split_divergence", spark, sf_dir).collect()}
    assert set(out) == {"train", "val", "test"}
    assert out["train"].kl_vs_train == 0.0
    assert out["val"].kl_vs_train > 0.0 and out["test"].kl_vs_train > 0.0
    assert out["train"].vocab_size == out["val"].vocab_size
