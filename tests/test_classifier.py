"""Hashed linear quality classifier (operators/classifier.py)."""

from pyspark.sql import functions as F

from us_flight_delay_data_pipeline_spark.operators.classifier import (
    classify_docs, hashed_logodds_weights)


def _corpus(spark):
    # perfectly separable vocabulary: "good" tokens only in high-
    # labeled docs, "spam" tokens only in low-labeled ones
    rows = []
    for i in range(40):
        rows.append((i, True, "good clean prose sentence structure"))
    for i in range(40, 80):
        rows.append((i, False, "spam junk noise garbage filler"))
    # mixed doc: 3 good tokens vs 2 spam tokens -> positive score
    rows.append((80, True, "good clean prose spam junk"))
    # token-less doc: score must be exactly 0, pred False
    rows.append((81, False, "   "))
    return spark.createDataFrame(rows, "doc_id long, label boolean, text string")


def test_separable_corpus_is_reclassified(spark):
    df = _corpus(spark)
    out = {r["doc_id"]: (r["pred_high"], r["score"])
           for r in classify_docs(df, "label", keep_cols=(),
                                  id_col="doc_id").collect()}
    for i in range(40):
        assert out[i][0] is True, (i, out[i])
    for i in range(40, 80):
        assert out[i][0] is False, (i, out[i])
    # majority-good mixed doc scores positive
    assert out[80][0] is True
    # token-less doc: exact zero score, negative class
    assert out[81] == (False, 0)


def test_weights_sign_matches_class_rate(spark):
    df = _corpus(spark)
    w = hashed_logodds_weights(df, "label")
    from us_flight_delay_data_pipeline_spark.operators.hashing import h32
    probe = spark.createDataFrame(
        [("good",), ("spam",)], "tok string").select(
        "tok", (h32(F.col("tok")) % 1024).alias("bucket"))
    got = {r["tok"]: r["w"] for r in probe.join(w, "bucket").collect()}
    assert got["good"] > 0       # high-corpus-only token
    assert got["spam"] < 0       # low-corpus-only token


def test_model_is_bucket_bounded(spark):
    """The weight table never exceeds the bucket count no matter the
    vocabulary — the hashing-trick boundedness the 100 TB posture
    relies on."""
    df = _corpus(spark)
    assert hashed_logodds_weights(df, "label", n_buckets=64).count() <= 64


def test_frozen_weights_generalize_cross_shard(spark):
    """score_docs with a weight table fit on a DIFFERENT shard must
    classify a held-out separable corpus correctly — the distillation
    round-trip (VERDICT r4 task #5): the model, not the heuristic,
    carries the signal to unseen docs."""
    from us_flight_delay_data_pipeline_spark.operators.classifier import (
        score_docs)

    df = _corpus(spark)
    train = df.filter(F.col("doc_id") < 60)      # 40 high + 20 low
    hold = df.filter(F.col("doc_id") >= 60)      # 20 low + mixed + empty
    w = hashed_logodds_weights(train, "label")
    out = {r["doc_id"]: r["pred_high"]
           for r in score_docs(hold, w, "label").collect()}
    for i in range(60, 80):
        assert out[i] is False, (i, out[i])      # unseen spam docs
    assert out[80] is True                       # unseen mixed doc
    assert out[81] is False                      # token-less


def test_score_docs_equals_classify_docs_when_same_corpus(spark):
    """classify_docs must be exactly fit-then-score — the refactor
    seam cannot change scores."""
    from us_flight_delay_data_pipeline_spark.operators.classifier import (
        score_docs)

    df = _corpus(spark)
    w = hashed_logodds_weights(df, "label")
    a = {r["doc_id"]: r["score"]
         for r in classify_docs(df, "label").collect()}
    b = {r["doc_id"]: r["score"]
         for r in score_docs(df, w, "label").collect()}
    assert a == b
