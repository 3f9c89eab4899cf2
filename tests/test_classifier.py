"""Classifier tests — bit-exact-model discipline plus a DuckDB oracle for
inference (training is an ordered driver fold; its mirror here is the
NON-lazy averaged perceptron that materializes the running weight sum
after every sample, a different algorithm with a provably equal result)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from hbase_observer_es_spark.io import table
from hbase_observer_es_spark.operators.classifier import (
    CLS_DIM,
    CLS_EPOCHS,
    CLS_HOLDOUT_MOD,
    CLS_TARGET_TOKEN,
    bucket_col,
    bucket_py,
    classify,
    doc_buckets_py,
    margin_expr,
    margin_pandas,
    frozen_model,
    q_quality_classify,
    q_quality_classify_trained,
    sql_margin_replay,
    tokens_col,
    train_perceptron,
    train_text_classifier,
)
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, duckdb_con


def _labeled_docs(spark, sf_dir):
    return table(spark, sf_dir, "documents").withColumn(
        "label",
        F.array_contains(tokens_col(F.col("text")), CLS_TARGET_TOKEN).cast("int"),
    )


@pytest.fixture(scope="module")
def fixture_model(spark):
    # train once per module: training is deterministic, so this is the
    # same model q_quality_classify builds internally
    d = _labeled_docs(spark, SF_ORACLE)
    return train_text_classifier(
        d.where(F.col("doc_id") % CLS_HOLDOUT_MOD != 0),
        "label",
        dim=CLS_DIM,
        epochs=CLS_EPOCHS,
    )


# ------------------------------------------------------------------ oracle


def test_inference_matches_sql_replay(spark, fixture_model):
    """The TRAINED form: fit at SF_ORACLE, replay inference in SQL with
    the just-trained weights as literals."""
    model = fixture_model
    con = duckdb_con(SF_ORACLE)
    try:
        r = compare(
            "q_quality_classify_trained",
            q_quality_classify_trained(spark, SF_ORACLE),
            con,
            sql_margin_replay(model, f"doc_id % {CLS_HOLDOUT_MOD} = 0"),
        )
        assert r.ok, r.detail
    finally:
        con.close()


def test_registered_query_matches_static_oracle(spark):
    """The REGISTERED form: frozen literal weights, static ORACLES entry —
    exactly what the driver compares (and at any sf, since both sides
    carry the same literals)."""
    from hbase_observer_es_spark.operators.classifier import ORACLES

    con = duckdb_con(SF_ORACLE)
    try:
        r = compare(
            "q_quality_classify",
            q_quality_classify(spark, SF_ORACLE),
            con,
            ORACLES["q_quality_classify"],
        )
        assert r.ok, r.detail
    finally:
        con.close()


def test_frozen_model_retrain_provenance(spark):
    """The in-source literals ARE the sf0.01 fixture's trained model: a
    full retrain (same split, order, dim, epochs) must reproduce
    CLS_W_NONZERO/CLS_B bit-for-bit. Fails loudly if the fixture data,
    the feature map, or the trainer drifts."""
    d = _labeled_docs(spark, "/root/testdata/sf0.01")
    retrained = train_text_classifier(
        d.where(F.col("doc_id") % CLS_HOLDOUT_MOD != 0),
        "label",
        dim=CLS_DIM,
        epochs=CLS_EPOCHS,
    )
    assert retrained == frozen_model()


def test_heldout_accuracy_beats_majority(spark):
    rows = q_quality_classify_trained(spark, SF_ORACLE).collect()
    n = len(rows)
    acc = sum(1 for r in rows if r["pred"] == r["label"]) / n
    pos = sum(r["label"] for r in rows) / n
    majority = max(pos, 1 - pos)
    assert acc >= 0.9 and acc > majority, (acc, majority)


def test_frozen_heldout_accuracy_beats_majority(spark):
    """The frozen literals really recovered the token rule: held-out
    accuracy at the training scale (sf0.01) clears the same bar."""
    rows = q_quality_classify(spark, "/root/testdata/sf0.01").collect()
    n = len(rows)
    acc = sum(1 for r in rows if r["pred"] == r["label"]) / n
    pos = sum(r["label"] for r in rows) / n
    majority = max(pos, 1 - pos)
    assert acc >= 0.9 and acc > majority, (acc, majority)


# ------------------------------------------------------------- feature map


def test_bucket_parity_spark_vs_python(spark):
    toks = ["join", "the", "héllo", "wörld", "a", "123", "x!y", "Zz", "日本"]
    df = spark.createDataFrame([(t,) for t in toks], "t string")
    got = {
        r["t"]: r["b"]
        for r in df.select("t", bucket_col(F.col("t"), 512).alias("b")).collect()
    }
    assert got == {t: bucket_py(t, 512) for t in toks}


def test_doc_buckets_py_matches_spark(spark):
    text = "the quick  brown fox the"
    df = spark.createDataFrame([(text,), (None,), ("",)], "text string")
    from hbase_observer_es_spark.operators.classifier import doc_buckets_col

    got = [
        list(r["b"])
        for r in df.select(doc_buckets_col(F.col("text"), 64).alias("b")).collect()
    ]
    assert got == [doc_buckets_py(text, 64), [], []]


# ---------------------------------------------------------------- training


def naive_averaged_perceptron(samples, dim, epochs):
    """Non-lazy mirror: materialize the weight-sum after EVERY sample."""
    w = [0] * dim
    b = 0
    acc_w = [0] * dim
    acc_b = 0
    for _ in range(epochs):
        for x, y in samples:
            margin = b + sum(w[i] for i in x)
            if y * margin <= 0:
                for i in x:
                    w[i] += y
                b += y
            for i in range(dim):
                acc_w[i] += w[i]
            acc_b += b
    return {"w": acc_w, "b": acc_b, "dim": dim}


def test_lazy_average_equals_naive_mirror():
    rng = random.Random(11)
    for trial in range(30):
        dim = rng.randint(2, 12)
        n = rng.randint(1, 15)
        samples = [
            (
                sorted(rng.sample(range(dim), rng.randint(0, dim))),
                rng.choice([1, -1]),
            )
            for _ in range(n)
        ]
        epochs = rng.randint(1, 4)
        lazy = train_perceptron(samples, dim, epochs)
        naive = naive_averaged_perceptron(samples, dim, epochs)
        assert lazy == naive, (trial, samples)


def test_converges_on_separable_data():
    # hidden rule: y = +1 iff feature 3 present — linearly separable, so
    # enough epochs drive training accuracy to 1 (perceptron mistake bound)
    rng = random.Random(7)
    dim = 32
    samples = []
    for _ in range(60):
        x = sorted(rng.sample([f for f in range(dim) if f != 3], 5))
        if rng.random() < 0.5:
            samples.append((sorted(x + [3]), 1))
        else:
            samples.append((x, -1))
    model = train_perceptron(samples, dim, epochs=20)
    correct = sum(
        1
        for x, y in samples
        if (model["b"] + sum(model["w"][i] for i in x) > 0) == (y == 1)
    )
    assert correct / len(samples) >= 0.95


# --------------------------------------------------------------- inference


def test_expr_and_pandas_paths_agree(spark, fixture_model):
    model = fixture_model
    d = _labeled_docs(spark, SF_ORACLE).limit(80)
    via_expr = {
        r["doc_id"]: r["margin"]
        for r in classify(d, model, use_expr=True).collect()
    }
    via_np = {
        r["doc_id"]: r["margin"]
        for r in classify(d, model, use_expr=False).collect()
    }
    assert via_expr == via_np and len(via_expr) == 80


def test_empty_text_margin_is_bias(spark):
    model = {"w": [5, -7, 11], "b": 42, "dim": 3}
    df = spark.createDataFrame([(None,), ("",), ("   ",)], "text string")
    for use_expr in (True, False):
        got = [r["margin"] for r in classify(df, model, use_expr=use_expr).collect()]
        assert got == [42, 42, 42], (use_expr, got)


def test_expr_path_dim_cap():
    model = {"w": [0] * (1 << 13), "b": 0, "dim": 1 << 13}
    with pytest.raises(ValueError, match="margin_pandas"):
        margin_expr(F.col("text"), model)


def test_margin_scores_a_stream(spark, tmp_path, fixture_model):
    """Inference is a pure Column expression, so the trained model scores a
    STREAM unmodified — the online half of the quality gate (the batch
    pipeline trains; the ingest stream applies). availableNow drains the
    fixture as micro-batches and the margins must equal the batch path's."""
    d = str(tmp_path / "in.parquet")
    table(spark, SF_ORACLE, "documents").limit(40).write.parquet(d)
    # both paths read the SAME materialized rows (an unordered limit is not
    # stable across separate executions of the source query)
    landed = spark.read.parquet(d)
    batch = {
        r["doc_id"]: r["margin"]
        for r in classify(landed, fixture_model).collect()
    }

    got: dict[int, int] = {}

    def sink(df, _bid):
        for r in df.collect():
            got[r["doc_id"]] = r["margin"]

    stream = spark.readStream.schema(landed.schema).parquet(d)
    q = (
        classify(stream, fixture_model)
        .select("doc_id", "margin")
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        assert q.awaitTermination(120), "stream did not drain within 120s"
    finally:
        q.stop()
    assert got == batch and len(got) == 40


# --------------------------------------------------------------- fail-loud


def test_validation(spark):
    with pytest.raises(ValueError, match="dim"):
        train_perceptron([], 0)
    with pytest.raises(ValueError, match="epochs"):
        train_perceptron([], 1, epochs=0)
    with pytest.raises(ValueError, match="labels"):
        train_perceptron([([0], 2)], 1)
    df = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 0)], "doc_id long, text string, label int"
    )
    with pytest.raises(ValueError, match="max_samples"):
        train_text_classifier(df, "label", max_samples=1)
    empty = spark.createDataFrame([], "doc_id long, text string, label int")
    with pytest.raises(ValueError, match="no training rows"):
        train_text_classifier(empty, "label")
    # a NULL label is a labeling bug, never a class
    nullable = spark.createDataFrame(
        [(1, "a", 1), (2, "b", None)], "doc_id long, text string, label int"
    )
    with pytest.raises(ValueError, match="NULL label for doc_id=2"):
        train_text_classifier(nullable, "label")
