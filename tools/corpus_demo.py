"""End-to-end timed corpus run over the UNREGISTERED training-data surface.

``bench.py`` measures the 189 registered queries; this tool measures the
round-10 pipeline components the registry cannot hold (array outputs,
trained artifacts): profile → quality gate → exact dedup → trained
classifier gate → mixture realization → BPE training → fixed-length
sequence packing → sharded parquet publication + verification → WebDataset
tar publication + byte audit — one real curation run, wall-clock per stage, so "the new surface composes" is a measured statement, not a
claimed one.

Prints ONE JSON line (the bench.py convention):
``{"metric": "corpus_demo_sec", "value": <total>, "unit": "sec",
"stages": {...}, "rows": {...}, "sf": ...}``.

Usage: ``python tools/corpus_demo.py [--sf-dir DIR] [--out DIR]``
(defaults: ``$SPARK_GRAFT_SF_DIR`` or sf0.1; a temp dir).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hbase_observer_es_spark.io import table  # noqa: E402
from hbase_observer_es_spark.session import get_spark  # noqa: E402

MIN_TOKENS = 20  # quality floor (whitespace tokens)
NUM_MERGES = 2000
SEQ_LEN = 1024
N_SHARDS = 8
CLS_DIM = 2048
CLS_EPOCHS = 3


def run(spark, sf_dir: str, out: str) -> dict:
    from hbase_observer_es_spark.operators.bpe import train_bpe
    from hbase_observer_es_spark.operators.classifier import (
        classify,
        tokens_col,
        train_text_classifier,
    )
    from hbase_observer_es_spark.operators.dedup import q_dedup_exact
    from hbase_observer_es_spark.operators.mixture import (
        MIX_FACTORS,
        realize_mixture,
    )
    from hbase_observer_es_spark.operators.profile import profile_stats
    from hbase_observer_es_spark.operators.seqpack import (
        pack_training_sequences,
    )
    from hbase_observer_es_spark.operators.text import q_text_quality
    from hbase_observer_es_spark.sinks.dataset_export import (
        export_dataset,
        verify_export,
    )

    stages: dict[str, float] = {}
    rows: dict[str, int] = {}

    def stage(name: str, fn):
        t0 = time.monotonic()
        r = fn()
        stages[name] = round(time.monotonic() - t0, 3)
        return r

    docs = table(spark, sf_dir, "documents")
    rows["input"] = stage("profile", lambda: int(
        profile_stats(docs, ["doc_id", "text", "lang"])
        .where(F.col("col_name") == "doc_id")
        .head()["n_rows"]
    ))

    # every staged fn ends in an ACTION (parquet land or count), so each
    # stage's number is its own execution, not lazy plan-building billed
    # to whoever runs the plan first
    def gate():
        kept = (
            q_text_quality(spark, sf_dir)
            .where(F.col("n_tokens") >= MIN_TOKENS)
            .select("doc_id")
        )
        p = os.path.join(out, "gated.parquet")
        docs.join(kept, "doc_id").write.mode("overwrite").parquet(p)
        return spark.read.parquet(p)

    gated = stage("quality_gate", gate)

    def dedup():
        survivors = q_dedup_exact(spark, sf_dir).select("doc_id")
        p = os.path.join(out, "curated.parquet")
        gated.join(survivors, "doc_id").write.mode("overwrite").parquet(p)
        c = spark.read.parquet(p)
        rows["curated"] = c.count()
        return c

    curated = stage("exact_dedup", dedup)
    rows_curated = rows["curated"]

    def cls_gate():
        labeled = curated.withColumn(
            "label",
            F.array_contains(tokens_col(F.col("text")), "join").cast("int"),
        )
        model = train_text_classifier(
            labeled, "label", dim=CLS_DIM, epochs=CLS_EPOCHS,
            max_samples=1_000_000,
        )
        return classify(curated, model).where(F.col("margin") > 0).count()

    rows["cls_positive"] = stage("classifier_train_score", cls_gate)

    def mix():
        mixed = realize_mixture(curated, MIX_FACTORS)
        # repeats become distinct packable rows via a (doc, rep) composite id
        m = (
            curated.join(mixed.select("doc_id", "rep_idx"), "doc_id")
            .withColumn(
                "mix_id",
                F.col("doc_id") * F.lit(1 << 8) + F.col("rep_idx"),
            )
        )
        p = os.path.join(out, "mixed.parquet")
        m.write.mode("overwrite").parquet(p)
        c = spark.read.parquet(p)
        rows["mixed"] = c.count()
        return c

    mixed = stage("mixture_realize", mix)

    merges = stage(
        "bpe_train",
        lambda: train_bpe(curated, num_merges=NUM_MERGES, min_word_count=1),
    )
    rows["bpe_merges"] = len(merges)

    def pack():
        seqs = pack_training_sequences(
            mixed, merges, seq_len=SEQ_LEN, n_shards=N_SHARDS, id_col="mix_id"
        ).withColumn(
            "seq_key",
            F.col("shard") * F.lit(1 << 32) + F.col("seq_id"),
        )
        return export_dataset(
            seqs, os.path.join(out, "packed"), key="seq_key", n_shards=N_SHARDS
        )

    manifest = stage("bpe_pack_export", pack)
    rows["sequences"] = int(manifest["total_rows"])
    rows["train_tokens"] = rows["sequences"] * SEQ_LEN

    stage(
        "verify_export",
        lambda: verify_export(spark, os.path.join(out, "packed")),
    )

    def wds_publish():
        from hbase_observer_es_spark.sinks.wds import verify_wds, write_wds

        p = os.path.join(out, "wds")
        pub = curated.select(
            F.format_string("doc-%09d", F.col("doc_id")).alias("key"),
            "text",
            F.to_json(F.struct("lang", "source", "n_chars")).alias("meta"),
        )
        m = write_wds(pub, p, {"text": "txt", "meta": "json"}, N_SHARDS, key_col="key")
        verify_wds(p)
        return int(m["total_samples"])

    rows["wds_samples"] = stage("wds_publish", wds_publish)

    assert rows_curated > 0 and rows["sequences"] > 0
    return {
        "metric": "corpus_demo_sec",
        "value": round(sum(stages.values()), 3),
        "unit": "sec",
        "stages": stages,
        "rows": rows,
        "sf": sf_dir,
        "params": {
            "min_tokens": MIN_TOKENS,
            "num_merges": NUM_MERGES,
            "seq_len": SEQ_LEN,
            "n_shards": N_SHARDS,
            "cls_dim": CLS_DIM,
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("corpus-demo", shuffle_partitions=int(cpus))
    try:
        out = args.out or tempfile.mkdtemp(prefix="corpus_demo_")
        print(json.dumps(run(spark, args.sf_dir, out)))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
