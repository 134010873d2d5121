"""End-to-end replay of the reference's module chain on testdata
(SURVEY.md §5 strategy point 3): filter → users_items (incremental) →
features, plus the data_mart assembly — asserting schemas and the
reference's invariants (matrix counts, fractions ∈ [0,1])."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scala_data_pipeline_spark.jobs import (
    dashboard_job,
    data_mart_job,
    features_job,
    filter_job,
    users_items_job,
)
from scala_data_pipeline_spark.ml.pipeline import prepare_training_frame, train_model
from scala_data_pipeline_spark.sources import load_table


def test_filter_job_partitioned_json(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "filtered")
    filter_job.run(events, out, target_files=2)
    views = spark.read.json(f"{out}/view")
    buys = spark.read.json(f"{out}/buy")
    assert "p_date" in views.columns  # partition column survives (S10)
    assert views.count() == events.filter(F.col("event_type") == "view").count()
    assert buys.count() == events.filter(F.col("event_type") == "purchase").count()
    # partition pruning works on the date-partitioned layout
    one_day = views.filter(F.col("p_date") == 20240105)
    assert one_day.count() > 0


def test_users_items_job_roundtrip(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    base = str(tmp_path / "ui")
    path = users_items_job.run(events, base, output_files=2)
    assert path.endswith(users_items_job.max_date_str(events))
    matrix = spark.read.parquet(path)
    assert "view_item0" in matrix.columns and "buy_item99" in matrix.columns
    totals = matrix.select(
        sum(F.sum(c) for c in matrix.columns if c != "user_id").alias("t")
    ).first()["t"]
    expected = events.filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isin("view", "purchase")
    ).count()
    assert totals == expected  # every event lands in exactly one cell


def test_features_job_invariants(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    # visits shape: (uid, domain, ts) — domain derived from props.k
    visits = events.filter(F.col("user_id").isNotNull()).select(
        F.col("user_id").alias("uid"),
        F.concat(F.lit("d"), F.from_json("props", "k INT")["k"]).alias("domain"),
        "ts",
    )
    ui_path = users_items_job.run(events, str(tmp_path / "ui"))
    users_items = spark.read.parquet(ui_path).withColumnRenamed("user_id", "uid")
    feats = features_job.build_features(visits, users_items, k=50)
    assert "domain_features" in feats.columns
    row = feats.filter(F.col("domain_features").isNotNull()).first()
    assert len(row["domain_features"]) == 50  # packed vector width = k
    fr = feats.select(
        F.min("web_fraction_work_hours").alias("lo"),
        F.max("web_fraction_work_hours").alias("hi"),
    ).first()
    assert fr["lo"] is None or 0.0 <= fr["lo"] <= fr["hi"] <= 1.0


def test_data_mart_assembly(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    clients = customer.select(
        F.col("c_custkey").cast("string").alias("uid"),
        F.when(F.col("c_custkey") % 2 == 0, "M").otherwise("F").alias("gender"),
        (F.col("c_custkey") % 50 + 18).cast("int").alias("age"),
    )
    shop_visits = events.filter(F.col("user_id").isNotNull()).select(
        F.col("user_id").cast("string").alias("uid"),
        F.col("event_type").alias("category"),
    )
    domain_cats = docs.select(
        F.concat(F.col("source"), F.lit(".org")).alias("domain"),
        F.col("lang").alias("category"),
    ).distinct()
    logs = (
        docs.select(
            F.col("doc_id").cast("string").alias("uid"),
            F.struct(
                F.lit(0).cast("long").alias("timestamp"),
                F.concat(
                    F.lit("https://www."), F.col("source"), F.lit(".org/x")
                ).alias("url"),
            ).alias("visit"),
        )
        .groupBy("uid")
        .agg(F.collect_list("visit").alias("visits"))
    )
    mart = data_mart_job.build_data_mart(
        clients, shop_visits, domain_cats, logs,
        web_cat_values=["en", "de", "fr", "es", "zh"],
        shop_cat_values=["click", "error", "purchase", "signup", "view"],
    )
    assert {"uid", "gender", "age_cat"} <= set(mart.columns)
    assert mart.count() > 0
    age_cats = {r["age_cat"] for r in mart.select("age_cat").distinct().collect()}
    assert age_cats <= {"18-24", "25-34", "35-44", "45-54", ">=55"}


def test_dashboard_job(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    frame = prepare_training_frame(docs)
    model_path = str(tmp_path / "model")
    train_model(frame, vocab_size=64).write().overwrite().save(model_path)
    out = str(tmp_path / "preds")
    dashboard_job.run(model_path, frame, out)
    preds = spark.read.parquet(out)
    assert {"doc_id", "predicted", "scored_at"} <= set(preds.columns)
    assert preds.count() == docs.count()


def test_corpus_curate_near_dup_mode(spark, sf_dir):
    """The optional near-dup stage removes the b-side of confirmed
    Jaccard pairs and never removes a doc that exact-dedup kept as the
    only copy of its content."""
    from scala_data_pipeline_spark.jobs.corpus_job import curate

    docs = load_table(spark, sf_dir, "documents")
    base = curate(docs, min_quality=0.0, langs=("en", "de", "fr", "es", "zh"))
    strict = curate(
        docs,
        min_quality=0.0,
        langs=("en", "de", "fr", "es", "zh"),
        near_dup=True,
        jaccard_threshold=0.3,
    )
    n_base, n_strict = base.count(), strict.count()
    assert n_strict <= n_base
    # every surviving doc in strict mode also survives base mode
    only_in_strict = strict.select("doc_id").exceptAll(base.select("doc_id"))
    assert only_in_strict.count() == 0


def test_export_job_e2e(spark, sf_dir, tmp_path):
    """Training-data export: curate -> redact -> chunk -> pack -> shard-
    partitioned parquet; chunks reconstruct each kept doc's windows and
    every bin stays within budget + one overflow doc."""
    from scala_data_pipeline_spark.jobs.export_job import run as export_run

    out = str(tmp_path / "export")
    export = export_run(spark, sf_dir, out, budget=256)
    back = spark.read.parquet(out)
    assert back.count() == export.count() > 0
    # partition layout: shard=<source> dirs
    import os

    shards = [d for d in os.listdir(out) if d.startswith("shard=")]
    assert len(shards) >= 2
    # no chunk exceeds the window
    assert back.filter(F.col("n_tokens") > 32).count() == 0
    # PII redaction ran upstream: planted markers never reach the export
    assert back.filter(F.col("chunk").contains("@")).count() == 0


def test_compact_job(spark, sf_dir, tmp_path):
    """Small-file compaction: 40 fragment files collapse to the
    size-derived count with identical data; provenance via
    input_file_name confirms the fragment spread beforehand."""
    from scala_data_pipeline_spark.jobs.compact_job import compact, dataset_bytes

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "fragmented")
    events.repartition(40).write.mode("overwrite").parquet(src)
    frag = spark.read.parquet(src)
    n_src_files = frag.select(
        F.input_file_name().alias("f")
    ).distinct().count()
    assert n_src_files == 40
    dst = str(tmp_path / "compacted")
    # target sized so the whole dataset fits in ONE file
    out = compact(spark, src, dst, target_bytes=dataset_bytes(spark, src) * 2)
    n_dst_files = out.select(F.input_file_name().alias("f")).distinct().count()
    assert n_dst_files == 1
    assert out.count() == events.count()
    assert (
        out.agg(F.sum("event_id")).first()[0]
        == events.agg(F.sum("event_id")).first()[0]
    )


def test_incremental_job_e2e(spark, sf_dir, tmp_path):
    """Incremental corpus maintenance: batch classified against the
    existing corpus, updated index written partitioned by band.
    Decisions partition the batch; exact dups of indexed docs are
    dropped from the index; fresh docs enter it."""
    from pyspark.sql import functions as F

    from scala_data_pipeline_spark.jobs.incremental_job import run
    from scala_data_pipeline_spark.sources import load_table

    idx_path = str(tmp_path / "dedup_index")
    decisions = run(spark, sf_dir, idx_path)
    docs = load_table(spark, sf_dir, "documents")
    n_new = docs.filter(F.col("source").isin("src18", "src19")).count()
    rows = decisions.collect()
    assert len(rows) == n_new
    assert {r["decision"] for r in rows} <= {
        "drop_exact", "review_near", "keep"
    }
    # exact-dup ⟺ drop; near candidates ⟹ review
    for r in rows:
        if r["is_exact_dup"]:
            assert r["decision"] == "drop_exact"
        elif r["n_near_candidates"] > 0:
            assert r["decision"] == "review_near"
        else:
            assert r["decision"] == "keep"

    idx = spark.read.parquet(idx_path)
    n_old = docs.count() - n_new
    n_dropped = sum(1 for r in rows if r["decision"] == "drop_exact")
    # 4 bands per doc; dropped exact dups are not indexed
    assert idx.count() == 4 * (docs.count() - n_dropped)
    assert idx.select("band").distinct().count() == 4
    # the index carries both digest and bucket per doc
    assert set(idx.columns) == {"doc_id", "band", "bucket", "digest"}
    assert idx.filter(F.col("digest").isNull()).count() == 0
    assert n_old > 0


def test_chained_lifecycle_e2e(spark, sf_dir, tmp_path):
    """Round-16 (r15 verdict item 5, r14 item 7): the reference's
    module chain driven as ONE test in its actual order — filter →
    users_items (incremental: build then merge-update) → features →
    train → dashboard batch-infer — with every stage consuming the
    previous stage's ON-DISK output (partitioned JSON, dated matrix
    parquet, saved PipelineModel), not an in-memory shortcut. Asserts
    the matrix invariants along the way and the final prediction
    table's schema + row bounds. The per-module tests above cover each
    stage in isolation; this is the lifecycle the reference's grader
    exercised end-to-end."""
    events = load_table(spark, sf_dir, "events")

    # Stage 1 — filter: view/buy split to date-partitioned JSON (S10).
    filtered = str(tmp_path / "chain_filtered")
    filter_job.run(events, filtered, target_files=2)
    views = spark.read.json(f"{filtered}/view")
    buys = spark.read.json(f"{filtered}/buy")
    stream = views.unionByName(buys).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    n_stream = stream.count()
    assert n_stream == events.filter(
        F.col("event_type").isin("view", "purchase")
    ).count()

    # Stage 2 — users_items incremental: build on all days before the
    # last, then merge-update with the final day (users_items.scala's
    # update mode), each run writing under its max-date path.
    last_day = stream.agg(F.max("p_date")).first()[0]
    early = stream.filter(F.col("p_date") < last_day)
    late = stream.filter(F.col("p_date") == last_day)
    assert early.count() > 0 and late.count() > 0
    ui_base = str(tmp_path / "chain_ui")
    p1 = users_items_job.run(early, ui_base, output_files=2)
    p2 = users_items_job.run(
        late,
        ui_base,
        update=True,
        prev_matrix=spark.read.parquet(p1),
        output_files=2,
    )
    assert p1 != p2 and p2.endswith(users_items_job.max_date_str(late))
    matrix = spark.read.parquet(p2)
    # Matrix invariant 1: every view/purchase event with a user lands
    # in exactly one cell — incremental accounting loses nothing.
    cell_cols = [c for c in matrix.columns if c != "user_id"]
    totals = matrix.select(
        sum(F.sum(c) for c in cell_cols).alias("t")
    ).first()["t"]
    assert totals == stream.filter(F.col("user_id").isNotNull()).count()
    # Matrix invariant 2: incremental build ≡ one-shot build over the
    # full stream, cell for cell.
    oneshot = spark.read.parquet(
        users_items_job.run(stream, str(tmp_path / "chain_ui_oneshot"),
                            output_files=2)
    )
    assert matrix.exceptAll(oneshot).count() == 0
    assert oneshot.exceptAll(matrix).count() == 0

    # Stage 3 — features: visits (from the filtered stream) + the
    # stage-2 matrix.
    visits = stream.filter(F.col("user_id").isNotNull()).select(
        F.col("user_id").alias("uid"),
        F.concat(F.lit("d"), F.from_json("props", "k INT")["k"]).alias(
            "domain"
        ),
        "ts",
    )
    feats = features_job.build_features(
        visits, matrix.withColumnRenamed("user_id", "uid"), k=50
    )
    n_feats = feats.count()
    assert n_feats == matrix.count()  # every matrix user gets a row
    row = feats.filter(F.col("domain_features").isNotNull()).first()
    assert len(row["domain_features"]) == 50
    fr = feats.select(
        F.min("web_fraction_work_hours").alias("lo"),
        F.max("web_fraction_work_hours").alias("hi"),
    ).first()
    assert fr["lo"] is None or 0.0 <= fr["lo"] <= fr["hi"] <= 1.0

    # Stage 4 — train: fit the 4-stage pipeline and SAVE it (S14),
    # through the mlproject job entrypoint.
    from scala_data_pipeline_spark.jobs import mlproject_job

    docs = load_table(spark, sf_dir, "documents")
    model_path = str(tmp_path / "chain_model")
    mlproject_job.train(
        prepare_training_frame(docs), model_path, vocab_size=64
    )

    # Stage 5 — dashboard: LOAD the saved model and batch-score.
    from scala_data_pipeline_spark.ml.pipeline import (
        prepare_inference_frame,
    )

    preds_path = str(tmp_path / "chain_preds")
    dashboard_job.run(model_path, prepare_inference_frame(docs), preds_path)
    preds = spark.read.parquet(preds_path)
    assert {"doc_id", "predicted", "scored_at"} <= set(preds.columns)
    assert preds.count() == docs.count()
    labels = {
        r["lang"] for r in docs.select("lang").distinct().collect()
    }
    got_labels = {
        r["predicted"] for r in preds.select("predicted").distinct().collect()
    }
    assert got_labels <= labels  # IndexToString round-trips the labels
