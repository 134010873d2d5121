"""Unit tests for the curation operators' edge cases (the oracle-parity
sweep covers the happy path on the real tables)."""

from __future__ import annotations

from scala_data_pipeline_spark.ext.curation import pii_redact, repetition_ratio


def test_pii_redact_kinds_and_order(spark):
    docs = spark.createDataFrame(
        [
            (0, "mail bob@1.2.3.4.example.com then 10.0.0.1 and 555-123-4567"),
            (1, "clean text with no pii at all"),
            (2, "a@b.co x@y.org"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    # Email redacted BEFORE the IP pass: the dotted host must not leave
    # a stray <IPV4> behind.
    assert rows[0]["redacted"] == "mail <EMAIL> then <IPV4> and <PHONE>"
    assert (rows[0]["n_email"], rows[0]["n_phone"], rows[0]["n_ipv4"]) == (1, 1, 1)
    assert rows[0]["n_pii"] == 3
    assert rows[1]["redacted"] == "clean text with no pii at all"
    assert rows[1]["n_pii"] == 0
    assert rows[2]["redacted"] == "<EMAIL> <EMAIL>"
    assert rows[2]["n_email"] == 2


def test_sample_fraction_one_keeps_everything(spark):
    from scala_data_pipeline_spark.ext.curation import (
        deterministic_sample,
        deterministic_sample_sql,
        sample_threshold_hex,
    )

    # md5('40691') starts with 'ffff' — the prefix a clamped 'ffff'
    # threshold silently dropped; fraction 1.0 must keep it.
    assert sample_threshold_hex(1.0) == "g"
    docs = spark.createDataFrame(
        [(40691, "edge"), (1, "a"), (2, "b")], ["doc_id", "text"]
    )
    assert deterministic_sample(docs, 1.0).count() == 3
    assert "'g'" in deterministic_sample_sql(1.0)
    # sub-1.0 fractions keep the hex-threshold path
    assert sample_threshold_hex(0.5) == "8000"


def test_repetition_ratio_bounds(spark):
    docs = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam"),  # all bigrams identical
            (1, "one two three four five"),  # all bigrams distinct
            (2, "solo"),  # fewer tokens than n -> single whole-text shingle
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in repetition_ratio(docs).collect()}
    assert rows[0]["n_ngrams"] == 4 and rows[0]["n_distinct"] == 1
    assert rows[0]["repetition_ratio"] == 0.75
    assert rows[1]["repetition_ratio"] == 0.0
    assert rows[2]["n_ngrams"] == 1 and rows[2]["repetition_ratio"] == 0.0


def test_epoch_oversample_empty_rates_returns_empty(spark, sf_dir):
    # ADVICE r3: empty mixture config = keep nothing (not a crash).
    from scala_data_pipeline_spark.ext.curation import (
        epoch_oversample,
        epoch_oversample_sql,
    )
    from scala_data_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = epoch_oversample(docs, {})
    assert out.columns == ["doc_id", "source", "epoch"]
    assert out.count() == 0
    assert "WHERE FALSE" in epoch_oversample_sql({})


def test_epoch_oversample_sql_escapes_quotes():
    # source names with single quotes must not break the VALUES list
    from scala_data_pipeline_spark.ext.curation import epoch_oversample_sql

    sql = epoch_oversample_sql({"o'brien": 1.0})
    assert "'o''brien'" in sql


def test_weighted_sample_biases_toward_heavy_rows(spark, sf_dir):
    """A-ES with w = n_chars must overrepresent long documents: the
    sampled mean weight exceeds the corpus mean (deterministic given the
    fixed md5 draw), the sample is exactly n rows, and a different salt
    yields a different (independent) selection."""
    from pyspark.sql import functions as F

    from scala_data_pipeline_spark.ext.curation import weighted_sample
    from scala_data_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    sample = weighted_sample(docs, n=50)
    rows = sample.collect()
    assert len(rows) == 50
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = sum(r["weight"] for r in rows) / len(rows)
    assert sample_mean > corpus_mean
    resalted = {
        r["doc_id"] for r in weighted_sample(docs, n=50, salt="x").collect()
    }
    assert resalted != {r["doc_id"] for r in rows}


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from scala_data_pipeline_spark.ext.curation import weighted_sample

    docs = spark.createDataFrame(
        [(1, 0), (2, -5), (3, 10), (4, 3)], ["doc_id", "n_chars"]
    )
    got = {r["doc_id"] for r in weighted_sample(docs, n=10).collect()}
    assert got == {3, 4}


def test_cluster_split_never_separates_near_dups(spark, sf_dir):
    """The whole point: every LSH near-dup pair lands on ONE side.
    Also: both sides are non-empty and every document is labeled."""
    from scala_data_pipeline_spark.ext.curation import cluster_split
    from scala_data_pipeline_spark.ext.dedup import lsh_candidate_pairs
    from scala_data_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    labeled = {
        r["doc_id"]: r["split"] for r in cluster_split(docs).collect()
    }
    assert len(labeled) == docs.count()
    assert set(labeled.values()) == {"train", "test"}
    pairs = lsh_candidate_pairs(docs).collect()
    assert pairs, "fixture must contain near-dup pairs for this test"
    for r in pairs:
        assert labeled[r["doc_a"]] == labeled[r["doc_b"]], (
            r["doc_a"], r["doc_b"])


def test_dedup_reweight_conserves_mass(spark, sf_dir):
    """Dedup-and-reweight must conserve corpus mass exactly: every
    dropped near-dup's unit of weight moves onto its cluster keeper,
    so sum(weight) == |docs| and keepers carry weight == cluster
    size."""
    from pyspark.sql import functions as F

    from scala_data_pipeline_spark.queries.ext_dedup import dedup_reweight
    from scala_data_pipeline_spark.sources import load_table

    out = dedup_reweight(spark, sf_dir)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert out.agg(F.sum("weight")).collect()[0][0] == n_docs
    assert out.count() <= n_docs
    assert out.filter(F.col("weight") < 1).count() == 0


def test_score_calibration_null_source_group(spark):
    """NULL source must rank as its OWN group (matching the oracle's
    PARTITION BY source, where NULL is a distinct partition) — never
    merge into the sentinel global group (round-13 advisor fix:
    the _grp sentinel is keyed on kind, not on coalesce(source))."""
    from scala_data_pipeline_spark.ext.curation import score_calibration

    docs = spark.createDataFrame(
        [
            (1, "a"),
            (2, "a"),
            (3, "a"),
            (4, None),
            (5, None),
            (6, "b"),
        ],
        ["doc_id", "source"],
    )
    scores = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0), (4, 2.0), (5, 4.0), (6, 1.0)],
        ["doc_id", "score"],
    )
    got = {
        (r.source, r.score): r.calibrated_score
        for r in score_calibration(docs, scores).collect()
    }
    # Global grain: {1.0: 2, 2.0: 2, 3.0: 1, 4.0: 1}, N=6 → intervals
    # 1.0 (0, 2/6], 2.0 (2/6, 4/6], 3.0 (4/6, 5/6], 4.0 (5/6, 1].
    # NULL source has 2 rows (2.0, 4.0): positions 1/2 and 1.
    assert got[(None, 2.0)] == 2.0  # p=0.5 lands in (1/3, 2/3]
    assert got[(None, 4.0)] == 4.0  # p=1 -> global max
    # 'a' positions 1/3, 2/3, 1 against UNCORRUPTED global intervals —
    # under the old bug the NULL rows inflated the global cum counts.
    assert got[("a", 1.0)] == 1.0
    assert got[("a", 2.0)] == 2.0
    assert got[("a", 3.0)] == 4.0
    assert got[("b", 1.0)] == 4.0
    assert len(got) == 6


def test_score_calibration_properties(spark, sf_dir):
    """Quantile-mapping invariants: per source, calibration is
    monotone in the raw score; calibrated values come from the global
    score domain; and the mapped global quantile is >= the source
    quantile position (G(G^-1(p)) >= p)."""
    from pyspark.sql import functions as F

    from scala_data_pipeline_spark.ext.textstats import quality_features
    from scala_data_pipeline_spark.queries.ext_curation import (
        curation_score_calibration,
    )
    from scala_data_pipeline_spark.sources import load_table

    rows = curation_score_calibration(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    global_scores = {
        r.quality_score
        for r in quality_features(docs).select("quality_score").collect()
    }
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
        assert r.calibrated_score in global_scores
        assert 0.0 < r.src_ecdf <= 1.0
    for src, rs in by_source.items():
        rs.sort(key=lambda r: r.score)
        calibs = [r.calibrated_score for r in rs]
        assert calibs == sorted(calibs), src  # monotone mapping
        assert rs[-1].src_ecdf == 1.0  # top score maps the full mass


def test_unimax_allocation_invariants(spark, sf_dir):
    """UniMax water-filling contracts (Chung et al. 2023): no language
    exceeds its epoch cap; the allocation exhausts min(budget, total
    capacity); every uncapped language receives the SAME uniform share,
    and that share is >= every capped language's capacity (otherwise
    the cap should not have bound)."""
    from scala_data_pipeline_spark.ext.curation import unimax_allocation
    from scala_data_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = unimax_allocation(docs, budget_factor=1.5, max_epochs=2.0).collect()
    assert rows
    total_tokens = sum(r.n_tokens for r in rows)
    budget = 1.5 * total_tokens
    total_cap = sum(r.capacity for r in rows)
    for r in rows:
        assert r.alloc_tokens <= r.capacity + 1e-6, r
        assert r.epochs <= 2.0 + 1e-9, r
        if r.capped:
            assert r.alloc_tokens == round(r.capacity, 4), r
    assert abs(sum(r.alloc_tokens for r in rows) - min(budget, total_cap)) < 1.0
    uncapped = [r.alloc_tokens for r in rows if not r.capped]
    if uncapped:
        assert max(uncapped) - min(uncapped) < 1e-4
        share = uncapped[0]
        for r in rows:
            if r.capped:
                assert r.capacity <= share + 1e-4, r


def test_unimax_closed_form_matches_iterative_reference(spark):
    """The closed form's prefix-monotonicity claim, checked against the
    paper's ITERATIVE water-filling on constructed corpora: all-capped
    (budget >= total capacity), none-capped (uniform fits under every
    cap), capacity ties, and a single language."""
    from scala_data_pipeline_spark.ext.curation import unimax_allocation

    def reference(n_tokens: dict, budget: float, max_epochs: float):
        caps = {l: n * max_epochs for l, n in n_tokens.items()}
        alloc = {}
        remaining, langs = budget, sorted(caps)
        while langs:
            share = remaining / len(langs)
            bound = [l for l in langs if caps[l] <= share]
            if not bound:
                for l in langs:
                    alloc[l] = share
                return alloc
            for l in bound:
                alloc[l] = caps[l]
                remaining -= caps[l]
            langs = [l for l in langs if l not in bound]
        return alloc

    cases = [
        # (tokens per lang, budget_factor)
        ({"a": 100, "b": 100, "c": 100}, 5.0),   # all capped
        ({"a": 100, "b": 100, "c": 100}, 0.5),   # none capped (ties)
        ({"a": 10, "b": 1000, "c": 100, "d": 10}, 1.5),
        ({"only": 77}, 1.0),
        ({"a": 1, "b": 2, "c": 4, "d": 8, "e": 16, "f": 10000}, 1.2),
    ]
    for tokens, factor in cases:
        rows = [
            (lang, " ".join(["w"] * n)) for lang, n in tokens.items()
        ]
        docs = spark.createDataFrame(rows, ["lang", "text"])
        got = {
            r.lang: r.alloc_tokens
            for r in unimax_allocation(
                docs, budget_factor=factor, max_epochs=2.0
            ).collect()
        }
        budget = factor * sum(tokens.values())
        want = reference(tokens, budget, 2.0)
        assert set(got) == set(want), (tokens, factor)
        for lang in want:
            assert abs(got[lang] - want[lang]) < 1e-3, (
                lang, got[lang], want[lang], tokens, factor,
            )
