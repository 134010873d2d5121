"""Text-analysis + multimodal extension queries with DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ext.multimodal import extract_features, to_media_frame
from ..ext.textstats import (
    inverted_index_sql,
    bigram_lm_perplexity,
    bigram_lm_perplexity_sql,
    bm25_scores,
    bm25_scores_sql,
    fingerprint,
    fingerprint_sql,
    lang_id,
    lang_id_sql,
    perplexity_buckets,
    perplexity_buckets_sql,
    quality_features,
    quality_features_sql,
    tf_idf,
    tf_idf_sql,
    token_count,
    token_count_sql,
    unigram_surprisal,
    unigram_surprisal_sql,
)
from ..sources import load_table


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_features(load_table(spark, sf_dir, "documents"))


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(load_table(spark, sf_dir, "documents"))


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(load_table(spark, sf_dir, "documents"))


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = to_media_frame(load_table(spark, sf_dir, "documents"))
    return extract_features(media, fake=True)


# documents.text is ASCII → utf-8 bytes == characters; the byte-level
# fake features are expressible over the text column directly.
MULTIMODAL_ORACLE = """
SELECT doc_id,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       lower(hex(CAST(substr(text, 1, 8) AS BLOB))) AS head_hex,
       CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte
FROM documents
"""


# Round-6 rotation: text_fingerprint (winnowing scan, green r1-r4)
# demoted — the text family keeps driver rows via lang_id, gopher,
# tfidf and lm_perplexity. Slot freed for a never-checked SQL shape.
# Round-7 driver rotation: text_lang_id (green r1-r5 + r6) demoted to
# an extra — the text family keeps driver rows via gopher, tfidf, bm25
# and lm_perplexity; its slot goes to the never-checked event_trigrams
# (tsstats).
# Round-9 driver rotation: multimodal_features demoted after 6 green
# driver rounds (r2-r8); still oracle-checked locally.
QUERIES: dict = {}

ORACLES: dict = {}

# Initialized early so rotation demotions can assign at their query's
# definition site; the bulk literal below uses update().
EXTRA_QUERIES: dict = {}
EXTRA_ORACLES: dict = {}


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_count(load_table(spark, sf_dir, "documents"))


def text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.chunking import chunk_documents

    return chunk_documents(load_table(spark, sf_dir, "documents"))


def _chunks_oracle() -> str:
    from ..ext.chunking import chunk_documents_sql

    return chunk_documents_sql()


def text_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.chunking import pack_sequences

    return pack_sequences(load_table(spark, sf_dir, "documents"))


def _pack_oracle() -> str:
    from ..ext.chunking import pack_sequences_sql

    return pack_sequences_sql()


def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tf_idf(load_table(spark, sf_dir, "documents"))


def text_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return unigram_surprisal(load_table(spark, sf_dir, "documents"))


def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term -> (df, ctf, capped posting list) retrieval-index build
    (round 7; see ext/textstats.py::inverted_index)."""
    from ..ext.textstats import inverted_index

    return inverted_index(load_table(spark, sf_dir, "documents"))


def text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_lm_perplexity(load_table(spark, sf_dir, "documents"))


# text_tfidf promoted to a driver slot round 4; Round-9 rotation:
# demoted after 5 green rounds (r4-r8) — the text family keeps driver
# rows via gopher, bm25, lm_perplexity and the newly-promoted
# text_inverted_index.
# Round-9 driver rotation: text_inverted_index promoted (never
# driver-checked; capped-postings retrieval-index build — the cap is
# replayed in its oracle).
# Round-15 demotion (green driver rows in 5 rounds):
EXTRA_QUERIES["text_inverted_index"] = text_inverted_index
EXTRA_ORACLES["text_inverted_index"] = inverted_index_sql()

# text_lm_perplexity promoted to a driver slot in round 5 (never
# driver-checked before).
# Round-10 rotation: demoted after 5 green driver rounds (r5-r9).
EXTRA_QUERIES["text_lm_perplexity"] = text_lm_perplexity
EXTRA_ORACLES["text_lm_perplexity"] = bigram_lm_perplexity_sql()

def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for a fixed query over the corpus."""
    return bm25_scores(load_table(spark, sf_dir, "documents"))


def text_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail corpus partition by LM perplexity."""
    return perplexity_buckets(load_table(spark, sf_dir, "documents"))


# text_bm25 promoted to a driver slot in round 6 (per-verdict: newest
# ranked-retrieval family, never driver-checked before).
# Round-10 rotation: demoted after 4 green driver rounds (r6-r9).
EXTRA_QUERIES["text_bm25"] = text_bm25
EXTRA_ORACLES["text_bm25"] = bm25_scores_sql()


def text_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IR eval (new r6): nDCG@20 / MRR / AP / P / recall of multi-query
    BM25 rankings vs exact AND-term-containment relevance."""
    from ..ext.ranking import retrieval_eval

    return retrieval_eval(load_table(spark, sf_dir, "documents"))


def _retrieval_eval_oracle() -> str:
    from ..ext.ranking import retrieval_eval_sql

    return retrieval_eval_sql()

# Round-14 rotation: text_token_count promoted (never driver-checked;
# the BPE-pretokenizer count was touched by the round-13 NULL-text fix
# wave) in place of the demoted lorenz_customer_spend.
# Round-18 rotation: demoted after 4 green driver rounds (r14-r17).
EXTRA_QUERIES["text_token_count"] = text_token_count
EXTRA_ORACLES["text_token_count"] = token_count_sql()

# Round-17 rotation: text_chunks promoted (never driver-checked; the
# training-sequence chunking op had no driver row before r17).
QUERIES["text_chunks"] = text_chunks
ORACLES["text_chunks"] = _chunks_oracle()

EXTRA_QUERIES.update({
    "text_fingerprint": text_fingerprint,
    "text_ppl_buckets": text_ppl_buckets,
    "text_retrieval_eval": text_retrieval_eval,
    "text_lang_id": text_lang_id,
    "text_tfidf": text_tfidf,
    "multimodal_features": multimodal_features,
})
EXTRA_ORACLES.update({
    "text_lang_id": lang_id_sql(),
    "text_tfidf": tf_idf_sql(),
    "multimodal_features": MULTIMODAL_ORACLE,
    "text_fingerprint": fingerprint_sql(),
    "text_ppl_buckets": perplexity_buckets_sql(),
    "text_retrieval_eval": _retrieval_eval_oracle(),
})

# Round-18 rotation: promoted (never driver-checked; per-token unigram
# surprisal — the LM-free quality signal).
QUERIES["text_surprisal"] = text_surprisal
ORACLES["text_surprisal"] = unigram_surprisal_sql()
# Round-16 rotation: promoted to a driver slot (never driver-checked;
# the registry's only UDTF bin-packing shape).
QUERIES["text_pack_bins"] = text_pack_bins
ORACLES["text_pack_bins"] = _pack_oracle()


def text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top adjacent-character-pair counts over the token vocabulary —
    the counting step of a BPE tokenizer-training iteration."""
    from ..ext.textstats import bpe_pair_counts

    return bpe_pair_counts(load_table(spark, sf_dir, "documents"))


def _bpe_oracle() -> str:
    from ..ext.textstats import bpe_pair_counts_sql

    return bpe_pair_counts_sql()


EXTRA_QUERIES["text_bpe_pairs"] = text_bpe_pairs
EXTRA_ORACLES["text_bpe_pairs"] = _bpe_oracle()


def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher + C4 heuristic quality-rule bundle: per-doc statistics and
    pass flags in one codegen scan (no shuffle, no UDF)."""
    from ..ext.textstats import gopher_quality_rules

    return gopher_quality_rules(load_table(spark, sf_dir, "documents"))


def _gopher_oracle() -> str:
    from ..ext.textstats import gopher_quality_rules_sql

    return gopher_quality_rules_sql()


# Round-6 rotation: text_gopher_rules promoted to a driver slot (new
# flagship quality-filter bundle, never driver-checked); text_quality
# (green rounds 1-4, a strict subset of the gopher statistics) demoted
# to keep the family under one hard row.
# Round-10 rotation: demoted after 5 green driver rounds (r5-r9).
EXTRA_QUERIES["text_gopher_rules"] = text_gopher_rules
EXTRA_ORACLES["text_gopher_rules"] = _gopher_oracle()
EXTRA_QUERIES["text_quality"] = text_quality
EXTRA_ORACLES["text_quality"] = quality_features_sql()


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-to-many media transform: every 2nd 32-byte frame of each
    payload, Arrow-batched."""
    from ..ext.multimodal import sample_frames, to_media_frame

    return sample_frames(
        to_media_frame(load_table(spark, sf_dir, "documents"))
    )


def multimodal_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-to-one media transform with a size contract (resize/thumbnail
    stand-in)."""
    from ..ext.multimodal import resize_thumbnail, to_media_frame

    return resize_thumbnail(
        to_media_frame(load_table(spark, sf_dir, "documents"))
    )


def _frame_oracle() -> str:
    from ..ext.multimodal import sample_frames_sql

    return sample_frames_sql()


def _thumb_oracle() -> str:
    from ..ext.multimodal import resize_thumbnail_sql

    return resize_thumbnail_sql()


# Round-15 promotion (never driver-checked):
# Round-19 demotion (green r15-r18).
EXTRA_QUERIES["multimodal_frame_sample"] = multimodal_frame_sample
EXTRA_ORACLES["multimodal_frame_sample"] = _frame_oracle()
# Round-16 rotation: promoted to a driver slot (never driver-checked).
QUERIES["multimodal_thumbnail"] = multimodal_thumbnail
ORACLES["multimodal_thumbnail"] = _thumb_oracle()


def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned BPE merge table (rows-only: the merge loop is iterative
    driver-side math over the aggregated vocabulary; merge #1 is
    anchored to the oracle-checked bpe_pair_counts in tests/test_bpe.py,
    and the FULL table is replayed against an independent single-node
    reference fed by DuckDB word counts in tests/test_rows_only_bounds.py)."""
    from ..ext.bpe import bpe_train

    return bpe_train(load_table(spark, sf_dir, "documents"))


EXTRA_QUERIES["text_bpe_train"] = text_bpe_train


def text_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility (BPE tokens per word) — the
    train → encode → corpus-metric lifecycle in one query: distributed
    word counts feed the driver-side merge loop, the learned merges are
    applied corpus-wide by the Arrow-batched greedy encoder, and the
    result aggregates to one row per language. Fertility is THE
    capacity metric a multilingual training pipeline budgets by (how
    many model tokens a language pays per word). Rows-only: the merge
    loop is iterative and the greedy application order-dependent —
    no SQL twin exists; invariants (fertility >= 1, monotone
    non-increasing in merge count, zero-merge fertility == chars per
    word) are locked in tests/test_bpe.py."""
    from ..ext.bpe import (
        N_MERGES,
        VOCAB_CAP,
        bpe_apply,
        train_merges,
        word_counts,
    )

    docs = load_table(spark, sf_dir, "documents")
    wc = word_counts(docs)
    vocab = [
        (r.word, r.n)
        for r in wc.orderBy(F.col("n").desc(), F.col("word"))
        .limit(VOCAB_CAP)
        .collect()
    ]
    merges = train_merges(vocab, N_MERGES)
    enc = bpe_apply(docs, merges)
    return (
        enc.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
            F.round(
                F.sum("n_bpe_tokens") / F.sum("n_words"), 6
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


EXTRA_QUERIES["text_bpe_fertility"] = text_bpe_fertility


def text_zipf_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf power-law fit over the corpus token-frequency spectrum —
    a one-row corpus-health statistic (natural text ~ slope -1)."""
    from ..ext.textstats import zipf_spectrum

    return zipf_spectrum(load_table(spark, sf_dir, "documents"))


def _zipf_oracle() -> str:
    from ..ext.textstats import zipf_spectrum_sql

    return zipf_spectrum_sql()


# Round-17 rotation: promoted (never driver-checked; the Zipf
# rank-frequency spectrum over the corpus vocabulary).
QUERIES["text_zipf_spectrum"] = text_zipf_spectrum
ORACLES["text_zipf_spectrum"] = _zipf_oracle()


def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID eval (round 7): confusion counts of the marker-word
    classifier against the corpus's labeled lang column, with
    per-true-lang recall — the classifier-audit step before trusting
    lang gates at scale. One corpus scan + one (true, predicted)
    aggregate; recall is a window over the <=25-row confusion grain."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    preds = lang_id(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "predicted_lang"
    )
    labeled = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("true_lang")
    )
    conf = (
        labeled.join(preds, on="doc_id")
        .groupBy("true_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w_true = Window.partitionBy("true_lang")
    return conf.select(
        "true_lang",
        "predicted_lang",
        "n",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(w_true).cast("double"),
            6,
        ).alias("row_frac"),
    )


LANG_CONFUSION_ORACLE = f"""
WITH preds AS (
  SELECT doc_id, predicted_lang FROM ({lang_id_sql()})
), conf AS (
  SELECT d.lang AS true_lang, p.predicted_lang,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents d JOIN preds p USING (doc_id)
  GROUP BY 1, 2
)
SELECT true_lang, predicted_lang, n,
       ROUND(CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY true_lang) AS DOUBLE), 6)
         AS row_frac
FROM conf
"""

# Round-19 rotation: promoted (never driver-checked).
QUERIES["text_lang_confusion"] = text_lang_confusion
ORACLES["text_lang_confusion"] = LANG_CONFUSION_ORACLE


def quality_reliability_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability curve of the heuristic quality score vs the Gopher
    rule bundle (round 9): score deciles x empirical rule pass-rate —
    the calibration view a pipeline checks before trusting a cheap
    score as a gate proxy for the expensive rule set. Shape: two
    codegen corpus scans joined once on the uniform doc_id key, then a
    10-row aggregate; both the score and the rules are deterministic
    expressions, so the DuckDB twin replays them exactly."""
    from pyspark.sql import functions as F

    from ..ext.textstats import gopher_quality_rules, quality_features

    docs = load_table(spark, sf_dir, "documents")
    scored = quality_features(docs).select("doc_id", "quality_score")
    rules = gopher_quality_rules(docs).select("doc_id", "passes_gopher")
    joined = scored.join(rules, on="doc_id")
    binned = joined.select(
        F.least(
            F.floor(F.col("quality_score") * 10).cast("int"), F.lit(9)
        ).alias("score_bin"),
        F.col("passes_gopher").cast("int").alias("p"),
    )
    return (
        binned.groupBy("score_bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("p").cast("long").alias("n_pass"),
        )
        .select(
            "score_bin",
            "n_docs",
            "n_pass",
            F.round(
                F.col("n_pass") / F.col("n_docs").cast("double"), 6
            ).alias("pass_rate"),
        )
    )


def _reliability_oracle() -> str:
    from ..ext.textstats import (
        gopher_quality_rules_sql,
        quality_score_sql,
    )

    return f"""
WITH scored AS (
  SELECT doc_id, {quality_score_sql()} AS quality_score FROM documents
), rules AS ({gopher_quality_rules_sql()}),
binned AS (
  SELECT LEAST(CAST(FLOOR(s.quality_score * 10) AS INTEGER), 9)
           AS score_bin,
         CAST(r.passes_gopher AS INTEGER) AS p
  FROM scored s JOIN rules r USING (doc_id)
)
SELECT score_bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(p) AS BIGINT) AS n_pass,
       ROUND(CAST(SUM(p) AS DOUBLE) / COUNT(*), 6) AS pass_rate
FROM binned GROUP BY score_bin
"""


# Round-16 rotation: demoted after 5 green driver rounds (r11-r15) —
# still oracle-checked locally by tests/test_oracle_parity.py.
EXTRA_QUERIES["quality_reliability_curve"] = quality_reliability_curve
EXTRA_ORACLES["quality_reliability_curve"] = _reliability_oracle()


def text_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between per-source unigram
    distributions (round 9) — the mixture-health matrix a pretraining
    recipe watches when balancing sources (a source drifting from the
    rest shows up as a rising JS row). Shape: one corpus token
    aggregation to the bounded (source x vocab) grain (~20 x ~30
    rows), a dense broadcast grid fill for absent terms, then the
    bounded pairwise join — the corpus is scanned ONCE regardless of
    how many source pairs exist. Per-term contributions round to 8
    decimals and sum as exact decimals (order-independent), final JS
    rounded to 6 — the repo's float-exactness convention."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), " "), lambda t: t != ""
            )
        ).alias("term"),
    )
    counts = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.groupBy("source").agg(F.sum("cnt").alias("total"))
    sources = totals.select("source", "total")
    vocab = counts.select("term").distinct()
    # dense bounded grid (sources x vocab) so absent terms carry p=0
    grid = (
        sources.crossJoin(F.broadcast(vocab))
        .join(counts, on=["source", "term"], how="left")
        .select(
            "source",
            "term",
            (
                F.coalesce(F.col("cnt"), F.lit(0)).cast("double")
                / F.col("total").cast("double")
            ).alias("p"),
        )
    )
    a = grid.select(
        F.col("source").alias("source_a"),
        "term",
        F.col("p").alias("pa"),
    )
    b = grid.select(
        F.col("source").alias("source_b"),
        "term",
        F.col("p").alias("pb"),
    )
    pairs = a.join(b, on="term").filter(
        F.col("source_a") < F.col("source_b")
    )
    m = (F.col("pa") + F.col("pb")) / 2
    contrib = (
        F.when(
            F.col("pa") > 0,
            F.col("pa") * F.log(F.col("pa") / m) * 0.5,
        ).otherwise(F.lit(0.0))
        + F.when(
            F.col("pb") > 0,
            F.col("pb") * F.log(F.col("pb") / m) * 0.5,
        ).otherwise(F.lit(0.0))
    )
    return (
        pairs.select(
            "source_a",
            "source_b",
            F.round(contrib, 8).cast("decimal(18,8)").alias("c"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.round(F.sum("c").cast("double"), 6).alias("js_divergence"))
    )


SOURCE_DIVERGENCE_ORACLE = """
WITH toks AS (
  SELECT source, unnest(list_filter(string_split(lower(text), ' '),
                                    t -> t <> '')) AS term
  FROM documents
), counts AS (
  SELECT source, term, COUNT(*) AS cnt FROM toks GROUP BY 1, 2
), totals AS (
  SELECT source, SUM(cnt) AS total FROM counts GROUP BY 1
), vocab AS (SELECT DISTINCT term FROM counts),
grid AS (
  SELECT s.source, v.term,
         CAST(COALESCE(c.cnt, 0) AS DOUBLE) / CAST(s.total AS DOUBLE) AS p
  FROM totals s CROSS JOIN vocab v
  LEFT JOIN counts c ON c.source = s.source AND c.term = v.term
), pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, a.term,
         a.p AS pa, b.p AS pb
  FROM grid a JOIN grid b ON a.term = b.term AND a.source < b.source
)
SELECT source_a, source_b,
       ROUND(CAST(SUM(CAST(ROUND(
           CASE WHEN pa > 0
                THEN pa * ln(pa / ((pa + pb) / 2)) * 0.5 ELSE 0 END
         + CASE WHEN pb > 0
                THEN pb * ln(pb / ((pa + pb) / 2)) * 0.5 ELSE 0 END,
           8) AS DECIMAL(18,8))) AS DOUBLE), 6) AS js_divergence
FROM pairs GROUP BY 1, 2
"""

# Round-17 rotation: demoted after 6 green driver rounds (r11-r16).
EXTRA_QUERIES["text_source_divergence"] = text_source_divergence
EXTRA_ORACLES["text_source_divergence"] = SOURCE_DIVERGENCE_ORACLE


def text_normalize_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/CCNet-style ingestion cleaning (ext/textnorm.py). The
    synthetic corpus is already clean ASCII, so -- pii_redact precedent
    -- the query plants deterministic dirt per document (curly quotes,
    a zero-width space, an NBSP, an en dash, a BEL control char,
    double spaces; same expression in the oracle) so the chain is
    exercised for real, not as a no-op."""
    from pyspark.sql import functions as F

    from ..ext.textnorm import clean_text

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("\u201cHdr\u200b\u201d  "),
            F.col("text"),
            F.lit("\u00a0\u2013 t\u0007ail "),
            (F.col("doc_id") % 7).cast("string"),
        ).alias("text"),
    )
    return clean_text(docs).select(
        "doc_id", "text_clean", "n_chars_text_clean"
    )


def _textnorm_oracle() -> str:
    from ..ext.textnorm import clean_text_sql

    dirty = (
        "chr(8220) || 'Hdr' || chr(8203) || chr(8221) || '  ' || text"
        " || chr(160) || chr(8211) || ' t' || chr(7) || 'ail '"
        " || CAST(doc_id % 7 AS VARCHAR)"
    )
    clean = clean_text_sql(dirty)
    return f"""
SELECT doc_id,
       {clean} AS text_clean,
       CAST(LENGTH({clean}) AS BIGINT) AS n_chars_text_clean
FROM documents
"""


# Round-17 rotation: demoted after 6 green driver rounds (r11-r16).
EXTRA_QUERIES["text_normalize_clean"] = text_normalize_clean
EXTRA_ORACLES["text_normalize_clean"] = _textnorm_oracle()


def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (ext/textstats.py): top word-
    2-gram character fraction + duplicate 5-gram character weight per
    document — one codegen scan, no shuffle."""
    from ..ext.textstats import repetition_signals

    return repetition_signals(load_table(spark, sf_dir, "documents"))


def _repetition_oracle() -> str:
    from ..ext.textstats import repetition_signals_sql

    return repetition_signals_sql()


EXTRA_QUERIES["text_repetition_signals"] = text_repetition_signals
EXTRA_ORACLES["text_repetition_signals"] = _repetition_oracle()


BOUNDS = {
    "text_bpe_train": (
        "tests/test_rows_only_bounds.py::test_text_bpe_train_matches_single_node_reference"
        " — full merge table equals an independent single-node BPE replay"
    ),
    "text_bpe_fertility": (
        "tests/test_bpe.py::test_bpe_fertility_invariants"
        " — fertility >= 1, monotone in merges, == chars/word at zero merges"
    ),
}
