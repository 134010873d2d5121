"""Corpus-curation pipeline query: the full dedup → quality → lang →
enrich flow against one composed DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..ext.dedup import shingles_sql
from ..ext.textstats import ENGLISH_STOPWORDS
from ..jobs.corpus_job import curate
from ..sources import load_table

MIN_QUALITY = 0.5
LANGS = ("en", "de", "fr", "es")


def corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curate(
        load_table(spark, sf_dir, "documents"),
        min_quality=MIN_QUALITY,
        langs=LANGS,
    )


_TOKS = "list_filter(string_split(text, ' '), t -> t <> '')"
_STOPS = ", ".join(f"'{w}'" for w in ENGLISH_STOPWORDS)
_N_TOKENS = f"len({_TOKS})"
_STOP_RATIO = (
    f"ROUND(CAST(len(list_filter({_TOKS}, t -> t IN ({_STOPS}))) AS DOUBLE)"
    f" / {_N_TOKENS}, 6)"
)
_SCORE = (
    f"ROUND(LEAST(1.0, (CAST({_N_TOKENS} AS DOUBLE) / 50.0) * 0.5"
    f" + {_STOP_RATIO} * 2.0), 6)"
)

CORPUS_ORACLE = f"""
WITH keepers AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
), deduped AS (
  SELECT d.* FROM documents d JOIN keepers USING (doc_id)
), gated AS (
  SELECT doc_id, lang, text,
         CAST({_N_TOKENS} AS BIGINT) AS n_tokens,
         {_SCORE} AS quality_score
  FROM deduped
  WHERE {_SCORE} >= {MIN_QUALITY}
    AND lang IN ({", ".join(f"'{l}'" for l in LANGS)})
), prints AS (
  SELECT doc_id,
         array_to_string(list_slice(list_sort(list(h)), 1, 4), '') AS fingerprint
  FROM (
    SELECT DISTINCT doc_id, md5(shingle) AS h FROM (
      SELECT doc_id, unnest({shingles_sql('text')}) AS shingle FROM gated
    )
  )
  GROUP BY doc_id
)
SELECT g.doc_id, g.lang, g.n_tokens, g.quality_score, p.fingerprint
FROM gated g JOIN prints p USING (doc_id)
"""


# Round-9 driver rotation: corpus_curate demoted after 6 green driver
# rounds (r2-r8) — still oracle-checked via tests/test_oracle_parity.py.
QUERIES: dict = {}
ORACLES: dict = {}


def corpus_export_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full export tail under the hash gate: curate → PII-redact →
    chunk → pack, exactly jobs/export_job.build_export over the curated
    corpus (write step elided — the driver compares the frame).

    r19: the kept set comes from jobs.corpus_job.gated_corpus — the
    exact-dedup + quality + lang gates WITHOUT curate()'s fingerprint
    enrichment, which this chain never reads and which cannot change
    membership (fingerprint() is exactly one row per doc because
    shingles() emits ≥1 shingle per document). The old form evaluated
    the full curate subtree, fingerprint shuffle included, once per
    export branch: 42 exchanges → 3."""
    from ..jobs.corpus_job import gated_corpus
    from ..jobs.export_job import build_export

    docs = load_table(spark, sf_dir, "documents")
    curated = gated_corpus(docs, min_quality=MIN_QUALITY, langs=LANGS).select(
        "doc_id", "text", "source"
    )
    return build_export(curated).select(
        "shard", "bin_id", "doc_id", "chunk_idx", "chunk", "n_tokens"
    )


def _export_chain_oracle() -> str:
    from ..ext.chunking import chunk_documents_sql, pack_sequences_sql
    from ..ext.curation import PII_PATTERNS
    from ..ext.textstats import quality_score_sql

    red = "text"
    for kind in ("email", "phone", "ipv4"):
        red = (
            f"regexp_replace({red}, '{PII_PATTERNS[kind]}',"
            f" '<{kind.upper()}>', 'g')"
        )
    langs = ", ".join(f"'{l}'" for l in LANGS)
    return f"""
WITH keepers AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
), deduped AS (
  SELECT d.* FROM documents d JOIN keepers USING (doc_id)
), clean AS (
  SELECT doc_id, {red} AS text, source FROM deduped
  WHERE {quality_score_sql()} >= {MIN_QUALITY} AND lang IN ({langs})
), bins AS (
  SELECT doc_id, shard, bin_id FROM ({pack_sequences_sql(table='clean')})
), chunks AS (
  SELECT * FROM ({chunk_documents_sql(table='clean')})
)
SELECT b.shard, b.bin_id, c.doc_id, c.chunk_idx, c.chunk, c.n_tokens
FROM chunks c JOIN bins b USING (doc_id)
"""


EXTRA_QUERIES = {
    "corpus_curate": corpus_curate,
}
EXTRA_ORACLES = {
    "corpus_curate": CORPUS_ORACLE,
}
# Round-19 rotation: promoted (never driver-checked; the full
# chunk->pack->export chain over documents).
QUERIES["corpus_export_chain"] = corpus_export_chain
ORACLES["corpus_export_chain"] = _export_chain_oracle()


def recipe_funnel_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token accounting through the curation funnel (round 9): docs
    and whitespace tokens surviving each stage — raw → exact-dedup
    keepers → Gopher quality gate → benchmark decontamination. The
    observability view a pretraining recipe publishes ("how many
    training tokens does each filter cost?"). Each stage is the SAME
    operator the recipe job runs (ext/dedup, ext/textstats,
    ext/curation); the output is 4 bounded rows from corpus-pass
    aggregations, exact long token sums."""
    from pyspark.sql import functions as F

    from ..ext.curation import decontaminate
    from ..ext.dedup import exact_dedup_groups
    from ..ext.textstats import gopher_quality_rules

    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(
        F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    ).cast("long")
    # Shared stage frames (toks ×4, keepers ×3, quality ×2 across the
    # union branches) are left as PLAIN expressions: the repeated
    # subtrees share their shuffle output via ReusedExchange (the
    # digest groupBy's exchange is byte-identical in every reference),
    # and the per-branch tails are cheap id-set merges. The r19 eager
    # localCheckpoints forced three SERIAL construction-time
    # materialization jobs before the main plan could start — the
    # driver measured 1.27 → 2.21 s, the round's one real regression
    # (r19 verdict item 1) — because at this working-set size the fixed
    # job cost exceeds the recompute the checkpoints save. At 100 TB a
    # recipe run persists these stage frames between stages; that is
    # the production shape, not a per-query construction job.
    toks = docs.select("doc_id", n_tok.alias("n_tok"))

    keepers = exact_dedup_groups(docs).select(
        F.col("keeper_id").alias("doc_id")
    )
    quality = (
        keepers.join(
            gopher_quality_rules(docs).select("doc_id", "passes_gopher"),
            on="doc_id",
        )
        .filter(F.col("passes_gopher"))
        .select("doc_id")
    )
    stage3_docs = docs.join(quality, on="doc_id").filter(
        F.col("doc_id") >= 25
    )
    bench = docs.filter(F.col("doc_id") < 25)
    decon = decontaminate(stage3_docs, bench).select("doc_id")

    def stage(name, ids):
        return (
            ids.join(toks, on="doc_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_tok").cast("long").alias("n_tokens"),
            )
            .select(F.lit(name).alias("stage"), "n_docs", "n_tokens")
        )

    return (
        stage("1_raw", docs.select("doc_id"))
        .unionByName(stage("2_exact_dedup", keepers))
        .unionByName(stage("3_quality", quality))
        .unionByName(stage("4_decontaminated", decon))
    )


def _funnel_oracle() -> str:
    from ..ext.dedup import shingles_sql
    from ..ext.textstats import gopher_quality_rules_sql

    grams = shingles_sql("text", 8)
    return f"""
WITH toks AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
              AS BIGINT) AS n_tok
  FROM documents
), keepers AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
), gq AS (
  SELECT doc_id, passes_gopher
  FROM ({gopher_quality_rules_sql()})
), quality AS (
  SELECT k.doc_id FROM keepers k JOIN gq USING (doc_id)
  WHERE passes_gopher
), bench_grams AS (
  SELECT DISTINCT md5(g) AS h
  FROM (SELECT unnest({grams}) AS g FROM documents WHERE doc_id < 25)
), contaminated AS (
  SELECT DISTINCT d.doc_id
  FROM (SELECT doc_id, md5(unnest({grams})) AS h
        FROM documents
        WHERE doc_id >= 25
          AND doc_id IN (SELECT doc_id FROM quality)) d
  WHERE d.h IN (SELECT h FROM bench_grams)
), decon AS (
  SELECT doc_id FROM quality
  WHERE doc_id >= 25
    AND doc_id NOT IN (SELECT doc_id FROM contaminated)
), stages AS (
  SELECT '1_raw' AS stage, doc_id FROM documents
  UNION ALL SELECT '2_exact_dedup', doc_id FROM keepers
  UNION ALL SELECT '3_quality', doc_id FROM quality
  UNION ALL SELECT '4_decontaminated', doc_id FROM decon
)
SELECT stage,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM stages JOIN toks USING (doc_id)
GROUP BY stage
"""


# Round-18 rotation: promoted (never driver-checked; the per-stage
# doc/token accounting over the chained curation recipe).
QUERIES["recipe_funnel_accounting"] = recipe_funnel_accounting
ORACLES["recipe_funnel_accounting"] = _funnel_oracle()
