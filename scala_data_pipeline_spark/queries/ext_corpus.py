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
    corpus (write step elided — the driver compares the frame)."""
    from pyspark.sql import functions as F

    from ..jobs.export_job import build_export

    docs = load_table(spark, sf_dir, "documents")
    kept = curate(docs, min_quality=MIN_QUALITY, langs=LANGS).select("doc_id")
    curated = docs.join(kept, on="doc_id").select("doc_id", "text", "source")
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
    "corpus_export_chain": corpus_export_chain,
}
EXTRA_ORACLES = {
    "corpus_curate": CORPUS_ORACLE,
    "corpus_export_chain": _export_chain_oracle(),
}
