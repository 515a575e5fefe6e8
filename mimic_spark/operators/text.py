"""Text-analysis operators over the `documents` table (training-data ops).

All hot-path computation is JVM-side built-ins (split/filter/aggregate higher-
order functions) — no Python in the row path.  The doc-fingerprint op is the
one place a rolling hash is computed, still via SQL higher-order functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimic_spark.operators.catalog import load_tables, register

STOPWORDS = {
    "en": ["the", "of", "and", "to", "a", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "por", "que"],
}


def _words(col: str = "text") -> F.Column:
    return F.split(F.trim(F.col(col)), r"\s+")


def _stop_hits(words: F.Column, lang: str) -> F.Column:
    lst = STOPWORDS[lang]
    return F.size(F.filter(words, lambda w: w.isin(lst)))


def _sql_stop_hits(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter(words, w -> w IN ({lst})))"


@register(
    "text_quality_scores",
    family="training-data: quality scoring (length/punct/stopword ratios) — §2.8 string fns at scale",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, text, n_chars,
         regexp_split_to_array(trim(text), '\\s+') AS words
  FROM documents
)
SELECT doc_id,
       len(words) AS n_words,
       n_chars AS n_chars,
       len(regexp_replace(text, '[A-Za-z0-9\\s]+', '', 'g')) AS n_punct,
       round({_sql_stop_hits("en")} * 1.0 / len(words), 4) AS stop_ratio,
       round(n_chars * 1.0 / len(words), 2) AS chars_per_word
FROM tok
""",
)
def text_quality_scores(spark: SparkSession, sf: str) -> DataFrame:
    (d,) = load_tables(spark, sf, "documents")
    d = d.withColumn("words", _words())
    nw = F.size("words")
    return d.select(
        "doc_id",
        nw.alias("n_words"),
        F.col("n_chars").alias("n_chars"),
        F.length(F.regexp_replace("text", r"[A-Za-z0-9\s]+", "")).alias("n_punct"),
        F.round(_stop_hits(F.col("words"), "en") * 1.0 / nw, 4).alias("stop_ratio"),
        F.round(F.col("n_chars") * 1.0 / nw, 2).alias("chars_per_word"),
    )


@register(
    "text_token_counts",
    family="training-data: token counting (whitespace + BPE-ish regex)",
    oracle="""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\\s+')) AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]')) AS bpe_tokens
FROM documents
""",
)
def text_token_counts(spark: SparkSession, sf: str) -> DataFrame:
    (d,) = load_tables(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.size(_words()).alias("ws_tokens"),
        F.size(
            F.expr(r"regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]', 0)")
        ).alias("bpe_tokens"),
    )


@register(
    "lang_id_stopwords",
    family="training-data: language-ID by stopword-hit argmax (n-gram heuristic)",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
  FROM documents
),
hits AS (
  SELECT doc_id, lang,
         {_sql_stop_hits("en")} AS h_en,
         {_sql_stop_hits("de")} AS h_de,
         {_sql_stop_hits("fr")} AS h_fr,
         {_sql_stop_hits("es")} AS h_es
  FROM tok
)
SELECT doc_id, lang,
       CASE WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
            WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
            WHEN h_fr >= h_es THEN 'fr'
            ELSE 'es' END AS lang_guess
FROM hits
""",
)
def lang_id_stopwords(spark: SparkSession, sf: str) -> DataFrame:
    (d,) = load_tables(spark, sf, "documents")
    words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    d = d.withColumn("words", words)
    h = {lang: _stop_hits(F.col("words"), lang) for lang in STOPWORDS}
    guess = (
        F.when(
            (h["en"] >= h["de"]) & (h["en"] >= h["fr"]) & (h["en"] >= h["es"]), "en"
        )
        .when((h["de"] >= h["fr"]) & (h["de"] >= h["es"]), "de")
        .when(h["fr"] >= h["es"], "fr")
        .otherwise("es")
    )
    return d.select("doc_id", "lang", guess.alias("lang_guess"))


@register(
    "doc_fingerprint",
    family="training-data: document fingerprint (rolling polynomial hash over words, mod 2^31-1)",
    oracle="""
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words FROM documents
),
wh AS (  -- per-word rolling hash over characters, then combine over words
  SELECT doc_id,
         list_transform(words,
           w -> list_reduce(
                  list_prepend(cast(0 AS BIGINT),
                    list_transform(generate_series(1, length(w)),
                                   i -> cast(unicode(substring(w, i, 1)) AS BIGINT))),
                  (acc, x) -> (acc * 31 + x) % 2147483647)) AS word_hashes
  FROM tok
)
SELECT doc_id,
       list_reduce(list_prepend(cast(0 AS BIGINT), word_hashes),
                   (acc, x) -> (acc * 1000003 + x) % 2147483647) AS fingerprint
FROM wh
""",
)
def doc_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic content fingerprint, pure SQL higher-order functions —
    identical integer arithmetic in Spark and DuckDB (no engine hash)."""
    (d,) = load_tables(spark, sf, "documents")
    word_hash = (
        "aggregate(transform(sequence(1, length(w)), "
        "i -> cast(ascii(substring(w, i, 1)) AS BIGINT)), "
        "cast(0 AS BIGINT), (acc, x) -> pmod(acc * 31 + x, 2147483647))"
    )
    return (
        d.withColumn("words", _words())
        .withColumn(
            "word_hashes", F.expr(f"transform(words, w -> {word_hash})")
        )
        .select(
            "doc_id",
            F.expr(
                "aggregate(word_hashes, cast(0 AS BIGINT), "
                "(acc, x) -> pmod(acc * 1000003 + x, 2147483647))"
            ).alias("fingerprint"),
        )
    )
