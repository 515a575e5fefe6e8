"""Text-analysis operators over the `documents` table (training-data ops).

All hot-path computation is JVM-side built-ins (split/filter/aggregate higher-
order functions) — no Python in the row path.  The doc-fingerprint op is the
one place a rolling hash is computed, still via SQL higher-order functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimic_spark.operators.catalog import load_tables, register, spread

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
    family="training-data: quality scoring (length/punct/stopword ratios) + token counting (whitespace + BPE-ish regex) — §2.8 string fns at scale",
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
       round(n_chars * 1.0 / len(words), 2) AS chars_per_word,
       len(regexp_extract_all(text, '[A-Za-z]{{1,4}}|[0-9]|[^A-Za-z0-9\\s]')) AS bpe_tokens
FROM tok
""",
)
def text_quality_scores(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc quality stats AND token counts (whitespace tokens == n_words;
    BPE-ish regex tokens as bpe_tokens) — merged with the former
    text_token_counts entry (r3) to keep every oracled query inside the
    driver's 50-entry correctness window; coverage is identical."""
    from mimic_spark.functions.arrow_kernels import make_text_quality_kernel

    (d,) = load_tables(spark, sf, "documents")
    # r9: all four counters (word count, punct count, stopword hits,
    # BPE-ish token count) come from ONE vectorized byte pass in an Arrow
    # kernel — exact twins of the split/regexp_count/HOF-filter expressions
    # they replace (the BPE alternation's greedy tokenization is countable
    # as ceil(letter_run/4) + digits + punct; see arrow_kernels).  The
    # ratio/rounding arithmetic stays in the JVM with the identical
    # expressions, so output values are unchanged.  spread lifts the scan
    # to core-count parallelism (no-op at real scale).
    k = spread(d.select("doc_id", "text", "n_chars")).mapInArrow(
        make_text_quality_kernel(STOPWORDS["en"]),
        "doc_id bigint, n_chars bigint, n_words int, n_punct int, "
        "stop_hits int, bpe int",
    )
    nw = F.col("n_words")
    return k.select(
        "doc_id",
        nw.alias("n_words"),
        F.col("n_chars").alias("n_chars"),
        F.col("n_punct").alias("n_punct"),
        F.round(F.col("stop_hits") * 1.0 / nw, 4).alias("stop_ratio"),
        F.round(F.col("n_chars") * 1.0 / nw, 2).alias("chars_per_word"),
        F.col("bpe").alias("bpe_tokens"),
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
    """Deterministic content fingerprint — identical integer arithmetic in
    Spark and DuckDB (no engine hash).

    r9: computed by a vectorized numpy kernel over Arrow batches
    (functions/arrow_kernels.py) instead of interpreted Catalyst
    higher-order functions.  The per-character rolling hash is exact int64
    arithmetic mod 2^31-1, so the kernel is bit-identical to the HOF
    expression it replaced (twin-tested incl. dirty-text fallback); the
    plan stays a single shuffle-free map stage (scan -> MapInArrow), and
    only (doc_id, text) crosses the Python boundary (guide §4.1/§4.2).
    Measured 4.7 s -> ~0.6 s at sf1 on local[32]."""
    from mimic_spark.functions.arrow_kernels import doc_fingerprint_batches

    (d,) = load_tables(spark, sf, "documents")
    return spread(d.select("doc_id", "text")).mapInArrow(
        doc_fingerprint_batches, "doc_id bigint, fingerprint bigint"
    )


@register(
    "text_redact_pii",
    family="training-data: PII redaction (regexp_replace scrub of emails/phones before training)",
    oracle="""
WITH seeded AS (
  SELECT doc_id,
         concat(substring(text, 1, 40), ' contact user', doc_id,
                '@example.com or +1 555-', lpad(cast(doc_id % 10000 AS VARCHAR), 4, '0'),
                '-', lpad(cast(doc_id % 97 AS VARCHAR), 4, '0'), ' now') AS text
  FROM documents
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                        '<EMAIL>', 'g'),
         '\\+?[0-9]{1,3}[- ]?[0-9]{3}[- ]?[0-9]{3,4}[- ]?[0-9]{3,4}',
         '<PHONE>', 'g') AS redacted,
       cast(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails
FROM seeded
""",
)
def text_redact_pii(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrub: the standard pre-training redaction pass.  The PII is
    seeded deterministically into the text (the synthetic corpus has none)
    so the regexes are exercised for real on every row; both engines build
    the identical seeded string.  Pure JVM regexp_replace — no UDF."""
    (d,) = load_tables(spark, sf, "documents")
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\+?[0-9]{1,3}[- ]?[0-9]{3}[- ]?[0-9]{3,4}[- ]?[0-9]{3,4}"
    seeded = F.concat(
        F.substring("text", 1, 40),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 97).cast("string"), 4, "0"),
        F.lit(" now"),
    )
    s = d.select("doc_id", seeded.alias("text"))
    return s.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(F.col("text"), email_re, "<EMAIL>"),
            phone_re,
            "<PHONE>",
        ).alias("redacted"),
        F.regexp_count(F.col("text"), F.lit(email_re)).cast("long").alias("n_emails"),
    )


@register(
    "tfidf_top_terms",
    family="training-data: per-doc top terms by TF with document-frequency rarity tiebreak (vocab/IDF build)",
    oracle="""
WITH words AS (
  SELECT doc_id, lower(unnest(regexp_split_to_array(trim(text), '\\s+'))) AS word
  FROM documents
),
tf AS (SELECT doc_id, word, count(*) AS tf FROM words GROUP BY doc_id, word),
df AS (SELECT word, count(DISTINCT doc_id) AS df FROM words GROUP BY word)
SELECT doc_id, word, cast(tf AS BIGINT) AS tf, cast(df AS BIGINT) AS df
FROM (
  SELECT tf.doc_id, tf.word, tf.tf, df.df,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, df.df ASC, tf.word) AS rn
  FROM tf JOIN df USING (word)
) WHERE rn <= 3
""",
)
def tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary/IDF build: term frequency per doc joined to corpus document
    frequency, top-3 terms per doc by TF with rarity (low df) tiebreak.
    Integer-only ordering keeps the oracle hash float-free.  Plan: explode ->
    two hash aggs -> broadcast-joined df (vocab is small relative to corpus)
    -> per-doc window top-k."""
    (d,) = load_tables(spark, sf, "documents")
    from pyspark.sql import Window as W

    words = d.select(
        "doc_id", F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word")
    )
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = words.groupBy("word").agg(F.count_distinct("doc_id").alias("df"))
    w = W.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("word")
    )
    return (
        tf.join(F.broadcast(df), "word")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn <= 3")
        .select("doc_id", "word", F.col("tf").cast("long"), F.col("df").cast("long"))
    )


@register(
    "contamination_ngram_overlap",
    family="training-data: train/test contamination check via shingle containment (n-gram overlap vs held-out set)",
    oracle="""
WITH words AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                  i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingle
    FROM words)
),
test_sh AS (SELECT doc_id AS test_id, shingle FROM sh WHERE doc_id % 10 = 0),
train_sh AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 10 <> 0),
sizes AS (SELECT doc_id, count(*) AS n FROM train_sh GROUP BY doc_id),
hits AS (
  SELECT t.doc_id, s.test_id, count(*) AS c
  FROM train_sh t JOIN test_sh s USING (shingle)
  GROUP BY t.doc_id, s.test_id
)
SELECT h.doc_id AS doc_id, h.test_id AS test_id,
       round(h.c * 1.0 / z.n, 4) AS containment
FROM hits h JOIN sizes z USING (doc_id)
WHERE h.c * 1.0 / z.n >= 0.3
""",
)
def contamination_ngram_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark-contamination scan: for every training doc, shingle
    containment against a held-out 'test set' (docs with doc_id % 10 == 0
    stand in for the benchmark).  Flags train docs whose 3-gram containment
    vs some test doc is >= 0.3 — the standard n-gram decontamination pass.
    Plan: one shingle explode, split into train/test streams, equi-join on
    shingle (the test side is the small one — broadcastable at real scale),
    count per (train, test) pair.  No all-pairs product."""
    from mimic_spark.operators.dedup import _shingles

    (d,) = load_tables(spark, sf, "documents")
    sh = _shingles(d)
    test_sh = sh.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("test_id"), "shingle"
    )
    train_sh = sh.filter(F.col("doc_id") % 10 != 0)
    sizes = train_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    hits = (
        train_sh.join(F.broadcast(test_sh), "shingle")
        .groupBy("doc_id", "test_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    containment = F.col("c") * 1.0 / F.col("n")
    return (
        hits.join(sizes, "doc_id")
        .filter(containment >= 0.3)
        .select("doc_id", "test_id", F.round(containment, 4).alias("containment"))
    )


@register(
    "sample_stratified",
    family="training-data: deterministic stratified sampling (per-stratum rates, reproducible hash gate)",
    oracle="""
WITH strata AS (
  SELECT doc_id, n_chars,
         doc_id % 5 AS stratum,
         (doc_id % 5 + 1) * 10 AS rate_pct,
         ((doc_id % 2147483647) * 2654435761) % 100 AS gate
  FROM documents
)
SELECT doc_id, cast(stratum AS BIGINT) AS stratum,
       cast(rate_pct AS BIGINT) AS rate_pct, n_chars
FROM strata WHERE gate < rate_pct
""",
)
def sample_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Reproducible stratified downsampling — the curation pass that keeps
    x% per source/quality stratum.  The keep-gate is pure integer arithmetic
    on the key (Knuth multiplicative hash mod 100), so the sample is
    deterministic across engines, runs, retries and cluster sizes — no RNG
    state, no seed plumbing, filter fully pushed into the scan."""
    (d,) = load_tables(spark, sf, "documents")
    stratum = F.col("doc_id") % 5
    rate = (stratum + 1) * 10
    # reduce the key mod 2^31-1 BEFORE the Knuth multiply: the product then
    # stays < 2^62 for ANY doc_id, so the gate never overflows BIGINT in
    # either engine (unreduced, doc_id > ~3.5e9 wraps in Spark and errors in
    # DuckDB/ANSI mode — r2 ADVICE finding)
    gate = ((F.col("doc_id") % 2147483647) * F.lit(2654435761)) % 100
    return (
        d.select(
            "doc_id",
            stratum.cast("long").alias("stratum"),
            rate.cast("long").alias("rate_pct"),
            "n_chars",
        )
        .filter(gate < rate)
    )


@register(
    "text_repetition_score",
    family="training-data: repetition/boilerplate scoring — distinct-trigram ratio per doc (registers after the frozen 50-query window; value-checked by tools/check_correctness.py)",
    oracle="""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
  FROM documents
), t AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, greatest(len(ws) - 2, 0)),
           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
         ) AS tris
  FROM w
)
SELECT doc_id,
       CAST(len(tris) AS BIGINT) AS n_trigrams,
       CAST(len(list_distinct(tris)) AS BIGINT) AS n_distinct_trigrams,
       CASE WHEN len(tris) > 0
            THEN 1.0 - len(list_distinct(tris)) * 1.0 / len(tris)
            ELSE NULL END AS rep_ratio
FROM t
""",
)
def text_repetition_score(spark: SparkSession, sf: str) -> DataFrame:
    """Repetition / boilerplate score: 1 - distinct_trigrams/total_trigrams
    per document (high ratio = TV-static boilerplate, SEO spam, template
    text — a standard pretraining quality gate alongside
    text_quality_scores' length/stopword features).

    Computed ARRAY-LOCALLY (transform over a word-index sequence, then
    array_distinct): zero shuffles — the scale-optimal shape for a per-doc
    score.  The alternative explode→groupBy(doc_id) plan triples the data
    and shuffles the whole corpus by doc_id; the higher-order functions here
    are CodegenFallback (interpreted, still JVM) but that trade wins at
    100 TB because it removes the corpus-wide exchange entirely."""
    (d,) = load_tables(spark, sf, "documents")
    ws = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n = F.size(ws)
    idx = F.when(n >= 3, F.sequence(F.lit(1), n - 2)).otherwise(
        F.array().cast("array<int>")
    )
    tris = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ",
            F.element_at(ws, i),
            F.element_at(ws, i + 1),
            F.element_at(ws, i + 2),
        ),
    )
    staged = d.select("doc_id", tris.alias("tris"))
    n_tris = F.size("tris")
    n_dist = F.size(F.array_distinct("tris"))
    return staged.select(
        "doc_id",
        n_tris.cast("long").alias("n_trigrams"),
        n_dist.cast("long").alias("n_distinct_trigrams"),
        F.when(
            n_tris > 0, F.lit(1.0) - n_dist * F.lit(1.0) / n_tris
        ).alias("rep_ratio"),
    )


CHUNK_WORDS = 64  # window size (words per chunk)
CHUNK_STRIDE = 48  # overlap = CHUNK_WORDS - CHUNK_STRIDE = 16 words


@register(
    "chunk_documents",
    family="training-data: sliding-window document chunking for context windows / embedding input (registers after the frozen 50-query window; value-checked by tools/check_correctness.py)",
    oracle=f"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\r\\f]+') AS ws
  FROM documents
), s AS (
  SELECT doc_id, ws,
         unnest(generate_series(1, len(ws), {CHUNK_STRIDE})) AS start
  FROM w
)
SELECT doc_id,
       CAST((start - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       array_to_string(
         list_slice(ws, start, least(start + {CHUNK_WORDS} - 1, len(ws))),
         ' ') AS chunk_text,
       CAST(least({CHUNK_WORDS}, len(ws) - start + 1) AS BIGINT) AS n_tokens
FROM s
""",
)
def chunk_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding-window chunking: split each document into 64-word windows
    every 48 words (16-word overlap) — the preprocessing step that feeds
    context-window-bounded consumers (embedding models, RAG indexes,
    packed pretraining sequences via pack_sequences).

    Chunk starts are 1, 1+stride, ... <= n_words, mirrored exactly by the
    DuckDB oracle's generate_series.  All JVM-side (split + sequence +
    slice + explode): the only data movement is the explode's row growth
    (~n_words/stride rows per doc), no shuffle at all — chunking stays a
    pure map stage at any corpus size."""
    (d,) = load_tables(spark, sf, "documents")
    ws = F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+")
    staged = d.select("doc_id", ws.alias("ws"))
    n = F.size("ws")
    starts = F.sequence(F.lit(1), n, F.lit(CHUNK_STRIDE))
    ex = staged.select(
        "doc_id", "ws", F.explode(starts).alias("start")
    )
    return ex.select(
        "doc_id",
        ((F.col("start") - 1) / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
        F.concat_ws(
            " ", F.slice(F.col("ws"), F.col("start"), F.lit(CHUNK_WORDS))
        ).alias("chunk_text"),
        F.least(
            F.lit(CHUNK_WORDS), F.size("ws") - F.col("start") + 1
        ).cast("long").alias("n_tokens"),
    )
