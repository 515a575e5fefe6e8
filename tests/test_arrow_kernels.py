"""r9 optimization twins: the vectorized Arrow/numpy kernels must be
value-identical to the Catalyst higher-order-function expressions they
replaced — on the clean fast path AND on dirty text that forces the
per-row Python fallback (tabs, unicode, double/edge spaces, empties,
NULLs)."""

from __future__ import annotations

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

DIRTY_TEXTS = [
    "plain single space words here",
    "double  space",
    "tab\tseparated words",
    " leading space",
    "trailing space ",
    "trailing tab\t",
    "",
    None,
    "one",
    "exactly three words",
    "nbsp inside and café words",
    "newline\nbreaks words apart",
    "a b c d e f g h i j k l",
    "punct, marks; and 123 digits! (mixed) 4567",
    "LongishWordThatExceedsFourLetters plus tiny a bb ccc dddd eeeee",
]


@pytest.fixture(scope="module")
def dirty_df(spark):
    rows = [(i, t) for i, t in enumerate(DIRTY_TEXTS)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_doc_fingerprint_kernel_matches_hof(spark, dirty_df):
    from mimic_spark.functions.arrow_kernels import doc_fingerprint_batches

    word_hash = (
        "aggregate(transform(sequence(1, length(w)), "
        "i -> cast(ascii(substring(w, i, 1)) AS BIGINT)), "
        "cast(0 AS BIGINT), (acc, x) -> pmod(acc * 31 + x, 2147483647))"
    )
    hof = (
        dirty_df.withColumn("words", F.split(F.trim(F.col("text")), r"\s+"))
        .withColumn("word_hashes", F.expr(f"transform(words, w -> {word_hash})"))
        .select(
            "doc_id",
            F.expr(
                "aggregate(word_hashes, cast(0 AS BIGINT), "
                "(acc, x) -> pmod(acc * 1000003 + x, 2147483647))"
            ).alias("fingerprint"),
        )
    )
    kern = dirty_df.select("doc_id", "text").mapInArrow(
        doc_fingerprint_batches, "doc_id bigint, fingerprint bigint"
    )
    assert sorted(map(tuple, hof.collect())) == sorted(
        map(tuple, kern.collect())
    )


def test_minhash_kernel_matches_hof(spark, dirty_df):
    from mimic_spark.functions.arrow_kernels import make_minhash_kernel
    from mimic_spark.functions.portable_hash import (
        HASH_MOD,
        hash_family,
        spark_word_hashes,
    )

    family = hash_family(4)
    staged = dirty_df.select(
        "doc_id",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("words"),
    ).select("doc_id", F.expr(spark_word_hashes("words")).alias("wh"))
    base_expr = (
        f"array_distinct(transform(sequence(1, size(wh) - 2), "
        f"i -> ((element_at(wh, i) * 131 + element_at(wh, i + 1)) * 131 "
        f"+ element_at(wh, i + 2)) % {HASH_MOD}))"
    )
    b = staged.filter(F.size("wh") >= 3).select(
        "doc_id", F.explode(F.expr(base_expr)).alias("b")
    )
    hof = b.groupBy("doc_id").agg(
        *[
            F.expr(f"min((b * {a} + {c}) % {HASH_MOD})").alias(f"mh{i}")
            for i, (a, c) in enumerate(family)
        ]
    )
    # the minhash text is LOWERCASED upstream in the operator; mirror that
    lowered = dirty_df.select("doc_id", F.lower(F.trim("text")).alias("text"))
    kern = lowered.mapInArrow(
        make_minhash_kernel(family),
        "doc_id bigint, mh0 bigint, mh1 bigint, mh2 bigint, mh3 bigint",
    )
    assert sorted(map(tuple, hof.collect())) == sorted(
        map(tuple, kern.collect())
    )


def test_text_quality_kernel_matches_expressions(spark, dirty_df):
    from mimic_spark.functions.arrow_kernels import make_text_quality_kernel
    from mimic_spark.operators.text import STOPWORDS, _stop_hits

    d = dirty_df.withColumn("n_chars", F.length("text").cast("long"))
    words = F.split(F.trim(F.col("text")), r"\s+")
    hof = d.withColumn("words", words).select(
        "doc_id",
        F.size("words").alias("n_words"),
        F.length(F.regexp_replace("text", r"[A-Za-z0-9\s]+", "")).alias(
            "n_punct"
        ),
        _stop_hits(F.col("words"), "en").alias("stop_hits"),
        F.size(
            F.expr(
                r"regexp_extract_all(text,"
                r" '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]', 0)"
            )
        ).alias("bpe"),
    )
    kern = d.select("doc_id", "text", "n_chars").mapInArrow(
        make_text_quality_kernel(STOPWORDS["en"]),
        "doc_id bigint, n_chars bigint, n_words int, n_punct int, "
        "stop_hits int, bpe int",
    ).select("doc_id", "n_words", "n_punct", "stop_hits", "bpe")
    h = {r["doc_id"]: r for r in hof.collect()}
    k = {r["doc_id"]: r for r in kern.collect()}
    assert set(h) == set(k)
    for i in h:
        # size()/HOFs return -1/NULL conventions for NULL input; kernel
        # returns NULL for every counter of a NULL text
        if DIRTY_TEXTS[i] is None:
            assert k[i]["n_words"] is None
            continue
        for c in ("n_words", "n_punct", "stop_hits", "bpe"):
            assert h[i][c] == k[i][c], (i, c, h[i], k[i])


def test_local_topk_kernel_never_changes_result(spark):
    from mimic_spark.functions.arrow_kernels import make_local_topk_kernel
    from pyspark.sql import Window as W

    rows = [
        (i, float((i * 37) % 101), ["a", "b", "c"][i % 3]) for i in range(500)
    ]
    # duplicate values force tiebreak reliance; add a null group row to hit
    # the pass-through branch
    df = spark.createDataFrame(rows, "k bigint, v double, g string")
    w = W.partitionBy("g").orderBy(F.col("v").desc(), F.col("k"))
    exact = (
        df.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 3")
        .select("g", "k", "v")
    )
    cand = df.select("k", "v", "g").mapInArrow(
        make_local_topk_kernel("g", "v", "k", 3),
        "k bigint, v double, g string",
    )
    viak = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 3")
        .select("g", "k", "v")
    )
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, viak.collect())
    )


def test_cosine_kernel_bit_identical(spark):
    from mimic_spark.functions.arrow_kernels import make_cosine_topk_kernel
    from mimic_spark.operators.similarity import _dot, _norm

    import random

    rnd = random.Random(7)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    e = spark.createDataFrame(rows, "vec_id bigint, v array<double>")
    q = [(r[0], r[1]) for r in rows[:2]]
    kern = e.mapInArrow(
        make_cosine_topk_kernel(q, 8),
        "query_id bigint, neighbor_id bigint, cos_raw double",
    )
    qdf = e.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    hof = e.join(F.broadcast(qdf), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            _dot(F.col("qv"), F.col("v"))
            / (_norm(F.col("qv")) * _norm(F.col("v")))
        ).alias("cos_raw"),
    )
    a = {(r[0], r[1]): r[2] for r in kern.collect()}
    b = {(r[0], r[1]): r[2] for r in hof.collect()}
    assert set(a) == set(b)
    for key in a:
        # bit-identical doubles, not approximately equal
        assert a[key] == b[key], (key, a[key].hex(), b[key].hex())
