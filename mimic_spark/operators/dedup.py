"""Deduplication operator family over `documents` (training-data pipeline ops).

Strategies, each a `queries()` entry (plus dedup_embedding_cosine in
similarity.py and connected-component clustering at the end of this file):
- exact (normalized-key hash groupBy)            — SQL-oracled
- n-gram Jaccard pairs (shingle self-join)       — SQL-oracled
- MinHash + LSH candidate pairs + verification   — rows-only (engine hash),
  verified in pytest as (a) a subset of the exact-Jaccard pairs and (b)
  deterministic across runs
- SimHash near-dup pairs                         — rows-only, pytest twin

Scale posture: the shingle self-join is the canonical big-data near-dup plan
(explode -> shuffle on shingle -> pair-count) and is what MinHash/LSH then
*approximates* with banding to avoid the quadratic candidate blow-up; both are
implemented so the LSH path can be validated against the exact one at small SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimic_spark.operators.catalog import load_tables, register

JACCARD_THRESHOLD = 0.5
SHINGLE_N = 3


def _shingles(df: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id -> distinct word-3-gram shingles (JVM-side higher-order fns).

    Grams are built with element_at rather than slice: slice allocates a new
    array per gram and measured 10x slower on ~500-word docs (5.5s -> 0.5s
    for 260k shingles). The word array is materialized once per row first so
    the lambda doesn't re-split the text per reference."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    staged = df.select("doc_id", words.alias("_w"))
    w = F.col("_w")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(w) - (SHINGLE_N - 1), F.lit(0))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, i + k) for k in range(SHINGLE_N)]
        ),
    )
    return staged.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("shingle")
    )


@register(
    "dedup_exact",
    family="training-data: exact dedup via normalized-key groupBy (ref A2/S6 idempotent identity)",
    oracle="""
WITH keyed AS (
  SELECT doc_id,
         lower(concat_ws(' ',
           regexp_split_to_array(trim(text), '\\s+')[1],
           regexp_split_to_array(trim(text), '\\s+')[2],
           regexp_split_to_array(trim(text), '\\s+')[3])) AS dedup_key
  FROM documents
)
SELECT doc_id, dedup_key,
       min(doc_id) OVER (PARTITION BY dedup_key) AS canonical_id,
       (doc_id <> min(doc_id) OVER (PARTITION BY dedup_key)) AS is_dup
FROM keyed
""",
)
def dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup on a normalized key (first 3 words, lowercased): every doc
    maps to the group's canonical (min) doc_id — the reference's
    deterministic-identity dedup (W1/S6) applied to documents."""
    from pyspark.sql import Window as W

    (d,) = load_tables(spark, sf, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    key = F.lower(F.concat_ws(" ", F.slice(words, 1, 3)))
    keyed = d.select("doc_id", key.alias("dedup_key"))
    w = W.partitionBy("dedup_key")
    return keyed.select(
        "doc_id",
        "dedup_key",
        F.min("doc_id").over(w).alias("canonical_id"),
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_dup"),
    )


@register(
    "dedup_ngram_jaccard",
    family="training-data: near-dup pairs by word-3-gram Jaccard >= 0.5 (exact shingle self-join)",
    oracle=f"""
WITH words AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(w) - {SHINGLE_N - 1}, 0)),
                  i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingle
    FROM words)
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE c * 1.0 / (sa.n + sb.n - c) >= {JACCARD_THRESHOLD}
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    (d,) = load_tables(spark, sf, "documents")
    sh = _shingles(d).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # lossless prune: a shingle held by a single doc can never produce a
    # pair — drop it before the quadratic self-join (set sizes for the
    # Jaccard denominator still use the unpruned counts above)
    shared = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > 1)
        .select("shingle")
    )
    sh_shared = sh.join(shared, "shingle")
    a = sh_shared.alias("a")
    b = sh_shared.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("c") * 1.0 / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


N_MINHASH = 16
LSH_BANDS = 4  # 4 bands x 4 rows


@register(
    "dedup_minhash_lsh",
    family="training-data: MinHash+LSH near-dup (shingle->minhash->band->bucket-join->verify)",
    oracle=None,  # minhash uses xxhash64 (engine-specific); pytest asserts
    # candidates verify to a subset of dedup_ngram_jaccard's exact pairs
)
def dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Scalable near-dup: 16 minhashes -> 4 LSH bands -> bucket self-join for
    candidates -> exact Jaccard verification of candidates only.

    At 100 TB the shingle self-join in dedup_ngram_jaccard is quadratic in
    hot shingles; this plan shuffles only (doc, band-signature) rows and
    verifies a near-linear candidate set."""
    (d,) = load_tables(spark, sf, "documents")
    sh = _shingles(d)

    mins = sh.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"mh{i}")
            for i in range(N_MINHASH)
        ]
    )
    rows_per_band = N_MINHASH // LSH_BANDS
    bands = mins.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.col(f"mh{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ]
                        ).alias("sig"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", "bs.band", "bs.sig")

    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.sig") == F.col("y.sig"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )

    # verify candidates with exact Jaccard (candidate set is small)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    pair_sh = cand.join(
        sh.select(F.col("doc_id").alias("doc_a"), F.col("shingle").alias("sh_a")),
        "doc_a",
    ).join(
        sh.select(F.col("doc_id").alias("doc_b"), F.col("shingle").alias("sh_b")),
        "doc_b",
    )
    common = pair_sh.filter(F.col("sh_a") == F.col("sh_b")).groupBy(
        "doc_a", "doc_b"
    ).agg(F.count(F.lit(1)).alias("c"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("c") * 1.0 / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


@register(
    "dedup_simhash",
    family="training-data: SimHash 64-bit signatures + hamming<=3 near-dup pairs",
    oracle=None,  # xxhash64-based; determinism + symmetry asserted in pytest
)
def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash: per-word 64-bit hash; signature bit b = majority vote of word
    hash bits.  Bit votes via JVM higher-order functions over the word array;
    pair generation prunes on equal 16-bit sub-bands (hamming<=3 implies at
    least one of 4 sub-bands equal — pigeonhole), then exact popcount filter.
    """
    (d,) = load_tables(spark, sf, "documents")
    words = F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    hashes = F.transform(words, lambda w: F.xxhash64(w))
    # bit b vote: sum over words of (hash>>b)&1, majority => bit set
    nw = F.size(words)
    bits = [
        (
            F.aggregate(
                hashes,
                F.lit(0).cast("long"),
                lambda acc, h: acc + h.bitwiseAND(F.lit(1).cast("long")) if b == 0
                else acc + F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1).cast("long")),
            )
            * 2
            > nw.cast("long")
        ).cast("long")
        for b in range(64)
    ]
    sig = bits[0]
    for b in range(1, 64):
        sig = sig + F.shiftleft(bits[b], b)
    sigs = d.select("doc_id", sig.alias("simhash"))

    # band on 16-bit chunks for candidate pruning
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF).cast("long"))
                        .alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bc"),
    ).select("doc_id", "simhash", "bc.band", "bc.chunk")
    cand = (
        chunks.alias("x")
        .join(
            chunks.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.simhash").alias("sig_a"),
            F.col("y.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.filter(hamming <= 3).select(
        "doc_a", "doc_b", hamming.cast("int").alias("hamming")
    )


@register(
    "dedup_clusters",
    family="training-data: near-dup clustering — connected components over Jaccard pairs (iterative min-label propagation)",
    oracle=None,  # iterative algorithm (non-SQL-expressible); pytest asserts
    # pair-consistency and transitivity against dedup_ngram_jaccard
)
def dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Group near-duplicate documents into clusters and elect a canonical id.

    Connected components by iterative min-label propagation over the exact
    Jaccard pair set: every doc starts labeled with its own id; each round a
    doc adopts the minimum label among itself and its neighbors; fixpoint in
    O(diameter) rounds.  DataFrame-iterative pattern: the loop lives on the
    driver, each round is pure joins/aggregations, and localCheckpoint cuts
    the growing lineage (the standard Spark idiom for iterative algorithms;
    at cluster scale swap in GraphFrames' LPA — same semantics).
    """
    pairs = dedup_ngram_jaccard(spark, sf).select("doc_a", "doc_b")
    # undirected edge list, both directions
    edges = pairs.unionByName(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).cache()
    (d,) = load_tables(spark, sf, "documents")
    labels = d.select(
        F.col("doc_id"), F.col("doc_id").alias("cluster_id")
    ).localCheckpoint()

    changed = 0
    for _ in range(20):  # diameter bound; tiny for near-dup graphs
        neighbor_min = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("cluster_id").alias("nb_label"),
                ),
                "doc_b",
            )
            .groupBy(F.col("doc_a").alias("doc_id"))
            .agg(F.min("nb_label").alias("nb_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nb_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        # the loop exited on the round cap, not at fixpoint: clusters would
        # be silently split, violating the transitivity contract — fail loud
        raise RuntimeError(
            "dedup_clusters: min-label propagation did not converge within "
            "20 rounds (component diameter > 20); raise the bound or use a "
            "large-scale CC implementation (e.g. GraphFrames LPA)"
        )
    return labels.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") != F.col("cluster_id")).alias("is_dup"),
    )


@register(
    "dedup_levenshtein_blocked",
    family="training-data: edit-distance near-dup with blocking (equi-join on block key, no all-pairs)",
    oracle="""
WITH keyed AS (
  SELECT doc_id,
         lower(regexp_split_to_array(trim(text), '\\s+')[1]) AS block_key,
         substring(lower(trim(text)), 1, 80) AS head
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       cast(levenshtein(a.head, b.head) AS BIGINT) AS dist
FROM keyed a JOIN keyed b
  ON a.block_key = b.block_key AND a.doc_id < b.doc_id
WHERE levenshtein(a.head, b.head) <= 20
""",
)
def dedup_levenshtein_blocked(spark: SparkSession, sf: str) -> DataFrame:
    """Edit-distance near-dup on the doc head (first 80 chars), BLOCKED on
    the first word: the self-join is an equi-join on the block key, so the
    quadratic cost is per block, never corpus-wide — the classic blocking
    trick that keeps pairwise edit distance usable at scale.  levenshtein
    itself is a JVM built-in (no UDF)."""
    (d,) = load_tables(spark, sf, "documents")
    keyed = d.select(
        "doc_id",
        F.lower(F.element_at(F.split(F.trim(F.col("text")), r"\s+"), 1)).alias(
            "block_key"
        ),
        F.substring(F.lower(F.trim(F.col("text"))), 1, 80).alias("head"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    dist = F.levenshtein(F.col("a.head"), F.col("b.head"))
    return (
        a.join(
            b,
            (F.col("a.block_key") == F.col("b.block_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(dist <= 20)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.cast("long").alias("dist"),
        )
    )
