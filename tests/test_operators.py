"""Operator-catalog tests, focused on what the DuckDB oracle can't check:

- rows-only ops (engine-hash-based): determinism, cross-validation against
  their exact counterparts (LSH vs brute force, minhash vs exact Jaccard);
- deterministic_row_id stability across runs (the reference's
  test_deterministic_load_row_id.py contract);
- plan-shape assertions: broadcast where intended, no row-at-a-time Python
  (BatchEvalPython) anywhere, filter pushdown reaching the parquet scan.
"""

from __future__ import annotations

import pytest

from mimic_spark.operators import OPS

SF = "/root/testdata/sf0.001"


def test_registry_complete():
    # every op has a fn; SQL-expressible ones carry oracles
    assert len(OPS) >= 30
    n_oracled = sum(1 for op in OPS.values() if op.oracle)
    assert n_oracled >= 25


def test_deterministic_row_id_stable(spark):
    """Same rows -> same ids across two independent executions
    (ref test/py/test_deterministic_load_row_id.py:28-70)."""
    fn = OPS["deterministic_row_id"].fn
    a = {r["o_orderkey"]: r["load_row_id"] for r in fn(spark, SF).collect()}
    b = {r["o_orderkey"]: r["load_row_id"] for r in fn(spark, SF).collect()}
    assert a == b
    # injective in practice over this keyspace
    assert len(set(a.values())) == len(a)


def test_production_id_is_xxhash64_not_portable_twin(spark):
    """The interpreted portable-hash row id exists ONLY as the DuckDB oracle
    twin (operators/relational.py deterministic_row_id_op); the engine's
    production id path is xxhash64 and the CDC hot path must never import
    the twin (it is a CodegenFallback per-character loop, ~100x slower)."""
    import ast
    import os

    from mimic_spark.functions.hashing import deterministic_row_id

    # 1. the production id expression compiles to xxhash64
    df = spark.range(1).select(deterministic_row_id("id").alias("rid"))
    assert "xxhash64" in df._jdf.queryExecution().analyzed().toString()

    # 2. no CDC-hot-path module imports the portable twin
    root = os.path.join(os.path.dirname(__file__), "..", "mimic_spark")
    hot = ["streaming", "lakehouse", "sources", "functions/hashing.py",
           "functions/normalize.py"]
    for rel in hot:
        p = os.path.join(root, rel)
        files = (
            [p] if p.endswith(".py")
            else [os.path.join(p, f) for f in os.listdir(p) if f.endswith(".py")]
        )
        for fp in files:
            tree = ast.parse(open(fp).read())
            for node in ast.walk(tree):
                names = []
                if isinstance(node, ast.Import):
                    names = [a.name for a in node.names]
                elif isinstance(node, ast.ImportFrom):
                    names = [node.module or ""]
                assert not any("portable_hash" in n for n in names), (
                    f"{fp} imports portable_hash — the oracle twin must not "
                    "enter the CDC hot path"
                )


def test_minhash_lsh_subset_of_exact(spark):
    """LSH candidates, after verification, are a subset of the exact
    Jaccard pairs — and recall is high at this threshold."""
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in OPS["dedup_ngram_jaccard"].fn(spark, SF).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in OPS["dedup_minhash_lsh"].fn(spark, SF).collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == exact[k]
    if exact:
        recall = len(lsh) / len(exact)
        assert recall >= 0.6, f"LSH recall too low: {recall}"


def test_simhash_deterministic_and_sane(spark):
    fn = OPS["dedup_simhash"].fn
    a = sorted(tuple(r) for r in fn(spark, SF).collect())
    b = sorted(tuple(r) for r in fn(spark, SF).collect())
    assert a == b
    for doc_a, doc_b, hamming in a:
        assert doc_a < doc_b
        assert 0 <= hamming <= 3


def test_ann_lsh_recall_vs_bruteforce(spark):
    brute = {}
    for r in OPS["ann_cosine_topk"].fn(spark, SF).collect():
        brute.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx = {}
    for r in OPS["ann_lsh_bucketed"].fn(spark, SF).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(approx) == set(brute)
    recalls = [
        len(brute[q] & approx.get(q, set())) / len(brute[q]) for q in brute
    ]
    avg = sum(recalls) / len(recalls)
    # the driver's synthetic embeddings are near-uniform random (top-5 cosine
    # ~0.3, mean 0) — the adversarial case for LSH; ideal 4-plane Rademacher
    # LSH measures ~0.44 recall here (numpy check), vs 0.31 for a random
    # same-size candidate set. Assert we beat random and stay in the ideal
    # band; on clustered real embeddings recall is far higher.
    assert avg >= 0.35, f"ANN-LSH avg recall too low: {avg} ({recalls})"


def test_doc_fingerprint_matches_python_twin(spark):
    """The rolling hash is plain integer arithmetic — recompute 20 docs in
    Python and compare."""
    rows = OPS["doc_fingerprint"].fn(spark, SF).orderBy("doc_id").limit(20).collect()
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .orderBy("doc_id")
        .limit(20)
        .collect()
    )

    def fp(text: str) -> int:
        words = text.strip().split()
        acc = 0
        for w in words:
            h = 0
            for ch in w:
                h = (h * 31 + ord(ch)) % 2147483647
            acc = (acc * 1000003 + h) % 2147483647
        return acc

    for r, d in zip(rows, docs):
        assert r["doc_id"] == d["doc_id"]
        assert r["fingerprint"] == fp(d["text"]), d["doc_id"]


# ------------------------------------------------------------- plan checks


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_python_row_udfs_anywhere(spark):
    """BASELINE.json: no per-row Python. Plans may contain ArrowEvalPython
    (pandas UDF) but never BatchEvalPython (row-at-a-time)."""
    for name, op in OPS.items():
        if name == "cdc_transcripts_final":
            continue  # multi-action pipeline, checked in CDC tests
        plan = _physical_plan(op.fn(spark, SF))
        assert "BatchEvalPython" not in plan, f"{name} uses row-at-a-time Python"


def test_broadcast_join_in_star_query(spark):
    plan = _physical_plan(OPS["join_broadcast_star"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_filter_pushdown_reaches_scan(spark):
    plan = _physical_plan(OPS["q1_pricing_summary"].fn(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning_reaches_scan(spark):
    plan = _physical_plan(OPS["global_topk"].fn(spark, SF))
    # only 3 of 5 customer columns should be read
    assert "c_mktsegment" not in plan.split("ReadSchema")[-1]


def test_sort_merge_join_for_asof(spark):
    """The as-of/range join must use the equi-key (user_id), not degenerate
    to broadcast-nested-loop over the range predicate."""
    plan = _physical_plan(OPS["asof_range_join"].fn(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_recall_and_determinism(spark):
    brute = {}
    for r in OPS["ann_cosine_topk"].fn(spark, SF).collect():
        brute.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    a = sorted(tuple(r) for r in OPS["ann_ivf_probe"].fn(spark, SF).collect())
    b = sorted(tuple(r) for r in OPS["ann_ivf_probe"].fn(spark, SF).collect())
    assert a == b  # deterministic (seed centroids, no rand())
    approx = {}
    for q, n, _ in a:
        approx.setdefault(q, set()).add(n)
    recalls = [
        len(brute[q] & approx.get(q, set())) / len(brute[q]) for q in brute
    ]
    avg = sum(recalls) / len(recalls)
    # probing 3/8 cells samples ~37% of a near-uniform corpus; beating that
    # baseline shows the cells carry signal (clustered corpora score higher)
    assert avg >= 0.3, f"IVF avg recall too low: {avg} ({recalls})"

    # r4 verdict #6: Lloyd refinement must not LOSE recall vs the raw seed
    # centroids (on clustered corpora it gains; this near-uniform corpus
    # bounds it from below)
    seed_only = {}
    for r in (
        OPS["ann_ivf_probe"].fn(spark, SF, lloyd_iters=0).collect()
    ):
        seed_only.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    seed_recalls = [
        len(brute[q] & seed_only.get(q, set())) / len(brute[q]) for q in brute
    ]
    seed_avg = sum(seed_recalls) / len(seed_recalls)
    assert avg >= seed_avg - 1e-9, (
        f"Lloyd refinement regressed recall: {avg} < seed {seed_avg}"
    )


def test_cosine_dedup_consistent_with_topk(spark):
    """Every (query, neighbor) from brute-force top-k whose cos_sim clears
    the dedup threshold must appear in dedup_embedding_cosine's pairs."""
    from mimic_spark.operators.similarity import COSINE_DUP_THRESHOLD

    pairs = {
        (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
        for r in OPS["dedup_embedding_cosine"].fn(spark, SF).collect()
    }
    for r in OPS["ann_cosine_topk"].fn(spark, SF).collect():
        if r["cos_sim"] >= COSINE_DUP_THRESHOLD:
            k = (
                min(r["query_id"], r["neighbor_id"]),
                max(r["query_id"], r["neighbor_id"]),
            )
            assert k in pairs, k


def test_dedup_clusters_consistent(spark):
    """Connected components agree with the pair set: endpoints of every pair
    share a cluster; transitive closure holds; non-paired docs are singleton
    canonicals."""
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in OPS["dedup_ngram_jaccard"].fn(spark, SF).collect()
    ]
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in OPS["dedup_clusters"].fn(spark, SF).collect()
    }
    for a, b in pairs:
        assert labels[a] == labels[b], (a, b)
    # canonical = min id of the component
    comp: dict = {}
    for a, b in pairs:
        comp.setdefault(a, set()).add(b)
        comp.setdefault(b, set()).add(a)
    # python-side closure for verification
    seen = set()
    for start in comp:
        if start in seen:
            continue
        stack, members = [start], set()
        while stack:
            x = stack.pop()
            if x in members:
                continue
            members.add(x)
            stack.extend(comp.get(x, ()))
        seen |= members
        want = min(members)
        for m in members:
            assert labels[m] == want, (m, labels[m], want)
    paired = set(comp)
    for doc, lab in labels.items():
        if doc not in paired:
            assert lab == doc  # singleton is its own canonical


def test_dedup_clusters_lsh_pair_source_equals_exact(spark):
    """The scale path: dedup_clusters fed from the near-linear MinHash-LSH
    pair generator must produce the same clusters as the exact (quadratic)
    shingle self-join feed — at sf0.01, where LSH recall on >=0.5-Jaccard
    pairs is 1.0 (test_minhash_lsh_subset_of_exact bounds it below at
    sf0.001).  This is the r4-verdict seam that removes the last quadratic
    dependency from the clustering path at 100 TB."""
    from mimic_spark.operators.dedup import dedup_minhash_lsh

    sf01 = "/root/testdata/sf0.01"
    exact_fed = {
        (r["doc_id"], r["cluster_id"], r["is_dup"])
        for r in OPS["dedup_clusters"].fn(spark, sf01).collect()
    }
    lsh_fed = {
        (r["doc_id"], r["cluster_id"], r["is_dup"])
        for r in OPS["dedup_clusters"]
        .fn(spark, sf01, pair_source=dedup_minhash_lsh)
        .collect()
    }
    assert lsh_fed == exact_fed


def test_star_contraction_equals_label_propagation(spark):
    """The log-round large-star/small-star CC must produce exactly the same
    components as the O(diameter) min-label propagation baseline on random
    graphs — and must converge on a >20-diameter chain where the baseline's
    20-round cap fails loud (the 100-TB soft spot the contraction removes)."""
    import random

    import pytest

    from mimic_spark.operators.dedup import (
        connected_components,
        min_label_propagation,
    )

    rng = random.Random(42)
    for trial in range(3):
        n = 60
        verts = [f"d{trial}_{i:03d}" for i in range(n)]
        edges = [
            tuple(sorted(rng.sample(verts, 2)))
            for _ in range(rng.randint(20, 80))
        ]
        pairs = spark.createDataFrame(
            list(set(edges)), "doc_a string, doc_b string"
        )
        vdf = spark.createDataFrame([(v,) for v in verts], "doc_id string")
        star = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(spark, pairs, vdf).collect()
        }
        lpa = {
            r["doc_id"]: r["cluster_id"]
            for r in min_label_propagation(spark, pairs, vdf).collect()
        }
        assert star == lpa, f"trial {trial}: star != LPA"

    # 40-hop chain: diameter 40 > the LPA cap of 20 rounds
    chain_verts = [f"c{i:03d}" for i in range(41)]
    chain_pairs = spark.createDataFrame(
        [(f"c{i:03d}", f"c{i+1:03d}") for i in range(40)],
        "doc_a string, doc_b string",
    )
    cvdf = spark.createDataFrame([(v,) for v in chain_verts], "doc_id string")
    with pytest.raises(RuntimeError, match="diameter"):
        min_label_propagation(spark, chain_pairs, cvdf)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(spark, chain_pairs, cvdf).collect()
    }
    assert got == {v: "c000" for v in chain_verts}


def test_era_running_max_equals_lag_on_fixed_width(spark):
    """On fixed-width intervals (end order == start order) the running-max
    merge (era_variable_intervals' primitive) must reproduce the lag-based
    era_gaps_islands exactly — the regime where the simplification is valid."""
    from pyspark.sql import functions as F

    from mimic_spark.operators.windows import merge_intervals

    e = spark.read.parquet(f"{SF}/events.parquet")
    iv = e.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    via_runmax = (
        merge_intervals(iv, ["user_id"], gap_seconds=0)
        .groupBy("user_id", "era_id")
        .agg(
            F.min("start_ts").alias("era_start"),
            F.max("end_ts").alias("era_end"),
            F.count(F.lit(1)).alias("n_incidents"),
        )
    )
    from mimic_spark.operators.windows import era_gaps_islands

    via_lag = era_gaps_islands(spark, SF)
    a = {tuple(r) for r in via_runmax.collect()}
    b = {tuple(r) for r in via_lag.collect()}
    assert a == b


def test_era_variable_intervals_swallow_case(spark):
    """A long interval swallowing later short ones: lag(end) would split the
    era; the running max must not (ref cdm_drug_era.sql's motivating case)."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from mimic_spark.operators.windows import merge_intervals

    def t(m):
        return datetime(2025, 1, 1, m // 60, m % 60)

    rows = [
        # long interval 0..50; short ones 10..12, 20..22 inside it;
        # 48..55 overlaps its tail; 120.. starts a genuinely new era
        ("u1", t(0), t(50)),
        ("u1", t(10), t(12)),
        ("u1", t(20), t(22)),
        ("u1", t(48), t(55)),
        ("u1", t(120), t(125)),
    ]
    iv = spark.createDataFrame(rows, "user_id string, start_ts timestamp, end_ts timestamp")
    out = (
        merge_intervals(iv, ["user_id"], gap_seconds=0)
        .groupBy("user_id", "era_id")
        .agg(F.min("start_ts").alias("s"), F.max("end_ts").alias("e"), F.count(F.lit(1)).alias("n"))
        .orderBy("era_id")
        .collect()
    )
    assert len(out) == 2
    assert out[0]["n"] == 4 and out[0]["s"] == t(0) and out[0]["e"] == t(55)
    assert out[1]["n"] == 1
    # and with a 90-minute grace pad the two eras fuse (the 30-day analog)
    fused = (
        merge_intervals(iv, ["user_id"], gap_seconds=90 * 60)
        .agg(F.max("era_id").alias("mx"))
        .collect()[0]["mx"]
    )
    assert fused == 1


def test_new_ops_plan_shapes(spark):
    """Round-2 ops keep 100x-safe plans: broadcast joins where the small
    side is known, no cartesian products, no row-at-a-time Python."""
    from mimic_spark.plans.explain import plan_facts

    def plan_of(name):
        df = OPS[name].fn(spark, SF)
        return plan_facts(df), df._jdf.queryExecution().executedPlan().toString()

    facts, plan = plan_of("tfidf_top_terms")
    assert facts["row_python"] == 0 and facts["bnl_join"] == 0
    assert facts["broadcast_hash_join"] >= 1  # df (vocab) side broadcast

    facts, plan = plan_of("contamination_ngram_overlap")
    assert facts["row_python"] == 0 and facts["bnl_join"] == 0
    assert facts["broadcast_hash_join"] >= 1  # test-set side broadcast
    assert "CartesianProduct" not in plan

    facts, plan = plan_of("dedup_levenshtein_blocked")
    assert facts["row_python"] == 0
    assert "CartesianProduct" not in plan  # block key makes it an equi-join

    facts, plan = plan_of("text_redact_pii")
    assert facts["row_python"] == 0 and facts["arrow_python"] == 0  # pure JVM regex

    facts, plan = plan_of("era_variable_intervals")
    assert facts["row_python"] == 0
    assert facts["exchanges"] == 1  # one user_id shuffle reused end-to-end


def test_query_caches_released_between_catalog_calls(spark):
    """cache_for_query keeps the reuse win inside one query but the NEXT
    catalog invocation releases it — no cross-query cache dependence and no
    unbounded cached-RDD growth across a catalog sweep (r2 verdict #1/#3)."""
    from mimic_spark.operators.catalog import _QUERY_CACHES

    sc = spark.sparkContext

    def stored_ids():
        return {r.id() for r in sc._jsc.sc().getRDDStorageInfo()}

    # delta-based: other tests may legitimately leave localCheckpoint blocks
    # in storage; this test owns only the blocks the minhash query adds
    before = stored_ids()
    OPS["dedup_minhash_lsh"].fn(spark, SF).collect()  # caches shingles
    assert len(_QUERY_CACHES) > 0
    added = stored_ids() - before
    assert added  # the cache actually materialized
    OPS["q1_pricing_summary"].fn(spark, SF).collect()  # next query releases
    assert len(_QUERY_CACHES) == 0
    # unpersist is async (blocking=False); poll briefly for the blocks to drop
    import time

    for _ in range(50):
        if not (stored_ids() & added):
            break
        time.sleep(0.1)
    assert not (stored_ids() & added)


def test_sequence_packing_invariants(spark):
    """Next-fit packing: every doc assigned once; packs are contiguous runs
    in shard order; a pack never exceeds CAP + its last doc's tokens (the
    next-fit overflow bound); deterministic across runs.  The invariants
    hold under EVERY token counter: the whitespace default, the JVM BPE-ish
    regex, and an Arrow-batched pandas-UDF tokenizer (the pluggable seam a
    trainer's real tokenizer would use)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from mimic_spark.operators.packing import (
        PACK_CAP_TOKENS,
        bpe_ish_tokens,
        pack_sequences,
        whitespace_tokens,
    )

    # deterministic tokenizer stand-in: ~chars/4, floor 1 (the shape a real
    # BPE produces), vectorized over the Arrow batch.  (lambda form: the
    # module-level `from __future__ import annotations` stringifies type
    # hints, which pandas_udf can't resolve for decorated functions)
    fake_bpe_udf = pandas_udf(
        lambda texts: (texts.str.len() // 4).clip(lower=1).astype("int32"),
        "int",
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    results = {}
    for cname, counter in [
        ("whitespace", whitespace_tokens),
        ("bpe_ish", bpe_ish_tokens),
        ("pandas_udf", fake_bpe_udf),
    ]:
        rows = sorted(
            (r["shard"], r["doc_id"], r["n_tokens"], r["pack_id"], r["offset_in_pack"])
            for r in pack_sequences(spark, SF, token_counter=counter).collect()
        )
        results[cname] = rows
        assert len(rows) == docs, cname
        assert len({r[1] for r in rows}) == docs, cname  # each doc once

        by_shard = {}
        for shard, doc_id, n_tokens, pack_id, off in rows:
            assert n_tokens >= 1, (cname, doc_id)
            by_shard.setdefault(shard, []).append(
                (doc_id, n_tokens, pack_id, off)
            )
        for shard, items in by_shard.items():
            items.sort()
            cum = 0
            prev_pack = 0
            pack_tokens = {}
            for doc_id, n_tokens, pack_id, off in items:
                assert pack_id >= prev_pack  # contiguous, never decreasing
                assert off == cum % PACK_CAP_TOKENS
                assert pack_id == cum // PACK_CAP_TOKENS
                pack_tokens[pack_id] = pack_tokens.get(pack_id, 0) + n_tokens
                cum += n_tokens
                prev_pack = pack_id
            # next-fit bound: pack total < CAP + max single doc in the pack
            for pid, total in pack_tokens.items():
                last_doc_tokens = max(t for d, t, p, o in items if p == pid)
                assert total <= PACK_CAP_TOKENS + last_doc_tokens, cname

    # different counters genuinely count differently (the seam is live).
    # (The synthetic corpus is pure space-separated words, so the BPE-ish
    # regex agrees with whitespace there — prove it differs on punctuated
    # text directly instead.)
    assert results["whitespace"] != results["pandas_udf"]
    from pyspark.sql import functions as F

    punct = spark.createDataFrame([("Hello, world! x2",)], "text string")
    r = punct.select(
        whitespace_tokens(F.col("text")).alias("ws"),
        bpe_ish_tokens(F.col("text")).alias("bpe"),
    ).first()
    assert r["ws"] == 3
    assert r["bpe"] == 6  # Hello , world ! x 2 -> letter/digit/punct pieces

    # catalog entry (position 51, oracled) is the whitespace form
    again = sorted(
        (r["shard"], r["doc_id"], r["n_tokens"], r["pack_id"], r["offset_in_pack"])
        for r in OPS["pack_sequences"].fn(spark, SF).collect()
    )
    assert results["whitespace"] == again  # and deterministic across runs

def test_sizing_derivations():
    """r5 verdict Missing #2: index parameters derive from corpus stats.
    The floors reproduce the oracle-pinned constants at the 500-row
    correctness corpus; at scale the formulas take over."""
    from mimic_spark.operators.sizing import (
        ivf_cells,
        ivf_probes,
        lsh_planes,
        minhash_config,
        minhash_rows_per_band,
    )

    # oracle/test corpus (500 rows) -> exactly the pinned constants
    assert lsh_planes(500) == 4
    assert ivf_cells(500) == 8
    assert ivf_probes(ivf_cells(500)) == 3
    assert minhash_rows_per_band(500) == 4

    # scale growth: log2 planes, sqrt cells, ln-driven band rows
    assert lsh_planes(2000) == 6
    assert lsh_planes(10**9) == 24  # clamped (16M buckets)
    assert ivf_cells(2000) == 31
    assert ivf_cells(10**9) == 31623
    assert ivf_probes(31623) == 3163  # 10% of cells
    assert minhash_rows_per_band(10**10) == 15

    # derived minhash layout places the S-curve knee at the threshold
    h, b, r = minhash_config(500, threshold=0.5)
    assert h == b * r and (b, r) == (16, 4)
    assert abs((1.0 / b) ** (1.0 / r) - 0.5) < 0.1

    # monotone in corpus size (never shrinks as data grows)
    for f in (lsh_planes, ivf_cells):
        sizes = [f(n) for n in (10**3, 10**5, 10**7, 10**9)]
        assert sizes == sorted(sizes)


def test_autosized_operators_match_pinned_at_oracle_scale(spark):
    """Auto-sizing must be oracle-safe: at the 500-row corpus the derived
    parameters equal the pinned oracle constants, so the auto-sized plan
    returns byte-identical results; a production-derived minhash layout
    stays exact-verified (subset of the exact Jaccard pairs, recall >=
    the pinned layout's)."""
    from mimic_spark.operators.dedup import dedup_minhash_lsh
    from mimic_spark.operators.similarity import ann_lsh_bucketed
    from mimic_spark.operators.sizing import minhash_config

    auto = sorted(map(tuple, OPS["ann_lsh_bucketed"].fn(spark, SF).collect()))
    pinned = sorted(map(tuple, ann_lsh_bucketed(spark, SF, n_planes=4).collect()))
    assert auto == pinned

    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in OPS["dedup_ngram_jaccard"].fn(spark, SF).collect()
    }
    pinned_pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in OPS["dedup_minhash_lsh"].fn(spark, SF).collect()
    }
    h, b, _ = minhash_config(500, threshold=0.5)
    derived_pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_minhash_lsh(spark, SF, n_hashes=h, n_bands=b).collect()
    }
    assert set(derived_pairs) <= set(exact)
    for k, v in derived_pairs.items():
        assert v == exact[k]  # verification stage is exact either way
    # knee at the threshold (0.5) vs pinned knee at 0.707: recall never drops
    assert len(derived_pairs) >= len(pinned_pairs)
