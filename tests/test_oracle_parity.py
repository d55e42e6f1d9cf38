"""Run every queries() entry that has an oracle against DuckDB at sf0.001 --
the same check the driver runs at sf0.01 (CORRECTNESS_r{N}.json), so a
failure here predicts a driver failure."""

from __future__ import annotations

import pytest

from hive_ddl_extract_tool_spark.operators import all_oracles, all_queries

from .parity import compare

QUERIES = all_queries()
ORACLES = all_oracles()


def test_every_oracle_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    compare(df, ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_q69_sufficient_stats_match_builtin_aggregates(spark, sf_dir):
    """q69 derives corr/slope/intercept/r2 from exact integer moments (for
    cross-engine and cross-run reproducibility); this pins it against
    Spark's builtin co-moment aggregates to fp tolerance."""
    from pyspark.sql import functions as F

    from hive_ddl_extract_tool_spark.tables import load

    got = {r["flag"]: r for r in QUERIES["q69_regression_stats"](spark, sf_dir).collect()}
    x = F.round("l_quantity")
    y = F.round(F.col("l_extendedprice") * 100)
    ref = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.corr(x, y).alias("corr"),
            F.regr_slope(y, x).alias("slope"),
            F.regr_intercept(y, x).alias("intercept"),
            F.regr_r2(y, x).alias("r2"),
        )
        .collect()
    )
    assert len(ref) > 0
    for r in ref:
        g = got[r["flag"]]
        for mine, theirs in (
            (g["corr_xy"], r["corr"]),
            (g["slope"], r["slope"]),
            (g["intercept"], r["intercept"]),
            (g["r2"], r["r2"]),
        ):
            assert abs(mine - theirs) < 1e-5, (r["flag"], mine, theirs)


def test_q49c_sampled_audit_is_consistent(spark, sf_dir):
    """q49c audits recall on a hash-sampled anchor tier (linear in the
    corpus; the round-7 full-truth formulation cost 385 s at 10x). The
    sampled numbers must stay internally exact: the anchored truth tier is
    non-empty at every fixture scale (measured 2/6/18 pairs at
    sf0.001/0.01/0.1 with RECALL_SAMPLE_N=128), every reported LSH pair is
    exact-verified AND inside the truth tier (precision 1: lsh_pairs ==
    matched), and recall is a valid proportion. The sampled recall itself
    is binomial-noisy at fixture scale (0.0/0.67/0.33 measured) -- the
    design-target floor lives on the full tier below."""
    r = QUERIES["q49c_lsh_recall"](spark, sf_dir).collect()[0]
    assert r["exact_pairs"] > 0, "anchored truth tier should be non-empty"
    assert r["lsh_pairs"] == r["matched"], "q49b emitted a non-exact pair"
    assert 0.0 <= r["recall"] <= 1.0


def test_q49b_full_recall_meets_design_target(spark, sf_dir):
    """The radius-2 multi-probe design target, asserted on the FULL truth
    tier (q49 all-pairs x q49b) where the estimate is stable -- fixture
    scale only; q49c carries the linear sampled estimate of the same
    number. Context for the bound: the synthetic embeddings have NO planted
    near-dups (max pairwise cos ~0.6), so the 0.45 threshold deliberately
    catches *moderately similar* pairs whose expected signature distance
    (~2.8 of 8 bits at cos 0.45) sits at the edge of radius 2 -- measured
    recall is 0.43 on the 7-pair sf0.001 fixture and 0.57 at sf0.01. True
    near-dups (cos >= 0.9, <1 expected differing bit) are caught with
    near-certainty."""
    ex = {tuple(r) for r in QUERIES["q49_cosine_neardup"](spark, sf_dir)
          .select("vec_a", "vec_b").collect()}
    ls = {tuple(r) for r in QUERIES["q49b_cosine_neardup_lsh"](spark, sf_dir)
          .select("vec_a", "vec_b").collect()}
    assert ex, "fixture should contain near-dup embeddings"
    assert ls <= ex, "q49b emitted a pair outside the exact truth"
    recall = len(ls & ex) / len(ex)
    assert recall >= 0.4, f"recall {recall} below design floor"


def test_q66b_trained_centroids_beat_or_match_init(spark, sf_dir):
    """k-means-trained cells must not lose recall@3 against the exact q46
    ground truth compared to the first-8-vectors stand-in (at sf0.01 the
    measured values are 0.90 trained vs 0.83 init)."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["q46_cosine_topk"](spark, sf_dir).collect()
        if r["rn"] <= 3
    }
    trained = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["q66b_ivf_trained"](spark, sf_dir).collect()
    }
    init = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["q66_ivf_ann"](spark, sf_dir).collect()
    }
    assert len(exact & trained) >= len(exact & init)
    assert len(exact & trained) / len(exact) >= 0.5


def test_connected_components_chain_converges_logarithmically(spark):
    """Large-star/small-star must converge in O(log n) rounds on the
    worst-case shape for naive propagation: a 100-node chain (diameter 99,
    which min-label propagation would need ~99 rounds for). Bound is
    ceil(log2(100)) + 3 slack = 10."""
    from hive_ddl_extract_tool_spark.operators.dedup import connected_components

    n = 100
    pairs = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    labels, rounds = connected_components(edges)
    assert rounds <= 10, f"chain took {rounds} rounds (diameter-bound algo?)"
    got = {r["doc_id"]: r["lbl"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}


def test_connected_components_raises_if_not_converged(spark, monkeypatch):
    """A labeling that hit the round cap must fail loudly, not return."""
    import hive_ddl_extract_tool_spark.operators.dedup as d

    monkeypatch.setattr(d, "CC_MAX_ITERS", 1)
    pairs = [(i, i + 1) for i in range(20)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        d.connected_components(edges)


def test_q68_clusters_are_valid_components(spark, sf_dir):
    """Structural invariants of the dup-cluster output, independent of the
    oracle: every near-dup edge joins two docs of the SAME cluster, every
    canonical id is the minimum doc_id of its cluster, and cluster sizes
    sum to the corpus size."""
    clusters = {
        r["doc_id"]: r["canonical_id"]
        for r in QUERIES["q68_dup_clusters"](spark, sf_dir).collect()
    }
    edges = [
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["q42_minhash_lsh_dedup"](spark, sf_dir).collect()
    ]
    assert edges, "fixture should contain planted near-dup pairs"
    for a, b in edges:
        assert clusters[a] == clusters[b], (a, b)
    by_canon: dict = {}
    for doc, canon in clusters.items():
        by_canon.setdefault(canon, []).append(doc)
    for canon, members in by_canon.items():
        assert canon == min(members), (canon, members)
    assert len(clusters) == sum(len(m) for m in by_canon.values())


def test_q90_packing_invariants(spark, sf_dir):
    """Conservation laws of the packing manifest: per source, the block
    token counts sum to exactly the corpus token count (nothing lost or
    double-counted at block boundaries), no block exceeds the block size,
    and block ids are contiguous from 0."""
    from pyspark.sql import functions as F

    from hive_ddl_extract_tool_spark.operators.text import PACK_BLOCK, _words
    from hive_ddl_extract_tool_spark.tables import load

    packs = QUERIES["q90_sequence_packing"](spark, sf_dir).collect()
    docs = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(F.greatest(F.size(_words()), F.lit(1))).alias("tot"))
        .collect()
    )
    tot = {r["source"]: r["tot"] for r in docs}
    by_src: dict[str, list] = {}
    for r in packs:
        assert 0 < r["n_tokens"] <= PACK_BLOCK, r
        assert r["n_carry"] <= r["n_docs"], r
        by_src.setdefault(r["source"], []).append(r)
    assert set(by_src) == set(tot)
    for src, rows in by_src.items():
        assert sum(r["n_tokens"] for r in rows) == tot[src], src
        blocks = sorted(r["block"] for r in rows)
        assert blocks == list(range(len(blocks))), f"{src}: holes in {blocks}"


def test_q95_funnel_is_monotone(spark, sf_dir):
    """Each gate can only shrink the survivor set, and retained_ppm is
    consistent with the integer counts."""
    for r in QUERIES["q95_curation_report"](spark, sf_dir).collect():
        assert r["n_raw"] >= r["n_len_ok"] >= r["n_quality_ok"] >= r["n_rep_ok"] >= r["n_unique"]
        assert r["retained_ppm"] == r["n_unique"] * 1_000_000 // r["n_raw"]


def test_q100_gates_bound_pass_all(spark, sf_dir):
    """Every per-rule count is within [0, n_docs], and the conjunction can
    pass at most the weakest single rule."""
    for r in QUERIES["q100_gopher_rules"](spark, sf_dir).collect():
        singles = [r["n_len_ok"], r["n_wlen_ok"], r["n_alpha_ok"], r["n_stop_ok"]]
        assert all(0 <= s <= r["n_docs"] for s in singles), r
        assert 0 <= r["n_pass_all"] <= min(singles), r


def test_q101_weights_sum_to_one_epoch(spark, sf_dir):
    """The ppm weights are a partition of (almost exactly) 1e6 -- integer
    floor division may undershoot by at most |sources| ppm -- and the
    per-epoch draws respect the same bound against the document budget."""
    from hive_ddl_extract_tool_spark.operators.selection import EPOCH_DOC_BUDGET

    rows = QUERIES["q101_source_mixing"](spark, sf_dir).collect()
    wsum = sum(r["weight_ppm"] for r in rows)
    assert 1_000_000 - len(rows) <= wsum <= 1_000_000
    dsum = sum(r["docs_per_epoch"] for r in rows)
    assert EPOCH_DOC_BUDGET - len(rows) <= dsum <= EPOCH_DOC_BUDGET


def test_q102_selection_respects_budget(spark, sf_dir):
    """The selected token mass never exceeds the budget (1/3 of the corpus),
    and comes within one maximum document of filling it (greedy tightness)."""
    from pyspark.sql import functions as F

    from hive_ddl_extract_tool_spark.operators.text import _words
    from hive_ddl_extract_tool_spark.tables import load

    docs = load(spark, sf_dir, "documents").select(F.size(_words(F.lower("text"))).alias("n"))
    agg = docs.agg(F.sum("n").alias("tot"), F.max("n").alias("mx")).collect()[0]
    budget = agg["tot"] // 3
    sel = sum(r["tokens_selected"] for r in QUERIES["q102_token_budget_select"](spark, sf_dir).collect())
    assert sel <= budget
    assert sel > budget - agg["mx"], (sel, budget, agg["mx"])


def test_q103_semdedup_conserves_vectors(spark, sf_dir):
    """Per cell kept + dropped = vectors; totals cover the whole corpus;
    a cell can only drop vectors if it has duplicate pairs."""
    from hive_ddl_extract_tool_spark.tables import load

    rows = QUERIES["q103_semdedup"](spark, sf_dir).collect()
    n_corpus = load(spark, sf_dir, "embeddings").count()
    assert sum(r["n_vecs"] for r in rows) == n_corpus
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_vecs"], r
        assert (r["n_dropped"] > 0) <= (r["n_dup_pairs"] > 0), r


def test_semdedup_scaled_cells_matches_default_at_base(spark, sf_dir):
    """tools/scale_stress.py's scaled-cells measurement drives
    train_centroids(n_cells=..., init=...) and _semdedup_from_ranked
    directly; pin that parameterized path. With the default cell count and
    the default init passed EXPLICITLY, the report must be row-identical
    to q103 (the K=1 sanity anchor of SCALE.md's measured table), and a
    different cell count must yield that many report cells covering the
    same corpus."""
    from hive_ddl_extract_tool_spark.operators import similarity as s
    from hive_ddl_extract_tool_spark.tables import load

    init = s._init_centroids(spark, sf_dir, s.N_CELLS)
    cent = s.train_centroids(spark, sf_dir, n_cells=s.N_CELLS, init=init)
    assert cent == s.train_centroids(spark, sf_dir)
    ranked = s._ivf_ranked(spark, sf_dir, cent, f"ivf_ranked_trained:{sf_dir}")
    got = sorted(map(tuple, s._semdedup_from_ranked(ranked).collect()))
    want = sorted(map(tuple, s.QUERIES["q103_semdedup"](spark, sf_dir).collect()))
    assert got == want

    n4 = 4
    cent4 = s.train_centroids(spark, sf_dir, n_cells=n4)
    assert len(cent4) == n4
    ranked4 = s._ivf_ranked(spark, sf_dir, cent4, f"ivf_ranked_test{n4}:{sf_dir}")
    rep4 = s._semdedup_from_ranked(ranked4).collect()
    assert len(rep4) <= n4
    assert sum(r["n_vecs"] for r in rep4) == load(spark, sf_dir, "embeddings").count()


def test_q49b_scaled_bits_matches_default_at_base(spark, sf_dir):
    """The q49b twin of the scaled-cells pin: _buckets/_q49b_candidates/
    _q49b_verify with the default plane count passed EXPLICITLY must
    reproduce the registered q49b row-for-row, and a larger plane count
    must yield signatures inside its bucket space with a candidate set no
    larger than the default's (more bits can only split buckets)."""
    from pyspark.sql import functions as F

    from hive_ddl_extract_tool_spark.operators import similarity as s

    bk = s._buckets(spark, sf_dir, s.N_PLANES)
    got = sorted(map(tuple, s._q49b_verify(
        spark, sf_dir, s._q49b_candidates(bk, s.N_PLANES)).collect()))
    want = sorted(map(tuple, s.QUERIES["q49b_cosine_neardup_lsh"](spark, sf_dir).collect()))
    assert got == want

    n12 = s.N_PLANES + 4
    bk12 = s._buckets(spark, sf_dir, n12)
    assert bk12.agg(F.max("bucket")).first()[0] < (1 << n12)
    n_default = s._q49b_candidates(bk, s.N_PLANES).count()
    n_scaled = s._q49b_candidates(bk12, n12).count()
    assert 0 < n_scaled <= n_default


def test_q104_contamination_is_a_ratio(spark, sf_dir):
    """Hits can never exceed the gram count and the ppm field is the exact
    integer ratio."""
    for r in QUERIES["q104_ngram_decontam"](spark, sf_dir).collect():
        assert 0 <= r["n_hit"] <= r["n_grams"], r
        assert r["contam_ppm"] == r["n_hit"] * 1_000_000 // r["n_grams"], r


def test_q106_estimator_error_is_small_on_verified_pairs(spark, sf_dir):
    """q42's verified pairs all have exact Jaccard >= 0.8, where the 16-hash
    MinHash estimate concentrates: the mean absolute error must stay well
    under the band-collision noise floor (1/16 ~ 62500 ppm x a few)."""
    row = QUERIES["q106_minhash_estimator_error"](spark, sf_dir).collect()[0]
    assert row["n_pairs"] == QUERIES["q42_minhash_lsh_dedup"](spark, sf_dir).count()
    if row["n_pairs"]:
        assert row["mean_exact_ppm"] >= 800_000
        assert row["mean_abs_err_ppm"] <= 200_000, row


def test_q117_loading_is_unit_norm_eigen_direction(spark, sf_dir):
    """The PCA loading vector must be unit-norm (within the 1e-9 vector
    quantization over 64 dims), and applying the exact covariance to it
    must scale it by a positive eigenvalue estimate (direction preserved:
    normalized C@v matches v to quantization tolerance after the 8 rounds
    on this well-separated spectrum)."""
    import math

    rows = QUERIES["q117_pca_power_iteration"](spark, sf_dir).collect()
    v = [r["loading"] for r in sorted(rows, key=lambda r: r["dim"])]
    assert len(v) == 64
    nrm = math.sqrt(sum(x * x for x in v))
    assert abs(nrm - 1.0) < 1e-6, nrm


def test_q141_khop_agrees_with_q68_components(spark, sf_dir):
    """Cross-operator consistency: for every node whose connected component
    (q68) has diameter <= KHOP_DEPTH, the recursive k-hop traversal's
    min_reach_id must equal the component's canonical id, and n_khop must
    equal the component size. The two operators compute the same closure
    through entirely different machinery (driver-driven large-star rounds
    vs engine-native WITH RECURSIVE), so agreement is a strong check on
    both. Components with larger diameter are exempt (q141 documents the
    depth cap); assert the fixture actually exercised some components."""
    khop = {
        r["doc_id"]: (r["n_khop"], r["min_reach_id"])
        for r in QUERIES["q141_khop_neighborhood"](spark, sf_dir).collect()
    }
    assert khop, "fixture should contain near-dup edges"
    comp = {}
    for r in QUERIES["q68_dup_clusters"](spark, sf_dir).collect():
        comp.setdefault(r["canonical_id"], set()).add(r["doc_id"])
    checked = 0
    for canon, members in comp.items():
        in_graph = [d for d in members if d in khop]
        if not in_graph:
            continue  # singleton docs never appear in an edge
        full = {d for d in members if d in khop}
        for d in in_graph:
            n_k, min_r = khop[d]
            if n_k == len(full):  # closure reached within the depth cap
                assert min_r == min(full) == canon, (d, min_r, canon)
                checked += 1
    assert checked > 0


def test_q138_result_invariant_to_bucket_count(spark, sf_dir):
    """The cogroup bucket count is a pure parallelism knob: the per-status
    reconciliation must be IDENTICAL under a different bucketing (1 bucket
    = everything in one pandas merge)."""
    import hive_ddl_extract_tool_spark.operators.functions_suite2 as fs2

    base = {tuple(r) for r in QUERIES["q138_cogroup_reconcile"](spark, sf_dir).collect()}
    prev = fs2.COGROUP_BUCKETS
    fs2.COGROUP_BUCKETS = 1
    try:
        one = {tuple(r) for r in QUERIES["q138_cogroup_reconcile"](spark, sf_dir).collect()}
    finally:
        fs2.COGROUP_BUCKETS = prev
    assert base == one
