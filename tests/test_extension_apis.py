"""Spark 4 extension surfaces a platform team would build on: the Python
Data Source API (pure-Python connectors that still partition and run inside
the executor plan) and Observation metrics (data-quality counters collected
during a query's own pass — no second scan).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_python_data_source_partitioned_read(spark):
    """Register a pure-Python batch connector and read through the normal
    spark.read path: the source declares its own partitions, each read
    runs executor-side, and the result is a first-class DataFrame. This is
    the extension story for feeds with no JVM connector (internal APIs,
    bespoke formats): write the reader in Python, keep Spark's planning,
    partitioning, and downstream codegen."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class DocFeedReader(DataSourceReader):
        def __init__(self, options):
            self.n_parts = int(options.get("partitions", "4"))
            self.per_part = int(options.get("rowsperpartition", "10"))

        def partitions(self):
            return [InputPartition(i) for i in range(self.n_parts)]

        def read(self, partition):
            base = partition.value * self.per_part
            for i in range(self.per_part):
                doc_id = base + i
                yield (doc_id, f"synthetic doc {doc_id}", len(f"synthetic doc {doc_id}"))

    class DocFeed(DataSource):
        @classmethod
        def name(cls):
            return "docfeed"

        def schema(self):
            return "doc_id bigint, text string, n_chars int"

        def reader(self, schema):
            return DocFeedReader(self.options)

    spark.dataSource.register(DocFeed)
    df = (
        spark.read.format("docfeed")
        .option("partitions", "3")
        .option("rowsPerPartition", "5")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3
    rows = sorted((r.doc_id, r.text, r.n_chars) for r in df.collect())
    assert len(rows) == 15
    assert rows[0] == (0, "synthetic doc 0", len("synthetic doc 0"))
    assert rows[-1][0] == 14
    # the python source composes with ordinary JVM-side transformations
    agg = df.agg(F.sum("doc_id").alias("s")).collect()[0]
    assert agg["s"] == sum(range(15))


def test_observation_metrics_ride_the_query_pass(spark, sf_dir):
    """Data-quality counters (nulls, out-of-range, row volume) attached via
    observe() are computed DURING the main query's single scan -- the
    monitoring pattern for a 100 TB pipeline where a second
    validation scan would double the bill."""
    from pyspark.sql import Observation

    from hive_ddl_extract_tool_spark.tables import load

    obs = Observation("quality")
    docs = load(spark, sf_dir, "documents").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("text").isNull() | (F.length("text") == 0)).alias("n_empty"),
        F.count_if(F.length("text") > 100_000).alias("n_oversize"),
    )
    result = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    metrics = obs.get
    assert metrics["n_rows"] == sum(r["n"] for r in result)
    assert metrics["n_empty"] == 0
    assert metrics["n_oversize"] == 0


def test_run_cli_lists_and_rejects(capsys):
    """The query-runner CLI: no args lists every registered query with its
    check kind; an unknown name exits 2 with a suggestion."""
    from hive_ddl_extract_tool_spark.run import main

    assert main([]) == 0
    out = capsys.readouterr().out
    assert "q01_pricing_summary  [oracle]" in out
    assert "q06_approx_distinct_users  [oracle]" in out
    assert "q48_cosine_topk_pandas  [oracle]" in out
    assert "q51_decode_features  [rows-only]" in out

    assert main(["q01_pricing_summry"]) == 2
    err = capsys.readouterr().err
    assert "did you mean" in err


def test_run_cli_check_mode(capsys, sf_dir):
    """--check runs the query AND its oracle, exiting 0 on match and 2 for
    rows-only queries (nothing to check)."""
    from hive_ddl_extract_tool_spark.run import main

    assert main(["q05_distinct_users", sf_dir, "--check"]) == 0
    assert "OK: q05_distinct_users" in capsys.readouterr().out
    assert main(["q51_decode_features", sf_dir, "--check"]) == 2


def test_bpe_merge_rounds_are_monotone(spark, sf_dir):
    """Greedy BPE invariants on the real corpus: round 2's winning pair
    count can never exceed round 1's (merging only removes or re-labels
    pair occurrences -- every post-merge pair occurrence maps to at most
    one pre-merge occurrence), and round 1 merges two single chars."""
    from hive_ddl_extract_tool_spark.operators import all_queries

    rows = {r["round"]: r for r in all_queries()["q156_bpe_merge_rounds"](spark, sf_dir).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["pair_count"] >= rows[2]["pair_count"] > 0
    assert len(rows[1]["left_sym"]) == 1 and len(rows[1]["right_sym"]) == 1
    assert rows[1]["merged"] == rows[1]["left_sym"] + rows[1]["right_sym"]


def test_format_roundtrip_formats_agree(spark, sf_dir):
    """Every sink format must round-trip the identical corpus: all five
    rows of q165 carry the same row count, whole-row fingerprint, and
    n_chars sum (the oracle separately pins them to the original
    parquet)."""
    from hive_ddl_extract_tool_spark.operators import all_queries

    rows = all_queries()["q165_format_roundtrip"](spark, sf_dir).collect()
    assert {r["fmt"] for r in rows} == {"parquet", "orc", "json", "csv", "xml"}
    assert len({(r["n_rows"], r["row_fp"], r["sum_chars"]) for r in rows}) == 1


def test_deletion_manifest_consistent_with_delete_set_and_clusters(spark, sf_dir):
    """q166 must agree with first principles: total deleted docs equals the
    modular delete set's size, and per source every deleted canonical
    either re-elected or went extinct (an extinct cluster's canonical is
    necessarily deleted, since the canonical is a member)."""
    from pyspark.sql import functions as F

    from hive_ddl_extract_tool_spark.operators import all_queries
    from hive_ddl_extract_tool_spark.operators.dedup import DELETE_MOD
    from hive_ddl_extract_tool_spark.tables import load

    rows = all_queries()["q166_deletion_manifest"](spark, sf_dir).collect()
    n_del_expected = (
        load(spark, sf_dir, "documents").filter(F.col("doc_id") % DELETE_MOD == 0).count()
    )
    assert sum(r["n_docs_deleted"] for r in rows) == n_del_expected
    for r in rows:
        assert r["n_reelected"] + r["n_extinct"] == r["n_canonicals_deleted"], r


def test_cluster_split_partitions_the_corpus_exactly(spark, sf_dir):
    """q167's splits must partition the corpus: doc counts sum to the
    corpus size and cluster counts sum to q68's distinct canonical count
    (the same staged labels, independently aggregated)."""
    from pyspark.sql import functions as F

    from hive_ddl_extract_tool_spark.operators import all_queries

    qs = all_queries()
    rows = qs["q167_cluster_split"](spark, sf_dir).collect()
    n_docs_corpus = qs["q68_dup_clusters"](spark, sf_dir).count()
    n_clusters = (
        qs["q68_dup_clusters"](spark, sf_dir).select("canonical_id").distinct().count()
    )
    assert sum(r["n_docs"] for r in rows) == n_docs_corpus
    assert sum(r["n_clusters"] for r in rows) == n_clusters
    assert len({r["naive_straddle_clusters"] for r in rows}) == 1


def test_ann_rank_quality_bounded_by_ideal(spark, sf_dir):
    """q163's per-query gains are bounded by the ideal: at most K hits and
    dcg_x6 never above the ideal 11 (= 6/1 + 6/2 + 6/3)."""
    from hive_ddl_extract_tool_spark.operators import all_queries
    from hive_ddl_extract_tool_spark.operators.vectors import NDCG_K, _IDCG_X

    for r in all_queries()["q163_ann_rank_quality"](spark, sf_dir).collect():
        assert 0 <= r["n_hits"] <= NDCG_K
        assert 0 <= r["dcg_x6"] <= _IDCG_X
        assert r["ndcg_ppm"] <= 1_000_000


def test_bloom_audit_never_false_negative(spark, sf_dir):
    """THE Bloom guarantee: every true member passes the filter, so
    n_bloom_pass >= n_members and false positives account exactly for the
    difference; the bit count never exceeds what the build could set."""
    from hive_ddl_extract_tool_spark.operators import all_queries
    from hive_ddl_extract_tool_spark.operators.layout import BLOOM_K

    r = all_queries()["q173_bloom_prune_audit"](spark, sf_dir).collect()[0]
    assert r["n_bloom_pass"] >= r["n_members"]
    assert r["n_bloom_pass"] - r["n_members"] == r["n_false_pos"]
    assert r["n_bits_set"] <= min(r["m_bits"], BLOOM_K * r["n_build_keys"])


def test_zorder_audit_layouts_cover_identical_rows(spark, sf_dir):
    """Both layouts partition the SAME rows: per layout the file row counts
    sum to the lineitem count, and the z-order layout must prune at least
    as many files on the key probe as the date-sorted layout (that
    advantage is the operator's reason to exist)."""
    from hive_ddl_extract_tool_spark.operators import all_queries
    from hive_ddl_extract_tool_spark.tables import load

    rows = {r["layout"]: r for r in all_queries()["q172_zorder_layout"](spark, sf_dir).collect()}
    n = load(spark, sf_dir, "lineitem").count()
    assert rows["zorder"]["n_rows"] == n and rows["linear"]["n_rows"] == n
    assert rows["zorder"]["n_skip_key_probe"] >= rows["linear"]["n_skip_key_probe"]


def test_equidepth_histogram_partitions_the_value_domain(spark, sf_dir):
    """q174's buckets must partition the cells: ordered by bucket id, cell
    ranges are disjoint and increasing, and row counts sum to the orders
    count."""
    from hive_ddl_extract_tool_spark.operators import all_queries
    from hive_ddl_extract_tool_spark.tables import load

    rows = sorted(
        all_queries()["q174_equidepth_histogram"](spark, sf_dir).collect(),
        key=lambda r: r["bucket"],
    )
    assert sum(r["n_rows"] for r in rows) == load(spark, sf_dir, "orders").count()
    for a, b in zip(rows, rows[1:]):
        assert a["max_cell"] < b["min_cell"]


def test_bitmap_distinct_bounds(spark, sf_dir):
    """q183: the global distinct is bounded by every per-type count below
    and their sum above."""
    from hive_ddl_extract_tool_spark.operators import all_queries

    rows = {r["event_type"]: r["n_users"] for r in all_queries()["q183_bitmap_distinct"](spark, sf_dir).collect()}
    total = rows.pop("__all__")
    assert max(rows.values()) <= total <= sum(rows.values())


def test_update_mode_emission_counts_bounded_by_batches(spark, sf_dir):
    """q180: a group can emit at most one update per micro-batch, and must
    emit at least one (it exists in the result)."""
    from hive_ddl_extract_tool_spark.operators import all_queries
    from hive_ddl_extract_tool_spark.streaming.windows import UPDATE_SRC_BUCKETS

    for r in all_queries()["q180_stream_update_mode"](spark, sf_dir).collect():
        assert 1 <= r["n_updates"] <= UPDATE_SRC_BUCKETS, r


def test_python_datasink_commit_protocol(spark, sf_dir):
    """q194's custom sink must leave a CLEAN committed state: the manifest
    names exactly the renamed part files, their recorded row counts sum to
    the corpus size, and no _tmp file survives commit (a stale temp would
    mean a task wrote outside the two-phase protocol)."""
    import json
    import os
    import tempfile

    from hive_ddl_extract_tool_spark.operators import all_queries
    from hive_ddl_extract_tool_spark.tables import load

    out = all_queries()["q194_python_datasink"](spark, sf_dir)
    total = sum(r["n_rows"] for r in out.collect())
    n_docs = load(spark, sf_dir, "documents").count()
    assert total == n_docs

    from hive_ddl_extract_tool_spark.operators._cache import scratch_dir

    out_dir = scratch_dir("q194_sink", sf_dir)
    names = sorted(os.listdir(out_dir))
    assert not any(n.startswith("_tmp-") for n in names), names
    assert not any(n.endswith(".tmp") for n in names), names  # manifest swap completed
    with open(f"{out_dir}/_manifest.json") as f:
        manifest = json.load(f)
    listed = sorted(e["file"] for e in manifest["files"])
    assert listed == [n for n in names if n.endswith(".jsonl")], (listed, names)
    assert sum(e["rows"] for e in manifest["files"]) == n_docs
