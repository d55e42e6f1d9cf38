"""Tokenizer training (SURVEY.md §2B X56): the BPE merge loop's core step,
distributed.

Byte-pair encoding training (Sennrich et al. 2016, the algorithm behind
GPT-2/RoBERTa vocabularies) repeats one primitive: count adjacent symbol
pairs across the corpus, merge the most frequent pair everywhere, recount.
q156 runs two exact rounds of that primitive over the document corpus:

- pair counting is a vocabulary-sized aggregation (distinct words carry
  their corpus frequency, so the corpus is scanned once and every later
  pass touches only the vocabulary — the same "work on (word, freq), not
  tokens" trick the reference BPE implementations use);
- the greedy left-to-right merge is expressed with window functions over
  (word, position): an occurrence of pair (l, r) merges iff l != r (two
  occurrences can never overlap: the middle symbol would have to equal
  both l and r) or its offset within its run of l's is even (a run of
  length L merges floor(L/2) times — exactly greedy non-overlapping
  scanning). This makes the merge a pure relational expression, identical
  in the DuckDB oracle, with no per-row Python.

Integer counts + a total-order tiebreak (count DESC, left, right) make
both rounds deterministic cross-engine. Scale: every shuffle is keyed by
the word (vocabulary-sized, short char arrays); the winning pair is a
1-row broadcast. A full vocab build = this step in a loop, exactly like
q66b's k-means rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ._cache import cached_df
from .text import LOWER_WORDS_SQL, _words
from ..tables import load


def q156_bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two exact BPE merge rounds over the document corpus: for round 1
    and round 2 emit (round, left_sym, right_sym, merged, pair_count) —
    the pair chosen by each round and its corpus frequency."""
    # The (word, freq, pos, char) table feeds three consumers (round-1 pair
    # count, the merge pass, and through it round 2); Catalyst does not CSE
    # across them, so stage it once -- ONE corpus scan total, and the staged
    # table is vocabulary-sized, not corpus-sized.
    def build_chars() -> DataFrame:
        wf = (
            load(spark, sf_dir, "documents")
            .select(F.explode(_words(F.lower("text"))).alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("f"))
        )
        return wf.select(
            "w", "f", F.posexplode(F.regexp_extract_all("w", F.lit("."), 0)).alias("pos", "sym")
        )

    chars = cached_df(spark, f"bpe_chars:{sf_dir}", build_chars)
    win = W.partitionBy("w").orderBy("pos")

    def top_pair(stream: DataFrame, sym_col: str) -> DataFrame:
        pairs = stream.withColumn("nxt", F.lead(sym_col).over(win)).filter(
            F.col("nxt").isNotNull()
        )
        cnt = pairs.groupBy(F.col(sym_col).alias("l"), F.col("nxt").alias("r")).agg(
            F.sum("f").alias("c")
        )
        return cnt.orderBy(F.desc("c"), "l", "r").limit(1)

    top1 = top_pair(chars, "sym")

    # Greedy merge of top1's pair: run starts mark maximal same-symbol
    # runs; the running max of run-start positions gives each symbol its
    # offset within its run without a second shuffle key.
    base = (
        chars.withColumn("nxt", F.lead("sym").over(win))
        .withColumn(
            "rs",
            F.when(
                F.lag("sym").over(win).isNull() | (F.lag("sym").over(win) != F.col("sym")),
                F.col("pos"),
            ),
        )
        .withColumn("run_start", F.max("rs").over(win))
    )
    j = base.crossJoin(
        F.broadcast(top1.select(F.col("l").alias("m_l"), F.col("r").alias("m_r")))
    )
    ms = (
        (F.col("sym") == F.col("m_l"))
        & (F.col("nxt") == F.col("m_r"))
        & ((F.col("m_l") != F.col("m_r")) | ((F.col("pos") - F.col("run_start")) % 2 == 0))
    )
    merged_stream = (
        j.withColumn("ms", F.coalesce(ms, F.lit(False)))
        .withColumn("consumed", F.coalesce(F.lag("ms").over(win), F.lit(False)))
        .filter(~F.col("consumed"))
        .select(
            "w",
            "f",
            "pos",
            F.when(F.col("ms"), F.concat("m_l", "m_r")).otherwise(F.col("sym")).alias("sym2"),
        )
    )
    top2 = top_pair(merged_stream, "sym2")

    def emit(top: DataFrame, rnd: int) -> DataFrame:
        return top.select(
            F.lit(rnd).cast("bigint").alias("round"),
            F.col("l").alias("left_sym"),
            F.col("r").alias("right_sym"),
            F.concat("l", "r").alias("merged"),
            F.col("c").alias("pair_count"),
        )

    return emit(top1, 1).unionByName(emit(top2, 2))


ORACLE_Q156 = f"""
WITH wf AS (
  SELECT w, CAST(count(*) AS BIGINT) AS f
  FROM (SELECT unnest({LOWER_WORDS_SQL}) AS w FROM documents)
  GROUP BY w
),
wc AS (SELECT w, f, regexp_extract_all(w, '.') AS cs FROM wf),
pe AS (SELECT w, f, cs, unnest(generate_series(1, len(cs))) AS pos FROM wc),
syms AS (SELECT w, f, pos, cs[pos] AS sym FROM pe),
p1 AS (SELECT w, f, sym, lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt FROM syms),
cnt1 AS (SELECT sym AS l, nxt AS r, CAST(sum(f) AS BIGINT) AS c
         FROM p1 WHERE nxt IS NOT NULL GROUP BY 1, 2),
top1 AS (SELECT l, r, c FROM cnt1 ORDER BY c DESC, l, r LIMIT 1),
rs AS (
  SELECT w, f, pos, sym,
         lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt,
         CASE WHEN lag(sym) OVER (PARTITION BY w ORDER BY pos) IS DISTINCT FROM sym
              THEN pos END AS run_start_pos
  FROM syms
),
base AS (
  SELECT w, f, pos, sym, nxt,
         max(run_start_pos) OVER (PARTITION BY w ORDER BY pos) AS run_start
  FROM rs
),
m AS (
  SELECT w, f, pos, sym,
         coalesce(sym = t.l AND nxt = t.r
                  AND (t.l <> t.r OR (pos - run_start) % 2 = 0), FALSE) AS ms,
         t.l AS m_l, t.r AS m_r
  FROM base, top1 t
),
mm AS (
  SELECT w, f, pos, ms, m_l, m_r, sym,
         coalesce(lag(ms) OVER (PARTITION BY w ORDER BY pos), FALSE) AS consumed
  FROM m
),
ns AS (
  SELECT w, f, pos, CASE WHEN ms THEN m_l || m_r ELSE sym END AS sym2
  FROM mm WHERE NOT consumed
),
p2 AS (SELECT w, f, sym2, lead(sym2) OVER (PARTITION BY w ORDER BY pos) AS nxt FROM ns),
cnt2 AS (SELECT sym2 AS l, nxt AS r, CAST(sum(f) AS BIGINT) AS c
         FROM p2 WHERE nxt IS NOT NULL GROUP BY 1, 2),
top2 AS (SELECT l, r, c FROM cnt2 ORDER BY c DESC, l, r LIMIT 1)
SELECT CAST(1 AS BIGINT) AS round, l AS left_sym, r AS right_sym,
       l || r AS merged, c AS pair_count FROM top1
UNION ALL
SELECT CAST(2 AS BIGINT), l, r, l || r, c FROM top2
"""


QUERIES = {"q156_bpe_merge_rounds": q156_bpe_merge_rounds}
ORACLES = {"q156_bpe_merge_rounds": ORACLE_Q156}
