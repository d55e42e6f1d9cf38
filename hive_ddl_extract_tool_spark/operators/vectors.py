"""Vector compression and mining (SURVEY.md §2B X58-X60): product
quantization, contrastive hard-negative mining, and truncated-dimension
(matryoshka) recall — the embedding-side operators a 100 TB vector corpus
needs beyond search itself (similarity.py) and scalar quantization (q72).

- q158 product quantization (Jégou et al. 2011): the corpus assigns each
  of M=8 subvectors to its nearest of K=16 sub-codebook entries. The
  codebook is a deterministic md5-derived constant held in INTEGER
  milli-units, and vectors quantize to milli-units before the distance,
  so assignment argmins and total distortion are exact integer arithmetic
  on both engines (a trained codebook would come from q66b's k-means per
  subspace; only the literals change). Assignment is pure projection —
  no join, no shuffle; the only exchange is the final 128-group
  aggregate.
- q159 hard-negative mining: for each anchor, the most-similar vector
  with a DIFFERENT label inside the anchor's IVF cell — the batch-mining
  step of contrastive training (triplet/InfoNCE). Cell confinement is the
  scale story (q103's SemDeDup shape): candidate pairs are cell-local,
  never corpus × corpus.
- q160 matryoshka truncation audit: recall@5 of first-16-dims cosine
  top-k against full-64-dim top-k, per query — the measurement that
  decides whether truncated embeddings (Kusupati et al. 2022) can serve
  the recall tier. Both rankings come from ONE corpus scan and one
  window exchange (both cosines computed per candidate row).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ._cache import cached_df
from .similarity import COSINE_SQL, DIM, _cosine, _init_centroids, _ivf_cells_sql, cell_argmin
from ..tables import load

# --------------------------------------------------------------------------
# q158: product quantization — assignment + distortion audit
# --------------------------------------------------------------------------

PQ_M = 8            # subspaces
PQ_DSUB = DIM // PQ_M
PQ_K = 16           # codes per subspace


def _pq_codebook() -> list[list[list[int]]]:
    """codebook[m][k][d] in integer milli-units, spanning the fixture's
    value range (~±0.53): md5-derived, identical constant on both engines
    because the oracle SQL embeds the same numbers as literals."""
    return [
        [
            [
                int(hashlib.md5(f"pq:{m}:{k}:{d}".encode()).hexdigest()[:8], 16) % 1001 - 500
                for d in range(PQ_DSUB)
            ]
            for k in range(PQ_K)
        ]
        for m in range(PQ_M)
    ]


PQ_CODEBOOK = _pq_codebook()


def q158_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (subspace, code): how many vectors land on the code and their
    total squared quantization error (integer milli-unit^2)."""
    emb = load(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == DIM)
    )
    qx = F.transform("embedding", lambda x: F.round(x.cast("double") * 1000).cast("bigint"))
    vec = emb.select("vec_id", qx.alias("qx"))

    def sub_assign(m: int) -> Column:
        qs = F.slice("qx", m * PQ_DSUB + 1, PQ_DSUB)
        # codebook[m] as ONE literal array<array<bigint>> iterated by a
        # transform lambda: a fully unrolled K x D expression tree (the
        # first cut) compiled 16x more code for identical arithmetic.
        cb_m = F.array(*[
            F.array(*[F.lit(c).cast("bigint") for c in PQ_CODEBOOK[m][k]])
            for k in range(PQ_K)
        ])
        dists = F.transform(
            cb_m,
            lambda row: F.aggregate(
                F.zip_with(qs, row, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ),
        )
        best = F.array_min(dists)
        # array_position returns the FIRST index of the min -> ties break
        # on the lowest code, same as the oracle's (d2, k) ordering.
        return F.struct(
            F.lit(m).cast("bigint").alias("m"),
            (F.array_position(dists, best) - 1).cast("bigint").alias("code"),
            best.alias("d2"),
        )

    assigned = vec.select(
        "vec_id", F.explode(F.array(*[sub_assign(m) for m in range(PQ_M)])).alias("a")
    )
    return assigned.groupBy(F.col("a.m").alias("m"), F.col("a.code").alias("code")).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("a.d2").alias("total_sqerr"),
    )


def _pq_codebook_values_sql() -> str:
    rows = []
    for m in range(PQ_M):
        for k in range(PQ_K):
            lst = ", ".join(str(c) for c in PQ_CODEBOOK[m][k])
            rows.append(f"({m}, {k}, [{lst}])")
    return ",\n  ".join(rows)


ORACLE_Q158 = f"""
WITH cb(m, k, c) AS (VALUES
  {_pq_codebook_values_sql()}
),
e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qx
  FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = {DIM}
),
sub AS (
  SELECT vec_id, ms.m AS m, qx[ms.m * {PQ_DSUB} + 1 : ms.m * {PQ_DSUB} + {PQ_DSUB}] AS qs
  FROM e, (SELECT unnest(range(0, {PQ_M})) AS m) ms
),
d AS (
  SELECT vec_id, m, k,
         CAST(list_sum(list_transform(range(1, {PQ_DSUB} + 1),
              i -> (qs[i] - c[i]) * (qs[i] - c[i]))) AS BIGINT) AS d2
  FROM sub JOIN cb USING (m)
),
a AS (SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, k) AS rn FROM d)
SELECT CAST(m AS BIGINT) AS m, CAST(k AS BIGINT) AS code,
       CAST(count(*) AS BIGINT) AS n_vecs, CAST(sum(d2) AS BIGINT) AS total_sqerr
FROM a WHERE rn = 1
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q159: contrastive hard-negative mining inside IVF cells
# --------------------------------------------------------------------------

N_ANCHORS = 20


def _cells_with_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding, label, cell) staged once: cell assignment is the
    q66 projection argmin (no shuffle), and both the anchor and candidate
    sides read the staged table — one embeddings scan total."""
    def build() -> DataFrame:
        cents = _init_centroids(spark, sf_dir)
        emb = load(spark, sf_dir, "embeddings")
        return emb.select(
            "vec_id", "embedding", "label",
            # the SHARED assignment expression (similarity.cell_argmin) --
            # an inline copy here could drift from the _ivf_cells_sql oracle
            cell_argmin(cents).alias("cell"),
        )

    return cached_df(spark, f"hardneg_cells:{sf_dir}", build)


def q159_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each anchor (vec_id < N_ANCHORS): the most cosine-similar vector
    with a different label in the anchor's IVF cell. Ties break on the
    candidate id; scores round to 6dp under the shared double-accumulated
    cosine. At any corpus size the candidate join is cell-local."""
    cells = _cells_with_label(spark, sf_dir)
    anchors = cells.filter(F.col("vec_id") < N_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("anchor_label"),
        "cell",
    )
    cands = cells.select(
        F.col("vec_id").alias("negative_id"),
        F.col("embedding").alias("ce"),
        F.col("label").alias("negative_label"),
        "cell",
    )
    scored = (
        F.broadcast(anchors)
        .join(cands, "cell")
        .filter(F.col("anchor_label") != F.col("negative_label"))
        .select(
            "anchor_id", "anchor_label", "negative_id", "negative_label", "cell",
            F.round(_cosine(F.col("qe"), F.col("ce")), 6).alias("cos_sim"),
        )
    )
    w = W.partitionBy("anchor_id").orderBy(F.col("cos_sim").desc(), F.col("negative_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id", "anchor_label", "negative_id", "negative_label",
            F.col("cell").cast("bigint").alias("cell"), "cos_sim",
        )
    )


ORACLE_Q159 = f"""
WITH ranked AS ({_ivf_cells_sql()}),
cells AS (
  SELECT r.vec_id, r.embedding, e.label, r.ci AS cell
  FROM ranked r JOIN embeddings e USING (vec_id) WHERE r.rk = 1
),
anchors AS (
  SELECT vec_id AS anchor_id, embedding AS qe, label AS anchor_label, cell
  FROM cells WHERE vec_id < {N_ANCHORS}
),
cands AS (
  SELECT vec_id AS negative_id, embedding AS ce, label AS negative_label, cell
  FROM cells
),
s AS (
  SELECT anchor_id, anchor_label, negative_id, negative_label, cell,
         round({COSINE_SQL}, 6) AS cos_sim
  FROM anchors JOIN cands USING (cell)
  WHERE anchor_label <> negative_label
)
SELECT anchor_id, anchor_label, negative_id, negative_label,
       CAST(cell AS BIGINT) AS cell, cos_sim
FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
                                   ORDER BY cos_sim DESC, negative_id) AS rn FROM s)
WHERE rn = 1
"""


# --------------------------------------------------------------------------
# q160: matryoshka truncation recall audit
# --------------------------------------------------------------------------

TRUNC_DIM = 16
RECALL_K = 5
N_AUDIT_QUERIES = 10


def q160_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@K of first-TRUNC_DIM-dims cosine ranking vs the full-DIM
    ranking, per query. Both cosines are computed on the SAME candidate
    row, so the corpus is scanned once and both rankings share one
    query-keyed window exchange."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_AUDIT_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(_cosine(F.col("qe"), F.col("ce")), 6).alias("cos_full"),
            F.round(
                _cosine(F.slice("qe", 1, TRUNC_DIM), F.slice("ce", 1, TRUNC_DIM)), 6
            ).alias("cos_trunc"),
        )
    )
    wf = W.partitionBy("query_id").orderBy(F.col("cos_full").desc(), F.col("neighbor_id"))
    wt = W.partitionBy("query_id").orderBy(F.col("cos_trunc").desc(), F.col("neighbor_id"))
    ranked = scored.withColumn("rn_full", F.row_number().over(wf)).withColumn(
        "rn_trunc", F.row_number().over(wt)
    )
    return ranked.groupBy("query_id").agg(
        F.sum(
            F.when((F.col("rn_full") <= RECALL_K) & (F.col("rn_trunc") <= RECALL_K), 1)
            .otherwise(0)
            .cast("bigint")
        ).alias("n_overlap"),
        F.lit(RECALL_K).cast("bigint").alias("k"),
    )


_COSINE_TRUNC_SQL = f"""
  list_sum(list_transform(range(1, {TRUNC_DIM} + 1), i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)))
  / (sqrt(list_sum(list_transform(qe[1:{TRUNC_DIM}], x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
   * sqrt(list_sum(list_transform(ce[1:{TRUNC_DIM}], x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
"""

ORACLE_Q160 = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {N_AUDIT_QUERIES}),
c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
s AS (
  SELECT query_id, neighbor_id,
         round({COSINE_SQL}, 6) AS cos_full,
         round({_COSINE_TRUNC_SQL}, 6) AS cos_trunc
  FROM q, c WHERE query_id <> neighbor_id
),
r AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_full DESC, neighbor_id) AS rn_full,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_trunc DESC, neighbor_id) AS rn_trunc
  FROM s
)
SELECT query_id,
       CAST(sum(CASE WHEN rn_full <= {RECALL_K} AND rn_trunc <= {RECALL_K} THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
       CAST({RECALL_K} AS BIGINT) AS k
FROM r GROUP BY query_id
"""


# --------------------------------------------------------------------------
# q163: rank-discounted ANN quality audit (nDCG-style, exact rationals)
# --------------------------------------------------------------------------

NDCG_K = 3
# harmonic rank discounts 1/i scaled by LCM(1..K) so gains are integers
_DISCOUNT_LCM = 6
_DISCOUNTS = {i: _DISCOUNT_LCM // i for i in range(1, NDCG_K + 1)}  # 6, 3, 2
_IDCG_X = sum(_DISCOUNTS.values())  # 11


def q163_ann_rank_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-aware quality of the LSH ANN tier (q47) against the exact
    ranking (q46): a hit at approx-rank i earns discount 1/i, scaled by
    LCM(1..K)=6 so every gain is an integer — recall (q49c) says how many
    true neighbors survive, this says WHERE they land. ndcg_ppm is an
    integer division against the ideal 6/1+6/2+6/3 = 11, so the audit is
    hash-exact. Composes the two registered pipelines; the join is
    K-rows-per-query sized."""
    from .similarity import q46_cosine_topk, q47_ann_lsh

    exact = q46_cosine_topk(spark, sf_dir).filter(F.col("rn") <= NDCG_K).select(
        "query_id", "neighbor_id"
    )
    approx = q47_ann_lsh(spark, sf_dir).select("query_id", "neighbor_id", "rn")
    gain = F.coalesce(
        *[F.when(F.col("rn") == i, F.lit(w)) for i, w in _DISCOUNTS.items()], F.lit(0)
    )
    hits = approx.join(exact, ["query_id", "neighbor_id"], "left_semi").select(
        "query_id", gain.alias("g")
    )
    # base the report on the QUERY SET, not on queries that produced ANN
    # candidates -- a query whose bucket is empty must still report 0.
    from .similarity import N_QUERIES

    base = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id")
    )
    per_q = base.join(
        hits.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("n_hits"), F.sum("g").alias("dcg_x6")
        ),
        "query_id",
        "left",
    ).na.fill(0, ["n_hits", "dcg_x6"])
    return per_q.select(
        "query_id",
        F.col("n_hits").cast("bigint").alias("n_hits"),
        F.col("dcg_x6").cast("bigint").alias("dcg_x6"),
        F.expr(f"CAST(dcg_x6 * 1000000 DIV {_IDCG_X} AS BIGINT)").alias("ndcg_ppm"),
    )


def _oracle_q163() -> str:
    from .similarity import N_QUERIES, ORACLE_Q46, ORACLE_Q47

    cases = " ".join(f"WHEN {i} THEN {w}" for i, w in _DISCOUNTS.items())
    return f"""
WITH exact_k AS (SELECT query_id, neighbor_id FROM ({ORACLE_Q46}) WHERE rn <= {NDCG_K}),
approx AS (SELECT query_id, neighbor_id, rn FROM ({ORACLE_Q47})),
hits AS (
  SELECT a.query_id, CASE a.rn {cases} ELSE 0 END AS g
  FROM approx a WHERE EXISTS (SELECT 1 FROM exact_k e
                              WHERE e.query_id = a.query_id
                                AND e.neighbor_id = a.neighbor_id)
),
per_q AS (
  SELECT q.query_id,
         CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
         CAST(coalesce(h.dcg_x6, 0) AS BIGINT) AS dcg_x6
  FROM (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < {N_QUERIES}) q
  LEFT JOIN (SELECT query_id, count(*) AS n_hits, sum(g) AS dcg_x6
             FROM hits GROUP BY query_id) h USING (query_id)
)
SELECT query_id, n_hits, dcg_x6,
       CAST(dcg_x6 * 1000000 // {_IDCG_X} AS BIGINT) AS ndcg_ppm
FROM per_q
"""


QUERIES = {
    "q158_pq_distortion": q158_pq_distortion,
    "q159_hard_negatives": q159_hard_negatives,
    "q160_truncation_recall": q160_truncation_recall,
    "q163_ann_rank_quality": q163_ann_rank_quality,
}

ORACLES = {
    "q158_pq_distortion": ORACLE_Q158,
    "q159_hard_negatives": ORACLE_Q159,
    "q160_truncation_recall": ORACLE_Q160,
    "q163_ann_rank_quality": _oracle_q163(),
}
