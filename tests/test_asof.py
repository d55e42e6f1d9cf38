"""Generic as-of join operator: result parity against the naive
inequality-join definition on a fixture with ties, gaps, and keys that have
no prior right row."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_ddl_extract_tool_spark.operators.advanced import asof_join


def test_asof_join_matches_naive_definition(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 205, "b"), (2, 50, "c"), (3, 10, "d"), (1, 200, "e")],
        "k int, lts int, lval string",
    )
    right = spark.createDataFrame(
        [(1, 100, "r1"), (1, 150, "r2"), (1, 200, "r3"), (2, 60, "r4")],
        "k int, rts int, rval string",
    )
    got = {
        (r["k"], r["lts"]): r["asof_rval"]
        for r in asof_join(
            left, right, by="k", left_ts="lts", right_ts="rts",
            right_cols=["rval"], tiebreak="lval",
        ).collect()
    }
    # naive definition: latest right row with rts <= lts for the same key
    expected = {}
    rrows = [(1, 100, "r1"), (1, 150, "r2"), (1, 200, "r3"), (2, 60, "r4")]
    for k, lts, _ in [(1, 100, "a"), (1, 205, "b"), (2, 50, "c"), (3, 10, "d"), (1, 200, "e")]:
        prior = [(rts, rv) for rk, rts, rv in rrows if rk == k and rts <= lts]
        expected[(k, lts)] = max(prior)[1] if prior else None
    assert got == expected
    # exactly-simultaneous right row (rts == lts) is visible: k=1 lts=100 -> r1
    assert got[(1, 100)] == "r1"
    # no prior right row -> NULL: k=2 lts=50, k=3
    assert got[(2, 50)] is None and got[(3, 10)] is None


def test_asof_join_randomized_against_naive(spark):
    """Seeded random corpus: 12 keys, duplicate timestamps on both sides,
    keys present on only one side -- compared row-for-row against the naive
    quadratic definition computed in Python."""
    import numpy as np

    rng = np.random.RandomState(7)
    lrows = [
        (int(rng.randint(0, 12)), int(rng.randint(0, 40)), i)
        for i in range(200)
    ]
    rrows = [
        (int(rng.randint(0, 14)), int(rng.randint(0, 40)), 1000 + i)
        for i in range(150)
    ]
    # `tb` exists on BOTH sides (the operator's tiebreak contract): right
    # rows sharing a timestamp order among themselves by tb, so the carried
    # row is well-defined
    left = spark.createDataFrame([(k, t, i, i) for k, t, i in lrows], "k int, lts int, lid int, tb int")
    right = spark.createDataFrame([(k, t, i, i) for k, t, i in rrows], "k int, rts int, rid int, tb int")
    got = {
        (r["k"], r["lts"], r["lid"]): r["asof_rid"]
        for r in asof_join(
            left, right, by="k", left_ts="lts", right_ts="rts",
            right_cols=["rid"], tiebreak="tb",
        ).collect()
    }
    assert len(got) == len(lrows)
    for k, lts, lid in lrows:
        prior = [(rts, rid) for rk, rts, rid in rrows if rk == k and rts <= lts]
        # naive: latest rts wins; equal rts resolved by the window's order,
        # where the LAST right row in (ts, side, tiebreak) order is carried --
        # right rows tie-break among themselves on the tiebreak column (rid
        # ascending), so max (rts, rid) is the carried row
        expected = max(prior)[1] if prior else None
        assert got[(k, lts, lid)] == expected, (k, lts, lid)


def test_asof_join_plan_has_no_join(spark):
    from hive_ddl_extract_tool_spark.plans.explain import formatted_plan

    left = spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 2).alias("lts"))
    right = spark.range(5).select(F.col("id").alias("k"), (F.col("id") * 3).alias("rts"), F.lit("x").alias("rv"))
    df = asof_join(left, right, by="k", left_ts="lts", right_ts="rts",
                   right_cols=["rv"], tiebreak="k")
    assert "Join" not in formatted_plan(df).replace("Union", "")
