"""Round-6 operator tests: interval overlap join, co-travel — the
temporal/contact join family added on top of the round-5 surface."""

import numpy as np
import pytest


def test_interval_overlap_join_matches_bruteforce(spark):
    """General interval x interval overlap equals the literal range
    predicate; pairs spanning MANY chunks are still emitted exactly
    once (ownership dedup, no distinct); zero-length intervals drop;
    the plan has no cartesian/nested-loop join."""
    from zellige_spark.operators import temporal as TP

    rng = np.random.default_rng(57)
    n_a, n_b = 300, 200
    a_s = rng.integers(0, 100000, n_a)
    a_len = rng.integers(0, 9000, n_a)          # some zero-length
    b_s = rng.integers(0, 100000, n_b)
    b_len = rng.integers(1, 40000, n_b)         # long: many chunks
    a_rows = [(i, int(a_s[i]), int(a_s[i] + a_len[i])) for i in range(n_a)]
    b_rows = [(j, int(b_s[j]), int(b_s[j] + b_len[j])) for j in range(n_b)]
    a = spark.createDataFrame(a_rows, "a_id long, a_s long, a_e long")
    b = spark.createDataFrame(b_rows, "b_id long, b_s long, b_e long")
    out = TP.interval_overlap_join(a, b, chunk=1000)
    got = [(r.a_id, r.b_id, r.overlap_s, r.overlap_e)
           for r in out.collect()]
    assert len(got) == len(set(got)), "ownership dedup emitted a pair twice"

    want = []
    for i, sa, ea in a_rows:
        if ea <= sa:
            continue
        for j, sb, eb in b_rows:
            if max(sa, sb) < min(ea, eb):
                want.append((i, j, max(sa, sb), min(ea, eb)))
    assert sorted(got) == sorted(want)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_overlap_join_point_probe_special_case(spark):
    """[ts, ts+1) point probes reduce to point-in-interval semantics:
    inclusive start, exclusive end, boundary instants pinned."""
    from zellige_spark.operators import temporal as TP

    iv = spark.createDataFrame([(1, 100, 200)], "b_id long, b_s long, b_e long")
    pts = spark.createDataFrame(
        [(10, 99), (11, 100), (12, 199), (13, 200)],
        "a_id long, ts long")
    pr = pts.selectExpr("a_id", "ts as a_s", "ts + 1 as a_e")
    got = sorted(r.a_id for r in
                 TP.interval_overlap_join(pr, iv, chunk=50).collect())
    assert got == [11, 12]   # 99 before, 200 at the exclusive end


def test_interval_overlap_join_rejects_bad_chunk(spark):
    from zellige_spark.operators import temporal as TP

    df = spark.createDataFrame([(1, 0, 10)], "a_id long, a_s long, a_e long")
    with pytest.raises(ValueError):
        TP.interval_overlap_join(df, df, chunk=0)
