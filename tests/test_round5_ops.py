"""Round-5 additions: ANN recall-audit opt-out (plan-asserted), the
runtime ring fan-out (sequence-explode) that replaces the 1e6-literal
guard in the adaptive kNN paths, and their equality with the literal
fan-out."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


SF = "/root/testdata/sf0.001"


# --- recall_e3 audit opt-out (round-4 verdict task #2) ----------------------

@pytest.mark.parametrize("qname", ["ann_lsh", "ann_ivf", "ann_ivfpq"])
def test_ann_recall_audit_opt_out(spark, qname):
    """With recall_audit=False the ANN operators must not embed the
    brute-force corpus scan: no NestedLoopJoin / CartesianProduct in
    the plan, no recall_e3 column; with the default (on) the audit
    column is present — so the driver queries stay self-verifying while
    the production path is not Omega(n) by construction."""
    from zellige_spark.operators import similarity as SIM

    fn = {"ann_lsh": SIM.q_ann_lsh, "ann_ivf": SIM.q_ann_ivf,
          "ann_ivfpq": SIM.q_ann_ivfpq}[qname]
    off = fn(spark, SF, recall_audit=False)
    assert "recall_e3" not in off.columns
    plan = _plan(off)
    assert "NestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    on = fn(spark, SF)
    assert "recall_e3" in on.columns
    # same approximate answer either way
    a = sorted(map(tuple, off.select("query_id", "neighbor_id", "rank").collect()))
    b = sorted(map(tuple, on.select("query_id", "neighbor_id", "rank").collect()))
    assert a == b


def test_ann_bruteforce_plan_does_nestedloop(spark):
    """Sanity check on the assertion above: the brute-force oracle DOES
    plan a nested-loop (broadcast cross join) — so its absence in the
    audit-off plans is a meaningful signal, not a naming accident."""
    from zellige_spark.operators import similarity as SIM

    plan = _plan(SIM.q_ann_bruteforce(spark, SF))
    assert "NestedLoopJoin" in plan or "CartesianProduct" in plan


# --- hash-ordered (unbiased) training samples (verdict task #3) -------------

def test_ivf_training_sample_is_hash_ordered_not_prefix(spark):
    """The k-means training rows must come from a hash-ordered sample,
    not the first ids: train on a tiny corpus where the id-prefix slice
    and the hash slice differ, and check determinism across calls."""
    import numpy as np

    from zellige_spark.operators.similarity import _ivf_centroids

    rows = [(i, [float((i * 37 + j * 11) % 17 - 8) for j in range(8)])
            for i in range(64)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    C1 = _ivf_centroids(spark, emb, k=4, sample=16)
    C2 = _ivf_centroids(spark, emb, k=4, sample=16)
    assert np.array_equal(C1, C2)  # deterministic
    # the sampled ids are NOT the prefix 0..15
    sampled = [r["vec_id"] for r in
               emb.orderBy(F.xxhash64(F.col("vec_id"), F.lit(42)), "vec_id")
                  .limit(16).select("vec_id").collect()]
    assert sorted(sampled) != list(range(16))


# --- runtime (sequence-explode) ring fan-out --------------------------------

def _toy_points(spark):
    qs = spark.createDataFrame(
        [(0, -179.99, 0.5), (1, 10.0, 45.0), (2, 150.0, -60.0)],
        "query_id long, lon double, lat double")
    data = spark.createDataFrame(
        [(i, float((i * 97) % 360 - 180) + 0.123, float((i * 53) % 160 - 80) + 0.321)
         for i in range(300)],
        "image_id long, lon double, lat double")
    return qs, data


def test_kring_sequence_fanout_equals_literal(spark, monkeypatch):
    """Forcing the runtime sequence fan-out (threshold 0) must give the
    exact same kNN rows as the literal-array fan-out, XYZ backend."""
    from zellige_spark.operators import knn as KNN

    qs, data = _toy_points(spark)
    lit_rows = sorted(map(tuple,
        KNN.knn_kring(qs, data, k=3, index_zoom=2, max_ring=3)
           .select("query_id", "neighbor_id", "rank").collect()))
    monkeypatch.setattr(KNN, "LITERAL_FANOUT_MAX", 0)
    seq_rows = sorted(map(tuple,
        KNN.knn_kring(qs, data, k=3, index_zoom=2, max_ring=3)
           .select("query_id", "neighbor_id", "rank").collect()))
    assert seq_rows == lit_rows


def test_hex_sequence_fanout_equals_literal(spark, monkeypatch):
    """Same equality for the hex backend — including the dq-dependent
    dr bounds that keep max(|dq|,|dr|,|dq+dr|) <= R."""
    from zellige_spark.operators import hexgrid as HX
    from zellige_spark.operators import knn as KNN

    qs, data = _toy_points(spark)
    lit_rows = sorted(map(tuple,
        HX.knn_hex(qs, data, k=3, level=2, ring=3)
          .select("query_id", "neighbor_id", "rank").collect()))
    monkeypatch.setattr(KNN, "LITERAL_FANOUT_MAX", 0)
    seq_rows = sorted(map(tuple,
        HX.knn_hex(qs, data, k=3, level=2, ring=3)
          .select("query_id", "neighbor_id", "rank").collect()))
    assert seq_rows == lit_rows


def test_adaptive_full_cover_no_longer_raises(spark):
    """The exact scenario the round-4 advisor flagged: adaptive kNN at
    a fine index (zoom/level >= 9) on sparse data doubles its ring past
    the old literal cap before reaching full cover.  With the runtime
    fan-out both backends complete and find the true neighbor."""
    from zellige_spark.operators import hexgrid as HX
    from zellige_spark.operators import knn as KNN

    qs = spark.createDataFrame([(0, -179.5, 0.25)],
                               "query_id long, lon double, lat double")
    # single antipodal data point: nothing near the query, so the ring
    # must expand all the way
    data = spark.createDataFrame([(7, 179.5, -0.25)],
                                 "image_id long, lon double, lat double")
    out = (KNN.knn_kring_adaptive(qs, data, k=1, index_zoom=9,
                                  start_ring=400)
              .select("query_id", "neighbor_id", "rank").collect())
    assert [tuple(r) for r in out] == [(0, 7, 1)]
    out = (HX.knn_hex_adaptive(qs, data, k=1, level=9, start_ring=600)
             .select("query_id", "neighbor_id", "rank").collect())
    assert [tuple(r) for r in out] == [(0, 7, 1)]
