"""Physical-plan shape assertions — the 100-TB design contracts from
PLANS.md, pinned so a refactor can't silently regress them.  Each test
checks the EXECUTED (or final spark) plan string for the properties
that matter at scale: shuffle count, Python placement, join strategy."""

import re

from pyspark.sql import functions as F

from zellige_spark import synth
from zellige_spark.operators import encode as E
from zellige_spark.operators import pip as PIP
from zellige_spark.operators import tiles as T

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_shuffles(plan: str) -> int:
    # count shuffle boundaries, not reuse/AQE-read wrappers
    return len(re.findall(r"Exchange hashpartitioning|Exchange rangepartitioning", plan))


def test_encode_streaming_has_exactly_one_shuffle(spark):
    pts = synth.images_df(spark, 200).select("image_id", "lon", "lat")
    tiles = E.assemble_point_tiles_streaming(
        T.assign_tiles_buffered(pts, zoom=5))
    plan = _plan(tiles)
    assert _n_shuffles(plan) == 1, plan
    # the buffered-window filter must sit BELOW the exchange (clipped
    # rows never shuffle): the plan has no Filter above the Exchange
    above_exchange = plan.split("Exchange", 1)[0]
    assert "Filter" not in above_exchange, plan


def test_pip_broadcast_plan_is_broadcast_plus_arrow_filter(spark):
    pts = synth.images_df(spark, 200).select("image_id", "lon", "lat")
    polys = synth.coverage_polygons_df(spark, 20)
    plan = _plan(PIP.pip_join_broadcast(pts, polys))
    assert "Broadcast" in plan          # dim side broadcast, never SMJ
    assert "SortMergeJoin" not in plan
    assert _n_shuffles(plan) == 0, plan  # fact side never shuffles
    assert plan.count("ArrowEvalPython") == 1  # refine only


def test_knn_fixed_ring_single_data_shuffle(spark):
    q = spark.createDataFrame([("q0", 10.0, 10.0), ("q1", -20.0, 30.0)],
                              "query_id string, lon double, lat double")
    d = synth.images_df(spark, 300).select("image_id", "lon", "lat")
    from zellige_spark.operators import knn as KNN

    plan = _plan(KNN.knn_kring(q, d, k=3, index_zoom=4, max_ring=1,
                               data_id="image_id"))
    # one hash shuffle for the cell join side + one for the window
    assert _n_shuffles(plan) <= 2, plan
    assert "CartesianProduct" not in plan


def test_minhash_words_all_jvm_until_output(spark):
    from zellige_spark.operators import dedup as DD

    aug = DD._augmented(spark, SF)
    sig = DD.minhash_signatures(DD._word_shingle_arrays(aug))
    plan = _plan(sig)
    assert "EvalPython" not in plan  # signatures are pure Column math
