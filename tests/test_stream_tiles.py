"""Streaming incremental tile refresh: two micro-batches of image rows,
latest materialized tiles must equal a batch recompute over all data."""

import os

from zellige_spark import synth
from zellige_spark.operators import encode as E
from zellige_spark.operators import tiles as T
from zellige_spark.streaming.tiles import read_latest_tiles, stream_tile_refresh


def test_stream_tile_refresh_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # two files = (at least) two micro-batch units for availableNow
    a = synth.gen_images_pandas(0, 200)[["image_id", "lon", "lat"]]
    b = synth.gen_images_pandas(200, 400)[["image_id", "lon", "lat"]]
    spark.createDataFrame(a).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(src)

    q, store = stream_tile_refresh(spark, src, str(tmp_path / "work"), zoom=5)
    q.awaitTermination(240)

    latest = read_latest_tiles(spark, store).toPandas() \
        .sort_values(["tile_x", "tile_y"], ignore_index=True)

    full = spark.read.parquet(src)
    expected = E.assemble_point_tiles_streaming(
        T.assign_tiles_buffered(full, zoom=5)).toPandas() \
        .sort_values(["tile_x", "tile_y"], ignore_index=True)

    assert len(latest) == len(expected)
    assert (latest["feature_count"].to_numpy() == expected["feature_count"].to_numpy()).all()
    assert (latest["mvt"] == expected["mvt"]).all()  # byte-identical refresh
