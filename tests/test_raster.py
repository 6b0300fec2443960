"""Raster<->vector materialization tests."""

import numpy as np

from zellige_spark import synth
from zellige_spark.kernel import mvt as kmvt
from zellige_spark.kernel import simplify as ksimp
from zellige_spark.operators import raster as R
from zellige_spark.operators import tiles as T


def test_mask_to_rect_rings_merges_rows():
    mask = np.zeros((4, 4), dtype=bool)
    mask[1:3, 1:3] = True   # one 2x2 block
    mask[0, 3] = True       # one isolated cell
    rings = R.mask_to_rect_rings(mask, cell=10.0)
    assert len(rings) == 2
    areas = sorted(abs(ksimp.surveyor(r)) for r in rings)
    assert areas == [100.0, 400.0]
    for r in rings:
        assert ksimp.is_clockwise(r)
        assert (r[0] == r[-1]).all()


def test_rasterize_then_vectorize_roundtrip(spark):
    imgs = synth.images_df(spark, 400).select("image_id", "lon", "lat")
    assigned = T.assign_tiles_buffered(imgs, zoom=4)
    px = T.tile_local_px(assigned, extent=4096)
    rasters = R.rasterize_tiles(px, grid=32).cache()
    rs = rasters.toPandas()
    assert rs["n_points"].sum() >= 400
    # every PNG decodes and has energy where points exist
    r0 = rs.iloc[rs["n_points"].idxmax()]
    rgb = synth.decode_png(bytes(r0["png"]))
    assert rgb.shape == (32, 32, 3)
    assert rgb.max() == 255

    vec = R.vectorize_tiles(rasters, threshold=1).toPandas()
    assert len(vec) == len(rs)
    v0 = vec[(vec["tile_x"] == r0["tile_x"]) & (vec["tile_y"] == r0["tile_y"])].iloc[0]
    assert v0["feature_count"] >= 1
    layer = kmvt.decode_tile(bytes(v0["mvt"]))["coverage"]
    assert len(layer["features"]) == v0["feature_count"]
    f0 = layer["features"][0]
    assert f0["type"] == kmvt.GEOM_POLYGON
    assert f0["metadata"]["src"] == ("st", "raster")
    # decoded rectangle rings are closed 5-point rings in extent space
    outer, inner = f0["geometry"][0]
    assert len(outer) == 5 and outer[0] == outer[-1]
    assert all(0 <= x <= 4096 and 0 <= y <= 4096 for x, y in outer)
