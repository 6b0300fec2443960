"""Streaming cross-batch KDE heat: per-cell Epanechnikov sums are
additive, so the FINAL streamed state must equal the batch
``kde_heat`` over the union of all micro-batches — exactly, int64
for int64."""

import os
import time

import numpy as np

from zellige_spark.operators.hotspots import kde_heat
from zellige_spark.streaming.heat import stream_kde_heat

GRID, RADIUS = 8, 50000


def _batches(spark, tmp_path):
    src = str(tmp_path / "kde_in")
    os.makedirs(src)
    rng = np.random.default_rng(77)
    rows1 = [(int(i), int(rng.integers(0, 360000)),
              int(rng.integers(0, 170000))) for i in range(300)]
    rows2 = [(int(300 + i), int(rng.integers(0, 360000)),
              int(rng.integers(0, 170000))) for i in range(200)]
    # pin wrap coverage: events hugging both x edges
    rows2 += [(600, 5, 80000), (601, 359995, 80005)]
    for rows in (rows1, rows2):
        (spark.createDataFrame(rows, "id long, x long, y long")
         .coalesce(1).write.mode("append").parquet(src))
        time.sleep(1.1)
    return src


def test_stream_kde_final_state_equals_batch(spark, tmp_path):
    src = _batches(spark, tmp_path)
    q = stream_kde_heat(spark, src, str(tmp_path / "ckpt"),
                        grid=GRID, radius=RADIUS,
                        query_name="kde_t1", max_files_per_trigger=1)
    q.awaitTermination(180)
    out = spark.table("kde_t1").toPandas()
    assert out.n_updates.max() == 2, "cross-batch state was not exercised"
    last = (out.sort_values("n_updates").groupby(["cell_x", "cell_y"])
               .tail(1).reset_index(drop=True))
    got = {(r.cell_x, r.cell_y): (r.kde_num, r.n_in)
           for r in last.itertuples()}

    batch = spark.read.parquet(src)
    want = {(r.cell_x, r.cell_y): (r.kde_num, r.n_in)
            for r in kde_heat(batch, GRID, RADIUS).collect()
            if r.n_in > 0}
    assert got == want
