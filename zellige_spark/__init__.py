"""zellige_spark — a PySpark-native spatial-join + tiling engine.

Re-expresses the per-tile semantics of the zellige GeoJSON->MVT encoder
(reference at /root/reference) as vectorized numpy kernels driven by
Spark DataFrame plans, plus the at-scale operators the reference lacks
(tile assignment, point-in-polygon joins, kNN, dedup/text/similarity
operators for training-data pipelines).
"""

__version__ = "0.1.0"
