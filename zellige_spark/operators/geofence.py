"""Geofence enter/exit detection over ordered trajectories.

"Alert when an entity enters or leaves a zone" — geofenced delivery,
safety perimeters, region-based billing.  Each point gets an inside/
outside flag against a fixed polygon (even-odd ray cast, the same rule
as ``operators/pip.py``), and a transition row is emitted whenever the
flag differs from the entity's PREVIOUS point in (ts, id) order.

The inside flag is generated as one SQL expression TEXT shared
verbatim by Spark and DuckDB (`inside_crossings`): both engines run
the identical float op sequence, so the flag — and therefore the
transition set — is hash-exact under the oracle gate (polygon vertices
are chosen off the coordinate lattice, so no point sits within ulps of
an edge).

Scale plan: the flag is MAP-SIDE pure Column math (one CASE term per
edge, whole-stage codegen).  The only shuffle is the per-entity window
— one Exchange hash-partitioned by entity, the same key a streaming
state store shards by (see ``streaming/geofence.py`` for the
cross-batch stateful twin).
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["inside_crossings", "geofence_transitions"]


def inside_crossings(verts: Sequence[Tuple[float, float]],
                     lon: str = "lon", lat: str = "lat") -> str:
    """Even-odd ray-cast crossing count as SQL text (valid in Spark SQL
    AND DuckDB): crossing iff min(y1,y2) <= lat < max(y1,y2) and the
    edge's x at lat exceeds lon.  `(expr) % 2 = 1` is the inside flag.
    Same rule as ``kernel ray_cast_mask`` / queries ``_sql_pip_crossings``."""
    terms = []
    for (x1, y1), (x2, y2) in zip(verts[:-1], verts[1:]):
        if y1 == y2:
            continue
        t = f"(({lat} - {y1!r}) / ({y2!r} - {y1!r}))"
        xs = f"({x1!r} + {t} * ({x2!r} - {x1!r}))"
        cond = (f"({lat} >= least({y1!r},{y2!r}) AND"
                f" {lat} < greatest({y1!r},{y2!r}) AND {xs} > {lon})")
        terms.append(f"CASE WHEN {cond} THEN 1 ELSE 0 END")
    return " + ".join(terms)


def geofence_transitions(df: DataFrame,
                         verts: Sequence[Tuple[float, float]],
                         entity_col: str = "user_id",
                         ts_col: str = "ts",
                         id_col: str = "event_id") -> DataFrame:
    """Enter/exit rows per entity in (ts, id) order: (entity, id,
    ts_us, kind) where kind is 'enter' when the flag flips outside->in
    and 'exit' for in->out.  An entity's first point never emits."""
    inside = F.expr(f"(({inside_crossings(verts)}) % 2) = 1")
    w = Window.partitionBy(entity_col).orderBy(ts_col, id_col)
    d = (df.withColumn("_in", inside)
         .withColumn("_prev", F.lag("_in").over(w)))
    return (d.filter(F.col("_prev").isNotNull()
                     & (F.col("_prev") != F.col("_in")))
            .select(F.col(entity_col),
                    F.col(id_col),
                    F.expr(f"unix_micros(cast({ts_col} as timestamp))")
                    .alias("ts_us"),
                    F.when(F.col("_in"), F.lit("enter"))
                    .otherwise(F.lit("exit")).alias("kind")))
