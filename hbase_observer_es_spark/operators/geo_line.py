"""ES `geo_line` aggregation: per bucket, the sort-ordered track of the first
N points — the trip/route reconstruction agg (ES sorts bucket points by a
sort field and emits a size-capped LineString).

The reference delegates aggregation to Elasticsearch (/root/reference
README.md:3); the point derivation is nested_geo.py's (single source of truth
for the synthetic lat/lon and its id-range invariant).

Determinism: the track is ordered by the UNIQUE (ts, event_id) key and cut at
GEO_LINE_SIZE by a per-group rank; the rank itself is emitted as `point_seq`,
so the LineString is the `point_seq`-ordered scalar rows — no array collection.
Coordinates stay DOUBLES end-to-end (never formatted to strings: double→string
rendering is engine-specific, the D10/D12 family of drift); each coordinate is
one integer-derived division, identical on both engines.

Output shape: one row per kept point `(event_type, point_seq, lon, lat)` —
scalar columns only, per the registry-wide output contract (registry.py:
complex-typed top-level columns are not canonicalizable downstream). A consumer
rebuilds the per-bucket track by grouping on event_type and ordering by
point_seq; the cap bounds that to GEO_LINE_SIZE rows per bucket (the cap is
exactly why ES can promise geo_line won't blow up a coordinating node).

Scale: the per-group rank is the q_topk_pergroup posture — one hash exchange
on the bucket key, per-group sort bounded by group size; no further shuffle
(the collect-free shape drops the old groupBy/agg stage entirely).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import table
from .nested_geo import _SQL_LAT, _SQL_LON, _lat, _lon

GEO_LINE_SIZE = 10  # ES geo_line `size`: points kept per bucket


def q_agg_geoline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: the first {GEO_LINE_SIZE} points (by ts, event_id),
    one scalar row per point with its 1-based track position `point_seq`."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        e.select(
            "event_type",
            "ts",
            "event_id",
            _lon().alias("lon"),
            _lat().alias("lat"),
        )
        .withColumn("point_seq", F.row_number().over(w))
        .filter(F.col("point_seq") <= GEO_LINE_SIZE)
        .select("event_type", "point_seq", "lon", "lat")
    )


SQL_AGG_GEOLINE = f"""
WITH pts AS (
    SELECT event_type,
           {_SQL_LON} AS lon,
           {_SQL_LAT} AS lat,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY ts ASC, event_id ASC) AS point_seq
    FROM events
)
SELECT event_type, point_seq, lon, lat
FROM pts
WHERE point_seq <= {GEO_LINE_SIZE}
"""


QUERIES = {"q_agg_geoline": q_agg_geoline}
ORACLES = {"q_agg_geoline": SQL_AGG_GEOLINE}
