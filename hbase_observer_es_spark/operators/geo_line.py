"""ES `geo_line` aggregation: per bucket, the sort-ordered track of the first
N points — the trip/route reconstruction agg (ES sorts bucket points by a
sort field and emits a size-capped LineString).

The reference delegates aggregation to Elasticsearch (/root/reference
README.md:3); the point derivation is nested_geo.py's (single source of truth
for the synthetic lat/lon and its id-range invariant).

Determinism: the track is ordered by the UNIQUE (ts, event_id) key, cut at
GEO_LINE_SIZE by a per-group rank, and collected via sort_array over that same
key — the same list both engines produce. Coordinates stay DOUBLES in arrays
end-to-end (never formatted to strings: double→string rendering is
engine-specific, the D10/D12 family of drift); each coordinate is one
integer-derived division, identical on both engines.

Scale: the per-group rank is the q_topk_pergroup posture — one hash exchange
on the bucket key, per-group sort bounded by group size; the collect_list runs
over ≤GEO_LINE_SIZE rows per bucket (the cap is exactly why ES can promise
geo_line won't blow up a coordinating node — same reason it's safe here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import table
from .nested_geo import _SQL_LAT, _SQL_LON, _lat, _lon

GEO_LINE_SIZE = 10  # ES geo_line `size`: points kept per bucket


def q_agg_geoline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: the first {GEO_LINE_SIZE} points (by ts, event_id) as
    parallel lon/lat arrays in track order, plus the kept-point count."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.asc("ts"), F.asc("event_id"))
    pts = (
        e.select(
            "event_type",
            "ts",
            "event_id",
            _lon().alias("lon"),
            _lat().alias("lat"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= GEO_LINE_SIZE)
    )
    track = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("lon"), F.col("lat")))
    )
    return pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.transform(track, lambda p: p["lon"]).alias("line_lon"),
        F.transform(track, lambda p: p["lat"]).alias("line_lat"),
    )


SQL_AGG_GEOLINE = f"""
WITH pts AS (
    SELECT event_type, ts, event_id,
           {_SQL_LON} AS lon,
           {_SQL_LAT} AS lat,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY ts ASC, event_id ASC) AS rn
    FROM events
)
SELECT event_type, COUNT(*) AS n_points,
       list(lon ORDER BY ts ASC, event_id ASC) AS line_lon,
       list(lat ORDER BY ts ASC, event_id ASC) AS line_lat
FROM pts
WHERE rn <= {GEO_LINE_SIZE}
GROUP BY event_type
"""


QUERIES = {"q_agg_geoline": q_agg_geoline}
ORACLES = {"q_agg_geoline": SQL_AGG_GEOLINE}
