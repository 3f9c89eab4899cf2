"""Ad-hoc Spark SQL over the registered fixture views (io.register_views)."""

from __future__ import annotations

from hbase_observer_es_spark.io import TABLES, register_views

from .conftest import SF_ORACLE


def test_all_views_queryable(spark):
    register_views(spark, SF_ORACLE)
    for t in TABLES:
        assert spark.sql(f"SELECT COUNT(*) AS n FROM {t}").collect()[0].n > 0


def test_ansi_join_over_views(spark):
    register_views(spark, SF_ORACLE)
    rows = spark.sql(
        """
        SELECT n_name, COUNT(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n DESC, n_name LIMIT 3
        """
    ).collect()
    assert len(rows) == 3 and all(r.n > 0 for r in rows)
