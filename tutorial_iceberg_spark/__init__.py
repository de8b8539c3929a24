"""tutorial_iceberg_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the full query / data-processing surface of the
reference curriculum kyong0612/tutorial-iceberg (see SURVEY.md):

- relational analytics (scans, filters, aggregations, windows, sorts, joins)
  -> ``tutorial_iceberg_spark.operators``
- Parquet / CSV / partitioned sources+sinks, metadata introspection
  -> ``tutorial_iceberg_spark.sources``
- scalar / JSON / variant / vector / text functions
  -> ``tutorial_iceberg_spark.functions``
- Iceberg-semantics lakehouse tables (snapshots, time travel, MERGE,
  schema+partition evolution, compaction) emulated Spark-native
  -> ``tutorial_iceberg_spark.lakehouse``
- plan inspection / explain helpers -> ``tutorial_iceberg_spark.plans``
- Structured Streaming over the events table -> ``tutorial_iceberg_spark.streaming``

Everything is built on the public PySpark 4.x DataFrame/SQL API; no custom
Catalyst rules, no RDD hot paths, no row-at-a-time Python UDFs in hot paths.
"""

__version__ = "0.1.0"

from tutorial_iceberg_spark.session import get_spark  # noqa: F401
from tutorial_iceberg_spark.io import load_table, register_views  # noqa: F401
