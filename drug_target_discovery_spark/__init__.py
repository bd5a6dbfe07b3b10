"""drug_target_discovery_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference pipeline ``gvmfhy/drug-target-discovery`` (see SURVEY.md), built
Spark-first: lazy DataFrame transforms, Catalyst-optimized plans, broadcast
joins for small dims, window functions for per-group statistics, Pandas UDFs
only where built-ins genuinely can't express the semantics (t-distribution
CDF, per-source graph traversal, external enrichment).

Layout
------
- ``session``    : SparkSession factory tuned for local[32] and cluster use
- ``sources``    : parquet/CSV/text readers incl. the GEO Series Matrix parser
- ``functions``  : column-level helpers (stats, text, vector math)
- ``operators``  : composable DataFrame -> DataFrame transforms
- ``graph``      : edge-list graph ops (degree/eigenvector/betweenness)
- ``plans``      : the end-to-end drug-target pipeline as transform composition
- ``streaming``  : event-time windowing / dedup, batch- and stream-capable
- ``queries``    : the driver-facing registry (Spark impl + DuckDB oracle SQL)
"""

__version__ = "0.1.0"

from drug_target_discovery_spark.session import get_spark  # noqa: F401
