"""etlutil_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ``sheinnick/etlutil`` toolkit,
re-expressed as DataFrame-level transformations.

The reference (see SURVEY.md) is a single-process, record-at-a-time ETL
library: 8 nested-container operators plus a BigQuery-style date layer.
Here every operator is a pure ``DataFrame -> DataFrame`` transform compiled
driver-side against ``df.schema``, so Catalyst gets a fully declarative plan
(predicate pushdown, column pruning, whole-stage codegen, AQE all apply).

Layout:
    session     SparkSession factory tuned for the local[32] harness
    sources     testdata loaders + generic readers/sinks
    functions   column-level helpers (dates, hashing, text, vectors)
    operators   the reference's 8 operators lifted to DataFrames, plus
                scale-out extensions (dedup, similarity, text analysis)
    streaming   Structured Streaming variants of the date-bucket workload
    plans       plan-inspection utilities (pushdown/codegen assertions)
"""

from etlutil_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
