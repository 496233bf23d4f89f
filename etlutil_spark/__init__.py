"""etlutil_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ``sheinnick/etlutil`` toolkit,
re-expressed as DataFrame-level transformations.

The reference (see SURVEY.md) is a single-process, record-at-a-time ETL
library: 8 nested-container operators plus a BigQuery-style date layer.
Here every operator is a pure ``DataFrame -> DataFrame`` transform compiled
driver-side against ``df.schema``, so Catalyst gets a fully declarative plan
(predicate pushdown, column pruning, whole-stage codegen, AQE all apply).

The top-level namespace mirrors the reference's public surface
(``/root/reference/etlutil/__init__.py:32-51``) one-to-one — record
operators become DataFrame operators, the date layer keeps its names — and
adds the scale-out extensions (dedup, similarity, sessionization, skew,
profiling, streaming).

Layout:
    session     SparkSession factory tuned for the local[32] harness
    sources     testdata loaders + generic readers/sinks
    functions   column-level helpers (dates, hashing, text, vectors)
    operators   the reference's 8 operators lifted to DataFrames, plus
                scale-out extensions (dedup, similarity, text analysis)
    streaming   Structured Streaming variants of the date-bucket workload
    plans       plan-inspection utilities (pushdown/codegen assertions)
"""

from etlutil_spark.functions.daterange import (
    DateLike,
    DateRange,
    DateRanges,
    format_year_month,
    generate_date_array,
    get_relative_date_frame,
)
from etlutil_spark.functions.daterange import to_date_iso_str
from etlutil_spark.functions.daterange import to_date_py as to_date
from etlutil_spark.operators.casts import ConvertType, convert_types
from etlutil_spark.operators.clean import CleanMode, clean_columns
from etlutil_spark.operators.flatten import flatten_struct
from etlutil_spark.operators.jsonify import to_json_string
from etlutil_spark.operators.normalize_dates import normalize_date_fields
from etlutil_spark.operators.project import select_with_extras
from etlutil_spark.operators.prune import prune_columns
from etlutil_spark.operators.walk import sample_tree, schema_tree, walk_sample
from etlutil_spark.session import get_spark

__all__ = [
    # session
    "get_spark",
    # reference record operators (SURVEY §2.1), DataFrame-lifted
    "prune_columns",
    "schema_tree",
    "sample_tree",
    "walk_sample",  # the reference `walk` contract (print + collected copy)
    "select_with_extras",
    "convert_types",
    "ConvertType",
    "clean_columns",
    "CleanMode",
    "flatten_struct",
    "normalize_date_fields",
    "to_json_string",
    # reference date layer (SURVEY §2.2)
    "DateLike",
    "to_date",
    "to_date_iso_str",
    "format_year_month",
    "generate_date_array",
    "get_relative_date_frame",
    "DateRange",
    "DateRanges",
]
__version__ = "0.2.0"
