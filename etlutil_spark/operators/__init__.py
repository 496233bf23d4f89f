from etlutil_spark.operators.casts import ConvertType, convert_types
from etlutil_spark.operators.clean import CleanMode, clean_columns
from etlutil_spark.operators.flatten import flatten_struct
from etlutil_spark.operators.jsonify import to_json_string
from etlutil_spark.operators.normalize_dates import normalize_date_fields
from etlutil_spark.operators.project import select_with_extras
from etlutil_spark.operators.prune import prune_columns
from etlutil_spark.operators.walk import sample_tree, schema_tree

__all__ = [
    "CleanMode",
    "ConvertType",
    "clean_columns",
    "convert_types",
    "flatten_struct",
    "normalize_date_fields",
    "prune_columns",
    "sample_tree",
    "schema_tree",
    "select_with_extras",
    "to_json_string",
]
