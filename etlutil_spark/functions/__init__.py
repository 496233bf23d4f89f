from etlutil_spark.functions import dates, hashing, text, vectors
from etlutil_spark.functions.daterange import (
    DatePart,
    DateRange,
    DateRanges,
    format_year_month,
    generate_date_array,
    get_relative_date_frame,
    to_date_py,
    to_date_iso_str,
)

__all__ = [
    "DatePart",
    "DateRange",
    "DateRanges",
    "dates",
    "format_year_month",
    "generate_date_array",
    "get_relative_date_frame",
    "hashing",
    "text",
    "to_date_py",
    "to_date_iso_str",
    "vectors",
]
