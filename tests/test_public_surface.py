"""Top-level export surface: one analog per reference public symbol.

The reference exports 16 symbols (``/root/reference/etlutil/__init__.py:
32-51``); SURVEY §2 maps each to its DataFrame-level analog. This pins
the mapping so a refactor cannot silently drop a public entry point a
migrating user would import.
"""

import etlutil_spark as e

# reference symbol -> etlutil_spark top-level analog(s)
REFERENCE_SURFACE = {
    # date layer (same names)
    "DateLike": ["DateLike"],
    "to_date": ["to_date"],
    "to_date_iso_str": ["to_date_iso_str"],
    "DateRange": ["DateRange"],
    "DateRanges": ["DateRanges"],
    "generate_date_array": ["generate_date_array"],
    "format_year_month": ["format_year_month"],
    "get_relative_date_frame": ["get_relative_date_frame"],
    # container operators, DataFrame-lifted (SURVEY §2.1 names)
    "clean_dict": ["clean_columns", "CleanMode"],
    "convert_dict_types": ["convert_types", "ConvertType"],
    "convert_to_json_string": ["to_json_string"],
    "flatten_dict": ["flatten_struct"],
    "move_unknown_keys_to_extra": ["select_with_extras"],
    "normalize_date_fields": ["normalize_date_fields"],
    "prune_data": ["prune_columns"],
    "walk": ["walk_sample", "schema_tree", "sample_tree"],
}


class TestPublicSurface:
    def test_every_reference_symbol_has_an_exported_analog(self):
        missing = {
            ref: analogs
            for ref, analogs in REFERENCE_SURFACE.items()
            if not all(a in e.__all__ and hasattr(e, a) for a in analogs)
        }
        assert not missing, f"reference symbols without exported analogs: {missing}"

    def test_all_exports_resolve(self):
        broken = [n for n in e.__all__ if not hasattr(e, n)]
        assert not broken, f"__all__ names that do not resolve: {broken}"
