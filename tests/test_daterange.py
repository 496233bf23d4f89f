"""Reference-parity unit tests for the driver-side date layer.

Expected values mirror the reference's documented behavior
(/root/reference/etlutil/date.py doctests and tests/test_date.py cases),
re-derived independently."""

from __future__ import annotations

from datetime import date

import pytest

from etlutil_spark.functions.daterange import (
    DateRange,
    DateRanges,
    add_months,
    format_year_month,
    generate_date_array,
    get_relative_date_frame,
    to_date_py,
    to_date_iso_str,
)


class TestScalars:
    def test_to_date_py_forms(self):
        from datetime import datetime

        assert to_date_py("2024-01-15") == date(2024, 1, 15)
        assert to_date_py(date(2024, 1, 15)) == date(2024, 1, 15)
        assert to_date_py(datetime(2024, 1, 15, 10, 30)) == date(2024, 1, 15)

    def test_iso_and_year_month(self):
        assert to_date_iso_str("2024-01-15") == "2024-01-15"
        assert format_year_month("2024-01-15") == "2024-01"

    def test_add_months_clamps(self):
        assert add_months(date(2024, 1, 31), 1) == date(2024, 2, 29)
        assert add_months(date(2023, 1, 31), 1) == date(2023, 2, 28)
        assert add_months(date(2024, 1, 31), -2) == date(2023, 11, 30)


class TestGenerateDateArray:
    def test_daily(self):
        out = generate_date_array("2024-01-01", "2024-01-04")
        assert out == [date(2024, 1, d) for d in (1, 2, 3, 4)]

    def test_zero_interval_empty(self):
        assert generate_date_array("2024-01-01", "2024-01-04", 0) == []

    def test_wrong_direction_empty(self):
        assert generate_date_array("2024-01-04", "2024-01-01", 1) == []
        assert generate_date_array("2024-01-01", "2024-01-04", -1) == []

    def test_single_day(self):
        assert generate_date_array("2024-01-01", "2024-01-01") == [date(2024, 1, 1)]

    def test_backward_months_no_clamp_compound(self):
        out = generate_date_array("2024-01-31", "2023-07-01", -2, "MONTH")
        # start + k*interval semantics: Jul gets day 31, not compounded 30
        assert out == [
            date(2024, 1, 31),
            date(2023, 11, 30),
            date(2023, 9, 30),
            date(2023, 7, 31),
        ]

    def test_quarter_and_year(self):
        assert generate_date_array("2024-01-01", "2024-12-31", 1, "QUARTER") == [
            date(2024, 1, 1),
            date(2024, 4, 1),
            date(2024, 7, 1),
            date(2024, 10, 1),
        ]
        assert generate_date_array("2020-02-29", "2024-03-01", 1, "YEAR") == [
            date(2020, 2, 29),
            date(2021, 2, 28),
            date(2022, 2, 28),
            date(2023, 2, 28),
            date(2024, 2, 29),
        ]


class TestRelativeFrame:
    def test_month(self):
        assert get_relative_date_frame("MONTH", 0, date_from="2024-06-15") == (
            "2024-06-01",
            "2024-06-30",
        )
        assert get_relative_date_frame("MONTH", -1, date_from="2024-01-15") == (
            "2023-12-01",
            "2023-12-31",
        )

    def test_week_monday_start(self):
        # 2024-01-15 is a Monday
        assert get_relative_date_frame("WEEK", 0, date_from="2024-01-17") == (
            "2024-01-15",
            "2024-01-21",
        )
        assert get_relative_date_frame("WEEK", -1, date_from="2024-01-17") == (
            "2024-01-08",
            "2024-01-14",
        )

    def test_quarter(self):
        assert get_relative_date_frame("QUARTER", -1, date_from="2024-06-15") == (
            "2024-01-01",
            "2024-03-31",
        )
        assert get_relative_date_frame("QUARTER", 1, date_from="2024-01-15") == (
            "2024-04-01",
            "2024-06-30",
        )

    def test_year_and_day(self):
        assert get_relative_date_frame("YEAR", -2, date_from="2024-03-01") == (
            "2022-01-01",
            "2022-12-31",
        )
        assert get_relative_date_frame("DAY", 3, date_from="2024-02-27") == (
            "2024-03-01",
            "2024-03-01",
        )

    def test_bad_part(self):
        with pytest.raises(ValueError):
            get_relative_date_frame("FORTNIGHT", 0, date_from="2024-01-01")


class TestDateRange:
    def test_init_forms(self):
        assert DateRange("2024-01-01").as_tuple() == ("2024-01-01", "2024-01-01")
        dr = DateRange("2024-01-01", "2024-01-31")
        assert dr.as_dict() == {
            "date_start": "2024-01-01",
            "date_end": "2024-01-31",
        }
        assert DateRange().date_start == date.today().isoformat()

    def test_split(self):
        chunks = DateRange("2024-01-01", "2024-01-10").split(3)
        assert [c.as_tuple() for c in chunks] == [
            ("2024-01-01", "2024-01-03"),
            ("2024-01-04", "2024-01-06"),
            ("2024-01-07", "2024-01-09"),
            ("2024-01-10", "2024-01-10"),
        ]
        assert len(DateRange("2024-01-01", "2024-12-31").split(7)) == 53
        with pytest.raises(ValueError):
            DateRange("2024-01-01").split(0)

    def test_timestamps_half_open(self):
        dr = DateRange("2024-01-01", "2024-01-02")
        assert dr.to_timestamps() == {
            "starts_at": "2024-01-01T00:00:00Z",
            "ends_at": "2024-01-03T00:00:00Z",
        }
        assert dr.to_timestamps_but_same_dates()["ends_at"] == "2024-01-02T00:00:00Z"

    def test_timestamps_with_tz(self):
        dr = DateRange("2024-01-01", "2024-01-02")
        out = dr.to_timestamps(time="12:30:00", tz="Europe/Moscow")
        assert out == {
            "starts_at": "2024-01-01T09:30:00Z",
            "ends_at": "2024-01-03T09:30:00Z",
        }

    def test_contains_overlaps_days(self):
        dr = DateRange("2024-01-01", "2024-01-31")
        assert dr.contains("2024-01-31") and not dr.contains("2024-02-01")
        assert dr.overlaps(DateRange("2024-01-31", "2024-02-05"))
        assert not dr.overlaps(DateRange("2024-02-01", "2024-02-05"))
        assert dr.days_count() == 31

    def test_extend_shift_bounds(self):
        dr = DateRange("2024-01-10", "2024-01-20")
        assert dr.extend_by_days(2, 3).as_tuple() == ("2024-01-08", "2024-01-23")
        assert dr.shift_by_days(-5).as_tuple() == ("2024-01-05", "2024-01-15")
        # 2024-01-10 is Wednesday; week bounds Mon 8th - Sun 21st
        assert dr.extend_to_week_bounds().as_tuple() == ("2024-01-08", "2024-01-21")
        assert dr.extend_to_month_bounds().as_tuple() == ("2024-01-01", "2024-01-31")

    def test_around_date(self):
        out = DateRange.around_date(
            date_anchor="2024-06-15", days_lookback=2, days_lookforward=1
        )
        assert out.as_tuple() == ("2024-06-13", "2024-06-16")
        with pytest.raises(ValueError):
            DateRange.around_date(date_anchor="2024-06-15", days_lookback=-1)

    def test_split_month_8_8_8_rest(self):
        chunks = DateRange.split_month_8_8_8_rest("2024-02-15")
        assert [c.as_tuple() for c in chunks] == [
            ("2024-02-01", "2024-02-08"),
            ("2024-02-09", "2024-02-16"),
            ("2024-02-17", "2024-02-24"),
            ("2024-02-25", "2024-02-29"),
        ]
        assert DateRange.split_month_8_8_8_rest("2026-02-15")[-1].date_end == "2026-02-28"
        assert DateRange.split_month_8_8_8_rest("2024-01-15")[-1].date_end == "2024-01-31"

    def test_api_formats(self):
        dr = DateRange("2024-01-01", "2024-01-07")
        assert dr.to_fb_time_range() == {"since": "2024-01-01", "until": "2024-01-07"}
        bing = dr.to_bing_CustomDateRange()
        assert bing["CustomDateRangeStart"] == {"Day": 1, "Month": 1, "Year": 2024}
        assert bing["CustomDateRangeEnd"] == {"Day": 7, "Month": 1, "Year": 2024}
        assert dr.to_reddit_range()["ends_at"] == "2024-01-08T00:00:00Z"

    def test_str_format(self):
        assert str(DateRange("2024-01-01", "2024-01-07")) == "[2024-01-01 → 2024-01-07]"

    def test_format_placeholders_match_reference(self):
        # reference date.py:314-315: placeholders are {start}/{end} and the
        # default template is "{start} -> {end}" (NOT the __str__ arrow form)
        dr = DateRange("2024-01-01", "2024-01-07")
        assert dr.format() == "2024-01-01 -> 2024-01-07"
        assert dr.format("{start}..{end}") == "2024-01-01..2024-01-07"

    def test_custom_keys_defaults_match_reference(self):
        # reference date.py:317: defaults are starts_at/ends_at
        dr = DateRange("2024-01-01", "2024-01-31")
        assert dr.to_dict_with_custom_keys() == {
            "starts_at": "2024-01-01",
            "ends_at": "2024-01-31",
        }
        assert dr.to_dict_with_custom_keys("from_date", "to_date") == {
            "from_date": "2024-01-01",
            "to_date": "2024-01-31",
        }

    def test_reddit_range_tz_param_matches_reference(self):
        # reference date.py:377/541: to_reddit_range takes tz (default "UTC")
        dr = DateRange("2024-01-01", "2024-01-02")
        assert dr.to_reddit_range(tz=None) == dr.to_reddit_range()
        # UTC+4 (no DST): local midnight = 20:00 previous day UTC
        tbilisi = dr.to_reddit_range(tz="Asia/Tbilisi")
        assert tbilisi["starts_at"] == "2023-12-31T20:00:00Z"
        assert tbilisi["ends_at"] == "2024-01-02T20:00:00Z"
        same = dr.to_reddit_range_but_same_dates(tz="Asia/Tbilisi")
        assert same["ends_at"] == "2024-01-01T20:00:00Z"


class TestDateRanges:
    def test_calendar_periods_trim(self):
        out = DateRanges().calendar_periods("WEEK", 3, date_end="2024-01-17")
        assert [r.as_tuple() for r in out] == [
            ("2024-01-15", "2024-01-17"),  # trimmed current week
            ("2024-01-08", "2024-01-14"),
            ("2024-01-01", "2024-01-07"),
        ]
        full = DateRanges().calendar_periods(
            "WEEK", 1, date_end="2024-01-17", trim_last_period=False
        )
        assert full[0].as_tuple() == ("2024-01-15", "2024-01-21")

    def test_offset_range_buckets(self):
        out = DateRanges().offset_range_buckets(
            "MONTH", offset_start=-1, offset_end=-3, date_end="2024-06-15"
        )
        assert [r.as_tuple() for r in out] == [
            ("2024-05-01", "2024-05-31"),
            ("2024-04-01", "2024-04-30"),
            ("2024-03-01", "2024-03-31"),
        ]

    def test_split_lookback(self):
        out = DateRanges().split_lookback_period(30, 7, date_end="2024-12-31")
        assert len(out) == 5
        assert out[0].as_tuple() == ("2024-12-25", "2024-12-31")
        assert out[-1].as_tuple() == ("2024-12-02", "2024-12-03")
        assert sum(r.days_count() for r in out) == 30


class TestReferenceEdgeParity:
    """Literal expectations lifted from the reference's own test suite
    (/root/reference/tests/test_date.py) — the month-end clamping, leap
    years, negative steps, quarter/week boundary cases a BQ-migration
    user would hit first. Values are data (expected outputs), asserted
    against this implementation."""

    def test_generate_date_array_reference_cases(self):
        from datetime import date

        cases = [
            # leap-year crossing (test_date.py:304-307)
            (("2024-02-28", "2024-03-01"),
             [date(2024, 2, 28), date(2024, 2, 29), date(2024, 3, 1)]),
            # month-end clamping: Jan 31 + 1 MONTH = Feb 29 (leap), then Mar 31
            # — start + k*step, NOT compounding clamps (test_date.py:309-312)
            (("2024-01-31", "2024-03-31", 1, "MONTH"),
             [date(2024, 1, 31), date(2024, 2, 29), date(2024, 3, 31)]),
            # 30-day stride across a leap year (test_date.py:316-344)
            (("2024-01-01", "2024-12-31", 30, "DAY"),
             [date(2024, 1, 1), date(2024, 1, 31), date(2024, 3, 1),
              date(2024, 3, 31), date(2024, 4, 30), date(2024, 5, 30),
              date(2024, 6, 29), date(2024, 7, 29), date(2024, 8, 28),
              date(2024, 9, 27), date(2024, 10, 27), date(2024, 11, 26),
              date(2024, 12, 26)]),
            # negative steps walk backward (test_date.py:380-414)
            (("2024-01-10", "2024-01-01", -2, "DAY"),
             [date(2024, 1, 10), date(2024, 1, 8), date(2024, 1, 6),
              date(2024, 1, 4), date(2024, 1, 2)]),
            (("2024-12-01", "2024-01-01", -2, "MONTH"),
             [date(2024, 12, 1), date(2024, 10, 1), date(2024, 8, 1),
              date(2024, 6, 1), date(2024, 4, 1), date(2024, 2, 1)]),
            # degenerate spans (test_date.py:427-431)
            (("2024-01-01", "2024-01-01", -1, "DAY"), [date(2024, 1, 1)]),
            (("2024-01-01", "2024-01-05", -1, "DAY"), []),
            (("2024-01-01", "2024-03-01", 0, "DAY"), []),
        ]
        for args, expected in cases:
            assert generate_date_array(*args) == expected, args

    def test_generate_date_array_invalid_raises(self):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            generate_date_array("invalid-date", "2024-01-01")

    def test_relative_frame_reference_cases(self):
        from datetime import date

        anchor = date(2024, 6, 15)  # reference mocks today=2024-06-15 (Saturday)
        # year-boundary months (test_date.py:685-700)
        for part, n, expected in [
            ("MONTH", 6, ("2024-12-01", "2024-12-31")),
            ("MONTH", 7, ("2025-01-01", "2025-01-31")),
            ("MONTH", -6, ("2023-12-01", "2023-12-31")),
            ("MONTH", -7, ("2023-11-01", "2023-11-30")),
        ]:
            assert tuple(get_relative_date_frame(part, n, date_from=anchor)) == expected
        # quarter boundaries incl. year wrap (test_date.py:668-683)
        for n, expected in [
            (-1, ("2024-01-01", "2024-03-31")), (0, ("2024-04-01", "2024-06-30")),
            (1, ("2024-07-01", "2024-09-30")), (2, ("2024-10-01", "2024-12-31")),
            (4, ("2025-04-01", "2025-06-30")), (-4, ("2023-04-01", "2023-06-30")),
        ]:
            assert tuple(get_relative_date_frame("QUARTER", n, date_from=anchor)) == expected
        # ISO weeks: Monday start, same frame from every weekday (test_date.py:725-756)
        for d in range(10, 17):
            got = tuple(get_relative_date_frame("WEEK", 0, date_from=date(2024, 6, d)))
            assert got == ("2024-06-10", "2024-06-16"), d
        # defaults: MONTH, n=0 (test_date.py:758-763)
        assert tuple(get_relative_date_frame(date_from=anchor)) == ("2024-06-01", "2024-06-30")
