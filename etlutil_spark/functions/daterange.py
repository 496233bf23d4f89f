"""Driver-side date value objects and scalar helpers.

The reference keeps a rich date layer (``/root/reference/etlutil/date.py``)
whose objects parameterize queries — they are not data. The Spark lift keeps
them driver-side: a ``DateRange`` produces Column predicates and literal
bounds that Catalyst constant-folds and pushes into parquet scans / partition
pruning, which is exactly what you want at 100 TB (each backfill chunk becomes
a pruned scan, not a full pass).

Parity notes (behavior matched against the reference, fresh implementation):
  - Ranges are CLOSED/inclusive ``[start, end]``; canonical storage is the
    ISO string (reference ``date.py:270-271``).
  - Weeks are Monday-Sunday (reference ``date.py:213-215``).
  - Month arithmetic clamps to end-of-month (pendulum/BigQuery semantics).
  - ``to_timestamps`` converts inclusive dates to a half-open timestamp
    window by extending the end one day (reference ``date.py:429``).
"""

from __future__ import annotations

import calendar
from dataclasses import dataclass
from datetime import UTC, date, datetime, timedelta
from typing import Literal
from zoneinfo import ZoneInfo

DateLike = str | date | datetime
DatePart = Literal["DAY", "WEEK", "MONTH", "QUARTER", "YEAR"]

_PART_TO_MONTHS = {"MONTH": 1, "QUARTER": 3, "YEAR": 12}


# --------------------------------------------------------------------------
# scalar helpers (reference date.py:30-67)
# --------------------------------------------------------------------------


def to_date_py(value: DateLike) -> date:
    """Normalize str | date | datetime -> datetime.date (ISO parse for str)."""
    if isinstance(value, datetime):
        return value.date()
    if isinstance(value, date):
        return value
    return datetime.fromisoformat(value).date()


def to_date_iso_str(value: DateLike) -> str:
    """Normalize DateLike -> 'YYYY-MM-DD'."""
    return to_date_py(value).isoformat()


def format_year_month(value: DateLike) -> str:
    """Normalize DateLike -> 'YYYY-MM'."""
    return to_date_py(value).strftime("%Y-%m")


def add_months(d: date, n: int) -> date:
    """Calendar month addition with end-of-month clamping (Jan 31 +1m = Feb 29/28)."""
    month_index = d.year * 12 + (d.month - 1) + n
    year, month = divmod(month_index, 12)
    month += 1
    day = min(d.day, calendar.monthrange(year, month)[1])
    return date(year, month, day)


def _week_start(d: date) -> date:
    return d - timedelta(days=d.weekday())


def _quarter_start(d: date) -> date:
    return date(d.year, ((d.month - 1) // 3) * 3 + 1, 1)


def _month_end(d: date) -> date:
    return date(d.year, d.month, calendar.monthrange(d.year, d.month)[1])


# --------------------------------------------------------------------------
# generate_date_array — BigQuery GENERATE_DATE_ARRAY clone
# (reference date.py:70-155; column version in dates.date_spine)
# --------------------------------------------------------------------------


def generate_date_array(
    date_start: DateLike,
    date_end: DateLike,
    interval: int = 1,
    date_part: DatePart = "DAY",
) -> list[date]:
    """Inclusive list of dates from start to end stepping interval x part.

    interval 0 or a wrong-direction range yields []. Negative interval steps
    backward from start down to end. Month-family steps are end-of-month
    aware via :func:`add_months`.
    """
    if date_part not in ("DAY", "WEEK", "MONTH", "QUARTER", "YEAR"):
        raise ValueError("date_part must be DAY, WEEK, MONTH, QUARTER, or YEAR")
    if interval == 0:
        return []
    start, end = to_date_py(date_start), to_date_py(date_end)
    forward = interval > 0
    if (forward and start > end) or (not forward and start < end):
        return []

    out: list[date] = []
    step = 0
    current = start
    while (current <= end) if forward else (current >= end):
        out.append(current)
        step += 1
        k = interval * step
        if date_part == "DAY":
            current = start + timedelta(days=k)
        elif date_part == "WEEK":
            current = start + timedelta(weeks=k)
        else:
            current = add_months(start, _PART_TO_MONTHS[date_part] * k)
    return out


# --------------------------------------------------------------------------
# get_relative_date_frame (reference date.py:158-235)
# --------------------------------------------------------------------------


def get_relative_date_frame(
    date_part: DatePart = "MONTH", n: int = 0, *, date_from: DateLike | None = None
) -> tuple[str, str]:
    """(start, end) ISO strings of the calendar period n offsets from base.

    DAY/WEEK/MONTH/QUARTER/YEAR; weeks Monday-Sunday; base defaults to today.
    """
    base = to_date_py(date_from) if date_from is not None else date.today()

    if date_part == "DAY":
        target = base + timedelta(days=n)
        start = end = target
    elif date_part == "WEEK":
        start = _week_start(base) + timedelta(weeks=n)
        end = start + timedelta(days=6)
    elif date_part == "MONTH":
        target = add_months(base, n)
        start = target.replace(day=1)
        end = _month_end(target)
    elif date_part == "QUARTER":
        target = add_months(base, 3 * n)
        start = _quarter_start(target)
        end = _month_end(add_months(start, 2))
    elif date_part == "YEAR":
        start = date(base.year + n, 1, 1)
        end = date(base.year + n, 12, 31)
    else:
        raise ValueError("date_part must be DAY, WEEK, MONTH, QUARTER, or YEAR")

    return start.isoformat(), end.isoformat()


# --------------------------------------------------------------------------
# DateRange (reference date.py:238-776)
# --------------------------------------------------------------------------


@dataclass(frozen=True, init=False)
class DateRange:
    """Inclusive calendar interval stored as two ISO strings.

    ``DateRange()`` = today..today, ``DateRange(d)`` = single day,
    ``DateRange(s, e)`` = closed range. Immutable; every operation returns
    a new instance.
    """

    date_start: str
    date_end: str

    def __init__(
        self, date_start: DateLike | None = None, date_end: DateLike | None = None
    ):
        if date_start is None and date_end is None:
            today = date.today().isoformat()
            start_str = end_str = today
        elif date_end is None:
            start_str = end_str = to_date_iso_str(date_start)  # type: ignore[arg-type]
        else:
            start_str = to_date_iso_str(date_start)  # type: ignore[arg-type]
            end_str = to_date_iso_str(date_end)
        object.__setattr__(self, "date_start", start_str)
        object.__setattr__(self, "date_end", end_str)

    # -- conversions ------------------------------------------------------

    def as_tuple(self) -> tuple[str, str]:
        return (self.date_start, self.date_end)

    def as_list(self) -> list[str]:
        return [self.date_start, self.date_end]

    def as_dict(self) -> dict[str, str]:
        return {"date_start": self.date_start, "date_end": self.date_end}

    def to_dict_with_custom_keys(
        self, key_start: str = "starts_at", key_end: str = "ends_at"
    ) -> dict[str, str]:
        return {key_start: self.date_start, key_end: self.date_end}

    def format(self, template: str = "{start} -> {end}") -> str:
        """Template placeholders are ``{start}`` / ``{end}`` and the default
        is ``"{start} -> {end}"`` — both matched to the reference
        (``date.py:314-315``), so a migrating caller's custom template keeps
        rendering instead of raising KeyError."""
        return template.format(start=self.date_start, end=self.date_end)

    def __str__(self) -> str:  # reference date.py:302-303 display form
        return f"[{self.date_start} → {self.date_end}]"

    # -- API-format adapters (driver-side connector concern) ---------------

    def to_fb_time_range(self) -> dict[str, str]:
        return {"since": self.date_start, "until": self.date_end}

    def to_reddit_range(self, tz: str | None = "UTC") -> dict[str, str]:
        # tz param matches reference date.py:377 (None and "UTC" coincide)
        starts, ends = self._utc_bounds(half_open=True, tz=tz)
        return {"starts_at": starts, "ends_at": ends}

    def to_reddit_range_but_same_dates(self, tz: str | None = "UTC") -> dict[str, str]:
        starts, ends = self._utc_bounds(half_open=False, tz=tz)
        return {"starts_at": starts, "ends_at": ends}

    def to_bing_CustomDateRange(self) -> dict[str, dict[str, int]]:
        s, e = to_date_py(self.date_start), to_date_py(self.date_end)
        return {
            "CustomDateRangeStart": {"Day": s.day, "Month": s.month, "Year": s.year},
            "CustomDateRangeEnd": {"Day": e.day, "Month": e.month, "Year": e.year},
        }

    def _utc_bounds(
        self, *, half_open: bool, time: str = "00:00:00", tz: str | None = None
    ) -> tuple[str, str]:
        hh, mm, ss = (int(p) for p in time.split(":"))
        start_d = to_date_py(self.date_start)
        end_d = to_date_py(self.date_end) + timedelta(days=1 if half_open else 0)
        zone = ZoneInfo(tz) if tz else UTC
        fmt = lambda d: (  # noqa: E731
            datetime(d.year, d.month, d.day, hh, mm, ss, tzinfo=zone)
            .astimezone(UTC)
            .isoformat()
            .replace("+00:00", "Z")
        )
        return fmt(start_d), fmt(end_d)

    def to_timestamps(
        self,
        time: str = "00:00:00",
        tz: str | None = None,
        key_start: str = "starts_at",
        key_end: str = "ends_at",
    ) -> dict[str, str]:
        """Inclusive dates -> half-open UTC timestamp window (end + 1 day).

        The canonical predicate form of this idiom on a timestamp column is
        ``ts >= start AND ts < date_add(end, 1)`` — see
        :meth:`ts_predicate_sql` and ``dates.in_range``.
        """
        starts, ends = self._utc_bounds(half_open=True, time=time, tz=tz)
        return {key_start: starts, key_end: ends}

    def to_timestamps_but_same_dates(
        self,
        time: str = "00:00:00",
        tz: str | None = None,
        key_start: str = "starts_at",
        key_end: str = "ends_at",
    ) -> dict[str, str]:
        starts, ends = self._utc_bounds(half_open=False, time=time, tz=tz)
        return {key_start: starts, key_end: ends}

    # -- interval algebra ---------------------------------------------------

    def contains(self, value: DateLike) -> bool:
        return self.date_start <= to_date_iso_str(value) <= self.date_end

    def overlaps(self, other: DateRange) -> bool:
        return not (
            self.date_end < other.date_start or self.date_start > other.date_end
        )

    def days_count(self) -> int:
        return (to_date_py(self.date_end) - to_date_py(self.date_start)).days + 1

    def extend_by_days(self, start_days: int, end_days: int) -> DateRange:
        return DateRange(
            to_date_py(self.date_start) - timedelta(days=start_days),
            to_date_py(self.date_end) + timedelta(days=end_days),
        )

    def shift_by_days(self, days: int) -> DateRange:
        return DateRange(
            to_date_py(self.date_start) + timedelta(days=days),
            to_date_py(self.date_end) + timedelta(days=days),
        )

    def extend_to_week_bounds(self) -> DateRange:
        start = _week_start(to_date_py(self.date_start))
        end_d = to_date_py(self.date_end)
        return DateRange(start, end_d + timedelta(days=6 - end_d.weekday()))

    def extend_to_month_bounds(self) -> DateRange:
        return DateRange(
            to_date_py(self.date_start).replace(day=1),
            _month_end(to_date_py(self.date_end)),
        )

    def split(self, chunk_days: int) -> list[DateRange]:
        """Split into chunk_days-sized inclusive sub-ranges; last = remainder."""
        if chunk_days < 1:
            raise ValueError("chunk_days must be >= 1")
        start, end = to_date_py(self.date_start), to_date_py(self.date_end)
        chunks: list[DateRange] = []
        cur = start
        while cur <= end:
            chunk_end = min(end, cur + timedelta(days=chunk_days - 1))
            chunks.append(DateRange(cur, chunk_end))
            cur = chunk_end + timedelta(days=1)
        return chunks

    @staticmethod
    def around_date(
        *,
        date_anchor: DateLike | None = None,
        days_lookback: int | None = None,
        days_lookforward: int | None = None,
    ) -> DateRange:
        anchor = to_date_py(date_anchor) if date_anchor is not None else date.today()
        lb = int(days_lookback or 0)
        lf = int(days_lookforward or 0)
        if lb < 0 or lf < 0:
            raise ValueError("days_lookback/days_lookforward must be >= 0")
        return DateRange(anchor - timedelta(days=lb), anchor + timedelta(days=lf))

    @staticmethod
    def split_month_8_8_8_rest(date_anchor: DateLike | None = None) -> list[DateRange]:
        """Month of anchor -> fixed chunks 1-8 / 9-16 / 17-24 / 25-end."""
        anchor = to_date_py(date_anchor) if date_anchor is not None else date.today()
        y, m = anchor.year, anchor.month
        last = calendar.monthrange(y, m)[1]
        bounds = [(1, 8), (9, 16), (17, 24), (25, last)]
        return [DateRange(date(y, m, a), date(y, m, b)) for a, b in bounds]

    @staticmethod
    def single_calendar_period(
        date_part: DatePart, offset: int = 0, date_anchor: DateLike | None = None
    ) -> DateRange:
        s, e = get_relative_date_frame(date_part, offset, date_from=date_anchor)
        return DateRange(s, e)

    # -- Spark glue ---------------------------------------------------------

    def ts_predicate_sql(self, ts_col: str) -> str:
        """SQL predicate for a timestamp column: half-open [start, end+1d)."""
        end_next = (to_date_py(self.date_end) + timedelta(days=1)).isoformat()
        return (
            f"{ts_col} >= TIMESTAMP '{self.date_start} 00:00:00' "
            f"AND {ts_col} < TIMESTAMP '{end_next} 00:00:00'"
        )


# --------------------------------------------------------------------------
# DateRanges — period-bucket generators (reference date.py:779-956)
# --------------------------------------------------------------------------


class DateRanges:
    """Generators of `list[DateRange]` used to drive chunked/backfill queries."""

    def calendar_periods(
        self,
        date_part: DatePart = "WEEK",
        count: int = 4,
        date_end: DateLike | None = None,
        trim_last_period: bool = True,
    ) -> list[DateRange]:
        """`count` calendar-aligned periods ending at date_end, newest first."""
        end_str = to_date_iso_str(date_end) if date_end is not None else date.today().isoformat()
        out: list[DateRange] = []
        for i in range(count):
            s, e = get_relative_date_frame(date_part, -i, date_from=date_end)
            if trim_last_period and e > end_str:
                e = end_str
            out.append(DateRange(s, e))
        return out

    def offset_range_buckets(
        self,
        date_part: DatePart = "WEEK",
        offset_start: int = 0,
        offset_end: int = -3,
        date_end: DateLike | None = None,
    ) -> list[DateRange]:
        """Periods for offsets offset_start..offset_end (descending), trimmed."""
        end_str = to_date_iso_str(date_end) if date_end is not None else date.today().isoformat()
        out: list[DateRange] = []
        for offset in range(offset_start, offset_end - 1, -1):
            s, e = get_relative_date_frame(date_part, offset, date_from=date_end)
            out.append(DateRange(s, min(e, end_str)))
        return out

    def split_lookback_period(
        self,
        total_days: int,
        chunk_days: int,
        date_end: DateLike | None = None,
    ) -> list[DateRange]:
        """total_days back from date_end in chunk_days chunks, newest first."""
        if chunk_days < 1:
            raise ValueError("chunk_days must be >= 1")
        end = to_date_py(date_end) if date_end is not None else date.today()
        total_start = end - timedelta(days=total_days - 1)
        out: list[DateRange] = []
        cur_end = end
        while cur_end >= total_start:
            cur_start = max(total_start, cur_end - timedelta(days=chunk_days - 1))
            out.append(DateRange(cur_start, cur_end))
            cur_end = cur_start - timedelta(days=1)
        return out
