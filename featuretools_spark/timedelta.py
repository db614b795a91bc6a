"""Timedelta — absolute / relative / observation-count windows.

Semantics follow the reference (featuretools/entityset/timedelta.py:5-211):
units ms s m h d w are absolute; mo Y are calendar-relative;
'o' counts observations (rows), usable only for `use_previous`.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_ABS_SECONDS = {
    "ms": 0.001,
    "s": 1.0,
    "m": 60.0,
    "h": 3600.0,
    "d": 86400.0,
    "w": 7 * 86400.0,
}
_RELATIVE = {"mo", "Y"}
_OBSERVATION = "o"

_PARSE_RE = re.compile(r"^\s*(-?\d+(?:\.\d+)?)\s*([a-zA-Z]+)\s*$")

_ALIASES = {
    "millisecond": "ms", "milliseconds": "ms",
    "second": "s", "seconds": "s", "sec": "s",
    "minute": "m", "minutes": "m", "min": "m",
    "hour": "h", "hours": "h",
    "day": "d", "days": "d",
    "week": "w", "weeks": "w",
    "month": "mo", "months": "mo",
    "year": "Y", "years": "Y",
    "observation": "o", "observations": "o",
}


class Timedelta:
    """A window length: Timedelta(30, "d"), Timedelta(5, "o"), or
    parsed from a string like "30 days" / "5 observations"."""

    def __init__(self, value: float, unit: str = "d"):
        unit = _ALIASES.get(unit, _ALIASES.get(unit.lower(), unit))
        if unit not in _ABS_SECONDS and unit not in _RELATIVE and unit != _OBSERVATION:
            raise ValueError(f"unknown Timedelta unit: {unit!r}")
        self.value = value
        self.unit = unit

    @classmethod
    def parse(cls, spec) -> "Timedelta":
        if isinstance(spec, Timedelta):
            return spec
        if isinstance(spec, (int, float)):
            return cls(float(spec), "s")
        m = _PARSE_RE.match(str(spec))
        if not m:
            raise ValueError(f"cannot parse Timedelta: {spec!r}")
        return cls(float(m.group(1)), m.group(2))

    @property
    def is_observation(self) -> bool:
        return self.unit == _OBSERVATION

    @property
    def is_relative(self) -> bool:
        return self.unit in _RELATIVE

    @property
    def is_absolute(self) -> bool:
        return self.unit in _ABS_SECONDS

    def to_seconds(self) -> float:
        if not self.is_absolute:
            raise ValueError(f"Timedelta({self.value}{self.unit}) is not absolute")
        return self.value * _ABS_SECONDS[self.unit]

    def subtract_from(self, ts_col: Column) -> Column:
        """ts_col - self, as a Column expression (calendar-aware for mo/Y)."""
        if self.is_absolute:
            # sub-second precision preserved via interval microseconds
            micros = int(round(self.to_seconds() * 1_000_000))
            return ts_col - F.expr(f"INTERVAL {micros} MICROSECOND")
        if self.unit == "mo":
            return ts_col - F.make_interval(months=F.lit(int(self.value)))
        if self.unit == "Y":
            return ts_col - F.make_interval(years=F.lit(int(self.value)))
        raise ValueError("observation windows have no timestamp arithmetic")

    def get_name(self) -> str:
        # reference-compatible window naming, e.g. "30 Days"
        names = {
            "ms": "Milliseconds", "s": "Seconds", "m": "Minutes",
            "h": "Hours", "d": "Days", "w": "Weeks",
            "mo": "Months", "Y": "Years", "o": "Observations",
        }
        v = int(self.value) if float(self.value).is_integer() else self.value
        return f"{v} {names[self.unit]}"

    def __repr__(self):
        return f"Timedelta({self.value}, {self.unit!r})"

    def __eq__(self, other):
        return (
            isinstance(other, Timedelta)
            and self.value == other.value
            and self.unit == other.unit
        )

    def __hash__(self):
        return hash((self.value, self.unit))
