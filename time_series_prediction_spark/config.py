"""Configuration loading and driver-side date algebra.

Mirrors the reference's config surface:

* JSON config files -> plain dicts (reference ``src/demo/utils.py:63-86``,
  ``Get_Data_From_JSON``).
* ``dates_definitions`` — the driver-side date arithmetic that derives
  the windowing boundaries from the configured [start, end] interval
  (reference ``src/demo/utils.py:89-125``).

Defaults follow the reference's shipped config
(``dbfs/mnt/demo/data.json:29-32``): series 2018-12-01 → 2020-03-31
(487 days), history X = 365 days, horizon y = 92 days.
"""

from __future__ import annotations

import datetime as dt
import json
from dataclasses import dataclass, field

DEFAULT_START = "2018-12-01"
DEFAULT_END = "2020-03-31"
DEFAULT_X_DAYS = 365
DEFAULT_Y_DAYS = 92


def load_json_config(path: str) -> dict:
    """Read a JSON config file into a dict (reference Get_Data_From_JSON)."""
    with open(path) as f:
        return json.load(f)


@dataclass(frozen=True)
class DateSpec:
    """Derived date boundaries for windowing/extrapolation.

    Mirrors reference ``dates_definitions`` (``src/demo/utils.py:89-125``):
      * ``n_days``: total series length (end - start + 1)
      * ``prediction_start`` / ``prediction_end``: the 92-day horizon
        immediately after ``end``
      * ``minus_6_months``: end - 6 months (trajectory lookback)
      * ``x_window_start``: end - (X + y - 1) days (start of the X slice)
    """

    start: dt.date
    end: dt.date
    x_days: int = DEFAULT_X_DAYS
    y_days: int = DEFAULT_Y_DAYS
    n_days: int = field(init=False)
    prediction_start: dt.date = field(init=False)
    prediction_end: dt.date = field(init=False)
    minus_6_months: dt.date = field(init=False)
    x_window_start: dt.date = field(init=False)

    def __post_init__(self) -> None:
        object.__setattr__(self, "n_days", (self.end - self.start).days + 1)
        object.__setattr__(
            self, "prediction_start", self.end + dt.timedelta(days=1)
        )
        object.__setattr__(
            self, "prediction_end", self.end + dt.timedelta(days=self.y_days)
        )
        # end minus 6 calendar months (reference uses relativedelta months=6)
        m = self.end.month - 6
        y = self.end.year
        while m <= 0:
            m += 12
            y -= 1
        day = min(self.end.day, _days_in_month(y, m))
        object.__setattr__(self, "minus_6_months", dt.date(y, m, day))
        object.__setattr__(
            self,
            "x_window_start",
            self.end - dt.timedelta(days=self.x_days + self.y_days - 1),
        )


def _days_in_month(year: int, month: int) -> int:
    if month == 12:
        nxt = dt.date(year + 1, 1, 1)
    else:
        nxt = dt.date(year, month + 1, 1)
    return (nxt - dt.date(year, month, 1)).days


def dates_definitions(
    start: str = DEFAULT_START,
    end: str = DEFAULT_END,
    x_days: int = DEFAULT_X_DAYS,
    y_days: int = DEFAULT_Y_DAYS,
) -> DateSpec:
    """Parse ISO date strings and derive all windowing boundaries."""
    return DateSpec(
        start=dt.date.fromisoformat(start),
        end=dt.date.fromisoformat(end),
        x_days=x_days,
        y_days=y_days,
    )
