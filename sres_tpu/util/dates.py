"""Date helpers (reference: sres/base/util/dates.py + util/config.py:146-157)."""
from __future__ import annotations

from datetime import date, datetime, timedelta
from typing import List, Optional, Tuple, Union

TimeType = Union[datetime, int]


def drepr(d: TimeType) -> str:
    return d.strftime("%m/%d:%H/%Y") if isinstance(d, datetime) else str(d)


def dstr(d: datetime) -> str:
    """YYYYMMDD (reference: dates.py:21-22); also {year}/{month}/{day} kwargs
    via skw for filename templates (reference: dates.py:9-10)."""
    return f"{d.year}{d.month:02d}{d.day:02d}"


def skw(d: datetime) -> dict:
    return dict(year=str(d.year), month=f"{d.month:02d}", day=f"{d.day:02d}")


def year_date_range(y0: int, y1: int, dt_days: int = 1,
                    randomize: bool = False, seed: Optional[int] = None) -> List[datetime]:
    """Daily datetimes over [y0, y1) (reference: dates.py:46-50 year_range —
    named differently here because this module's year_range already returns
    year ints). Randomization is seeded, never wall-clock global random."""
    import numpy as _np
    d0, dates = datetime(y0, 1, 1), []
    while d0 < datetime(y1, 1, 1):
        dates.append(d0)
        d0 = d0 + timedelta(days=dt_days)
    if randomize:
        _np.random.default_rng(0 if seed is None else seed).shuffle(dates)
    return dates


def date_list(start: Optional[datetime], num_days: int) -> List[datetime]:
    if start is None or num_days <= 0:
        return []
    return [start + timedelta(days=i) for i in range(num_days)]


def date_bounds(start: datetime, ndays: int) -> Tuple[datetime, datetime]:
    return start, start + timedelta(days=ndays)


def year_range(y0: int, y1: int) -> List[int]:
    return list(range(y0, y1))


def start_date(task) -> Optional[datetime]:
    sd = task.get("start_date", None)
    if sd is None:
        return None
    toks = [int(tok) for tok in sd.split("/")]
    return datetime(month=toks[0], day=toks[1], year=toks[2])


def dateindex(d: datetime, task) -> int:
    sd = start_date(task)
    dt: timedelta = d - sd
    hours: int = (dt.seconds // 3600) + (dt.days * 24)
    return hours + 1
