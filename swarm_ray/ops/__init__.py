"""Training-data operators (dedup / similarity / text / multimodal /
relational) over the driver's TPC-H-ish tables. Each op registers a
``queries()`` entry and, where SQL-expressible, an ``oracle_sql()``
entry."""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def queries() -> dict[str, Callable[[str], Any]]:
    out: dict[str, Callable[[str], Any]] = {}
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    return out
