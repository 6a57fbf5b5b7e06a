"""Report-side scalar formatters.

``human_size`` is the analogue of the reference's
``Helper.GetDataSizeString`` (``Common/Helper.cs:7-45``): bytes ->
binary-unit string, one decimal place, largest unit that keeps the
value >= 1. Report-time only — never in a hot path.
"""

from __future__ import annotations

_UNITS = ["B", "KiB", "MiB", "GiB", "TiB", "PiB"]


def human_size(n_bytes: int) -> str:
    if n_bytes < 0:
        raise ValueError("size must be non-negative")
    value = float(n_bytes)
    for unit in _UNITS:
        if value < 1024.0 or unit == _UNITS[-1]:
            if unit == "B":
                return f"{int(value)} B"
            return f"{value:.1f} {unit}"
        value /= 1024.0
    raise AssertionError("unreachable")


def human_duration(seconds: float) -> str:
    """hh:mm:ss.ff — the session-message time format
    (``Desktop/OrdinaryDumpDeduplicatorDesktop.Logic.cs:268-284``)."""
    h = int(seconds // 3600)
    m = int((seconds % 3600) // 60)
    s = seconds % 60
    return f"{h:02d}:{m:02d}:{s:05.2f}"
