"""Error types for timeperiods_spark.

Mirrors the error conditions of the reference engine
(/root/reference/timeperiod_functions.R:126-220) without copying its
implementation: every reference `stop(...)` becomes a typed Python
exception so tests can assert on the exact failure mode.
"""

from __future__ import annotations


class TimeperiodsError(ValueError):
    """Base class for all timeperiods_spark errors."""


class RoleValidationError(TimeperiodsError):
    """Column-role misuse: missing columns, overlapping roles, reserved
    output names used as inputs (reference: timeperiod_functions.R:126-187)."""


class IntervalValidationError(TimeperiodsError):
    """Bad interval data: NULL endpoints, end < start, type mismatch
    (reference: timeperiod_functions.R:154-174, 191-195)."""


class DuplicateIntervalError(TimeperiodsError):
    """Exact duplicate (group, start, end) rows in the measurement table
    (reference: timeperiod_functions.R:198-202)."""


class OverlapError(TimeperiodsError):
    """Partially overlapping intervals within a group in the measurement
    table (reference: timeperiod_functions.R:213-220)."""
