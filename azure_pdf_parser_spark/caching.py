"""Tracked persist/unpersist for operator-internal cached tables.

Some operators persist an intermediate that feeds two downstream joins
(simhash fingerprints, the IVF assignment table). In a long-lived
session (bench loops, gate reruns) those cached blocks would otherwise
accumulate in executor storage memory forever — the operator can't
unpersist them itself because the returned DataFrame is lazy and still
references them.

Contract: operators route every internal ``.persist()`` through
:func:`tracked_persist`; callers call :func:`release_all` once the
returned DataFrame has been materialized (bench/gate runners do). At
production scale these intermediates would be checkpointed Iceberg
tables and the question disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    _TRACKED.append(df)
    return df


def release_all() -> None:
    """Unpersist every tracked intermediate (safe to call repeatedly)."""
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
        except Exception:
            pass
