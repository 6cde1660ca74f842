"""Cache-lifetime bookkeeping for library pipelines.

Several training-style functions (`ivfpq_search`, `dsir_model`,
`dsir_weights`) persist a corpus-derived intermediate because the plan
they return consumes it more than once — without the cache the whole
upstream chain re-executes per consumer.  Spark's lazy execution means
the function cannot unpersist before the caller materializes the
result, so the persisted frames are attached to the returned DataFrame
instead; `release_cached` frees them (idempotent) once a terminal
action has run.  Contract/driver sessions are short-lived and may skip
the release; long-lived library sessions composing many pipelines
should call it to bound the cache footprint (r06 ADVICE: repeated
calls otherwise accumulate cached blocks until LRU eviction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_ma_cached_frames"


def attach_cached(df: DataFrame, *frames: DataFrame) -> DataFrame:
    """Record persisted intermediates on the returned plan so
    `release_cached` can free them after materialization."""
    held = list(getattr(df, _ATTR, ()))
    setattr(df, _ATTR, held + list(frames))
    return df


def release_cached(df: DataFrame) -> DataFrame:
    """Unpersist every intermediate attached by `attach_cached`.
    Call after a terminal action has consumed ``df``; calling earlier
    is safe but forces later actions to recompute the freed stages."""
    for f in getattr(df, _ATTR, ()):
        f.unpersist()
    setattr(df, _ATTR, [])
    return df
