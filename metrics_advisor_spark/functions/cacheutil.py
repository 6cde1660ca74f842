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

Derived-frame caveat (r07 ADVICE): the attachment is a Python
attribute on the *returned wrapper object*.  Any further
transformation (``.select``/``.filter``/``.repartition``/…) builds a
NEW DataFrame wrapper that does not carry it, so ``release_cached``
must be called on the frame the library function returned — calling
it on a derived frame would silently free nothing.  To make that
mistake loud instead of silent, ``release_cached`` warns when the
frame carries no attachment record at all (a frame that was already
released carries an empty record and stays silent — release is
idempotent by design).
"""

from __future__ import annotations

import warnings

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
    is safe but forces later actions to recompute the freed stages.
    Unpersists with ``blocking=True`` so the persisted blocks are gone
    when this returns (callers — and tests — can rely on the cache
    footprint having actually shrunk, not merely been scheduled for
    async cleanup).  Warns if ``df`` carries no attachment record:
    that means it is a frame *derived* from a library result (see
    module docstring) and nothing would be freed.
    """
    held = getattr(df, _ATTR, None)
    if held is None:
        warnings.warn(
            "release_cached: this DataFrame carries no cache attachment "
            "record — it is probably derived (select/filter/...) from "
            "the frame a library function returned; call release_cached "
            "on that original frame instead",
            stacklevel=2,
        )
        return df
    for f in held:
        f.unpersist(blocking=True)
    setattr(df, _ATTR, [])
    return df
