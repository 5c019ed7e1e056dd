"""Caller-facing lifecycle for operator-internal persisted frames.

Several operators ``.persist()`` an internal frame that feeds more than
one side of their plan (LSH signatures feed both sides of the band
self-join; IVF residuals feed the codebook-sample job AND the scoring
scan). Their return value is a LAZY DataFrame built on top of that
cache, so the operator cannot unpersist it itself — unpersisting
before the caller's first action would forfeit the reuse the persist
exists for. The bench and oracle harnesses handle this with
``spark.catalog.clearCache()`` between queries, but a library consumer
embedding these operators in a long-lived session shouldn't have to
nuke the whole SQL cache (r6 verdict #7).

This module closes that structurally: every self-persisting operator
``pin()``-s its internal persisted frames to its RESULT frame, and the
caller releases them — scoped::

    from airflow_subscription_etl_spark.cache import released

    with released(minhash_lsh_pairs(docs)) as pairs:
        pairs.write.parquet(out)        # cache reused across actions here
    # signature cache freed on exit

or explicitly::

    pairs = minhash_lsh_pairs(docs)
    pairs.count()
    release(pairs)                      # frees the signature cache

Registration is a ``WeakKeyDictionary`` keyed on the result DataFrame
object, so an un-released result that goes out of scope drops its
registration with it — ``pin`` never extends any frame's lifetime, and
callers who ignore the mechanism entirely are no worse off than
before (Spark evicts / clearCache still works).
"""

from __future__ import annotations

import weakref
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame

#: result frame → the internal persisted frames backing it. Weak keys:
#: registration must not keep result frames (or through them, their
#: cached lineage) alive.
_PINS: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def pin(result: DataFrame, *persisted: DataFrame) -> DataFrame:
    """Record ``persisted`` (operator-internal ``.persist()``-ed frames)
    as backing ``result``, so ``release(result)`` can unpersist them.
    Returns ``result`` unchanged — designed to wrap a return statement."""
    if persisted:
        _PINS.setdefault(result, []).extend(persisted)
    return result


def release(result: DataFrame) -> int:
    """Unpersist every frame pinned to ``result`` (non-blocking) and
    forget the registration. Safe on frames that were never pinned.
    Returns the number of frames released."""
    frames = _PINS.pop(result, [])
    for df in frames:
        df.unpersist()
    return len(frames)


def adopt(result: DataFrame, source: DataFrame) -> DataFrame:
    """COPY the pins registered on ``source`` onto ``result`` — for
    operators that build their return value ON TOP of another
    operator's (or an internal stage's) pinned result, so the caller
    releases through the frame they actually hold. A copy, not a move:
    releasing through EITHER handle works (``DataFrame.unpersist()`` is
    an idempotent no-op on an unpersisted frame, so double release is
    harmless), whereas a move would silently strip the release path
    from ``source`` when a caller summarizes a result they keep using.

    SHARED FATE (ADVICE r7): the copied pins reference the SAME
    underlying caches, so ``release()`` through one handle unpersists
    them for every sibling handle too — a caller who releases the
    summary while still iterating on the raw assignment loses the
    cache reuse (never correctness; Spark recomputes). Hold releases
    until the last consumer of ANY adopted handle is done, or scope
    the whole consumption under one ``released()`` block.

    ``adopt(x, x)`` is an explicit no-op (a self-adopt would duplicate
    the pin list and make ``pinned_count`` lie). Safe when ``source``
    has no pins. Returns ``result`` unchanged."""
    if result is source:
        return result
    frames = _PINS.get(source, [])
    if frames:
        _PINS.setdefault(result, []).extend(frames)
    return result


@contextmanager
def released(result: DataFrame) -> Iterator[DataFrame]:
    """Scope the internal caches of an operator result: yields the
    frame, releases its pinned persists on exit (success or error).
    Within the block every action reuses the operator's internal cache;
    after it the executors' storage memory is returned."""
    try:
        yield result
    finally:
        release(result)


def pinned_count(result: DataFrame) -> int:
    """How many internal frames are currently pinned to ``result`` —
    introspection for tests."""
    return len(_PINS.get(result, []))
