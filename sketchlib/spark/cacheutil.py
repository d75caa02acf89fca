"""Handles for persisted intermediates inside composite operators.

Several dedup operators (MinHash verify-join, PPJoin candidate pairs, CDC
shared-chunk fingerprints) persist a mid-plan DataFrame because AQE
materializes broadcast id-sets in separate subquery jobs that would
otherwise re-execute the expensive upstream subtree once per job (measured
5x on the MinHash pipeline — see ``dedup/minhash.py``).  The operator
returns a *lazy* DataFrame, so it cannot unpersist before the caller's
action runs; left alone, repeated calls accumulate MEMORY_AND_DISK blocks
for the lifetime of the session.

The contract here: the operator tags its returned DataFrame with the
persisted intermediates via :func:`tag_intermediates`; after the caller has
run its terminal action (collect/write/count), it calls
:func:`unpersist_intermediates` on the result to release the blocks.
Callers that batch many corpora through one session (the corpus-job CLI)
may instead ``spark.catalog.clearCache()`` between runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_sketchlib_persisted"


def tag_intermediates(result: DataFrame, *persisted: DataFrame) -> DataFrame:
    """Attach the persisted upstream frames to ``result`` so the caller can
    release them once its action has run.  Returns ``result``."""
    setattr(result, _ATTR, list(persisted))
    return result


def tagged_intermediates(result: DataFrame) -> list[DataFrame]:
    """The persisted frames tagged onto ``result`` (empty if none) — for
    composite operators that consume a tagged frame internally and must
    RE-tag its intermediates onto their own return value so the release
    contract survives the composition."""
    return list(getattr(result, _ATTR, []) or [])


def unpersist_intermediates(result: DataFrame, blocking: bool = False) -> int:
    """Unpersist every intermediate tagged onto ``result`` (idempotent;
    safe on untagged frames).  Call AFTER the terminal action on
    ``result`` — unpersisting earlier re-exposes the subtree-re-execution
    pathology the persist exists to prevent.  Returns the number of frames
    released."""
    frames = getattr(result, _ATTR, None)
    if not frames:
        return 0
    for df in frames:
        df.unpersist(blocking=blocking)
    setattr(result, _ATTR, [])
    return len(frames)
