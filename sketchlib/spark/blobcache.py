"""Worker-process-level cache of deserialized sketch blobs.

A pandas UDF's closure — including any dict created next to it — is
re-pickled into EVERY task, so a closure-level ``cache = {}`` only dedups
across the Arrow batches of one task: a probe stage with thousands of
short tasks still re-parses the blob thousands of times per executor.
At the 100 TB posture a right-sized Bloom/CMS blob is GBs, and
``spec.from_bytes`` is a full parse + copy — per-task re-parsing
dominates the stage.

This module gives the intended per-WORKER reuse: the driver mints a
token (one per broadcast blob), the token rides the closure (tiny), and
the deserialized object lives in a module-level dict inside each Python
worker process, surviving across tasks for the worker's lifetime
(workers are reused by default: ``spark.python.worker.reuse``).

The cache is capped: sketches can be GBs, so at most ``_MAX`` distinct
blobs stay deserialized per worker (LRU eviction — the evicted object is
re-parsed on next use, it is not lost; the bytes live in the broadcast).
"""

from __future__ import annotations

import uuid
from collections import OrderedDict
from typing import Callable

_MAX = 4
_CACHE: "OrderedDict[str, object]" = OrderedDict()


def new_token() -> str:
    """Driver-side: one token per broadcast blob (rides the UDF closure)."""
    return uuid.uuid4().hex


def get_or_load(token: str, loader: Callable[[], object]) -> object:
    """Worker-side: deserialize once per worker process, LRU thereafter."""
    obj = _CACHE.get(token)
    if obj is None:
        obj = loader()
        _CACHE[token] = obj
        while len(_CACHE) > _MAX:
            _CACHE.popitem(last=False)
    else:
        _CACHE.move_to_end(token)
    return obj
