"""Embedding similarity: brute-force cosine top-k (baseline) and
signed-random-projection LSH bucketing (scale path), plus cosine near-dup."""

from .search import (  # noqa: F401
    cosine_near_dup_pairs,
    cosine_topk,
    srp_signature_col,
)
