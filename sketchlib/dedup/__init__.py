"""Deduplication operators for training-data pipelines: exact (fingerprint
groupBy), MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup,
and incremental shard-vs-seen-corpus dedup (Bloom split)."""

from .clusters import (  # noqa: F401
    assign_clusters,
    cluster_summary,
    connected_components,
    dedup_near_keep,
)
from .exact import dedup_exact, dedup_summary, duplicate_groups  # noqa: F401
from .paragraphs import (  # noqa: F401
    dedup_paragraphs,
    explode_paragraphs,
    paragraph_dedup_summary,
)
from .incremental import drop_seen, seen_bloom  # noqa: F401
from .jaccard import ngram_jaccard_pairs  # noqa: F401
from .minhash import (  # noqa: F401
    lsh_candidate_pairs,
    minhash_signatures,
    near_dup_pairs,
    shingles_col,
)
from .simhash import simhash_col, simhash_near_dup_pairs  # noqa: F401
