"""Embedding similarity: brute-force cosine top-k (baseline),
signed-random-projection LSH bucketing and cosine near-dup, IVF-Flat
partition pruning (`.ivf`), product-quantization compression + ADC search
(`.pq`), SemDeDup (`.semdedup`), and the Frequent Directions covariance
sketch (`.freqdir`)."""

from .pq import adc_topk, pq_encode, train_codebooks  # noqa: F401
from .search import (  # noqa: F401
    cosine_near_dup_pairs,
    cosine_topk,
    srp_signature_col,
)
