"""Text analysis for web-scale training-data pipelines: token counting,
quality scoring, language ID, fingerprinting — all Spark-native column
expressions (JVM, whole-stage codegen; no Python in the hot path)."""

from .analysis import (  # noqa: F401
    bpe_token_count,
    fingerprint_key,
    lang_id,
    normalize_text,
    quality_stats,
    stopword_count,
    ws_token_count,
)
from .chunking import (  # noqa: F401
    chunk_fingerprints,
    shared_chunk_pairs,
)
from .boilerplate import (  # noqa: F401
    frequent_line_hashes,
    remove_boilerplate,
    strip_boilerplate,
)
from .lmscore import (  # noqa: F401
    UnigramLM,
    lm_quality_filter,
    score_docs,
    train_unigram_lm,
)
from .pii import (  # noqa: F401
    has_pii,
    pii_counts,
    pii_summary,
    redact_pii,
    with_pii_stats,
)
from .urls import (  # noqa: F401
    filter_blocked_domains,
    normalize_url,
    url_domain,
    url_host,
)
from .decontaminate import (  # noqa: F401
    contamination_report,
    decontaminate,
    ngram_hash_col,
    ngram_hashes_from_tokens,
    tokens_col,
)
