"""Training-data pipelines over ``documents`` and ``embeddings`` —
dedup family, text analysis, similarity search.

Each function takes ``sf_dir`` -> Ray Dataset; oracle SQL lives in
``__ray_entry__``.  Shuffle discipline: fingerprint/signature columns ride
the shuffles, never full documents; pair generation happens inside bounded
buckets (digest / LSH band / label / lang blocks).

Round 5: the 4.8k-line monolith is split into per-family modules
(docs_shared / docs_dedup / docs_analysis); this facade re-exports every
public name unchanged, plus the internal helpers tests reach for.
"""

from .docs_shared import (  # noqa: F401
    BROADCAST_PAYLOAD_BYTES,
    MIX_RATES,
    N_DOC_PARTS,
    PAGERANK_SCALE,
    RAKE_STOPWORDS,
    _bucketed_pairs,
    _common_rank,
    _dedup_pairs,
    _global_rank,
    _levenshtein_pairs,
    _md5_bucket,
    _padded_prefix_bytes,
    _pair_hash_key,
    _pool_size,
    _prefix_candidates,
    _prefix_filtered_pairs,
    _presplit_graph_edges,
    _query_vectors,
    _read,
    _read_emb_head,
    _verify_id_pairs,
    ngram_jaccard,
    shingle_jaccard_pairs,
)
from .docs_dedup import *     # noqa: F401,F403
from .docs_analysis import *  # noqa: F401,F403
