"""Reusable operator library.

Operators Spark lacks natively, built as compositions of DataFrame
primitives (preferred) or Arrow-batched pandas stages (only where the
built-ins can't express the computation efficiently):

- ``asof``       : as-of / backward join (union-tag + running-last)
- ``topk``       : per-group and global top-k
- ``dedup``      : shingling, MinHash signatures, LSH banding, SimHash
- ``similarity`` : cosine kNN (broadcast brute-force) and blocked pair
                   scoring (numpy matmul inside applyInPandas)
"""

from .asof import asof_join  # noqa: F401
from .dedup import (  # noqa: F401
    hashed_word_shingles,
    lsh_candidate_pairs,
    minhash_frame,
    minhash_signature,
    shingle_frame,
    simhash64,
    simhash_frame,
    word_shingles,
)
from .salted import salted_join  # noqa: F401
from .similarity import (  # noqa: F401
    blocked_cosine_pairs,
    cosine_col,
    dot_col,
    knn_bruteforce,
    norm_col,
)
from .topk import topk_global, topk_per_group  # noqa: F401
