"""Scalar function helpers (JVM-side column expressions only)."""

from .text import (  # noqa: F401
    ngrams,
    stopword_ratio,
    tokens,
    vocabulary_fingerprint,
)
