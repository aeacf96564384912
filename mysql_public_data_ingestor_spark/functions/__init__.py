"""Shared column-expression helpers (all JVM-side, codegen-friendly)."""

from .textnorm import normalized_text, whitespace_tokens, word_shingles  # noqa: F401
