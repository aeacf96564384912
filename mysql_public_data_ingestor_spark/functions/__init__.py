"""Shared column-expression helpers (all JVM-side, codegen-friendly)."""

from .exact import exact_sum, exact_sum_window, quantize, sql_exact_sum  # noqa: F401
from .textnorm import (  # noqa: F401
    normalized_text,
    sha256_hex,
    sha256_prefix_i64,
    whitespace_tokens,
    word_shingles,
)
