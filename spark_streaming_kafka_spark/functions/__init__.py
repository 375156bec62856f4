"""Column-expression helpers (SURVEY.md §2.8 F1–F9 + pipeline functions)."""

from .hashing import md5_long, poly_fingerprint  # noqa: F401
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
