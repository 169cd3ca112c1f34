from .text import (  # noqa: F401
    doc_fingerprint,
    lang_guess,
    normalize_text,
    text_quality,
    tokens,
)
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
