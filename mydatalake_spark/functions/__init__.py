from .text import (  # noqa: F401
    doc_fingerprint,
    lang_guess,
    normalize_text,
    text_quality,
    tokens,
)
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
from .stats import (  # noqa: F401
    chi2_independence,
    cuped_adjusted,
    emd_1d,
    ks_2samp,
    mann_whitney_u,
    mutual_information,
    population_stability_index,
    theil_sen_trend,
    trimmed_stats,
    welch_ttest,
)
