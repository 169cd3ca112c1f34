from .search import brute_force_topk, ivf_topk, lsh_topk  # noqa: F401
from .search import hard_negatives_topk  # noqa: F401
from .quantize import quantize_int8, quantized_recall, quantized_topk  # noqa: F401
