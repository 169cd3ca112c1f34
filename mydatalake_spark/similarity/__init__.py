from .search import brute_force_topk, ivf_topk, lsh_topk  # noqa: F401
