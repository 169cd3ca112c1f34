from .qualify import rewrite_qualify, run_sql  # noqa: F401
