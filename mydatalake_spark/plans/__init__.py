from .qualify import rewrite_qualify, run_sql  # noqa: F401
from .table_sql import run_table_sql  # noqa: F401
