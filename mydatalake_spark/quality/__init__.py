from .checks import CHECKS, annotate, build_check  # noqa: F401
from .runner import CheckRunner, TableCheck  # noqa: F401
