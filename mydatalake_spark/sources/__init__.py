from .readers import read_source  # noqa: F401
from .rest import RestSource  # noqa: F401
