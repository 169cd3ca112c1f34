from .dedup import dedup_latest, flag_duplicates  # noqa: F401
from .merge import merge_upsert  # noqa: F401
from .asof import asof_join  # noqa: F401
from .dml import delete_where, update_where  # noqa: F401
