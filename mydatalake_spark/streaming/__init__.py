from .events import (  # noqa: F401
    session_agg,
    sliding_agg,
    stream_from_json_dir,
    tumbling_agg,
)
