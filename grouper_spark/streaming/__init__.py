from .grouper import Grouper, Request, shutdown, start, submit
from .stream import (
    append_stream_file,
    grouper_process_stream,
    stage_stream_source,
    stateful_extrema,
    stateful_running_sum,
    stateful_sessionize,
    transform_with_state_extrema,
)

__all__ = [
    "Grouper",
    "Request",
    "start",
    "submit",
    "shutdown",
    "grouper_process_stream",
    "append_stream_file",
    "stage_stream_source",
    "stateful_extrema",
    "stateful_running_sum",
    "stateful_sessionize",
    "transform_with_state_extrema",
]
