from .grouper import Grouper, Request, shutdown, start, submit
from .stream import (
    append_stream_file,
    grouper_process_stream,
    stage_stream_source,
    stateful_running_sum,
    stateful_sessionize,
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
    "stateful_running_sum",
    "stateful_sessionize",
]
