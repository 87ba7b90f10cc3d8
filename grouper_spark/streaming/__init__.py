from .grouper import Grouper, Request
from .stream import grouper_process_stream

__all__ = ["Grouper", "Request", "grouper_process_stream"]
