from .runner import run_stream_to_table
from .writer import state_timeout

__all__ = ["run_stream_to_table", "state_timeout"]
