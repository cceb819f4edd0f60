from .io import TABLES, events_observations, load_table
from .yahoo import read_yahoo_observations

__all__ = [
    "TABLES",
    "events_observations",
    "load_table",
    "read_yahoo_observations",
]
