from .bucketed import load_observations_bucketed, save_observations_bucketed
from .io import TABLES, events_observations, load_jsonl, load_table, save_jsonl
from .partitioned import (
    load_observations_partitioned,
    save_observations_partitioned,
    slice_partitioned,
)
from .yahoo import read_yahoo_observations

__all__ = [
    "TABLES",
    "events_observations",
    "load_observations_bucketed",
    "load_observations_partitioned",
    "load_jsonl",
    "load_table",
    "save_jsonl",
    "read_yahoo_observations",
    "save_observations_bucketed",
    "save_observations_partitioned",
    "slice_partitioned",
]
