from .io import TABLES, events_observations, load_table

__all__ = ["TABLES", "events_observations", "load_table"]
