from .parquet import TABLES, load_table, load_tables, register_views
from .jsonsrc import read_json_dir, read_master_location

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "read_json_dir",
    "read_master_location",
]
