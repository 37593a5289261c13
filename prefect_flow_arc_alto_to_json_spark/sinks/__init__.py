from .jdbc import write_keyed_updates, write_rows_dbapi
from .objects import write_json_objects

__all__ = ["write_json_objects", "write_keyed_updates", "write_rows_dbapi"]
