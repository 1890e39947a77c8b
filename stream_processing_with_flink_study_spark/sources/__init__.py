"""§2.1 sources (SURVEY.md S1-S7)."""

from .batch import from_elements, load_table, load_tables, read_file
from .generators import sensor_readings_stream, smoke_level_stream

__all__ = [
    "from_elements",
    "load_table",
    "load_tables",
    "read_file",
    "sensor_readings_stream",
    "smoke_level_stream",
]
