"""§2.1 sources (SURVEY.md S1-S7)."""

from .batch import from_elements, load_table, load_tables, read_file
from .custom_datasource import SensorDataSource, register_sensor_source
from .generators import sensor_readings_stream, smoke_level_stream

__all__ = [
    "SensorDataSource",
    "register_sensor_source",
    "from_elements",
    "load_table",
    "load_tables",
    "read_file",
    "sensor_readings_stream",
    "smoke_level_stream",
]
