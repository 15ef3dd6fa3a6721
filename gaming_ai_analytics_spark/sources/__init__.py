"""Sources & sinks: layered table IO, schema-pinned CSV, star loader."""

from gaming_ai_analytics_spark.sources.io import (
    TableStore,
    read_csv,
    table_path,
)
from gaming_ai_analytics_spark.sources.star import load_star, load_table

__all__ = ["TableStore", "read_csv", "table_path", "load_star", "load_table"]
