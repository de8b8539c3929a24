"""Sources and sinks: parquet/CSV/partitioned IO, metadata introspection, row generators."""
