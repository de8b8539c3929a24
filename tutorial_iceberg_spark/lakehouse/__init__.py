"""Lakehouse layer: Iceberg-semantics tables on plain parquet + JSON metadata."""
