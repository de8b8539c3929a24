"""LakeCatalog: namespace/table management (S11, D9).

The reference's Week-5 catalog is an Iceberg REST service queried over
HTTP (`GET /v1/namespaces`, `/v1/namespaces/{ns}/tables`, table metadata —
README.md:1036-1088). Our warehouse is a local directory tree
``warehouse/<namespace>/<table>/{metadata,data}``; this class exposes the
same three operations the reference's client implements, as DataFrames.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from tutorial_iceberg_spark.lakehouse import metadata as M
from tutorial_iceberg_spark.lakehouse.table import LakeTable


class LakeCatalog:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    def _loc(self, identifier: str) -> str:
        # "db.orders" -> warehouse/db/orders
        return os.path.join(self.warehouse, *identifier.split("."))

    def create_table(self, identifier: str, schema_ddl: str, **kwargs) -> LakeTable:
        loc = self._loc(identifier)
        if os.path.exists(os.path.join(loc, "metadata")):
            raise ValueError(f"table {identifier} already exists")
        return LakeTable.create(self.spark, loc, schema_ddl, name=identifier, **kwargs)

    def load_table(self, identifier: str) -> LakeTable:
        return LakeTable.load(self.spark, self._loc(identifier))

    def transaction(self):
        """Multi-table atomic transaction (2PC, single atomic decision
        record): ``with cat.transaction() as txn: txn.append(...)`` —
        see lakehouse/transaction.py for the protocol."""
        from tutorial_iceberg_spark.lakehouse.transaction import LakeTransaction

        return LakeTransaction(self)

    def drop_table(self, identifier: str) -> None:
        import shutil

        shutil.rmtree(self._loc(identifier))

    # -- REST-catalog-shaped listings (README.md:1049-1068) --------------
    def list_namespaces(self) -> DataFrame:
        rows = sorted(
            (d,) for d in os.listdir(self.warehouse)
            if os.path.isdir(os.path.join(self.warehouse, d))
        )
        return self.spark.createDataFrame(rows, "namespace string")

    def list_tables(self, namespace: str) -> DataFrame:
        base = os.path.join(self.warehouse, namespace)
        rows = sorted(
            (namespace, t)
            for t in (os.listdir(base) if os.path.isdir(base) else [])
            if os.path.isdir(os.path.join(base, t, "metadata"))
        )
        return self.spark.createDataFrame(rows, "namespace string, table_name string")

    def table_metadata(self, identifier: str) -> dict:
        """GET /v1/namespaces/{ns}/tables/{t} analog — raw metadata dict."""
        md = M.read_metadata(self._loc(identifier))
        return {
            "table_uuid": md.table_uuid,
            "name": md.name,
            "location": md.location,
            "current_snapshot_id": md.current_snapshot_id,
            "schema": {f.name: f.type for f in md.schema().fields},
            "partition_spec": [
                {"source": p.source, "transform": p.transform, "name": p.name}
                for p in md.spec().fields
            ],
            "snapshots": len(md.snapshots),
            "properties": dict(md.properties),
        }
