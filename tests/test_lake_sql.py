"""Replay of the reference's Week 4-5 SQL sequence (README.md:944-1028)
through the LakeSQL router — the 'paste the curriculum's SQL against this
engine' parity demonstration. Statement shapes and ordering mirror the
README; only the catalog name differs (and is accepted/ignored).
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from tutorial_iceberg_spark.lakehouse.catalog import LakeCatalog
from tutorial_iceberg_spark.lakehouse.sql import LakeSQL


@pytest.fixture()
def lsql(spark):
    with tempfile.TemporaryDirectory() as wh:
        yield LakeSQL(spark, LakeCatalog(spark, wh))


def test_week45_sql_sequence(lsql, spark):
    # D1 CREATE TABLE ... USING iceberg (README.md:944-951)
    lsql.sql("""
        CREATE TABLE demo.db.orders (
            order_id BIGINT, customer_id BIGINT, product_name STRING,
            amount DECIMAL(10,2), order_date DATE
        ) USING iceberg
    """)
    # D16 INSERT INTO ... VALUES (README.md:1136-1138)
    lsql.sql("""
        INSERT INTO demo.db.orders VALUES
          (1, 101, 'laptop',  CAST(1200.00 AS DECIMAL(10,2)), DATE '2024-01-15'),
          (2, 102, 'mouse',   CAST(25.50  AS DECIMAL(10,2)), DATE '2024-02-20'),
          (3, 103, 'keyboard',CAST(75.00  AS DECIMAL(10,2)), DATE '2024-02-25')
    """)
    assert lsql.sql("SELECT COUNT(*) AS n FROM demo.db.orders").first()["n"] == 3

    # D2 UPDATE (README.md:954-956)
    lsql.sql("UPDATE demo.db.orders SET amount = CAST(1100.00 AS DECIMAL(10,2)) "
             "WHERE order_id = 1")
    got = lsql.sql("SELECT amount FROM demo.db.orders WHERE order_id = 1").first()
    assert str(got["amount"]) == "1100.00"

    # D3 DELETE (README.md:959-960)
    lsql.sql("DELETE FROM demo.db.orders WHERE order_id = 2")
    assert lsql.sql("SELECT COUNT(*) AS n FROM demo.db.orders").first()["n"] == 2

    # D4 MERGE (README.md:963-967) — source as a temp view
    spark.sql("""
        SELECT * FROM (VALUES
            (3, 103, 'keyboard-pro', CAST(99.00 AS DECIMAL(10,2)), DATE '2024-02-26'),
            (9, 109, 'webcam',       CAST(89.99 AS DECIMAL(10,2)), DATE '2024-04-01')
        ) AS v(order_id, customer_id, product_name, amount, order_date)
    """).createOrReplaceTempView("order_updates")
    lsql.sql("""
        MERGE INTO demo.db.orders t USING order_updates s
        ON t.order_id = s.order_id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
    """)
    rows = {r["order_id"]: r for r in lsql.sql(
        "SELECT * FROM demo.db.orders").collect()}
    assert rows[3]["product_name"] == "keyboard-pro" and 9 in rows

    # D5/D7 ALTER TABLE ADD COLUMN [DEFAULT] (README.md:976, 1159-1166)
    lsql.sql("ALTER TABLE demo.db.orders ADD COLUMN discount_rate DOUBLE")
    lsql.sql("ALTER TABLE demo.db.orders ADD COLUMN region STRING DEFAULT 'unknown'")
    r1 = lsql.sql("SELECT region, discount_rate FROM demo.db.orders "
                  "WHERE order_id = 1").first()
    assert r1["region"] == "unknown" and r1["discount_rate"] is None

    # D6 RENAME COLUMN (README.md:979)
    lsql.sql("ALTER TABLE demo.db.orders RENAME COLUMN product_name TO item_name")
    names = {r["item_name"] for r in lsql.sql(
        "SELECT item_name FROM demo.db.orders").collect()}
    assert "laptop" in names

    # DROP COLUMN — completes the evolution verb set (metadata-only; old
    # files keep the bytes but id-based projection hides them)
    lsql.sql("ALTER TABLE demo.db.orders DROP COLUMN discount_rate")
    cols = lsql.sql("SELECT * FROM demo.db.orders").columns
    assert "discount_rate" not in cols and "region" in cols

    # D8 partition evolution (README.md:990-992)
    lsql.sql("ALTER TABLE demo.db.orders ADD PARTITION FIELD month(order_date)")

    # D9 metadata tables (README.md:982-1004)
    hist = lsql.sql("SELECT * FROM demo.db.orders.history")
    n_snaps = hist.count()
    assert n_snaps >= 4
    ops = [r["operation"] for r in lsql.sql(
        "SELECT operation FROM demo.db.orders.snapshots").collect()]
    assert ops[0] == "append"
    assert lsql.sql("SELECT * FROM demo.db.orders.refs").first()["name"] == "main"

    # D10 time travel (README.md:1007-1010)
    v1 = lsql.sql("SELECT COUNT(*) AS n FROM demo.db.orders VERSION AS OF 1")
    assert v1.first()["n"] == 3  # pre-update, pre-delete state

    # D11 rollback + D12 compaction + D13 expiry (README.md:1013-1028)
    lsql.sql("CALL demo.system.rewrite_data_files('db.orders')")
    assert lsql.sql("SELECT COUNT(*) AS n FROM demo.db.orders").first()["n"] == 3
    lsql.sql("CALL demo.system.rollback_to_snapshot('db.orders', 1)")
    assert lsql.sql("SELECT COUNT(*) AS n FROM demo.db.orders").first()["n"] == 3
    lsql.sql("CALL demo.system.expire_snapshots('db.orders')")

    # D15 table properties (README.md:1112-1121)
    lsql.sql("ALTER TABLE demo.db.orders SET TBLPROPERTIES "
             "('write.delete.mode'='merge-on-read')")
    t = lsql.catalog.load_table("db.orders")
    assert t.meta.properties["write.delete.mode"] == "merge-on-read"


def test_unknown_statement_raises(lsql):
    with pytest.raises(ValueError, match="unsupported statement"):
        lsql.sql("GRANT ALL ON db.orders TO somebody")


def test_insert_select_roundtrip(lsql, spark):
    lsql.sql("CREATE TABLE db.a (k BIGINT, v STRING) USING iceberg")
    lsql.sql("CREATE TABLE db.b (k BIGINT, v STRING) USING iceberg")
    lsql.sql("INSERT INTO db.a VALUES (1, 'x'), (2, 'y')")
    lsql.sql("INSERT INTO db.b SELECT k + 10 AS k, v FROM db.a")
    assert sorted(r["k"] for r in lsql.sql("SELECT k FROM db.b").collect()) == [11, 12]


def test_show_and_describe(lsql):
    lsql.sql("CREATE TABLE db.t1 (k BIGINT, v STRING) USING iceberg")
    lsql.sql("CREATE TABLE other.t2 (k BIGINT) USING iceberg")
    assert {r["namespace"] for r in lsql.sql("SHOW NAMESPACES").collect()} == {
        "db", "other"
    }
    assert [r["table_name"] for r in lsql.sql("SHOW TABLES IN db").collect()] == ["t1"]
    allt = {(r["namespace"], r["table_name"])
            for r in lsql.sql("SHOW TABLES").collect()}
    assert allt == {("db", "t1"), ("other", "t2")}
    lsql.sql("ALTER TABLE db.t1 ADD COLUMN region STRING DEFAULT 'unknown'")
    desc = {r["col_name"]: r for r in lsql.sql("DESCRIBE db.t1").collect()}
    assert desc["k"]["data_type"] == "bigint"
    assert desc["region"]["initial_default"] == "unknown"


def test_v3_variant_sql_sequence(lsql, spark):
    """Replay the reference's V3 VARIANT SQL (README.md:1128-1152): CREATE
    with a VARIANT column, INSERT PARSE_JSON literals, dot-path-style
    access — through the LakeSQL router on the lakehouse."""
    lsql.sql("""
        CREATE TABLE demo.db.events (
            event_id BIGINT,
            payload VARIANT
        ) USING iceberg
    """)
    lsql.sql("""
        INSERT INTO demo.db.events VALUES
            (1, PARSE_JSON('{"action": "click", "target": "button1", "metadata": {"version": 2}}')),
            (2, PARSE_JSON('{"action": "purchase", "item_id": 12345, "price": 99.99}'))
    """)
    rows = {
        r["event_id"]: r
        for r in lsql.sql(
            "SELECT event_id, "
            "variant_get(payload, '$.action', 'string') AS action, "
            "variant_get(payload, '$.metadata.version', 'int') AS version "
            "FROM demo.db.events"
        ).collect()
    }
    assert rows[1]["action"] == "click" and rows[1]["version"] == 2
    assert rows[2]["action"] == "purchase" and rows[2]["version"] is None
    got = lsql.sql(
        "SELECT event_id FROM demo.db.events "
        "WHERE variant_get(payload, '$.action', 'string') = 'purchase'"
    ).collect()
    assert [r["event_id"] for r in got] == [2]


def test_v3_deletion_vector_sql_sequence(lsql, spark):
    """Replay the reference's V3 Deletion Vectors SQL (README.md:1110-1121):
    enable merge-on-read, row-level DELETE with no file rewrite, read with
    deletes applied — through the router, with the engine's bitmap flavor."""
    lsql.sql("CREATE TABLE demo.db.dv_orders (order_id BIGINT, status STRING) "
             "USING iceberg")
    lsql.sql("INSERT INTO demo.db.dv_orders VALUES "
             "(1, 'ok'), (2, 'cancelled'), (3, 'ok'), (4, 'cancelled')")
    lsql.sql("ALTER TABLE demo.db.dv_orders SET TBLPROPERTIES "
             "('write.delete.mode' = 'merge-on-read')")
    lsql.sql("ALTER TABLE demo.db.dv_orders SET TBLPROPERTIES "
             "('write.delete.flavor' = 'vector')")
    t = lsql.catalog.load_table("db.dv_orders")
    files_before = [f.path for f in t.meta.snapshot().files]
    lsql.sql("DELETE FROM demo.db.dv_orders WHERE status = 'cancelled'")
    snap = t.meta.snapshot()
    assert [f.path for f in snap.files] == files_before  # no rewrite
    assert snap.delete_files and all(
        d.content == "vector" for d in snap.delete_files
    )
    got = [r["order_id"] for r in lsql.sql(
        "SELECT order_id FROM demo.db.dv_orders ORDER BY order_id").collect()]
    assert got == [1, 3]


def test_identifier_rewrite_respects_boundaries_and_literals(lsql, spark):
    """Regression: the read-rewrite must not touch (a) a LONGER identifier
    that merely ends with a known table name, or (b) a table name quoted
    inside a string literal — both previously corrupted delegated SELECTs."""
    import uuid

    lsql.sql("CREATE TABLE db.orders (k BIGINT, v STRING) USING iceberg")
    lsql.sql("INSERT INTO db.orders VALUES (1, 'x')")
    # (a) <x>db.orders is a DIFFERENT (Spark-catalog) table whose name
    # merely ENDS with the known identifier. The database name is unique
    # per run but still ends in "db" to preserve the substring hazard —
    # a fixed name collides in Spark's shared warehouse dir when two
    # suite instances run concurrently (the r13 loaded-run protocol).
    hazard_db = f"my{uuid.uuid4().hex[:8]}db"
    spark.sql("SELECT * FROM (VALUES (10, 'other'), (20, 'other2')) "
              "AS v(k, v)").createOrReplaceTempView("mydb_orders")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {hazard_db}")
    try:
        spark.sql("SELECT 10 AS k, 'other' AS v").write.mode("overwrite") \
            .saveAsTable(f"{hazard_db}.orders")
        got = lsql.sql(f"SELECT k FROM {hazard_db}.orders").collect()
        assert [r["k"] for r in got] == [10]
        # (b) the literal 'db.orders' must survive the rewrite verbatim
        r = lsql.sql("SELECT 'db.orders' AS name, COUNT(*) AS n FROM db.orders "
                     "GROUP BY 1").first()
        assert r["name"] == "db.orders" and r["n"] == 1
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {hazard_db}.orders")
        spark.sql(f"DROP DATABASE IF EXISTS {hazard_db}")


def test_orphan_sweep_includes_stale_metadata_tmp(lsql):
    """Regression: a writer crash between the temp-metadata write and the
    os.link CAS strands .tmp-*.json forever; remove_orphan_files must sweep
    stale ones (and leave fresh, possibly in-flight ones alone)."""
    import os
    import time

    from tutorial_iceberg_spark.lakehouse import metadata as M

    lsql.sql("CREATE TABLE db.m (k BIGINT) USING iceberg")
    t = lsql.catalog.load_table("db.m")
    mdir = M.metadata_dir(t.location)
    stale = os.path.join(mdir, ".tmp-deadbeef.json")
    fresh = os.path.join(mdir, ".tmp-cafebabe.json")
    for p in (stale, fresh):
        with open(p, "w") as f:
            f.write("{}")
    os.utime(stale, (time.time() - 7200, time.time() - 7200))
    removed = t.remove_orphan_files()
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)  # inside the grace window: kept
    assert any(p.endswith(".tmp-deadbeef.json") for p in removed)
    os.remove(fresh)


def test_zorder_column_limit_enforced(lsql):
    """Regression: 8 columns x 8 bits hits the bigint sign bit — compact
    must refuse instead of silently degrading clustering."""
    import pytest as _pytest

    cols = [f"c{i}" for i in range(8)]
    lsql.sql(f"CREATE TABLE db.z ({', '.join(c + ' BIGINT' for c in cols)}) "
             "USING iceberg")
    t = lsql.catalog.load_table("db.z")
    with _pytest.raises(ValueError, match="at most 7"):
        t.compact(zorder_by=cols)
    t.compact(zorder_by=cols[:7])  # 7 columns stays within 63 bits


def test_rewrite_data_files_strategies(lsql, spark):
    lsql.sql("CREATE TABLE db.c (k BIGINT, v BIGINT) USING iceberg")
    lsql.sql("INSERT INTO db.c SELECT id AS k, id * 2 AS v FROM range(200)")
    lsql.sql("CALL system.rewrite_data_files('db.c', 'sort', 'k')")
    t = lsql.catalog.load_table("db.c")
    assert t.meta.snapshot().summary.get("sort-by") == "k"
    lsql.sql("CALL system.rewrite_data_files('db.c', 'zorder', 'k,v')")
    assert t.meta.snapshot().summary.get("zorder-by") == "k,v"
    assert lsql.sql("SELECT COUNT(*) AS n FROM db.c").first()["n"] == 200


def test_drop_column_multi_and_malformed(lsql):
    """r10 ADVICE low: DROP COLUMNS (a, b) must drop both (it used to
    fall through to the generic SQL path), and unbalanced parens must
    error loudly instead of matching."""
    lsql.sql(
        "CREATE TABLE demo.db.t (id BIGINT, a BIGINT, b BIGINT, c BIGINT) "
        "USING iceberg"
    )
    lsql.sql("INSERT INTO demo.db.t VALUES (1, 10, 20, 30)")
    lsql.sql("ALTER TABLE demo.db.t DROP COLUMNS (a, b)")
    assert lsql.sql("SELECT * FROM demo.db.t").columns == ["id", "c"]
    for bad in (
        "ALTER TABLE demo.db.t DROP COLUMN (c",
        "ALTER TABLE demo.db.t DROP COLUMN c)",
        "ALTER TABLE demo.db.t DROP COLUMNS (c,)",
    ):
        with pytest.raises(ValueError, match="DROP COLUMN"):
            lsql.sql(bad)
    assert lsql.sql("SELECT * FROM demo.db.t").columns == ["id", "c"]


def test_drop_columns_is_atomic(lsql):
    """ADVICE r11 low: a multi-column DROP where a LATER name is refused
    must leave the schema untouched — validation happens up front and
    the evolution is one commit, not one commit per column."""
    lsql.sql(
        "CREATE TABLE demo.db.at (id BIGINT, a BIGINT, b BIGINT) "
        "USING iceberg"
    )
    lsql.sql("INSERT INTO demo.db.at VALUES (1, 10, 20)")
    t = lsql.catalog.load_table("db.at")
    n_schemas = len(t.meta.schemas)
    # 'a' is droppable, 'ghost' is not -> NOTHING may be dropped
    with pytest.raises(ValueError, match="no column ghost"):
        lsql.sql("ALTER TABLE demo.db.at DROP COLUMNS (a, ghost)")
    assert lsql.sql("SELECT * FROM demo.db.at").columns == ["id", "a", "b"]
    assert len(t.meta.schemas) == n_schemas  # zero commits happened
    with pytest.raises(ValueError, match="duplicate"):
        lsql.sql("ALTER TABLE demo.db.at DROP COLUMNS (a, a)")
    with pytest.raises(ValueError, match="every column"):
        lsql.sql("ALTER TABLE demo.db.at DROP COLUMNS (id, a, b)")
    # the happy path is still one commit for N columns
    lsql.sql("ALTER TABLE demo.db.at DROP COLUMNS (a, b)")
    assert lsql.sql("SELECT * FROM demo.db.at").columns == ["id"]
    assert len(t.meta.schemas) == n_schemas + 1


def test_alter_column_type_promotion(lsql):
    """Iceberg's ALTER COLUMN ... TYPE verb through the router."""
    lsql.sql("CREATE TABLE demo.db.p (id INT, price FLOAT) USING iceberg")
    lsql.sql("INSERT INTO demo.db.p VALUES (1, CAST(1.5 AS FLOAT))")
    lsql.sql("ALTER TABLE demo.db.p ALTER COLUMN id TYPE BIGINT")
    lsql.sql("ALTER TABLE demo.db.p ALTER COLUMN price TYPE DOUBLE")
    got = lsql.sql("SELECT * FROM demo.db.p")
    assert dict(got.dtypes) == {"id": "bigint", "price": "double"}
    assert got.first()["price"] == 1.5
    with pytest.raises(ValueError, match="promot"):
        lsql.sql("ALTER TABLE demo.db.p ALTER COLUMN id TYPE INT")


def test_call_branch_lifecycle_through_router(lsql, spark):
    """Branch procedures at the SQL surface: CALL create_branch /
    fast_forward (Iceberg's 3-arg form accepted) / merge_branch /
    drop_branch, interleaved with INSERTs that diverge main."""
    lsql.sql("CREATE TABLE demo.db.br (k BIGINT, tag STRING) USING iceberg")
    lsql.sql("INSERT INTO demo.db.br VALUES (1, 'seed')")
    lsql.sql("CALL demo.system.create_branch('db.br', 'ingest')")
    t = lsql.catalog.load_table("db.br")
    t.append_to_branch(
        "ingest", spark.createDataFrame([(2, "staged")], "k bigint, tag string")
    )
    # no divergence yet: Iceberg's 3-arg fast_forward publishes the branch
    lsql.sql("CALL demo.system.fast_forward('db.br', 'main', 'ingest')")
    assert lsql.sql("SELECT COUNT(*) AS n FROM demo.db.br").first()["n"] == 2
    # diverge: stage on the branch while main takes an INSERT
    t.append_to_branch(
        "ingest", spark.createDataFrame([(3, "staged2")], "k bigint, tag string")
    )
    lsql.sql("INSERT INTO demo.db.br VALUES (4, 'mainline')")
    import pytest

    with pytest.raises(ValueError, match="diverged"):
        lsql.sql("CALL demo.system.fast_forward('db.br', 'main', 'ingest')")
    lsql.sql("CALL demo.system.merge_branch('db.br', 'ingest')")
    rows = lsql.sql("SELECT tag FROM demo.db.br").collect()
    assert sorted(r["tag"] for r in rows) == [
        "mainline", "seed", "staged", "staged2",
    ]
    lsql.sql("CALL demo.system.drop_branch('db.br', 'ingest')")
    assert t.branches() == {}


def test_call_resolve_expired_transactions(lsql, spark):
    """Operator recovery at the SQL surface: CALL
    resolve_expired_transactions(grace) aborts an expired in-flight 2PC
    prepare and returns the resolved records as a DataFrame."""
    import os

    from tutorial_iceberg_spark.lakehouse import metadata as M

    lsql.sql("CREATE TABLE db.rx (k BIGINT) USING iceberg")
    lsql.sql("INSERT INTO db.rx VALUES (1)")
    txn = lsql.catalog.transaction()
    txn.append("db.rx", spark.createDataFrame([(2,)], "k bigint"))
    claimed = txn._prepare_once()
    for loc, v in claimed:
        os.utime(
            os.path.join(M.metadata_dir(loc), f"v{v}.metadata.json"), (1, 1)
        )
    out = lsql.sql("CALL demo.system.resolve_expired_transactions('60')")
    resolved = [r["resolved_txn"] for r in out.collect()]
    assert resolved == [os.path.basename(txn.decision_path)]
    assert M.txn_decision(txn.decision_path) == "aborted"
    # table readable and writable afterwards
    assert lsql.sql("SELECT COUNT(*) AS n FROM db.rx").first()["n"] == 1
    lsql.sql("INSERT INTO db.rx VALUES (3)")
    assert lsql.sql("SELECT COUNT(*) AS n FROM db.rx").first()["n"] == 2
