"""LakeSQL: the reference's Spark-SQL surface routed onto the lakehouse.

The curriculum's Weeks 4-5 interface is SQL — ``CREATE TABLE demo.db.orders
(...) USING iceberg`` (README.md:944-951), ``UPDATE``/``DELETE``/``MERGE``
(README.md:954-967), ``ALTER TABLE`` evolution (README.md:976-992),
metadata tables (README.md:982-1004), time travel (README.md:1007-1010) and
maintenance ``CALL`` procedures (README.md:1013-1028). This router accepts
those statement shapes verbatim (any catalog prefix; ``USING iceberg``
accepted as an alias) and dispatches to :class:`LakeTable` /
:class:`LakeCatalog`, so a user of the reference can paste its SQL against
this engine.

Parsing stance: a deliberately small statement-level regex router — NOT a
SQL engine. Everything inside a SELECT is delegated untouched to Spark SQL
(Catalyst does the real work) after lake-table references are resolved to
temp views of the correct snapshot; only the statement *kinds* the
curriculum exercises are recognized, and anything else raises cleanly.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from tutorial_iceberg_spark.lakehouse.catalog import LakeCatalog

_CREATE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?P<ident>[\w.]+)\s*\((?P<cols>.*?)\)\s*"
    r"USING\s+(?:iceberg|lake)\s*"
    r"(?:PARTITIONED\s+BY\s*\((?P<part>[^)]*)\))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_VALUES = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<ident>[\w.]+)\s+VALUES\s+(?P<values>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_SELECT = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<ident>[\w.]+)\s+(?P<select>SELECT\s+.+)$",
    re.IGNORECASE | re.DOTALL,
)
_UPDATE = re.compile(
    r"^\s*UPDATE\s+(?P<ident>[\w.]+)\s+SET\s+(?P<sets>.+?)\s+WHERE\s+(?P<pred>.+?)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<ident>[\w.]+)\s+WHERE\s+(?P<pred>.+?)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_MERGE = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<ident>[\w.]+)(?:\s+\w+)?\s+USING\s+(?P<src>[\w.]+)"
    r"(?:\s+\w+)?\s+ON\s+(?P<on>.+?)\s+"
    r"WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+"
    r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ADD_COLUMN = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<ident>[\w.]+)\s+ADD\s+COLUMNS?\s*\(?\s*"
    r"(?P<name>\w+)\s+(?P<type>[\w()\s,]+?)"
    r"(?:\s+DEFAULT\s+(?P<default>'[^']*'|\S+))?\s*\)?\s*$",
    re.IGNORECASE,
)
_RENAME_COLUMN = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<ident>[\w.]+)\s+RENAME\s+COLUMN\s+"
    r"(?P<old>\w+)\s+TO\s+(?P<new>\w+)\s*$",
    re.IGNORECASE,
)
# Iceberg's type-promotion verb: ALTER TABLE t ALTER COLUMN c TYPE bigint
_ALTER_COL_TYPE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<ident>[\w.]+)\s+ALTER\s+COLUMN\s+"
    r"(?P<name>\w+)\s+TYPE\s+(?P<type>\w+(?:\s*\(\s*\d+\s*,\s*\d+\s*\))?)\s*$",
    re.IGNORECASE,
)
# Parens must come as a matched pair (r10 ADVICE: 'DROP COLUMN (x' used
# to match and 'DROP COLUMNS (a, b)' silently fell through to the generic
# SQL path). The comma list supports multi-column drops; _DROP_PREFIX
# catches malformed variants so they error loudly instead of falling
# through.
_DROP_COLUMN = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<ident>[\w.]+)\s+DROP\s+COLUMNS?\s+"
    r"(?:\(\s*(?P<plist>\w+(?:\s*,\s*\w+)*)\s*\)|(?P<list>\w+(?:\s*,\s*\w+)*))"
    r"\s*$",
    re.IGNORECASE,
)
_DROP_PREFIX = re.compile(
    r"^\s*ALTER\s+TABLE\s+[\w.]+\s+DROP\s+COLUMNS?\b", re.IGNORECASE
)
_ADD_PARTITION = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<ident>[\w.]+)\s+ADD\s+PARTITION\s+FIELD\s+"
    r"(?P<decl>.+?)\s*$",
    re.IGNORECASE,
)
_SET_PROPS = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<ident>[\w.]+)\s+SET\s+TBLPROPERTIES\s*"
    r"\((?P<props>.+)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CALL = re.compile(
    r"^\s*CALL\s+(?:[\w.]+\.)?(?P<proc>rollback_to_snapshot|rewrite_data_files"
    r"|expire_snapshots|remove_orphan_files|fast_forward|merge_branch"
    r"|create_branch|drop_branch|resolve_expired_transactions)"
    r"\s*\((?P<args>.*?)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_VERSION_AS_OF = re.compile(
    r"\b(?P<ident>[\w.]+)\s+VERSION\s+AS\s+OF\s+(?P<ver>\d+)", re.IGNORECASE
)
_TS_AS_OF = re.compile(
    r"\b(?P<ident>[\w.]+)\s+TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)'", re.IGNORECASE
)
_META_SUFFIXES = {
    "history": "history",
    "snapshots": "snapshots_df",
    "partitions": "partitions_df",
    "files": "files_df",
    "refs": "refs_df",
}

# single-quoted SQL string literals ('' = escaped quote): table names inside
# them are data, never references, so the identifier rewrite must skip them
_LITERAL = re.compile(r"'(?:[^']|'')*'")


def _mask_literals(text: str) -> str:
    """Blank out quoted spans (length-preserving) so searches cannot hit
    identifier look-alikes inside string literals."""
    return _LITERAL.sub(lambda m: "\0" * len(m.group(0)), text)


def _sub_skip_literals(pat: re.Pattern, repl, text: str) -> str:
    """pat.sub applied only OUTSIDE single-quoted string literals."""
    parts: list[str] = []
    last = 0
    for m in _LITERAL.finditer(text):
        parts.append(pat.sub(repl, text[last : m.start()]))
        parts.append(m.group(0))
        last = m.end()
    parts.append(pat.sub(repl, text[last:]))
    return "".join(parts)


class LakeSQL:
    def __init__(self, spark: SparkSession, catalog: LakeCatalog):
        self.spark = spark
        self.catalog = catalog

    # -- identifier helpers ------------------------------------------------
    def _known_idents(self) -> list[str]:
        out = []
        for ns in [r["namespace"] for r in self.catalog.list_namespaces().collect()]:
            for r in self.catalog.list_tables(ns).collect():
                out.append(f"{ns}.{r['table_name']}")
        return out

    def _resolve(self, ident: str) -> str:
        """Accept any catalog prefix: demo.db.orders == db.orders."""
        parts = ident.split(".")
        known = self._known_idents()
        for k in (ident, ".".join(parts[-2:])):
            if k in known:
                return k
        raise ValueError(f"unknown lake table {ident!r}")

    def _view(self, ident: str, df: DataFrame | None = None) -> str:
        name = "lake_" + ident.replace(".", "_")
        (df if df is not None else self.catalog.load_table(ident).read()
         ).createOrReplaceTempView(name)
        return name

    # -- entry point -------------------------------------------------------
    def sql(self, stmt: str) -> DataFrame | None:
        """Execute one statement; SELECTs return a DataFrame, DML/DDL None."""
        s = stmt.strip().rstrip(";")
        if m := _CREATE.match(s):
            ident = self._short(m["ident"])
            part = [p.strip() for p in (m["part"] or "").split(",") if p.strip()]
            self.catalog.create_table(
                ident, m["cols"].strip(), partition_by=part or None
            )
            return None
        if m := _MERGE.match(s):
            t = self.catalog.load_table(self._resolve(m["ident"]))
            src = self.spark.table(m["src"])
            keys = self._merge_keys(m["on"])
            t.merge(src, on=keys)
            return None
        if m := _UPDATE.match(s):
            t = self.catalog.load_table(self._resolve(m["ident"]))
            assignments = {}
            for part in self._split_top(m["sets"]):
                col, expr = part.split("=", 1)
                assignments[col.strip()] = expr.strip()
            t.update(m["pred"].strip(), assignments)
            return None
        if m := _DELETE.match(s):
            t = self.catalog.load_table(self._resolve(m["ident"]))
            t.delete(m["pred"].strip())
            return None
        if m := _INSERT_VALUES.match(s):
            t = self.catalog.load_table(self._resolve(m["ident"]))
            cols = ", ".join(f.name for f in t.meta.schema().fields)
            df = self.spark.sql(
                f"SELECT * FROM (VALUES {m['values']}) AS v({cols})"
            )
            t.append(df)
            return None
        if m := _INSERT_SELECT.match(s):
            t = self.catalog.load_table(self._resolve(m["ident"]))
            t.append(self.spark.sql(self._rewrite_reads(m["select"])))
            return None
        if m := _ADD_PARTITION.match(s):
            self.catalog.load_table(self._resolve(m["ident"])).add_partition_field(
                m["decl"].strip()
            )
            return None
        if m := _RENAME_COLUMN.match(s):
            self.catalog.load_table(self._resolve(m["ident"])).rename_column(
                m["old"], m["new"]
            )
            return None
        if m := _ALTER_COL_TYPE.match(s):
            self.catalog.load_table(self._resolve(m["ident"])).promote_column(
                m["name"], m["type"]
            )
            return None
        if m := _DROP_COLUMN.match(s):
            tbl = self.catalog.load_table(self._resolve(m["ident"]))
            # one atomic schema commit — a refusal on ANY name leaves the
            # schema untouched (ADVICE r11: sequential drops were
            # partially applied on failure)
            tbl.drop_columns(re.split(r"\s*,\s*", m["plist"] or m["list"]))
            return None
        if _DROP_PREFIX.match(s):
            raise ValueError(
                "malformed ALTER TABLE ... DROP COLUMN: expected "
                "'DROP COLUMN c' or 'DROP COLUMNS (a, b)' with balanced "
                f"parentheses, got: {s.strip()!r}"
            )
        if m := _ADD_COLUMN.match(s):
            default = m["default"]
            if default is not None:
                default = default.strip("'")
                if re.fullmatch(r"-?\d+", default):
                    default = int(default)
            self.catalog.load_table(self._resolve(m["ident"])).add_column(
                m["name"], m["type"].strip(), default=default
            )
            return None
        if m := _SET_PROPS.match(s):
            t = self.catalog.load_table(self._resolve(m["ident"]))
            md = t.meta
            for kv in self._split_top(m["props"]):
                k, v = kv.split("=", 1)
                md.properties[k.strip().strip("'\"")] = v.strip().strip("'\"")
            t._commit(md)
            return None
        if m := _CALL.match(s):
            return self._call(m["proc"].lower(), m["args"])
        if m := re.match(r"^\s*SHOW\s+NAMESPACES\s*$", s, re.IGNORECASE):
            return self.catalog.list_namespaces()
        if m := re.match(r"^\s*SHOW\s+TABLES(?:\s+IN\s+(?:[\w.]*?(\w+)))?\s*$",
                         s, re.IGNORECASE):
            ns = m.group(1)
            if ns:
                return self.catalog.list_tables(ns)
            dfs = [
                self.catalog.list_tables(r["namespace"])
                for r in self.catalog.list_namespaces().collect()
            ]
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d)
            return out
        if m := re.match(r"^\s*DESCRIBE\s+(?:TABLE\s+)?([\w.]+)\s*$", s,
                         re.IGNORECASE):
            # DESCRIBE <table>: the schema-on-read habit the curriculum
            # builds in Week 2 (README.md:313-316), over lake metadata
            t = self.catalog.load_table(self._resolve(m.group(1)))
            rows = [
                (f.name, f.type, f.nullable,
                 None if f.initial_default is None else str(f.initial_default))
                for f in t.meta.schema().fields
            ]
            return self.spark.createDataFrame(
                rows, "col_name string, data_type string, nullable boolean, "
                "initial_default string"
            )
        if re.match(r"^\s*(SELECT|WITH)\b", s, re.IGNORECASE):
            return self.spark.sql(self._rewrite_reads(s))
        raise ValueError(f"unsupported statement: {stmt[:80]!r}")

    # -- pieces ------------------------------------------------------------
    def _short(self, ident: str) -> str:
        parts = ident.split(".")
        return ".".join(parts[-2:]) if len(parts) >= 2 else ident

    @staticmethod
    def _split_top(s: str) -> list[str]:
        """Split on commas not inside parens/quotes."""
        out, depth, cur, q = [], 0, [], None
        for ch in s:
            if q:
                if ch == q:
                    q = None
            elif ch in "'\"":
                q = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                out.append("".join(cur))
                cur = []
                continue
            cur.append(ch)
        if cur:
            out.append("".join(cur))
        return [p for p in (x.strip() for x in out) if p]

    @staticmethod
    def _merge_keys(on: str) -> list[str]:
        keys = []
        for clause in re.split(r"\s+AND\s+", on, flags=re.IGNORECASE):
            m = re.match(r"\s*\w+\.(\w+)\s*=\s*\w+\.(\w+)\s*$", clause)
            if not m or m.group(1) != m.group(2):
                raise ValueError(f"unsupported MERGE ON clause: {clause!r}")
            keys.append(m.group(1))
        return keys

    def _rewrite_reads(self, select: str) -> str:
        """Resolve lake-table references inside a SELECT: metadata tables
        (t.history, ...), time travel (VERSION/TIMESTAMP AS OF), then plain
        current-state reads — each becomes a temp view of the right
        snapshot, so Spark SQL plans the query itself."""
        out = select
        for ident in self._known_idents():
            t = self.catalog.load_table(ident)
            for suffix, method in _META_SUFFIXES.items():
                # (?<![\w.]) left boundary: `db.orders` must not rewrite the
                # tail of `mydb.orders`; literal masking: nor inside 'quotes'
                pat = re.compile(
                    rf"(?<![\w.])(?:[\w.]+\.)?{re.escape(ident)}\.{suffix}\b",
                    re.IGNORECASE,
                )
                if pat.search(_mask_literals(out)):
                    view = self._view(f"{ident}.{suffix}", getattr(t, method)())
                    out = _sub_skip_literals(pat, view, out)

        def _sub_version(m):
            ident = self._short(m["ident"])
            t = self.catalog.load_table(self._resolve(ident))
            return self._view(
                f"{ident}_v{m['ver']}", t.read(snapshot_id=int(m["ver"]))
            )

        def _sub_ts(m):
            from datetime import datetime

            ident = self._short(m["ident"])
            t = self.catalog.load_table(self._resolve(ident))
            ms = int(datetime.fromisoformat(m["ts"]).timestamp() * 1000)
            return self._view(f"{ident}_asof", t.read(as_of_ms=ms))

        out = _sub_skip_literals(_VERSION_AS_OF, _sub_version, out)
        out = _sub_skip_literals(_TS_AS_OF, _sub_ts, out)
        for ident in self._known_idents():
            pat = re.compile(
                rf"(?<![\w.])(?:[\w.]+\.)?{re.escape(ident)}\b", re.IGNORECASE
            )
            if pat.search(_mask_literals(out)):
                out = _sub_skip_literals(pat, self._view(ident), out)
        return out

    def _call(self, proc: str, args_s: str) -> DataFrame | None:
        args = [a.strip().strip("'\"") for a in self._split_top(args_s)]
        # accept Iceberg's named-arg style: table => 'db.orders'
        args = [a.split("=>")[-1].strip().strip("'\"") for a in args]
        if proc == "resolve_expired_transactions":
            # warehouse-level operator recovery (no table argument): abort
            # expired in-flight 2PC prepares, settle burned claims,
            # finalize crashed committers, GC old decision records —
            # returns the resolved transaction records as a DataFrame
            from tutorial_iceberg_spark.lakehouse.transaction import (
                LakeTransaction,
            )

            grace = float(args[0]) if args and args[0] else 3600.0
            resolved = LakeTransaction.resolve_expired(
                self.catalog.warehouse, grace_sec=grace
            )
            return self.spark.createDataFrame(
                [(r,) for r in resolved], "resolved_txn string"
            )
        t = self.catalog.load_table(self._resolve(args[0]))
        if proc == "rollback_to_snapshot":
            t.rollback_to(int(args[1]))
        elif proc == "rewrite_data_files":
            # Iceberg-style strategy args: ('t'), ('t','sort','k1,k2'),
            # ('t','zorder','k1,k2')
            if len(args) >= 3 and args[1].lower() == "sort":
                t.compact(target_files=4, sort_by=[c.strip() for c in args[2].split(",")])
            elif len(args) >= 3 and args[1].lower() == "zorder":
                t.compact(target_files=4, zorder_by=[c.strip() for c in args[2].split(",")])
            else:
                t.compact()
        elif proc == "expire_snapshots":
            t.expire_snapshots(keep_last=int(args[1]) if len(args) > 1 else 1)
        elif proc == "remove_orphan_files":
            t.remove_orphan_files()
        # branch lifecycle (Iceberg's fast_forward procedure + the
        # engine's diverged-branch merge extension, table.py):
        # CALL create_branch('db.t', 'audit'); CALL fast_forward('db.t',
        # 'audit'); CALL merge_branch('db.t', 'ingest'); CALL
        # drop_branch('db.t', 'audit')
        elif proc == "create_branch":
            t.create_branch(args[1])
        elif proc == "fast_forward":
            # accept Iceberg's 3-arg form ('t', 'main', 'branch') and the
            # engine's 2-arg form ('t', 'branch') — main is the only
            # publish target either way
            t.fast_forward(args[-1])
        elif proc == "merge_branch":
            t.merge_branch(args[-1])
        elif proc == "drop_branch":
            t.drop_branch(args[1])
        return None
