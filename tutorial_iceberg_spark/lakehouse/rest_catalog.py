"""REST catalog service + client (S11): the reference's Week-5 catalog
surface made real.

The reference explores an Iceberg REST catalog over HTTP — a TS client
calling ``GET /v1/namespaces``, ``/v1/namespaces/{ns}/tables`` and reading
table metadata (README.md:1036-1088) against the ``iceberg-rest-fixture``
service (README.md:862-874). This module serves the same three endpoints
(Iceberg REST spec response shapes) from a :class:`LakeCatalog` warehouse
using only the stdlib, plus the matching client:

- ``GET /v1/config``                                 -> catalog defaults
- ``GET /v1/namespaces``                             -> {"namespaces": [[ns], ...]}
- ``GET /v1/namespaces/{ns}/tables``                 -> {"identifiers": [...]}
- ``GET /v1/namespaces/{ns}/tables/{table}``         -> metadata document

Scale stance: the catalog answers from table METADATA only — no data file
is ever opened, so every response is O(manifest) like a real Iceberg
catalog; the server is a thin stateless view over the atomic metadata
commit protocol (metadata.commit_metadata), so concurrent writers never
torn-read through it.
"""

from __future__ import annotations

import json
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from tutorial_iceberg_spark.lakehouse.catalog import LakeCatalog


def _namespaces(cat: LakeCatalog) -> list[str]:
    import os

    return sorted(
        d
        for d in os.listdir(cat.warehouse)
        if os.path.isdir(os.path.join(cat.warehouse, d))
    )


def _tables(cat: LakeCatalog, ns: str) -> list[str]:
    import os

    base = os.path.join(cat.warehouse, ns)
    if not os.path.isdir(base):
        return []
    return sorted(
        t
        for t in os.listdir(base)
        if os.path.isdir(os.path.join(base, t, "metadata"))
    )


class _Handler(BaseHTTPRequestHandler):
    catalog: LakeCatalog  # injected by serve()

    def log_message(self, *_args) -> None:  # silence request logging
        pass

    def _send(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self) -> None:  # noqa: N802 (http.server contract)
        cat = self.catalog
        parts = [p for p in self.path.split("?")[0].split("/") if p]
        try:
            if parts == ["v1", "config"]:
                self._send(200, {"defaults": {}, "overrides": {"warehouse": cat.warehouse}})
            elif parts == ["v1", "namespaces"]:
                self._send(200, {"namespaces": [[ns] for ns in _namespaces(cat)]})
            elif len(parts) == 4 and parts[:2] == ["v1", "namespaces"] and parts[3] == "tables":
                ns = parts[2]
                if ns not in _namespaces(cat):
                    self._send(404, {"error": f"namespace {ns} not found"})
                    return
                self._send(
                    200,
                    {
                        "identifiers": [
                            {"namespace": [ns], "name": t} for t in _tables(cat, ns)
                        ]
                    },
                )
            elif len(parts) == 5 and parts[:2] == ["v1", "namespaces"] and parts[3] == "tables":
                ns, tbl = parts[2], parts[4]
                if tbl not in _tables(cat, ns):
                    self._send(404, {"error": f"table {ns}.{tbl} not found"})
                    return
                self._send(200, cat.table_metadata(f"{ns}.{tbl}"))
            else:
                self._send(404, {"error": f"no route {self.path}"})
        except Exception as e:  # pragma: no cover - defensive 500
            self._send(500, {"error": str(e)})


class RestCatalogServer:
    """Serve a LakeCatalog over the Iceberg REST endpoints on an ephemeral
    localhost port. Use as a context manager (tests) or call start/stop."""

    def __init__(self, catalog: LakeCatalog, port: int = 0):
        handler = type("BoundHandler", (_Handler,), {"catalog": catalog})
        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    @property
    def base_url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "RestCatalogServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    def __enter__(self) -> "RestCatalogServer":
        return self.start()

    def __exit__(self, *_exc) -> None:
        self.stop()


class RestCatalogClient:
    """The reference's TS client (listNamespaces/listTables/
    getTableMetadata, README.md:1036-1088), stdlib urllib."""

    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")

    def _get(self, path: str) -> dict:
        with urllib.request.urlopen(f"{self.base_url}{path}") as resp:
            return json.loads(resp.read())

    def config(self) -> dict:
        return self._get("/v1/config")

    def list_namespaces(self) -> list[str]:
        return [ns[0] for ns in self._get("/v1/namespaces")["namespaces"]]

    def list_tables(self, namespace: str) -> list[str]:
        ids = self._get(f"/v1/namespaces/{namespace}/tables")["identifiers"]
        return [i["name"] for i in ids]

    def get_table_metadata(self, namespace: str, table: str) -> dict:
        return self._get(f"/v1/namespaces/{namespace}/tables/{table}")
