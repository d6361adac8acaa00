"""Read-only REST-catalog shim over the icetbl metadata directory.

The reference's docker-compose stack serves ONE catalog to many
engines over HTTP (``/root/reference/docker-compose.yml:24-44`` — the
Iceberg REST catalog container every engine points at). The real
protocol is public (Apache Iceberg's rest-catalog-open-api.yaml); this
shim reproduces its read-path shape — config, namespace listing, table
listing, metadata load — over OUR JSON metadata dialect, entirely
offline (stdlib ``http.server`` + ``urllib``; the environment blocks
Maven/pyiceberg, so real-binary-format interop stays gated behind
``HAVE_ICEBERG``, see NOTES.md).

What makes it a *catalog* rather than a path convention: the client
discovers tables by name, receives the CURRENT metadata document and
fetches manifest lists through the server (``RemoteTableMeta._load_mf``
goes over HTTP), so a reader never touches the metadata directory —
exactly the separation the REST catalog exists for. Data files stay
local-filesystem reads (in production: object store), matching the real
protocol, which serves metadata only.

Endpoints (GET only):
  /v1/config                                  -> {"defaults":{}, "overrides":{}}
  /v1/namespaces                              -> {"namespaces": [["default"]]}
  /v1/namespaces/default/tables               -> {"identifiers": [...]}
  /v1/namespaces/default/tables/<name>        -> {"metadata-location": ..., "metadata": <v<N>.json doc>}
  /v1/namespaces/default/tables/<name>/manifests/<rel> -> {"entries": [...]}
"""

from __future__ import annotations

import json
import os
import threading
import urllib.error
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from iceberg_workshop_spark.icetbl import meta as M


class RestCatalogServer:
    """Serve registered table locations read-only over HTTP."""

    def __init__(self) -> None:
        self._tables: dict[str, str] = {}
        # n_requests backs a correctness assertion (q_catalog_rest's
        # require(n >= 6)); ThreadingHTTPServer handles each request on
        # its own thread, so the increment must be locked — a bare
        # `+= 1` is read-modify-write and can drop counts under
        # concurrent fetches.
        self.n_requests = 0
        self._count_lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args: Any) -> None:  # silence stderr
                pass

            def do_GET(self) -> None:  # noqa: N802 — http.server API
                with outer._count_lock:
                    outer.n_requests += 1
                body, status = outer._route(self.path)
                payload = json.dumps(body).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    # -- lifecycle -----------------------------------------------------
    def start(self) -> str:
        self._thread.start()
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    def register(self, name: str, location: str) -> None:
        self._tables[name] = location

    # -- routing -------------------------------------------------------
    def _route(self, path: str) -> tuple[dict[str, Any], int]:
        parts = [urllib.parse.unquote(p) for p in path.split("/") if p]
        if parts == ["v1", "config"]:
            return {"defaults": {}, "overrides": {}}, 200
        if parts == ["v1", "namespaces"]:
            return {"namespaces": [["default"]]}, 200
        if parts == ["v1", "namespaces", "default", "tables"]:
            return {
                "identifiers": [
                    {"namespace": ["default"], "name": n}
                    for n in sorted(self._tables)
                ]
            }, 200
        if (
            len(parts) == 5
            and parts[:4] == ["v1", "namespaces", "default", "tables"]
        ):
            loc = self._tables.get(parts[4])
            if loc is None:
                return {"error": "no such table"}, 404
            tm = M.read_current(loc)
            return {
                "metadata-location": M.metadata_path(loc, tm.version),
                "location": loc,
                "metadata": tm.doc,
            }, 200
        if (
            len(parts) == 7
            and parts[:4] == ["v1", "namespaces", "default", "tables"]
            and parts[5] == "manifests"
        ):
            loc = self._tables.get(parts[4])
            if loc is None:
                return {"error": "no such table"}, 404
            rel = os.path.join(M.METADATA_DIR, os.path.basename(parts[6]))
            try:
                with open(os.path.join(loc, rel)) as fh:
                    return json.load(fh), 200
            except FileNotFoundError:
                return {"error": "no such manifest"}, 404
        return {"error": "not found"}, 404


class RemoteTableMeta(M.TableMeta):
    """A TableMeta whose manifest loads go through the REST server —
    the reader side never opens the metadata directory."""

    def __init__(
        self, doc: dict[str, Any], version: int, location: str,
        base_url: str, name: str,
    ) -> None:
        super().__init__(doc, version, location)
        self._base_url = base_url
        self._name = name

    def _fetch_metadata_file(self, rel_path: str) -> dict[str, Any]:
        mf = urllib.parse.quote(os.path.basename(rel_path), safe="")
        url = (
            f"{self._base_url}/v1/namespaces/default/tables/"
            f"{self._name}/manifests/{mf}"
        )
        try:
            with urllib.request.urlopen(url) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as exc:
            if exc.code == 404:
                # same typed error as the filesystem path: a pinned
                # doc whose manifests/list were GC'd raises
                # SnapshotExpired, not a transport error
                raise M.SnapshotExpired(
                    f"metadata file {rel_path} for table {self._name} "
                    "is gone from the catalog (garbage-collected by "
                    "expire_snapshots); this pinned metadata version "
                    "can no longer be materialized"
                ) from None
            raise

    def _load_mf(self, rel_path: str) -> list[dict[str, Any]]:
        ents = self._mf_cache.get(rel_path)
        if ents is None:
            ents = self._fetch_metadata_file(rel_path)["entries"]
            self._mf_cache[rel_path] = ents
        return ents

    def _load_ml(self, rel_path: str) -> dict[str, Any]:
        # manifest lists ride the same metadata-file route as
        # manifests (served by basename under metadata/)
        return self._fetch_metadata_file(rel_path)


class RestCatalogClient:
    """Minimal read client for :class:`RestCatalogServer`."""

    def __init__(self, base_url: str) -> None:
        self.base_url = base_url.rstrip("/")

    def _get(self, path: str) -> dict[str, Any]:
        with urllib.request.urlopen(f"{self.base_url}{path}") as resp:
            return json.loads(resp.read())

    def list_namespaces(self) -> list[list[str]]:
        return self._get("/v1/namespaces")["namespaces"]

    def list_tables(self) -> list[str]:
        return [
            i["name"]
            for i in self._get("/v1/namespaces/default/tables")["identifiers"]
        ]

    def load_table(self, name: str) -> RemoteTableMeta:
        doc = self._get(f"/v1/namespaces/default/tables/{name}")
        version = int(
            os.path.basename(doc["metadata-location"])[1:].split(".")[0]
        )
        return RemoteTableMeta(
            doc["metadata"], version, doc["location"], self.base_url, name
        )
