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

Endpoints:
  GET /v1/config                                  -> {"defaults":{}, "overrides":{}}
  GET /v1/namespaces                              -> {"namespaces": [["default"]]}
  GET /v1/namespaces/default/tables               -> {"identifiers": [...]}
  GET /v1/namespaces/default/tables/<name>        -> {"metadata-location": ..., "metadata": <v<N>.json doc>}
  GET /v1/namespaces/default/tables/<name>/manifests/<rel> -> {"entries": [...]}
  POST /v1/namespaces/default/tables/<name>       -> commit: body
       {"requirements": [{"type": "assert-table-version", "version": N}],
        "metadata": <prepared doc>}; 200 with the new metadata-location,
       or 409 CommitFailedException when the requirement fails.

The POST endpoint is the catalog's WRITE half — the concurrent-writer
arbitration the reference's REST catalog provides to every engine in
its stack (docker-compose.yml:24-44). Split of labor mirrors the real
protocol: the writer materializes data files and manifest sidecars in
storage itself (``meta.prepare_commit_doc``), then ships only the
version DOCUMENT with an optimistic requirement; the catalog serializes
the pointer swap. Writers attached via ``RestCatalogClient
.attach_writer`` get the table's full optimistic-retry machinery
(refresh → rebase → re-commit) routed through the catalog, so two
simultaneous appenders both land without manual retry while
conflicting schema changes still raise.
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
        # Serializes the check-requirement → claim-version sequence of
        # catalog commits. The underlying meta.commit still does the
        # atomic v<N+1>.json link, so a rogue DIRECT-filesystem writer
        # racing the catalog also surfaces as a clean 409, never a
        # torn version.
        self._commit_lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args: Any) -> None:  # silence stderr
                pass

            def _reply(self, body: dict[str, Any], status: int) -> None:
                payload = json.dumps(body, default=str).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def do_GET(self) -> None:  # noqa: N802 — http.server API
                with outer._count_lock:
                    outer.n_requests += 1
                body, status = outer._route(self.path)
                self._reply(body, status)

            def do_POST(self) -> None:  # noqa: N802 — http.server API
                with outer._count_lock:
                    outer.n_requests += 1
                n = int(self.headers.get("Content-Length") or 0)
                try:
                    req = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError:
                    self._reply({"error": "malformed JSON body"}, 400)
                    return
                body, status = outer._route_post(self.path, req)
                self._reply(body, status)

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

    def _route_post(
        self, path: str, req: dict[str, Any]
    ) -> tuple[dict[str, Any], int]:
        parts = [urllib.parse.unquote(p) for p in path.split("/") if p]
        if (
            len(parts) == 5
            and parts[:4] == ["v1", "namespaces", "default", "tables"]
        ):
            return self._commit_table(parts[4], req)
        return {"error": "not found"}, 404

    def _commit_table(
        self, name: str, req: dict[str, Any]
    ) -> tuple[dict[str, Any], int]:
        """CAS pointer swap: apply the writer's prepared version doc iff
        every requirement still holds against the CURRENT table state —
        the shape of the real REST protocol's CommitTableRequest
        (requirements + updates → 200, or 409 CommitFailedException
        telling the writer to refresh and rebase)."""
        loc = self._tables.get(name)
        if loc is None:
            return {"error": "no such table"}, 404
        doc = req.get("metadata")
        if not isinstance(doc, dict):
            return {"error": "missing metadata document"}, 400
        asserted = None
        try:
            for r in req.get("requirements", []):
                if r.get("type") == "assert-table-version":
                    asserted = int(r["version"])
        except (KeyError, TypeError, ValueError, AttributeError):
            # malformed requirement entries are a CLIENT error — reply
            # 400 instead of aborting the handler thread mid-response
            return {"error": "malformed requirements"}, 400
        if asserted is None:
            # An unconditional swap would be a lost-update machine;
            # refuse rather than guess (the real catalog likewise
            # requires assert-ref-snapshot-id for branch writes).
            return {"error": "missing assert-table-version requirement"}, 400
        with self._commit_lock:
            cur = M.read_current(loc)
            if cur.version != asserted:
                return {
                    "error": "CommitFailedException",
                    "message": (
                        f"requirement failed: table {name} is at version "
                        f"{cur.version}, commit asserted {asserted}"
                    ),
                    "current_version": cur.version,
                }, 409
            try:
                committed = M.commit(M.TableMeta(doc, asserted, loc))
            except M.CommitConflict as exc:
                # a direct-filesystem writer claimed v<N+1> between our
                # read and the link — same client-visible outcome
                return {
                    "error": "CommitFailedException",
                    "message": str(exc),
                    "current_version": M.read_current(loc).version,
                }, 409
        return {
            "metadata-location": M.metadata_path(loc, committed.version),
            "location": loc,
            "metadata": committed.doc,
        }, 200


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
                # A 404 here usually means the pinned doc's manifests
                # were GC'd (same typed error as the filesystem path:
                # SnapshotExpired, not a transport error) — but a
                # misconfigured base URL / wrong namespace / dropped
                # table 404s identically, so distinguish: if the TABLE
                # endpoint itself is gone, report a catalog problem
                # instead of blaming expire_snapshots.
                table_url = (
                    f"{self._base_url}/v1/namespaces/default/tables/"
                    f"{self._name}"
                )
                try:
                    urllib.request.urlopen(table_url, timeout=5).close()
                except (urllib.error.URLError, OSError):
                    # NOT SnapshotExpired: a dead/misconfigured catalog
                    # must not be catchable as the GC'd-snapshot case
                    # (SnapshotExpired subclasses FileNotFoundError,
                    # which best-effort sweep loops suppress)
                    raise RuntimeError(
                        f"catalog GET {url} returned 404 and the table "
                        f"endpoint {table_url} is unreachable too — "
                        "check the catalog base URL / namespace / table "
                        "name before attributing this to snapshot GC"
                    ) from None
                raise M.SnapshotExpired(
                    f"metadata file {rel_path} for table {self._name} "
                    f"is gone from the catalog (GET {url} -> 404; "
                    "garbage-collected by expire_snapshots); this "
                    "pinned metadata version can no longer be "
                    "materialized"
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
    """Client for :class:`RestCatalogServer` — reads AND arbitrated
    writes (the commit POST)."""

    def __init__(self, base_url: str) -> None:
        self.base_url = base_url.rstrip("/")

    def _get(self, path: str) -> dict[str, Any]:
        with urllib.request.urlopen(f"{self.base_url}{path}") as resp:
            return json.loads(resp.read())

    def _post(self, path: str, payload: dict[str, Any]) -> dict[str, Any]:
        req = urllib.request.Request(
            f"{self.base_url}{path}",
            data=json.dumps(payload, default=str).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as exc:
            detail = exc.read().decode(errors="replace")
            if exc.code == 409:
                # surface the SAME typed conflict as the filesystem
                # commit point, so IceTable's optimistic-retry loops
                # rebase through a catalog exactly as they do through
                # os.link losses
                raise M.CommitConflict(
                    f"catalog rejected commit ({exc.code}): {detail}"
                ) from None
            raise RuntimeError(
                f"catalog POST {path} failed ({exc.code}): {detail}"
            ) from None

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

    # -- arbitrated writes ----------------------------------------------
    def commit_table(self, name: str, meta: M.TableMeta) -> RemoteTableMeta:
        """One optimistic commit attempt through the catalog.

        Writer-side: shard this attempt's snapshots into manifest
        sidecars in storage (``prepare_commit_doc`` — the writer owns
        its metadata FILES, same as the real protocol), then ship the
        version document with an assert-table-version requirement
        pinned to the version this mutation was planned against.
        Raises ``meta.CommitConflict`` on 409 so callers' retry loops
        refresh + rebase."""
        doc = M.prepare_commit_doc(meta)
        body = self._post(
            f"/v1/namespaces/default/tables/{name}",
            {
                "requirements": [
                    {"type": "assert-table-version", "version": meta.version}
                ],
                "metadata": doc,
            },
        )
        version = int(
            os.path.basename(body["metadata-location"])[1:].split(".")[0]
        )
        return RemoteTableMeta(
            body["metadata"], version, body["location"], self.base_url, name
        )

    def attach_writer(self, spark: Any, name: str) -> Any:
        """An :class:`IceTable` handle whose COMMIT POINT is this
        catalog: reads fetch metadata over HTTP (RemoteTableMeta) and
        every commit goes through ``commit_table``'s CAS requirement,
        refreshing from the catalog on conflict. Two attach_writer
        handles appending concurrently both land (blind-append rebase);
        a conflicting schema change still raises — the arbitration the
        reference delegates to its REST catalog container."""
        from iceberg_workshop_spark.icetbl.table import IceTable

        tbl = IceTable(spark, self.load_table(name))
        tbl.set_commit_arbiter(
            committer=lambda meta: self.commit_table(name, meta),
            refresher=lambda: self.load_table(name),
        )
        return tbl
