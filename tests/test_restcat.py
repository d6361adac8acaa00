"""REST-catalog shim (icetbl/restcat.py) unit surface beyond the
registered round trip (q_catalog_rest): protocol shape, 404s, remote
manifest fetches and their caching, and agreement between a
RemoteTableMeta and the same table opened from disk.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from iceberg_workshop_spark.icetbl import meta as M
from iceberg_workshop_spark.icetbl.restcat import (
    RestCatalogClient,
    RestCatalogServer,
)
from iceberg_workshop_spark.icetbl.table import IceTable


@pytest.fixture()
def served_table(spark, tmp_path):
    loc = str(tmp_path / "t")
    t = IceTable.create_as(
        spark, loc, spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    )
    t.insert_values([(3, "c")])
    srv = RestCatalogServer()
    srv.register("t", loc)
    base = srv.start()
    yield srv, base, loc
    srv.stop()


def _get(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.loads(r.read())


def test_protocol_shape_and_404s(served_table):
    srv, base, loc = served_table
    assert _get(base, "/v1/config") == {"defaults": {}, "overrides": {}}
    assert _get(base, "/v1/namespaces") == {"namespaces": [["default"]]}
    ids = _get(base, "/v1/namespaces/default/tables")["identifiers"]
    assert ids == [{"namespace": ["default"], "name": "t"}]
    doc = _get(base, "/v1/namespaces/default/tables/t")
    assert doc["location"] == loc
    assert doc["metadata"]["current_snapshot_id"] is not None
    # metadata-location points at the CURRENT version on disk
    assert doc["metadata-location"].endswith(
        f"v{M.read_current(loc).version}.json"
    )
    for missing in (
        "/v1/namespaces/default/tables/nope",
        "/v1/namespaces/default/tables/t/manifests/mf-nope.json",
        "/v1/not-a-route",
    ):
        with pytest.raises(urllib.error.HTTPError) as exc:
            _get(base, missing)
        assert exc.value.code == 404


def test_remote_meta_matches_disk_and_caches(served_table):
    srv, base, loc = served_table
    cli = RestCatalogClient(base)
    remote = cli.load_table("t")
    disk = M.read_current(loc)
    n_before = srv.n_requests
    remote_files = sorted(f["path"] for f in remote.current_files())
    assert remote_files == sorted(f["path"] for f in disk.current_files())
    assert srv.n_requests > n_before, "manifests must be fetched over HTTP"
    n_after = srv.n_requests
    # second materialization: every manifest comes from the client cache
    assert sorted(f["path"] for f in remote.current_files()) == remote_files
    assert srv.n_requests == n_after
    # path traversal in manifest names is neutralized (basename only)
    with pytest.raises(urllib.error.HTTPError):
        _get(
            base,
            "/v1/namespaces/default/tables/t/manifests/..%2F..%2Fetc%2Fpasswd",
        )


def test_remote_pinned_read_of_expired_snapshot_raises_typed(spark, served_table):
    """The REST path mirrors the filesystem contract: a pinned remote
    handle whose snapshot's metadata files were GC'd raises
    SnapshotExpired (via the catalog's 404), not a raw HTTPError."""
    import pytest

    from iceberg_workshop_spark.icetbl import meta as M
    from iceberg_workshop_spark.icetbl.restcat import RestCatalogClient

    srv, base, loc = served_table
    cli = RestCatalogClient(base)
    pinned = cli.load_table("t")  # holds the pre-expire metadata doc
    t = IceTable.load(spark, loc)
    t.truncate()
    t.insert_values([(9, "z")])
    t.expire_snapshots(older_than_ms=M.now_ms() + 1)
    with pytest.raises(M.SnapshotExpired):
        pinned.current_files()
