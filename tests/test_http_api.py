"""HTTP facade tests: in-process WSGI client, no sockets. Route, status
code, and error-shape parity with the reference FastAPI app (main.py);
every route is a thin delegate, so these are integration tests of the
library driven through the service surface."""

import pytest

from feature_store_implementation_spark.service import create_app


@pytest.fixture()
def client(fs):
    app = create_app(fs)
    app.testing = True
    return app.test_client()


def _setup(client):
    rt = client.post(
        "/api/v1/raw-tables",
        json={
            "name": "transactions",
            "schema_definition": {"required_columns": ["id", "amount"]},
        },
    )
    assert rt.status_code == 201
    f = client.post(
        "/api/v1/features",
        json={
            "name": "total_amount",
            "raw_table_id": rt.get_json()["id"],
            "computation_logic": "SUM(amount)",
            "feature_type": "numeric",
        },
    )
    assert f.status_code == 201
    return rt.get_json(), f.get_json()


def test_health(client):
    r = client.get("/api/v1/health")
    assert r.status_code == 200
    assert r.get_json() == {"status": "healthy", "service": "feature-store"}


def test_full_lifecycle_over_http(client):
    rt, f = _setup(client)

    v = client.post(
        f"/api/v1/features/{f['id']}/versions",
        json={
            "version": "v1.0",
            "data": [
                {"id": "u1", "amount": 10.0},
                {"id": "u1", "amount": 5.0},
                {"id": "u2", "amount": 7.5},
            ],
        },
    )
    assert v.status_code == 201
    assert v.get_json()["status"] == "active"

    vec = client.post("/api/v1/feature-vectors", json={"entity_id": "u1"})
    assert vec.status_code == 200
    body = vec.get_json()
    assert body["entity_id"] == "u1"
    assert body["features"] == {"total_amount": 15.0}

    versions = client.get(f"/api/v1/features/{f['id']}/versions")
    assert [row["version"] for row in versions.get_json()] == ["v1.0"]

    tables = client.get("/api/v1/raw-tables")
    assert [t["name"] for t in tables.get_json()] == ["transactions"]
    one = client.get(f"/api/v1/raw-tables/{rt['id']}")
    assert one.get_json()["schema_definition"] == rt["schema_definition"]


def test_error_status_parity(client):
    rt, f = _setup(client)

    # 400: duplicate raw-table name (main.py:47-52)
    dup = client.post(
        "/api/v1/raw-tables", json={"name": "transactions", "schema_definition": {}}
    )
    assert dup.status_code == 400
    assert "already exists" in dup.get_json()["detail"]

    # 404: feature FK missing (main.py:97-103)
    bad_fk = client.post(
        "/api/v1/features",
        json={
            "name": "x",
            "raw_table_id": 999,
            "computation_logic": "SUM(amount)",
            "feature_type": "numeric",
        },
    )
    assert bad_fk.status_code == 404

    # 400: schema validation (main.py:194-199)
    bad_schema = client.post(
        f"/api/v1/features/{f['id']}/versions",
        json={"version": "v1", "data": [{"id": "u1"}]},
    )
    assert bad_schema.status_code == 400

    # 404: vector for unknown entity (main.py:312-316)
    missing = client.post("/api/v1/feature-vectors", json={"entity_id": "nobody"})
    assert missing.status_code == 404

    # 400: duplicate (feature, version) pair (main.py:163-172)
    client.post(
        f"/api/v1/features/{f['id']}/versions",
        json={"version": "v1", "data": [{"id": "u1", "amount": 1.0}]},
    )
    dup_v = client.post(
        f"/api/v1/features/{f['id']}/versions",
        json={"version": "v1", "data": [{"id": "u1", "amount": 1.0}]},
    )
    assert dup_v.status_code == 400

    # 404: versions listing for a missing feature (main.py:238-241)
    assert client.get("/api/v1/features/999/versions").status_code == 404


def test_startup_recovery_runs(fs):
    """create_app(recover=True) sweeps dead-writer pending versions."""
    rt = fs.register_raw_table("t", {"required_columns": ["id", "v"]})
    feat = fs.create_feature("f", rt.id, "SUM(v)", "numeric")
    dead = fs.catalog.create_version(feat.id, "v9", status="pending")
    create_app(fs)
    assert fs.catalog.list_pending() == []
    with pytest.raises(Exception):
        fs.catalog.get_version(dead.id)


def test_online_snapshot_routes(client, tmp_path):
    """Extension routes: export the snapshot over HTTP, then point-read it
    back — the returned vector must match the batch-tier serve_vector
    (shared codec), an unknown entity is a 404 router miss, and the
    lookup schedules ZERO Spark jobs (it never touches the JVM)."""
    _, f = _setup(client)
    v = client.post(
        f"/api/v1/features/{f['id']}/versions",
        json={
            "version": "v1.0",
            "data": [
                {"id": "u1", "amount": 10.0},
                {"id": "u1", "amount": 5.0},
                {"id": "u2", "amount": 7.5},
            ],
        },
    )
    assert v.status_code == 201

    exp = client.post(
        "/api/v1/online-snapshots", json={"name": "daily", "n_shards": 4}
    )
    assert exp.status_code == 201
    assert exp.get_json() == {"name": "daily", "n_shards": 4, "rows": 2}

    # frozen-export contract: re-export under a live name is a 400 conflict
    dup = client.post(
        "/api/v1/online-snapshots", json={"name": "daily", "n_shards": 4}
    )
    assert dup.status_code == 400
    assert "already exists" in dup.get_json()["detail"]

    # names are validated — a path can never escape snapshot_root
    for bad in ("../escape", "/etc/x", "a/b", ".hidden"):
        r = client.post("/api/v1/online-snapshots", json={"name": bad})
        assert r.status_code == 400, bad

    batch = client.post("/api/v1/feature-vectors", json={"entity_id": "u1"})

    from feature_store_implementation_spark.session import get_spark

    sc = get_spark().sparkContext
    sc.setJobGroup("snapshot-http", "must stay empty")
    tracker = sc.statusTracker()
    online = client.post(
        "/api/v1/online-feature-vectors",
        json={"snapshot": "daily", "entity_id": "u1"},
    )
    assert tracker.getJobIdsForGroup("snapshot-http") == []
    sc.setJobGroup(None, None)
    assert online.status_code == 200
    got, want = online.get_json(), batch.get_json()
    assert got["entity_id"] == "u1"
    assert got["features"] == want["features"] == {"total_amount": 15.0}

    miss = client.post(
        "/api/v1/online-feature-vectors",
        json={"snapshot": "daily", "entity_id": "nobody"},
    )
    assert miss.status_code == 404
    assert "detail" in miss.get_json()


def test_startup_recovery_min_age_knob_spares_live_writer(fs):
    """Multi-instance deployments must be able to start a second service
    without sweeping a LIVE writer's pending version (review r10):
    create_app passes recover_min_age_seconds through to the sweep, so a
    young pending row survives startup while an old/unattributable one
    still sweeps."""
    rt = fs.register_raw_table("t_knob", {"required_columns": ["id", "v"]})
    feat = fs.create_feature("f_knob", rt.id, "SUM(v)", "numeric")
    live = fs.catalog.create_version(feat.id, "v_live", status="pending")
    create_app(fs, recover_min_age_seconds=3600)
    assert [p.id for p in fs.catalog.list_pending()] == [live.id]
    create_app(fs)  # default 0: startup of the ONLY instance sweeps it
    assert fs.catalog.list_pending() == []


def test_online_snapshot_lookup_parity_missing_feature_shapes(client, tmp_path):
    """Tier parity (B8): a feature an entity LACKS is omitted from the
    snapshot vector (not returned as null), and a feature_names filter
    matching nothing the entity holds is a 404 miss — the same shapes
    serve_vector produces (review r10)."""
    rt, f1 = _setup(client)
    f2 = client.post(
        "/api/v1/features",
        json={
            "name": "other_amt",
            "raw_table_id": rt["id"],
            "computation_logic": "SUM(amount)",
            "feature_type": "numeric",
        },
    ).get_json()
    # e1 holds BOTH features; e2 holds only total_amount
    client.post(
        f"/api/v1/features/{f1['id']}/versions",
        json={"version": "v1", "data": [{"id": "e1", "amount": 1.0},
                                        {"id": "e2", "amount": 2.0}]},
    )
    client.post(
        f"/api/v1/features/{f2['id']}/versions",
        json={"version": "v1", "data": [{"id": "e1", "amount": 5.0}]},
    )
    assert client.post(
        "/api/v1/online-snapshots", json={"name": "par", "n_shards": 2}
    ).status_code == 201

    def online(body):
        return client.post("/api/v1/online-feature-vectors", json=body)

    r = online({"snapshot": "par", "entity_id": "e2"})
    assert r.status_code == 200
    assert r.get_json()["features"] == {"total_amount": 2.0}  # no null cell

    r = online({"snapshot": "par", "entity_id": "e2",
                "feature_names": ["other_amt"]})
    assert r.status_code == 404  # nothing held → miss, like serve_vector


def test_online_snapshot_sync_route(client, fs, tmp_path):
    """POST /online-snapshots/<name>/sync: 404 unknown name, 200 no-op on
    a drained window, 200 with fresh values after a store-level update,
    409 (re-export taxonomy) once version resolution drifts."""
    _, f = _setup(client)
    v = client.post(
        f"/api/v1/features/{f['id']}/versions",
        json={"version": "v1.0", "data": [{"id": "u1", "amount": 10.0}]},
    )
    assert v.status_code == 201
    assert client.post(
        "/api/v1/online-snapshots", json={"name": "live", "n_shards": 2}
    ).status_code == 201

    assert client.post("/api/v1/online-snapshots/nope/sync").status_code == 404

    r = client.post("/api/v1/online-snapshots/live/sync")
    assert r.status_code == 200
    assert r.get_json()["changed_entities"] == 0

    vid = v.get_json()["id"]
    import pyspark.sql.functions as F  # noqa: F401

    more = fs.spark.createDataFrame(
        [("u9", "1.5")], "entity_id string, value string"
    )
    fs.store.write_values(vid, more)
    r = client.post("/api/v1/online-snapshots/live/sync")
    assert r.status_code == 200 and r.get_json()["changed_entities"] == 1
    got = client.post(
        "/api/v1/online-feature-vectors",
        json={"snapshot": "live", "entity_id": "u9"},
    )
    assert got.status_code == 200
    assert got.get_json()["features"] == {f["name"]: 1.5}

    # drift: activate a new version of the same feature -> conflict
    # (this facade maps ConflictError to 400, reference parity)
    assert client.post(
        f"/api/v1/features/{f['id']}/versions",
        json={"version": "v2.0", "data": [{"id": "u1", "amount": 1.0}]},
    ).status_code == 201
    r = client.post("/api/v1/online-snapshots/live/sync")
    assert r.status_code == 400
    assert "re-export" in r.get_json()["detail"]


def test_online_snapshot_sync_validates_max_changed(client, fs, tmp_path):
    """A malformed max_changed is a plain 400 VALIDATION error, not the
    ConflictError 're-export needed' taxonomy (ADVICE r10): the client sent
    garbage; the snapshot does not need a re-export."""
    _, f = _setup(client)
    assert client.post(
        f"/api/v1/features/{f['id']}/versions",
        json={"version": "v1.0", "data": [{"id": "u1", "amount": 10.0}]},
    ).status_code == 201
    assert client.post(
        "/api/v1/online-snapshots", json={"name": "val", "n_shards": 2}
    ).status_code == 201

    r = client.post(
        "/api/v1/online-snapshots/val/sync", json={"max_changed": "abc"}
    )
    assert r.status_code == 400
    detail = r.get_json()["detail"]
    assert "max_changed" in detail and "re-export" not in detail

    # a valid value still syncs
    r = client.post(
        "/api/v1/online-snapshots/val/sync", json={"max_changed": 5}
    )
    assert r.status_code == 200
