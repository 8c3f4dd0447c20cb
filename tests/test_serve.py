"""Push-plane HTTP server (serve.py): envelope decode, auth + load-shed
middlewares, and the shared-checkpoint state machine (skip-completed /
205-while-running / failure-leaves-uncommitted)."""

import base64
import http.client
import json
import threading
import time
from pathlib import Path

import pytest

from swarm_ray.serve import (BadEnvelope, ObjectMeta, ServeApp, content_pid,
                             decode_envelope, event_to_object, make_server)


def _envelope(event: dict) -> bytes:
    return json.dumps({
        "message": {"data": base64.b64encode(
            json.dumps(event).encode()).decode(),
            "messageId": "m-1"},
        "subscription": "projects/x/subscriptions/y",
    }).encode()


def _post(port: int, route: str, body: bytes,
          headers: dict | None = None) -> tuple[int, dict]:
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    try:
        conn.request("POST", route, body=body,
                     headers={"Content-Type": "application/json",
                              **(headers or {})})
        r = conn.getresponse()
        return r.status, json.loads(r.read() or b"{}")
    finally:
        conn.close()


@pytest.fixture()
def server(tmp_path):
    app = ServeApp(tmp_path / "out", max_inflight=2)
    srv = make_server(app)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1], app, tmp_path / "out"
    srv.shutdown()
    srv.server_close()


# ------------------------------------------------------------- decoders (M8)

def test_envelope_decode_literal_fields():
    evt = {"name": "/data/obj.parquet", "bucket": "b",
           "size": "12345",                      # decimal STRING
           "md5Hash": base64.b64encode(bytes(range(16))).decode(),
           "timeCreated": "2024-05-06T07:08:09Z"}
    got = event_to_object(decode_envelope(_envelope(evt)))
    assert got == ObjectMeta(
        name="/data/obj.parquet", bucket="b", size=12345,
        md5_hex=bytes(range(16)).hex(),
        created=got.created)
    assert got.created.isoformat() == "2024-05-06T07:08:09+00:00"


def test_envelope_decode_lenient_and_malformed():
    # optional fields decode best-effort to None
    got = event_to_object({"name": "x", "size": "not-a-number",
                           "md5Hash": "!!!", "timeCreated": "yesterday"})
    assert (got.size, got.md5_hex, got.created) == (None, None, None)
    for bad in (b"not json", b"{}",
                json.dumps({"message": {"data": "%%%"}}).encode()):
        with pytest.raises(BadEnvelope):
            decode_envelope(bad)
    with pytest.raises(BadEnvelope):
        event_to_object({"bucket": "no-name"})


# ------------------------------------------------------------- HTTP surface

def test_healthz_and_unknown_routes(server):
    port, _, _ = server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    conn.request("GET", "/healthz")
    assert conn.getresponse().status == 200
    conn.close()
    assert _post(port, "/event/pubsub/nope", b"{}")[0] == 404


def test_bad_envelope_is_400(server):
    port, _, _ = server
    status, body = _post(port, "/event/pubsub/cs", b"not json")
    assert status == 400 and "envelope" in body["error"]
    status, body = _post(port, "/event/pubsub/cs",
                         _envelope({"name": "/no/such/file.parquet"}))
    assert status == 400 and "no such object" in body["error"]
    # valid JSON but not an object: must be a 400, not a dropped
    # connection from .get() on a list (review finding)
    status, body = _post(port, "/event/pubsub/swarm", _envelope([1, 2]))
    assert status == 400 and "not a JSON object" in body["error"]
    status, body = _post(port, "/event/pubsub/cs", _envelope([1, 2]))
    assert status == 400 and "not a JSON object" in body["error"]


def test_ingest_skip_completed_and_shared_checkpoint(
        server, ray_session, tiny_seq_files):
    port, _, out = server
    path = tiny_seq_files[0]
    ev = _envelope({"name": path})

    status, body = _post(port, "/event/pubsub/cs", ev)
    assert status == 200 and body["status"] == "completed"
    assert body["skipped"] is False and body["rows_in"] > 0
    sinks = list(Path(out).glob("partition=*/sink_dataset=*/sink_table=*"))
    assert sinks, "ingest wrote no sink output"

    # redelivery of a completed message: acked with a skip, no rerun
    status, body = _post(port, "/event/pubsub/cs", ev)
    assert status == 200 and body["skipped"] is True

    # the batch job mode sees the SAME checkpoint: nothing pending
    from swarm_ray.pipelines.flagship import run_job
    assert run_job([path], out, files_per_partition=1,
                   incremental=True) == []


def test_swarm_route_batches_objects(server, ray_session, tiny_seq_files):
    port, _, out = server
    paths = sorted(tiny_seq_files[:2])
    ev = _envelope({"objects": [{"name": p} for p in paths]})
    status, body = _post(port, "/event/pubsub/swarm", ev)
    assert status == 200 and body["partition_id"] == content_pid(paths)
    status, body = _post(port, "/event/pubsub/swarm", ev)
    assert body["skipped"] is True
    # malformed work item
    assert _post(port, "/event/pubsub/swarm",
                 _envelope({"objects": []}))[0] == 400


def test_running_elsewhere_returns_205(server, tiny_seq_files):
    """A fresh heartbeat from another worker forces 205 (redeliver)."""
    port, _, out = server
    path = tiny_seq_files[0]
    pid = content_pid([path])
    part = Path(out) / f"partition={pid}"
    part.mkdir(parents=True)
    from swarm_ray.state.checkpoint import HEARTBEAT_NAME
    (part / HEARTBEAT_NAME).touch()
    status, body = _post(port, "/event/pubsub/cs", _envelope({"name": path}))
    assert status == 205 and body["status"] == "running"


def test_auth_middleware_401(tmp_path, tiny_seq_files):
    from swarm_ray.rules.auth import AuthRule
    from swarm_ray.rules.spec import Cond
    deny = AuthRule(name="no-anon", deny=True, where=(
        Cond("header.x-api-key", "eq", "anonymous"),))
    app = ServeApp(tmp_path / "out", auth_rules=[deny])
    srv = make_server(app)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        port = srv.server_address[1]
        ev = _envelope({"name": tiny_seq_files[0]})
        status, body = _post(port, "/event/pubsub/cs", ev,
                             headers={"X-Api-Key": "anonymous"})
        assert status == 401 and "no-anon" in body["error"]
        # same request, different key: passes the gate (default-allow)
        status, _ = _post(port, "/event/pubsub/cs", ev,
                          headers={"X-Api-Key": "team-a"})
        assert status in (200, 500)  # authorized (ray may not be up here)
    finally:
        srv.shutdown()
        srv.server_close()


def test_load_shed_429(server, monkeypatch, tiny_seq_files):
    port, app, _ = server
    release = threading.Event()

    def slow_handle(paths):
        release.wait(30)
        return 200, {"status": "completed", "skipped": True}

    monkeypatch.setattr(app, "handle_objects", slow_handle)
    ev = _envelope({"name": tiny_seq_files[0]})
    results = []
    threads = [threading.Thread(
        target=lambda: results.append(_post(port, "/event/pubsub/cs", ev)))
        for _ in range(3)]
    for t in threads:
        t.start()
    deadline = time.time() + 10            # max_inflight=2 → third sheds
    while not any(s == 429 for s, _ in results) and time.time() < deadline:
        time.sleep(0.05)
    release.set()
    for t in threads:
        t.join(timeout=30)
    statuses = sorted(s for s, _ in results)
    assert statuses == [200, 200, 429]
