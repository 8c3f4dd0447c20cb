"""Push-plane HTTP server — the literal ``swarm serve`` analogue.

Routes mirror the reference (pkg/controller/server/server.go:94-103):

* ``POST /event/pubsub/cs`` — Pub/Sub push envelope wrapping ONE
  cloud-storage object-finalize event.
* ``POST /event/pubsub/swarm`` — envelope wrapping a pre-batched work
  item (``{"objects": [...]}``), the reference's swarm-event route.
* ``GET /healthz`` — liveness.

Request lifecycle (pkg/controller/server/server.go:112-165):
middleware chain (logging → auth → load-shed) → envelope decode →
STATE ACQUIRE: already completed → 200 skip; another worker running →
205 Reset Content (forces Pub/Sub redelivery, server.go:126-151); else
run the partition and commit. A failed run returns 500 and leaves the
partition uncommitted, so redelivery re-processes it from scratch —
deterministic log_ids make that idempotent.

Envelope decode is the literal M8 decoder
(pkg/domain/model/message.go:44-104): base64 ``message.data`` body,
``size`` string→int, ``md5Hash`` base64→hex, ``timeCreated`` RFC3339
parse. The auth middleware is the M7 policy plane
(pkg/controller/server/middleware.go:17-46) evaluated over the real
HTTP request; the load-shed middleware ≙ the memory-limit 429
(middleware.go:91-108), keyed on in-flight ingests here because Ray's
object store — not the server heap — holds the data.

State machine (pkg/usecase/state.go:13-73): running→completed maps to
the partition heartbeat + ``_DONE`` manifest the batch job mode
already uses — serve and job share ONE checkpoint store, so push and
pull workers can drain the same spool concurrently without
double-ingesting, exactly the reference's Firestore contract.
"""

from __future__ import annotations

import base64
import binascii
import hashlib
import json
import threading
import time
from dataclasses import dataclass
from datetime import datetime
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Any
from urllib.parse import parse_qs, urlparse


class BadEnvelope(Exception):
    """Malformed Pub/Sub envelope or event body (≙ 400 paths in
    server.go:112-124)."""


@dataclass(frozen=True)
class ObjectMeta:
    """Decoded cloud-storage object event (≙ model.Object from
    CloudStorageEvent.ToObject(), message.go:61-104)."""

    name: str
    bucket: str = ""
    size: int | None = None
    md5_hex: str | None = None
    created: datetime | None = None


def decode_envelope(body: bytes) -> dict:
    """Pub/Sub push envelope → inner event dict: JSON
    ``{"message": {"data": base64(json)}}`` (message.go:44-59)."""
    try:
        env = json.loads(body)
        data = env["message"]["data"]
        evt = json.loads(base64.b64decode(data, validate=True))
    except (KeyError, TypeError, ValueError, binascii.Error) as e:
        raise BadEnvelope(f"bad pubsub envelope: {e}") from e
    if not isinstance(evt, dict):
        # valid JSON but not an object (e.g. a bare list/number): the
        # route handlers call .get on it — without this check that
        # AttributeError escaped the BadEnvelope clause and the client
        # saw a dropped connection instead of the 400 contract
        raise BadEnvelope("pubsub event payload is not a JSON object")
    return evt


def event_to_object(evt: dict) -> ObjectMeta:
    """Cloud-storage event → ObjectMeta, with the reference's lenient
    field parses: size is a DECIMAL STRING, md5Hash is BASE64 (hex out),
    timeCreated is RFC3339 (message.go:61-104). Only ``name`` is
    required; everything else decodes best-effort to None."""
    name = evt.get("name")
    if not name or not isinstance(name, str):
        raise BadEnvelope("cloud-storage event without object name")
    size = None
    try:
        size = int(evt["size"])
    except (KeyError, TypeError, ValueError):
        pass
    md5_hex = None
    try:
        md5_hex = base64.b64decode(evt["md5Hash"], validate=True).hex()
    except (KeyError, TypeError, ValueError, binascii.Error):
        pass
    created = None
    try:
        created = datetime.fromisoformat(
            str(evt["timeCreated"]).replace("Z", "+00:00"))
    except (KeyError, TypeError, ValueError):
        pass
    return ObjectMeta(name=name, bucket=str(evt.get("bucket", "")),
                      size=size, md5_hex=md5_hex, created=created)


def content_pid(paths: list[str]) -> str:
    """Content-addressed partition id — the SAME recipe as
    ``plan_incremental`` (state/checkpoint.py), so a push-delivered
    object and a pull-planned chunk of the same file set share a
    checkpoint entry."""
    return hashlib.md5(json.dumps(sorted(paths)).encode()).hexdigest()[:12]


class ServeApp:
    """The push worker's application state: one checkpoint store, one
    compiled ruleset, one broadcast intel table — compiled ONCE at
    server construction (≙ the reference wiring clients in
    serve.go:109-228), shared by every request thread."""

    def __init__(self, out_dir: str | Path, ruleset=None, intel=None,
                 auth_rules: list | None = None, max_inflight: int = 4):
        from .rules.spec import default_ruleset
        self.out_dir = Path(out_dir)
        self.ruleset = ruleset or default_ruleset()
        self.intel = intel
        self.auth_rules = auth_rules or []
        self.max_inflight = max_inflight
        self._lock = threading.Lock()
        self._running: set[str] = set()
        self._inflight = 0

    # ---------------------------------------------------- load shedding

    def try_acquire_slot(self) -> bool:
        """≙ the memory-limit middleware's 429 (middleware.go:91-108):
        shed load before starting another streaming ingest."""
        with self._lock:
            if self._inflight >= self.max_inflight:
                return False
            self._inflight += 1
            return True

    def release_slot(self) -> None:
        with self._lock:
            self._inflight -= 1

    # ---------------------------------------------------- state acquire

    def _other_worker_running(self, pid: str) -> bool:
        """A fresh heartbeat in the partition dir means ANOTHER process
        (a pull worker, or a sibling push server) is mid-ingest — the
        reference answers 205 so Pub/Sub redelivers after its ack
        deadline (server.go:126-151)."""
        from .state.checkpoint import HEARTBEAT_INTERVAL_S, HEARTBEAT_NAME
        hb = self.out_dir / f"partition={pid}" / HEARTBEAT_NAME
        try:
            return time.time() - hb.stat().st_mtime < 2 * HEARTBEAT_INTERVAL_S
        except OSError:
            return False

    def handle_objects(self, paths: list[str]) -> tuple[int, dict]:
        """Run the flagship ingest for one delivered object set under
        the shared checkpoint contract. Returns (http_status, body)."""
        from .pipelines.flagship import run_partition
        from .state.checkpoint import PartitionPlan, is_done

        missing = [p for p in paths if not Path(p).exists()]
        if missing:
            return 400, {"error": f"no such object(s): {missing}"}
        pid = content_pid(paths)
        if is_done(self.out_dir, pid):       # skip-if-completed
            return 200, {"status": "completed", "partition_id": pid,
                         "skipped": True}
        with self._lock:
            if pid in self._running:
                return 205, {"status": "running", "partition_id": pid}
            self._running.add(pid)
        try:
            if self._other_worker_running(pid):
                return 205, {"status": "running", "partition_id": pid}
            manifest = run_partition(
                PartitionPlan(pid, sorted(paths)), self.out_dir,
                self.ruleset, self.intel)
            return 200, {"status": "completed", "skipped": False,
                         **manifest}
        except Exception as e:               # stays uncommitted → redelivery
            return 500, {"status": "failed", "partition_id": pid,
                         "error": str(e)}
        finally:
            with self._lock:
                self._running.discard(pid)


class _Handler(BaseHTTPRequestHandler):
    """One request = middleware chain + route dispatch. The app rides
    on the server object (set by ``make_server``)."""

    server_version = "swarm-ray-serve/1"
    quiet = True

    @property
    def app(self) -> ServeApp:
        return self.server.app  # type: ignore[attr-defined]

    def log_message(self, fmt: str, *args: Any) -> None:
        if not self.quiet:                   # logging middleware
            super().log_message(fmt, *args)

    def _reply(self, status: int, body: dict) -> None:
        data = json.dumps(body).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _authorized(self, body: bytes) -> bool:
        """Auth middleware (M7): default-allow, deny → 401
        (middleware.go:17-46)."""
        from .rules.auth import AuthPolicyInput, Unauthorized, authorize
        u = urlparse(self.path)
        inp = AuthPolicyInput(
            method=self.command,
            path=u.path,
            remote=self.client_address[0],
            query={k: v for k, v in parse_qs(u.query).items()},
            header={k.lower(): v for k, v in self.headers.items()},
            body=body.decode(errors="replace"),
        )
        try:
            authorize(inp, self.app.auth_rules)
            return True
        except Unauthorized as e:
            self._reply(401, {"error": str(e)})
            return False

    def do_GET(self) -> None:
        if urlparse(self.path).path == "/healthz":
            self._reply(200, {"ok": True})
        else:
            self._reply(404, {"error": "not found"})

    def do_POST(self) -> None:
        route = urlparse(self.path).path
        if route not in ("/event/pubsub/cs", "/event/pubsub/swarm"):
            self._reply(404, {"error": "not found"})
            return
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        if not self._authorized(body):
            return
        if not self.app.try_acquire_slot():  # load-shed middleware
            self._reply(429, {"error": "too many in-flight ingests"})
            return
        try:
            evt = decode_envelope(body)
            if route == "/event/pubsub/cs":
                paths = [event_to_object(evt).name]
            else:                            # pre-batched swarm work item
                objs = evt.get("objects")
                if not isinstance(objs, list) or not objs:
                    raise BadEnvelope("swarm event without objects list")
                paths = [event_to_object(o).name if isinstance(o, dict)
                         else str(o) for o in objs]
            status, out = self.app.handle_objects(paths)
        except BadEnvelope as e:
            status, out = 400, {"error": str(e)}
        finally:
            self.app.release_slot()
        self._reply(status, out)


def make_server(app: ServeApp, host: str = "127.0.0.1",
                port: int = 0, quiet: bool = True) -> ThreadingHTTPServer:
    """Construct (not start) the push server; ``port=0`` binds an
    ephemeral port (``server.server_address[1]`` reports it)."""
    handler = type("Handler", (_Handler,), {"quiet": quiet})
    srv = ThreadingHTTPServer((host, port), handler)
    srv.app = app  # type: ignore[attr-defined]
    return srv


def cmd_serve(args) -> dict:
    """CLI entry: build the app, serve until interrupted."""
    from .rules.auth import load_auth_rules
    from .rules.load import load_ruleset

    ruleset = load_ruleset(args.rules) if args.rules else None
    auth = load_auth_rules(args.serve_auth_rules) \
        if getattr(args, "serve_auth_rules", None) else []
    app = ServeApp(args.out, ruleset=ruleset, auth_rules=auth,
                   max_inflight=args.max_inflight)
    srv = make_server(app, host=args.host, port=args.port, quiet=False)
    host, port = srv.server_address[:2]
    print(json.dumps({"serving": f"http://{host}:{port}",
                      "out": str(args.out)}), flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
    return {"mode": "serve", "stopped": True}
