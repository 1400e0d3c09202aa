"""HTTP serving front-end over :class:`lie_vae_tpu.serve.InferenceSession`.

The reference has no serving story at all (its post-training inference is
notebook code at batch size 1, toy_results.ipynb / main.py:134-143); the
in-process :mod:`lie_vae_tpu.serve` session is this framework's serving
core, and this module puts a network endpoint in front of it:

- stdlib-only (``http.server``): no framework dependency to deploy;
- two wire formats, negotiated by Content-Type: ``.npz`` bodies for
  production clients (compact binary numpy, no JSON overhead) and JSON (nested lists)
  for curl/debug traffic — responses mirror the request format;
- device work is serialized behind one lock (the chip is effectively
  single-client; the session's padded-chunk pipelining still applies
  within a request, so large requests stream at full chip rate);
- every endpoint is fixed-shape under the hood: requests of any size are
  padded to the session's compiled batch (serve.py:_chunked), so the
  server never triggers a recompile.

Endpoints (all under ``/v1/``, POST unless noted):

  GET  /healthz       liveness + model/readiness metadata
  POST /v1/encode       {images}            -> {pose, sigma, sample}
  POST /v1/decode       {poses}             -> {images}
  POST /v1/reconstruct  {images}            -> {images}
  POST /v1/sample       {n, seed?}          -> {images, poses?}
  POST /v1/geodesic     {pose_a, pose_b, steps?} -> {frames}

Start it with ``python -m lie_vae_tpu.cli.serve http --artifact <npz>
<model flags> --port 8310`` (or ``--aot <npz>`` with no model flags), or
embed :class:`ServingApp` + :func:`make_server` in another process.
"""
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_MAX_BODY = 1 << 30  # 1 GiB: a 4096-image f32 64x64 RGB request is 201 MB


class ServingError(ValueError):
    """Client error (HTTP 400): bad route, missing field, bad shape."""


class ServingApp:
    """Route table over one session. Thread-safe: concurrent HTTP workers
    serialize device work behind ``_lock`` (the jitted calls share the
    session's RNG-key state, and the chip is single-client anyway)."""

    def __init__(self, session):
        self.session = session
        self._lock = threading.Lock()

    # every handler: dict of numpy arrays/scalars -> dict of numpy arrays
    def _encode(self, req):
        out = self.session.encode(_require(req, "images"))
        return {"pose": out["pose"], "sigma": out["sigma"],
                "sample": out["sample"]}

    def _decode(self, req):
        return {"images": self.session.decode(_require(req, "poses"))}

    def _reconstruct(self, req):
        return {"images": self.session.reconstruct(_require(req, "images"))}

    def _sample(self, req):
        n = int(np.asarray(req.get("n", 16)))
        if not 1 <= n <= 65536:
            raise ServingError(f"n={n} out of range [1, 65536]")
        seed = req.get("seed")
        seed = int(np.asarray(seed)) if seed is not None else None
        return {"images": self.session.sample(n, seed=seed)}

    def _geodesic(self, req):
        steps = int(np.asarray(req.get("steps", 16)))
        if not 2 <= steps <= 4096:
            raise ServingError(f"steps={steps} out of range [2, 4096]")
        return {"frames": self.session.geodesic(
            _require(req, "pose_a"), _require(req, "pose_b"), steps=steps)}

    ROUTES = {"encode": _encode, "decode": _decode,
              "reconstruct": _reconstruct, "sample": _sample,
              "geodesic": _geodesic}

    def handle(self, route, req):
        fn = self.ROUTES.get(route)
        if fn is None:
            raise ServingError(
                f"unknown route {route!r}; have {sorted(self.ROUTES)}")
        with self._lock:
            return fn(self, req)

    def health(self):
        m = self.session.model
        return {"status": "ok",
                "latent_mode": m.latent_mode,
                "out_shape": list(m.out_shape),
                "batch_size": self.session.batch_size,
                "routes": sorted(self.ROUTES)}


def _require(req, key):
    if key not in req:
        raise ServingError(f"missing field {key!r} (have {sorted(req)})")
    return np.asarray(req[key])


def _parse_body(content_type, body):
    """npz bytes or JSON object -> {name: numpy array / scalar}."""
    if "json" in (content_type or ""):
        try:
            obj = json.loads(body.decode())
        except (UnicodeDecodeError, json.JSONDecodeError) as e:
            raise ServingError(f"bad JSON body: {e}")
        if not isinstance(obj, dict):
            raise ServingError("JSON body must be an object")
        return {k: (np.asarray(v, np.float32) if isinstance(v, list) else v)
                for k, v in obj.items()}, "json"
    try:
        with np.load(io.BytesIO(body)) as z:
            return {k: z[k] for k in z.files}, "npz"
    except Exception as e:
        raise ServingError(
            f"body is neither .npz nor JSON (Content-Type "
            f"{content_type!r}): {e}")


def _pack_response(out, fmt):
    if fmt == "json":
        payload = {k: np.asarray(v).tolist() for k, v in out.items()}
        return json.dumps(payload).encode(), "application/json"
    buf = io.BytesIO()
    np.savez(buf, **{k: np.asarray(v) for k, v in out.items()})
    return buf.getvalue(), "application/x-npz"


def _make_handler(app):
    class Handler(BaseHTTPRequestHandler):
        # request logging off by default (one line per request is noise at
        # serving rates); errors still surface in responses
        def log_message(self, fmt, *args):
            pass

        def _reply(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _reply_error(self, code, message):
            self._reply(code, json.dumps({"error": message}).encode(),
                        "application/json")

        def do_GET(self):
            if self.path.rstrip("/") in ("", "/healthz"):
                body = json.dumps(app.health()).encode()
                self._reply(200, body, "application/json")
            else:
                self._reply_error(404, f"unknown path {self.path!r}")

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length > _MAX_BODY:
                    return self._reply_error(
                        413, f"body {length} B exceeds {_MAX_BODY} B")
                body = self.rfile.read(length)
                if not self.path.startswith("/v1/"):
                    return self._reply_error(
                        404, f"unknown path {self.path!r} (use /v1/<route>)")
                route = self.path[len("/v1/"):].strip("/")
                req, fmt = _parse_body(self.headers.get("Content-Type"),
                                       body)
                out = app.handle(route, req)
                self._reply(200, *_pack_response(out, fmt))
            except ServingError as e:
                self._reply_error(400, str(e))
            except BrokenPipeError:
                pass                      # client went away mid-response
            except Exception as e:        # noqa: BLE001 — a serving loop
                self._reply_error(500, f"{type(e).__name__}: {e}")

    return Handler


def make_server(session, host="127.0.0.1", port=0):
    """Build (but don't start) a threaded HTTP server over ``session``.

    Returns the ``ThreadingHTTPServer``; its bound port is
    ``server.server_address[1]`` (useful with port=0). Call
    ``serve_forever()`` (blocking) or drive it from a thread.
    """
    app = ServingApp(session)
    server = ThreadingHTTPServer((host, port), _make_handler(app))
    server.app = app
    return server


def serve(session, host="127.0.0.1", port=8310, warmup=True):
    """Warm the session, print the bound address, and serve forever."""
    if warmup:
        session.warmup()
    server = make_server(session, host=host, port=port)
    bound = server.server_address
    print(f"serving on http://{bound[0]}:{bound[1]} "
          f"(batch_size={session.batch_size}, "
          f"latent_mode={session.model.latent_mode})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return server
