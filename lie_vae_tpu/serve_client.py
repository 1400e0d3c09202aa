"""Python client for the :mod:`lie_vae_tpu.serve_http` endpoint.

The reference has no serving story (its post-training inference is
notebook code at batch size 1, toy_results.ipynb / main.py:134-143);
this framework serves over HTTP (`python -m lie_vae_tpu.cli.serve http`)
and this module is the matching client — stdlib-only (urllib), speaking
the production ``.npz`` wire format (a compact binary numpy encoding —
far cheaper than JSON lists, though np.savez/np.load do serialize
through an in-memory zip), so a remote TPU serving host is usable from
any Python process with numpy. ``import lie_vae_tpu.serve_client`` needs
only numpy (the package __init__ degrades gracefully without jax), and
this single self-contained file can also be vendored outright:

    from lie_vae_tpu.serve_client import ServingClient
    c = ServingClient("http://tpu-host:8310")
    c.health()                      # model metadata + route list
    out = c.encode(images)          # {"pose", "sigma", "sample"}
    imgs = c.decode(out["pose"])    # (N, 64, 64, 3) float32
    frames = c.geodesic(out["pose"][0], out["pose"][1], steps=32)

Server-side request errors (HTTP 4xx/5xx with a JSON ``{"error": ...}``
body) raise :class:`ServingClientError` carrying the status code and the
server's message; transport failures propagate as ``urllib.error.URLError``.
"""
import io
import json
import urllib.error
import urllib.request

import numpy as np


class ServingClientError(RuntimeError):
    """Server rejected the request (HTTP status + server error message)."""

    def __init__(self, status, message):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status
        self.message = message


class ServingClient:
    """Client over one serving endpoint. Stateless and thread-safe (each
    call is one independent HTTP request; the server serializes device
    work internally)."""

    def __init__(self, base_url, timeout=120.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    # -- transport ---------------------------------------------------------
    def _request(self, req):
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                return r.read(), r.headers.get("Content-Type", "")
        except urllib.error.HTTPError as e:
            body = e.read()
            try:
                message = json.loads(body.decode())["error"]
            except Exception:
                message = body.decode(errors="replace")[:500]
            raise ServingClientError(e.code, message) from None

    def _post(self, route, arrays):
        """POST {name: array} as .npz; return {name: ndarray}."""
        buf = io.BytesIO()
        np.savez(buf, **{k: np.asarray(v) for k, v in arrays.items()
                         if v is not None})
        req = urllib.request.Request(
            f"{self.base_url}/v1/{route}", data=buf.getvalue(),
            headers={"Content-Type": "application/x-npz"})
        body, ctype = self._request(req)
        if "x-npz" not in ctype:
            # a 200 with a non-npz body (e.g. an HTML page injected by a
            # proxy) would otherwise surface as an opaque np.load zip error
            raise ServingClientError(
                200, f"expected an application/x-npz response, got "
                f"{ctype or 'no Content-Type'}: "
                f"{body[:200].decode(errors='replace')!r}")
        with np.load(io.BytesIO(body)) as z:
            return {k: z[k] for k in z.files}

    # -- endpoints ---------------------------------------------------------
    def health(self):
        """GET /healthz -> dict (status, latent_mode, out_shape, routes)."""
        body, _ = self._request(
            urllib.request.Request(f"{self.base_url}/healthz"))
        return json.loads(body.decode())

    def encode(self, images):
        """(N, H, W, C) images -> {"pose", "sigma", "sample"}."""
        return self._post("encode", {"images": images})

    def decode(self, poses):
        """(N, 3, 3) group elements -> (N, H, W, C) images."""
        return self._post("decode", {"poses": poses})["images"]

    def reconstruct(self, images):
        """(N, H, W, C) images -> their (N, H, W, C) reconstructions."""
        return self._post("reconstruct", {"images": images})["images"]

    def sample(self, n=16, seed=None):
        """n prior samples -> (n, H, W, C) decoded images."""
        return self._post("sample", {"n": n, "seed": seed})["images"]

    def geodesic(self, pose_a, pose_b, steps=16):
        """Decoded frames along the SO(3) geodesic from pose_a to pose_b."""
        return self._post("geodesic", {"pose_a": pose_a, "pose_b": pose_b,
                                       "steps": steps})["frames"]
