"""HTTP serving front-end tests (lie_vae_tpu.serve_http).

Pin the wire protocol (npz + JSON bodies, mirrored response format), the
route surface, numerical equality with the in-process session, and the
error contract. The server under test runs threaded on an ephemeral port
with a real socket — these are end-to-end HTTP round trips.
"""
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from lie_vae_tpu import serve_http
from tests.test_serve import _session, _toy_batch


@pytest.fixture(scope="module")
def server():
    model, sess = _session(batch_size=8)
    srv = serve_http.make_server(sess, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield model, sess, base
    srv.shutdown()
    srv.server_close()


def _post_npz(base, route, **arrays):
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    req = urllib.request.Request(
        f"{base}/v1/{route}", data=buf.getvalue(),
        headers={"Content-Type": "application/x-npz"})
    with urllib.request.urlopen(req) as r:
        assert r.headers["Content-Type"] == "application/x-npz"
        body = r.read()
    with np.load(io.BytesIO(body)) as z:
        return {k: z[k] for k in z.files}


def _post_json(base, route, payload):
    req = urllib.request.Request(
        f"{base}/v1/{route}", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        assert r.headers["Content-Type"] == "application/json"
        return json.loads(r.read().decode())


def test_healthz(server):
    model, sess, base = server
    with urllib.request.urlopen(f"{base}/healthz") as r:
        health = json.loads(r.read().decode())
    assert health["status"] == "ok"
    assert health["latent_mode"] == "so3"
    assert health["batch_size"] == 8
    assert "encode" in health["routes"]


def test_encode_npz_matches_session(server):
    model, sess, base = server
    x = _toy_batch(model, 13)                  # 13 rows -> padded chunks
    out = _post_npz(base, "encode", images=x)
    assert out["pose"].shape == (13, 3, 3)
    assert out["sigma"].shape == (13, 3)
    assert out["sample"].shape == (13, 3, 3)
    # pose/sigma are deterministic encoder outputs — must equal the
    # in-process session exactly (same weights, same padded dispatch)
    direct = sess.encode(x)
    np.testing.assert_array_equal(out["pose"], direct["pose"])
    np.testing.assert_array_equal(out["sigma"], direct["sigma"])


def test_decode_and_reconstruct_round_trip(server):
    model, sess, base = server
    x = _toy_batch(model, 5)
    pose = _post_npz(base, "encode", images=x)["pose"]
    imgs = _post_npz(base, "decode", poses=pose)["images"]
    assert imgs.shape == (5,) + tuple(model.out_shape)
    recon = _post_npz(base, "reconstruct", images=x)["images"]
    np.testing.assert_allclose(recon, imgs, rtol=1e-5, atol=1e-6)


def test_sample_and_geodesic(server):
    model, sess, base = server
    out = _post_npz(base, "sample", n=np.asarray(6), seed=np.asarray(0))
    assert out["images"].shape == (6,) + tuple(model.out_shape)
    # seeded sampling is reproducible across requests
    again = _post_npz(base, "sample", n=np.asarray(6), seed=np.asarray(0))
    np.testing.assert_array_equal(out["images"], again["images"])

    from lie_vae_tpu import ops
    import jax
    a, b = np.asarray(ops.random_group_matrices(jax.random.PRNGKey(3), 2))
    frames = _post_npz(base, "geodesic", pose_a=a, pose_b=b,
                       steps=np.asarray(7))["frames"]
    assert frames.shape == (7,) + tuple(model.out_shape)
    direct = sess.geodesic(a, b, steps=7)
    np.testing.assert_allclose(frames, direct, rtol=1e-5, atol=1e-6)


def test_json_protocol(server):
    model, sess, base = server
    x = _toy_batch(model, 3)
    out = _post_json(base, "encode", {"images": x.tolist()})
    pose = np.asarray(out["pose"], np.float32)
    assert pose.shape == (3, 3, 3)
    np.testing.assert_allclose(pose, sess.encode(x)["pose"],
                               rtol=1e-6, atol=1e-7)
    # JSON scalars work for sample
    out = _post_json(base, "sample", {"n": 2, "seed": 1})
    assert np.asarray(out["images"]).shape == (2,) + tuple(model.out_shape)


def _expect_http_error(base, route, code, body=b"", ctype="application/x-npz",
                       path=None):
    req = urllib.request.Request(
        path or f"{base}/v1/{route}", data=body,
        headers={"Content-Type": ctype})
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req)
    assert exc.value.code == code
    return json.loads(exc.value.read().decode())["error"]


def test_error_contract(server):
    model, sess, base = server
    buf = io.BytesIO()
    np.savez(buf, images=_toy_batch(model, 2))
    good = buf.getvalue()

    msg = _expect_http_error(base, "nonsense", 400, good)
    assert "unknown route" in msg
    msg = _expect_http_error(base, "encode", 400, b"not an npz")
    assert "neither .npz nor JSON" in msg
    msg = _expect_http_error(base, "encode", 400,
                             json.dumps({"wrong": [1.0]}).encode(),
                             ctype="application/json")
    assert "missing field 'images'" in msg
    msg = _expect_http_error(base, "", 404, good,
                             path=f"{base}/not_an_api")
    assert "unknown path" in msg
    # GET on an unknown path
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(f"{base}/nope")
    assert exc.value.code == 404


def test_sample_bounds(server):
    model, sess, base = server
    msg = _expect_http_error(base, "sample", 400,
                             json.dumps({"n": 0}).encode(),
                             ctype="application/json")
    assert "out of range" in msg


def test_concurrent_requests(server):
    """Threaded clients hammer the endpoint; the app lock serializes
    device work and every response is complete and correct."""
    model, sess, base = server
    x = _toy_batch(model, 4)
    expected = sess.encode(x)["pose"]
    results, errors = [None] * 8, []

    def hit(i):
        try:
            results[i] = _post_npz(base, "encode", images=x)["pose"]
        except Exception as e:                    # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    for r in results:
        np.testing.assert_array_equal(r, expected)


def test_client_library(server):
    """ServingClient round-trips every route against the live server and
    matches the in-process session numerically."""
    from lie_vae_tpu.serve_client import ServingClient, ServingClientError

    model, sess, base = server
    c = ServingClient(base)

    health = c.health()
    assert health["status"] == "ok"
    assert "encode" in health["routes"]

    x = _toy_batch(model, 4)
    out = c.encode(x)
    ref = sess.encode(x)
    np.testing.assert_array_equal(out["pose"], ref["pose"])
    np.testing.assert_array_equal(out["sigma"], ref["sigma"])

    imgs = c.decode(out["pose"])
    np.testing.assert_array_equal(imgs, sess.decode(ref["pose"]))
    np.testing.assert_array_equal(c.reconstruct(x), sess.reconstruct(x))

    s = c.sample(3, seed=7)
    assert s.shape == (3, *model.out_shape)
    np.testing.assert_array_equal(s, sess.sample(3, seed=7))

    frames = c.geodesic(out["pose"][0], out["pose"][1], steps=5)
    assert frames.shape == (5, *model.out_shape)

    # error contract: server message surfaces with the status code
    with pytest.raises(ServingClientError) as exc:
        c.sample(0)
    assert exc.value.status == 400 and "out of range" in exc.value.message
    with pytest.raises(ServingClientError):
        c._post("nonsense", {})
