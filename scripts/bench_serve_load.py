"""Concurrent-client load test of the HTTP serving endpoint.

`serve bench` publishes single-request latency and scan-amortized chip
rates; this driver measures the NETWORK serving stack under concurrent
clients — the real ThreadingHTTPServer front-end (lie_vae_tpu.serve_http,
npz wire format) over the compiled InferenceSession, N client threads
hammering POST /v1/encode (and /v1/reconstruct) for a fixed window.
Reported per client count: aggregate requests/s and images/s, p50/p95
request latency. This extends the framework's own serving claim — the
reference has no serving stack (it is a research training script).

The session runs freshly-initialized flagship weights (throughput is
weight-independent); pass --name <run> to serve a real checkpoint
instead.

Run (real TPU): python scripts/bench_serve_load.py [--clients 1 2 4]
    [--duration 8] [--req_batch 64]
"""
import argparse
import io
import json
import os
import statistics
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BEGIN, END = "<!-- serve-load:begin -->", "<!-- serve-load:end -->"


def build_session(args):
    import jax

    from __graft_entry__ import _flagship_model
    from lie_vae_tpu.serve import InferenceSession

    model = _flagship_model(compute_dtype="bfloat16",
                            deconv_head_dtype="float32")
    if args.name:
        return InferenceSession.from_checkpoint(
            os.path.join("outputs", args.name, "checkpoint"), model,
            batch_size=args.batch_size), model
    x = np.zeros((2, 64, 64, 3), np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, n=1, train=False)
    return InferenceSession(model, variables["params"],
                            batch_stats=variables["batch_stats"],
                            batch_size=args.batch_size), model


def _post_npz(base, route, body):
    req = urllib.request.Request(
        f"{base}/v1/{route}", data=body,
        headers={"Content-Type": "application/x-npz"})
    with urllib.request.urlopen(req) as r:
        r.read()


def run_window(base, route, body, n_clients, duration):
    """N client threads loop the request for `duration` s; returns
    (requests/s, p50 ms, p95 ms, n_requests)."""
    latencies, stop = [], []
    lock = threading.Lock()

    def client():
        local = []
        while not stop:
            t0 = time.perf_counter()
            _post_npz(base, route, body)
            local.append(time.perf_counter() - t0)
        with lock:
            latencies.extend(local)

    threads = [threading.Thread(target=client) for _ in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(duration)
    stop.append(True)
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat_ms = sorted(x * 1e3 for x in latencies)
    p50 = statistics.median(lat_ms)
    p95 = lat_ms[int(0.95 * (len(lat_ms) - 1))]
    return len(lat_ms) / wall, p50, p95, len(lat_ms)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--clients", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--routes", nargs="+",
                   default=["encode", "reconstruct"])
    p.add_argument("--duration", type=float, default=8.0)
    p.add_argument("--req_batch", type=int, default=64,
                   help="images per request")
    p.add_argument("--batch_size", type=int, default=64,
                   help="session dispatch batch (requests are padded/"
                        "chunked to this)")
    p.add_argument("--name", default=None,
                   help="serve outputs/<name>/checkpoint instead of "
                        "fresh-init weights")
    p.add_argument("--out", default="BENCHMARKS.md")
    args = p.parse_args(argv)

    from lie_vae_tpu import serve_http

    sess, model = build_session(args)
    srv = serve_http.make_server(sess, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    print(f"server on {base}")

    rng = np.random.default_rng(0)
    x = rng.random((args.req_batch, 64, 64, 3), np.float32)
    buf = io.BytesIO()
    np.savez(buf, images=x)
    body = buf.getvalue()

    # warmup: compile the padded dispatch for each route
    for route in args.routes:
        _post_npz(base, route, body)
        _post_npz(base, route, body)

    rows = []
    for route in args.routes:
        for n in args.clients:
            rps, p50, p95, count = run_window(base, route, body, n,
                                              args.duration)
            row = {"route": route, "clients": n,
                   "req_s": round(rps, 1),
                   "images_s": round(rps * args.req_batch),
                   "p50_ms": round(p50, 1), "p95_ms": round(p95, 1),
                   "requests": count}
            rows.append(row)
            print(json.dumps(row), flush=True)

    srv.shutdown()
    srv.server_close()

    import jax
    backend = jax.default_backend()
    lines = [
        BEGIN,
        "HTTP serving under concurrent load — the real "
        "`serve http` stack (ThreadingHTTPServer + npz wire format) over "
        f"the compiled flagship InferenceSession ({backend} backend), "
        f"{args.req_batch} images/request (session dispatch batch "
        f"{args.batch_size}), {args.duration:.0f}s windows per cell, "
        "single-host loopback clients. p50/p95 are whole-request "
        "latencies (serialize + HTTP + padded chip dispatch + response). "
        "The reference has no serving stack; this table extends the "
        "framework's own claim. Driven by `scripts/bench_serve_load.py`.",
        "",
        "| route | clients | req/s | images/s | p50 ms | p95 ms |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(f"| /v1/{r['route']} | {r['clients']} | {r['req_s']} "
                     f"| {r['images_s']} | {r['p50_ms']} | {r['p95_ms']} |")
    lines.append(END)
    block = "\n".join(lines)
    doc = open(args.out).read() if os.path.exists(args.out) else ""
    if BEGIN in doc and END in doc:
        doc = doc.split(BEGIN)[0] + block + doc.split(END, 1)[1]
    else:
        doc = (doc.rstrip() + "\n\n## Serving under concurrent load\n\n"
               + block + "\n")
    with open(args.out, "w") as f:
        f.write(doc)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
