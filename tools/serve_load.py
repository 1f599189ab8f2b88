"""Serving load test: N concurrent HTTP clients against `awm_tpu serve`.

Measures the L7 path end to end — WAV parse, micro-batch coalescing
(awm_tpu.batching), device call, WAV encode — and reports request and
audio-seconds throughput plus the /healthz coalescing stats.  This is the
PERF.md evidence for VERDICT round-2 item 8 (>=32 concurrent clients).

Usage (server in one process, load in another, or --self-serve for both):

    python -m awm_tpu serve --ckpt runs/base/ckpt_best --port 8787 &
    python tools/serve_load.py --port 8787 --clients 32 --requests 128 --seconds 4

The unit 'clips/s' is 1-second chunks through the model, comparable to the
bench.py embed+detect number (the gap between them is the HTTP+WAV host
overhead the micro-batcher must hide).
"""

from __future__ import annotations

import argparse
import http.client
import io
import json
import struct
import threading
import time

import numpy as np


def wav_bytes(x: np.ndarray, sr: int = 16000) -> bytes:
    pcm = (np.clip(x, -1, 1) * 32767.0).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16
    ) + b"data" + struct.pack("<I", len(pcm))
    return hdr + pcm


def healthz(host, port):
    c = http.client.HTTPConnection(host, port, timeout=30)
    c.request("GET", "/healthz")
    return json.loads(c.getresponse().read())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--requests", type=int, default=128, help="total requests")
    ap.add_argument("--seconds", type=int, default=4, help="audio length per request")
    ap.add_argument("--mix", default="detect,embed",
                    help="endpoints to alternate between")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    bodies = [wav_bytes(0.2 * rng.standard_normal(16000 * args.seconds))
              for _ in range(8)]
    mix = args.mix.split(",")
    before = healthz(args.host, args.port)["batching"]

    latencies, errors = [], []
    lock = threading.Lock()
    work = list(range(args.requests))

    def client(cid: int):
        c = http.client.HTTPConnection(args.host, args.port, timeout=600)
        while True:
            with lock:
                if not work:
                    return
                i = work.pop()
            ep = mix[i % len(mix)]
            path = "/detect" if ep == "detect" else f"/embed?message={i % 65536}"
            body = bodies[i % len(bodies)]
            t0 = time.perf_counter()
            try:
                c.request("POST", path, body=body,
                          headers={"Content-Length": str(len(body))})
                r = c.getresponse()
                r.read()
                ok = r.status == 200
            except Exception as e:  # noqa: BLE001 — count, don't crash the load
                ok = False
                c = http.client.HTTPConnection(args.host, args.port, timeout=600)
            dt = time.perf_counter() - t0
            with lock:
                (latencies if ok else errors).append(dt)

    # warmup: one request per endpoint so jit compilation is excluded
    for ep in mix:
        c = http.client.HTTPConnection(args.host, args.port, timeout=600)
        path = "/detect" if ep == "detect" else "/embed?message=1"
        c.request("POST", path, body=bodies[0],
                  headers={"Content-Length": str(len(bodies[0]))})
        c.getresponse().read()

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    after = healthz(args.host, args.port)["batching"]

    lat = np.asarray(sorted(latencies))
    reqs = after["requests"] - before["requests"]
    batches = after["device_batches"] - before["device_batches"]
    chunks = after["batched_chunks"] - before["batched_chunks"]
    print(json.dumps({
        "clients": args.clients,
        "requests_ok": len(latencies),
        "errors": len(errors),
        "wall_s": round(wall, 2),
        "req_per_s": round(len(latencies) / wall, 1),
        "clips_per_s": round(len(latencies) * args.seconds / wall, 1),
        "latency_p50_ms": round(float(lat[len(lat) // 2]) * 1e3, 1) if len(lat) else None,
        "latency_p95_ms": round(float(lat[int(len(lat) * 0.95)]) * 1e3, 1) if len(lat) else None,
        "device_batches": batches,
        "batched_chunks": chunks,
        "requests_served": reqs,
        "chunks_per_device_batch": round(chunks / batches, 2) if batches else None,
    }, indent=2))


if __name__ == "__main__":
    main()
