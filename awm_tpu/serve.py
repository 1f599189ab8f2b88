"""Minimal HTTP serving layer (L7) wrapping the embed/detect API.

The reference delegates serving to a sister repo (FastAPI backend + Next.js
frontend, ref: README.md:237-258).  This module provides the equivalent REST
surface with zero extra dependencies (stdlib ThreadingHTTPServer):

    POST /embed?message=N&seed=K   body: WAV bytes -> watermarked WAV bytes
                                   (metrics in X-Awm-* response headers)
    POST /detect?threshold=T       body: WAV bytes -> JSON detection result
    POST /verify?message=N         body: WAV bytes -> JSON authentication
                                   (detection + exact binomial test of the
                                   decoded bits against the expected message)
    GET  /healthz                  -> JSON status

Audio decoding/encoding is host-side; the model runs through the session's
batched device kernels via a micro-batching layer (awm_tpu.batching):
concurrent requests' chunks coalesce into ONE device call (bounded by
max_wait_ms), so the TPU sees large batches and exactly one consumer thread
while HTTP threads only decode/encode WAVs.  GET /healthz reports the
coalescing stats.

Start with:  python -m awm_tpu serve --ckpt runs/base/ckpt_best --port 8787
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from awm_tpu.api import InferenceSession, detect_array, verify_array, watermark_array
from awm_tpu.utils.audio_io import decode_wav_bytes, encode_wav_bytes, to_mono, resample


def _decode_wav_bytes(data: bytes, sample_rate: int) -> np.ndarray:
    """Request body -> mono float32 at the session rate, fully in memory
    (no temp-file round trip; audio_io._parse_wav on a BytesIO)."""
    wav, sr = decode_wav_bytes(data)
    return resample(to_mono(wav), sr, sample_rate)


_encode_wav_bytes = encode_wav_bytes


def make_handler(session: InferenceSession):
    # No lock: every request stages its own numpy buffers and the session's
    # jitted kernels are thread-safe (XLA executables are immutable), so
    # concurrent requests genuinely overlap host decode/encode work and
    # share the device via JAX's internal serialization.

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                payload = {"status": "ok", "message_bits": session.message_bits,
                           "sample_rate": session.sample_rate}
                if hasattr(session, "batcher"):
                    payload["batching"] = dict(session.batcher.stats)
                self._json(200, payload)
            else:
                self._json(404, {"error": "unknown endpoint"})

        def do_POST(self):
            url = urlparse(self.path)
            q = parse_qs(url.query)
            try:
                length = int(self.headers.get("Content-Length", "0"))
                if length <= 0:
                    return self._json(400, {"error": "empty body; POST WAV bytes"})
                data = self.rfile.read(length)
                wav = _decode_wav_bytes(data, session.sample_rate)
            except Exception as e:
                return self._json(400, {"error": f"could not decode audio: {e}"})

            if url.path == "/embed":
                try:
                    message: Optional[int] = None
                    ecc = q.get("ecc", ["0"])[0] in ("1", "true")
                    limit = 2**11 if ecc else 2**session.message_bits
                    if "message" in q:
                        message = int(q["message"][0])
                        if not 0 <= message < limit:
                            return self._json(400, {"error": "message out of range"})
                    seed = int(q["seed"][0]) if "seed" in q else None
                except ValueError as e:
                    return self._json(400, {"error": f"bad query parameter: {e}"})
                res = watermark_array(wav, session, message=message, seed=seed, ecc=ecc)
                out = _encode_wav_bytes(res["watermarked_waveform"], session.sample_rate)
                delta = res["delta_waveform"]
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(out)))
                self.send_header("X-Awm-Watermark-Rms", f"{float(np.sqrt((delta**2).mean())):.6g}")
                self.send_header("X-Awm-Messages", ",".join(map(str, res["messages"])))
                if "payloads" in res:
                    self.send_header("X-Awm-Payloads", ",".join(map(str, res["payloads"])))
                self.end_headers()
                self.wfile.write(out)
            elif url.path == "/detect":
                try:
                    thr = float(q["threshold"][0]) if "threshold" in q else 0.5
                    ecc = q.get("ecc", ["0"])[0] in ("1", "true")
                except ValueError as e:
                    return self._json(400, {"error": f"bad query parameter: {e}"})
                r = detect_array(wav, session, thr, ecc=ecc)
                self._json(200, {
                    "mean_probability": r["mean_probability"],
                    "is_watermarked": r["is_watermarked"],
                    "decision": r["decision"],
                    "predicted_message": r["predicted_message"],
                    "message_confidence": r["message_confidence"],
                    **({"ecc": r["ecc"]} if "ecc" in r else {}),
                })
            elif url.path == "/verify":
                try:
                    message = int(q["message"][0])
                    ecc = q.get("ecc", ["0"])[0] in ("1", "true")
                    limit = 2**11 if ecc else 2**session.message_bits
                    if not 0 <= message < limit:
                        return self._json(400, {"error": "message out of range"})
                    thr = float(q["threshold"][0]) if "threshold" in q else 0.5
                    alpha = float(q["alpha"][0]) if "alpha" in q else 0.01
                except (KeyError, ValueError) as e:
                    return self._json(
                        400,
                        {"error": f"need ?message=N (+ optional threshold/alpha): {e}"},
                    )
                self._json(200, verify_array(wav, session, message, thr, alpha, ecc=ecc))
            else:
                self._json(404, {"error": "unknown endpoint"})

    return Handler


class AwmHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer with a listen backlog sized for bursty load.

    The stdlib default request_queue_size=5 makes the kernel RST
    simultaneous connections beyond the backlog — measured: 13 of 32
    concurrent clients got ECONNRESET.  128 covers the micro-batcher's
    coalescing window worth of connects."""

    request_queue_size = 128


def serve(
    session: InferenceSession,
    host: str = "127.0.0.1",
    port: int = 8787,
    *,
    max_batch: int = 256,
    max_wait_ms: float = 5.0,
):
    from awm_tpu.batching import BatchedSession

    batched = BatchedSession(session, max_batch=max_batch, max_wait_ms=max_wait_ms)
    httpd = AwmHTTPServer((host, port), make_handler(batched))
    print(f"awm_tpu serving on http://{host}:{port} "
          "(POST /embed, /detect, /verify; GET /healthz)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
        batched.close()
