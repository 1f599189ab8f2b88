"""Micro-batching for serving: coalesce concurrent requests into one device
batch.

The reference's serving story is a per-request FastAPI wrapper (sister repo,
ref: README.md:237-258) — each request pays its own model call.  On TPU the
chunk kernels are batched-first (api.py), so the serving-optimal design is a
single device consumer that drains a queue of per-request chunk arrays,
concatenates them into one bucket-padded batch, runs ONE kernel call, and
scatters results back to the waiting requests:

- throughput: one (N_total, 16000) call instead of K small calls — small
  batches waste the MXU and pay K compile-cache lookups + dispatches;
- device discipline: exactly one thread touches the TPU, so HTTP threads
  never contend for the device (they only decode/encode WAVs);
- bounded latency: a request waits at most ``max_wait_ms`` for co-riders.

``MicroBatcher`` exposes the same ``embed_chunks`` / ``detect_summary``
signatures as ``InferenceSession``; ``BatchedSession`` is a duck-typed proxy
so ``watermark_array`` / ``detect_array`` work unchanged on top of it.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import List, Optional, Tuple

import numpy as np


class _Item:
    __slots__ = ("op", "arrays", "future")

    def __init__(self, op: str, arrays: Tuple[np.ndarray, ...]):
        self.op = op
        self.arrays = arrays
        self.future: Future = Future()


class MicroBatcher:
    """Single-consumer micro-batching front of an InferenceSession.

    max_batch: chunk budget per device call (requests above it still run,
    alone).  max_wait_ms: how long the first request in a window waits for
    co-riders before the batch is dispatched.
    """

    def __init__(self, session, *, max_batch: int = 256, max_wait_ms: float = 5.0):
        self.session = session
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.stats = {"requests": 0, "device_batches": 0, "batched_chunks": 0}
        self._q: "queue.Queue[Optional[_Item]]" = queue.Queue()
        self._lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- session-compatible surface -----------------------------------------

    def embed_chunks(self, chunks: np.ndarray, messages: np.ndarray) -> np.ndarray:
        return self._submit("embed", (np.asarray(chunks), np.asarray(messages)))

    def detect_summary(self, chunks: np.ndarray, lengths: Optional[np.ndarray] = None):
        chunks = np.asarray(chunks)
        if lengths is None:
            lengths = np.full(chunks.shape[0], chunks.shape[1], np.int32)
        return self._submit("detect", (chunks, np.asarray(lengths, np.int32)))

    def close(self) -> None:
        self._q.put(None)
        self._worker.join(timeout=5.0)

    # -- internals -----------------------------------------------------------

    def _submit(self, op: str, arrays):
        item = _Item(op, arrays)
        with self._lock:
            self.stats["requests"] += 1
        self._q.put(item)
        return item.future.result()

    def _collect(self) -> List[_Item]:
        """Block for the first item, then gather same-op co-riders until the
        chunk budget or the wait window is exhausted."""
        import time

        first = self._q.get()
        if first is None:
            return []
        batch = [first]
        total = first.arrays[0].shape[0]
        deadline = time.monotonic() + self.max_wait
        spill = None
        while total < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)  # re-post shutdown for the outer loop
                break
            if nxt.op != first.op:
                spill = nxt  # run it in the next window, keep this one pure
                break
            batch.append(nxt)
            total += nxt.arrays[0].shape[0]
        if spill is not None:
            self._q.put(spill)
        return batch

    def _run(self) -> None:
        while True:
            batch = self._collect()
            if not batch:
                return
            try:
                self._dispatch(batch)
            except Exception as e:  # pragma: no cover - defensive
                for it in batch:
                    if not it.future.done():
                        it.future.set_exception(e)

    def _dispatch(self, batch: List[_Item]) -> None:
        op = batch[0].op
        sizes = [it.arrays[0].shape[0] for it in batch]
        bounds = np.cumsum([0] + sizes)
        with self._lock:
            self.stats["device_batches"] += 1
            self.stats["batched_chunks"] += int(bounds[-1])
        if op == "embed":
            chunks = np.concatenate([it.arrays[0] for it in batch])
            msgs = np.concatenate([it.arrays[1] for it in batch])
            delta = self.session.embed_chunks(chunks, msgs)
            for it, lo, hi in zip(batch, bounds, bounds[1:]):
                it.future.set_result(delta[lo:hi])
        else:
            chunks = np.concatenate([it.arrays[0] for it in batch])
            lengths = np.concatenate([it.arrays[1] for it in batch])
            outs = self.session.detect_summary(chunks, lengths)
            for it, lo, hi in zip(batch, bounds, bounds[1:]):
                it.future.set_result(tuple(o[lo:hi] for o in outs))


class BatchedSession:
    """Duck-typed InferenceSession whose chunk kernels route through a
    MicroBatcher; everything else (attributes, helpers) delegates to the
    wrapped session.  Drop-in for watermark_array/detect_array."""

    def __init__(self, session, *, max_batch: int = 256, max_wait_ms: float = 5.0):
        self._session = session
        self.batcher = MicroBatcher(
            session, max_batch=max_batch, max_wait_ms=max_wait_ms
        )

    def embed_chunks(self, chunks, messages):
        return self.batcher.embed_chunks(chunks, messages)

    def detect_summary(self, chunks, lengths=None):
        return self.batcher.detect_summary(chunks, lengths)

    def close(self):
        self.batcher.close()

    def __getattr__(self, name):
        return getattr(self._session, name)
