"""Cross-request micro-batching for the synthesis engine.

The reference serves strictly one request at a time (`openaiapi.py` holds a
single in-process model; concurrency = uvicorn workers, each with its own
copy). Here concurrent HTTP requests are aggregated into ONE device
dispatch: a worker thread drains a queue, groups compatible requests
(same duration-scale ``alpha``), pads them into the engine's static
(batch, text, mel) buckets, and fans the results back out through futures.

Why it matters on TPU: a single utterance leaves the chip almost idle
(bench: throughput saturates only at batch >= 16), so batching across
requests is where serving throughput comes from — not from more model
replicas per chip.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import List, Optional, Tuple

from emotivoice_tpu.serving.engine import (
    SynthesisEngine,
    SynthesisRequest,
    SynthesisResult,
)


class MicroBatcher:
    """Aggregates concurrent ``submit`` calls into batched engine dispatches.

    - ``max_batch``: upper bound per dispatch (align with the engine's
      largest batch bucket).
    - ``max_wait_ms``: how long the first request in a batch waits for
      company. Zero keeps latency minimal (batch = whatever is already
      queued when the worker frees up — "continuous batching").
    """

    def __init__(
        self,
        engine: SynthesisEngine,
        max_batch: int = 16,
        max_wait_ms: float = 5.0,
    ):
        self.engine = engine
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        self._queue: "queue.Queue[Optional[Tuple[SynthesisRequest, Future]]]" = (
            queue.Queue()
        )
        self._dispatches = 0  # batches sent to the device (for tests/metrics)
        self._requests = 0
        self._worker = threading.Thread(
            target=self._run, daemon=True, name="microbatcher-worker"
        )
        self._worker.start()

    def submit(self, request: SynthesisRequest) -> SynthesisResult:
        """Blocking: enqueue and wait for the batched result."""
        fut: Future = Future()
        self._queue.put((request, fut))
        return fut.result()

    def submit_many(self, requests: List[SynthesisRequest]) -> List[SynthesisResult]:
        futs = []
        for r in requests:
            f: Future = Future()
            self._queue.put((r, f))
            futs.append(f)
        return [f.result() for f in futs]

    def close(self):
        self._queue.put(None)
        self._worker.join(timeout=5)

    # ------------------------------------------------------------------

    def _drain(self) -> List[Tuple[SynthesisRequest, Future]]:
        """Block for one item, then gather compatible company."""
        first = self._queue.get()
        if first is None:
            return []
        batch = [first]
        # Absolute deadline: the first request waits at most max_wait_ms in
        # total, however the followers trickle in.
        deadline = time.monotonic() + self.max_wait_ms / 1000.0
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            try:
                if remaining > 0:
                    item = self._queue.get(timeout=remaining)
                else:
                    item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is None:
                self._queue.put(None)  # re-post sentinel for the outer loop
                break
            if item[0].alpha != batch[0][0].alpha:
                # engine batches share one alpha; defer mismatches
                self._queue.put(item)
                break
            batch.append(item)
        return batch

    def _run(self):
        while True:
            batch = self._drain()
            if not batch:
                return
            reqs = [r for r, _ in batch]
            self._requests += len(reqs)
            self._dispatches += 1
            try:
                results = self.engine.synthesize_batch(reqs)
            except Exception as e:  # fan the failure out to every waiter
                for _, fut in batch:
                    fut.set_exception(e)
                continue
            for (_, fut), res in zip(batch, results):
                fut.set_result(res)
