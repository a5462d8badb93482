#!/usr/bin/env python
"""Concurrent load generator for the serving stack.

The exact harness behind docs/runs/SERVING_LOAD.md (r3 inlined it in the
doc; r5 promotes it to a tool for the cold-after-cache measurement —
VERDICT r4 ask #3). Prints one JSON line per round:
ok-count, wall, p50/p95 latency.

Usage:
  python tools/load_test.py --port 8731 [--clients 8] [--requests 64]
      [--voices 20] [--timeout 600] [--rounds 1]
"""

import argparse
import json
import threading
import time
import urllib.request

TEXTS = [
    "Happy New Year to you and your family.",
    "The quick brown fox jumps over the lazy dog.",
    "Speech synthesis on tensor processing units.",
    "A warm welcome to every listener out there.",
]


def run_round(url, n_clients, n_reqs, n_voices, timeout):
    results, lock = [], threading.Lock()

    def one(i):
        body = json.dumps({
            "input": TEXTS[i % len(TEXTS)],
            "voice": str(i % n_voices),
            "response_format": "wav",
        }).encode()
        t0 = time.time()
        try:
            with urllib.request.urlopen(
                urllib.request.Request(url, data=body), timeout=timeout
            ) as r:
                n = len(r.read())
                code = r.status
        except Exception:
            n, code = 0, -1
        with lock:
            results.append((code, n, time.time() - t0))

    def worker(k):
        for i in range(k, n_reqs, n_clients):
            one(i)

    t0 = time.time()
    ts = [threading.Thread(target=worker, args=(k,)) for k in range(n_clients)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    lat = sorted(t for _, _, t in results)
    return {
        "ok": sum(1 for c, n, _ in results if c == 200 and n > 0),
        "total": len(results),
        "wall_s": round(time.time() - t0, 2),
        "p50": round(lat[len(lat) // 2], 3),
        "p95": round(lat[int(len(lat) * 0.95)], 3),
        "max": round(lat[-1], 3),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="localhost")
    p.add_argument("--port", type=int, required=True)
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--voices", type=int, default=20)
    p.add_argument("--timeout", type=float, default=600.0)
    p.add_argument("--rounds", type=int, default=1)
    args = p.parse_args()

    url = f"http://{args.host}:{args.port}/v1/audio/speech"
    for r in range(args.rounds):
        out = run_round(
            url, args.clients, args.requests, args.voices, args.timeout
        )
        out["round"] = r + 1
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
