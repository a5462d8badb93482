#!/usr/bin/env python
"""Sample client for the OpenAI-compatible TTS endpoint.

Counterpart of the reference's `HTTP_API_TtsDemo/` (a client demo for
Youdao's hosted TTS HTTP API, `apidemo/TtsDemo.py`); this one targets the
local `tools/serve.py` server. Stdlib only.

Usage:
  python examples/api_client.py --text "Hello world" --voice 13 \
      --prompt Happy --out out.wav [--url http://localhost:8000]
"""

import argparse
import json
import sys
import urllib.error
import urllib.request


def synthesize(url, text, voice, prompt="", speed=1.0, fmt="wav",
               stream=False, on_chunk=None):
    body = json.dumps({
        "input": text,
        "voice": voice,
        "prompt": prompt,
        "speed": speed,
        "response_format": fmt,
        "stream": stream,
    }).encode("utf-8")
    req = urllib.request.Request(
        f"{url.rstrip('/')}/v1/audio/speech",
        data=body,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=600) as resp:
        if not stream:
            return resp.read()
        # chunked transfer: audio arrives sentence by sentence
        parts = []
        while True:
            chunk = resp.read(16384)
            if not chunk:
                break
            parts.append(chunk)
            if on_chunk:
                on_chunk(chunk)
        return b"".join(parts)


def metrics(url):
    with urllib.request.urlopen(f"{url.rstrip('/')}/v1/metrics", timeout=30) as r:
        return json.load(r)


def list_voices(url):
    with urllib.request.urlopen(f"{url.rstrip('/')}/v1/voices", timeout=30) as r:
        return json.load(r)["voices"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="http://localhost:8000")
    p.add_argument("--text", required=True)
    p.add_argument("--voice", default="0")
    p.add_argument("--prompt", default="")
    p.add_argument("--speed", type=float, default=1.0)
    p.add_argument("--format", default="wav")
    p.add_argument("--out", default="out.wav")
    p.add_argument("--stream", action="store_true",
                   help="chunked transfer; audio arrives per sentence")
    p.add_argument("--metrics", action="store_true",
                   help="print server metrics after synthesis")
    args = p.parse_args()

    try:
        audio = synthesize(
            args.url, args.text, args.voice, args.prompt, args.speed,
            args.format, stream=args.stream,
            on_chunk=(lambda c: print(f"  chunk: {len(c)} bytes"))
            if args.stream else None,
        )
    except urllib.error.HTTPError as e:
        print(f"HTTP {e.code}: {e.read().decode(errors='replace')[:200]}")
        sys.exit(1)
    with open(args.out, "wb") as f:
        f.write(audio)
    print(f"wrote {args.out} ({len(audio)} bytes)")
    if args.metrics:
        print(json.dumps(metrics(args.url), indent=2))


if __name__ == "__main__":
    main()
