#!/usr/bin/env python
"""Benchmark results server + leaderboard.

Capability match for the reference related_projects/rating_server (Flask/waitress +
MongoDB leaderboard receiving harness submissions, `perf_data_reciever.py`,
normalization `web_rating/lib/normalized_rating.py:10-21`) — dependency-free:
stdlib http.server + a JSON file store, with the same normalized-rating idea
(per-app MTEPS normalized by the best submission, averaged)."""
from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

STORE = os.environ.get("VGL_RATING_STORE", "/tmp/vgl_rating.json")
_lock = threading.Lock()


def _load():
    if os.path.exists(STORE):
        with open(STORE) as f:
            return json.load(f)
    return []


def _save(rows):
    with open(STORE, "w") as f:
        json.dump(rows, f, indent=1)


def normalized_rating(rows):
    """Per (app, graph): score = mteps / best_mteps; rating = mean over entries."""
    best = {}
    for r in rows:
        key = (r["app"], r["graph"])
        best[key] = max(best.get(key, 0.0), r.get("mteps") or 0.0)
    by_submitter = {}
    for r in rows:
        key = (r["app"], r["graph"])
        if best[key] > 0 and r.get("mteps"):
            by_submitter.setdefault(r.get("submitter", "anon"), []).append(
                r["mteps"] / best[key])
    return {s: sum(v) / len(v) for s, v in by_submitter.items()}


class Handler(BaseHTTPRequestHandler):
    def _send(self, code, obj):
        body = json.dumps(obj, indent=1).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        if self.path != "/submit":
            return self._send(404, {"error": "unknown path"})
        n = int(self.headers.get("Content-Length", 0))
        try:
            payload = json.loads(self.rfile.read(n))
        except json.JSONDecodeError:
            return self._send(400, {"error": "bad json"})
        rows = payload if isinstance(payload, list) else [payload]
        with _lock:
            data = _load()
            data.extend(rows)
            _save(data)
        self._send(200, {"accepted": len(rows)})

    def do_GET(self):
        with _lock:
            data = _load()
        if self.path == "/rating":
            return self._send(200, normalized_rating(data))
        return self._send(200, data)

    def log_message(self, *a):
        pass


def main(port: int = 1026):
    srv = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    print(f"rating server on :{port} (store: {STORE})")
    srv.serve_forever()


if __name__ == "__main__":
    import sys
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1026)
