#!/usr/bin/env python
"""Submit harness results to the rating server (reference
apps/scripts/submit_results.py:23-52 socket submission analog)."""
import argparse
import json
import urllib.request


def submit(rows, host="127.0.0.1", port=1026, submitter="anon"):
    for r in rows:
        r.setdefault("submitter", submitter)
    req = urllib.request.Request(
        f"http://{host}:{port}/submit", data=json.dumps(rows).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=10) as resp:
        return json.loads(resp.read())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("results_json")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=1026)
    p.add_argument("--submitter", default="anon")
    a = p.parse_args()
    with open(a.results_json) as f:
        rows = json.load(f)
    print(submit(rows, a.host, a.port, a.submitter))


if __name__ == "__main__":
    main()
