"""Offline demo API for the example pipelines (port 8399).

Serves /posts (limit_offset via _limit/_start) and /employees
(page/per_page under a /data envelope with a total hint) so the example
runs without internet access:

    python examples/mock_api.py &
    python -m apitap_spark.pipeline.runner -m examples/sql \
        -y examples/config/pipelines.yaml --log-level info
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

POSTS = [
    {"userId": i % 10 + 1, "id": i + 1, "title": f"title {i + 1}", "body": f"body {i + 1}"}
    for i in range(100)
]
EMPLOYEES = [
    {"id": i + 1, "name": f"emp {i + 1}", "dept": ["eng", "sales", "ops"][i % 3],
     "salary": 50_000 + 997 * i}
    for i in range(230)
]


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_GET(self):
        p = urlparse(self.path)
        qs = {k: v[0] for k, v in parse_qs(p.query).items()}
        if p.path == "/posts":
            start = int(qs.get("_start", 0))
            limit = int(qs.get("_limit", 20))
            body = POSTS[start : start + limit]
        elif p.path == "/employees":
            page = int(qs.get("page", 1))
            per = int(qs.get("per_page", 50))
            body = {
                "data": EMPLOYEES[(page - 1) * per : page * per],
                "meta": {"total": len(EMPLOYEES)},
            }
        else:
            self.send_response(404)
            self.end_headers()
            return
        data = json.dumps(body).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)


if __name__ == "__main__":
    print("mock API on http://127.0.0.1:8399 (/posts, /employees)")
    ThreadingHTTPServer(("127.0.0.1", 8399), Handler).serve_forever()
