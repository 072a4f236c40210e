"""Network query endpoint: a JSON-lines TCP server exposing the
execute / fetch / close operation lifecycle of the reference's client
protocol servers (``be/src/service/impala-hs2-server.cc`` —
ExecuteStatement / FetchResults / CloseOperation — and the beeswax
twin ``impala-beeswax-server.cc``).

The reference speaks Thrift; this container has no thrift library, so
the wire format is newline-delimited JSON over TCP — deliberately a
STAND-IN transport (documented protocol delta), while the operation
model, handle lifecycle, paged fetch, and session query options mirror
the reference faithfully:

    {"op": "ping"}                                  → {"ok": true, ...}
    {"op": "execute", "sql": "select ..."}          → {"handle": h, "columns": [...], "types": [...]}
    {"op": "fetch", "handle": h, "max_rows": 1024}  → {"rows": [[...], ...], "eos": false}
    {"op": "close", "handle": h}                    → {"ok": true}
    {"op": "set", "key": "...", "value": "..."}     → {"ok": true}
    {"op": "options"}                               → {"options": {...}}

Scale note: like the reference's plan-root sink, results buffer on the
coordinator only as the client consumes them — fetch pages pull from
``toLocalIterator()`` (one partition at a time crosses to the driver),
NOT a full collect, so a large result never materializes driver-side
faster than the client drains it.
"""

from __future__ import annotations

import datetime
import decimal
import itertools
import json
import socket
import socketserver
import threading
from typing import Any, Iterator

from impala_cut_spark.session import ImpalaSession


def _jsonable(v: Any) -> Any:
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) else v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    return v


class _Operation:
    """An executed statement: schema + a lazily-drained row iterator
    (the HS2 operation handle)."""

    def __init__(self, df):
        self.columns = df.columns
        self.types = [t for _, t in df.dtypes]
        self._rows: Iterator = iter(df.toLocalIterator())
        self.eos = False

    def fetch(self, max_rows: int) -> list[list[Any]]:
        # max_rows <= 0 would make islice return [] with eos never set
        # (0 < 0 is false), hanging drain-until-eos clients; the
        # reference's TFetchResultsReq treats a non-positive fetch size
        # as a protocol error too
        if max_rows <= 0:
            raise ValueError(f"max_rows must be positive, got {max_rows}")
        out = [
            [_jsonable(v) for v in row]
            for row in itertools.islice(self._rows, max_rows)
        ]
        if len(out) < max_rows:
            self.eos = True
        return out


class QueryServer:
    """Threaded TCP server around one ImpalaSession (the reference runs
    one beeswax/HS2 service per impalad coordinator)."""

    def __init__(self, session: ImpalaSession | None = None, host: str = "127.0.0.1", port: int = 0):
        self.session = session or ImpalaSession()
        self._ops: dict[int, _Operation] = {}
        self._next = itertools.count(1)
        self._lock = threading.Lock()
        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self) -> None:
                for line in self.rfile:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        resp = outer._dispatch(json.loads(line))
                    except Exception as e:  # noqa: BLE001 — error → client
                        resp = {"error": f"{type(e).__name__}: {e}"}
                    self.wfile.write((json.dumps(resp) + "\n").encode())
                    self.wfile.flush()

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.host, self.port = self._server.server_address

    # -- operation dispatch (ExecuteStatement/FetchResults/... analogue) --

    def _dispatch(self, req: dict) -> dict:
        op = req.get("op")
        if op == "ping":
            return {"ok": True, "engine": "impala_cut_spark", "protocol": "jsonl-v1"}
        if op == "execute":
            df = self.session.sql(req["sql"])
            with self._lock:
                h = next(self._next)
                self._ops[h] = _Operation(df)
            return {"handle": h, "columns": self._ops[h].columns, "types": self._ops[h].types}
        if op == "fetch":
            o = self._ops.get(req.get("handle"))
            if o is None:
                return {"error": "unknown handle"}
            rows = o.fetch(int(req.get("max_rows", 1024)))
            return {"rows": rows, "eos": o.eos}
        if op == "close":
            self._ops.pop(req.get("handle"), None)
            return {"ok": True}
        if op == "set":
            self.session.set_option(req["key"], req["value"])
            return {"ok": True}
        if op == "options":
            return {"options": dict(self.session.options())}
        return {"error": f"unknown op: {op!r}"}

    # -- lifecycle --------------------------------------------------------

    def serve_background(self) -> threading.Thread:
        t = threading.Thread(target=self._server.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self) -> None:
        self._server.shutdown()
        self._server.server_close()


class QueryClient:
    """Minimal blocking client for the jsonl protocol (the
    impala-shell-side counterpart; see shell.py for the interactive
    REPL, which stays in-process)."""

    def __init__(self, host: str, port: int):
        self._sock = socket.create_connection((host, port))
        self._f = self._sock.makefile("rwb")

    def call(self, **req) -> dict:
        self._f.write((json.dumps(req) + "\n").encode())
        self._f.flush()
        resp = json.loads(self._f.readline())
        if "error" in resp:
            raise RuntimeError(resp["error"])
        return resp

    def query(self, sql: str, page: int = 1024) -> tuple[list[str], list[list[Any]]]:
        """execute + drain all fetch pages + close — the common path."""
        r = self.call(op="execute", sql=sql)
        h, cols = r["handle"], r["columns"]
        rows: list[list[Any]] = []
        while True:
            fr = self.call(op="fetch", handle=h, max_rows=page)
            rows.extend(fr["rows"])
            if fr["eos"]:
                break
        self.call(op="close", handle=h)
        return cols, rows

    def close(self) -> None:
        self._f.close()
        self._sock.close()


def main() -> None:  # pragma: no cover — interactive entry point
    import argparse

    from impala_cut_spark.sources.catalog import register_views

    ap = argparse.ArgumentParser(description="impala_cut_spark query server (jsonl-v1)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=21050)  # reference HS2 default port
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    session = ImpalaSession()
    register_views(session.spark, args.sf_dir)
    srv = QueryServer(session, host=args.host, port=args.port)
    print(f"listening on {srv.host}:{srv.port} (jsonl-v1)", flush=True)
    srv._server.serve_forever()


if __name__ == "__main__":
    main()
