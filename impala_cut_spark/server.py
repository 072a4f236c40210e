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

Beeswax twin (``impala-beeswax-server.cc`` operation names; rows come
back as tab-delimited ASCII strings — the Beeswax Results.data wire
shape — with NULLs rendered ``NULL``):

    {"op": "beeswax.query", "sql": "..."}           → {"handle": h}
    {"op": "beeswax.executeAndWait", "sql": "..."}  → {"handle": h}
    {"op": "beeswax.fetch", "handle": h,
     "start_over": false, "fetch_size": 1024}       → {"columns": [...], "data": ["a\tb", ...], "has_more": true}
    {"op": "beeswax.get_results_metadata",
     "handle": h}                                   → {"schema": [{"name": ..., "type": ...}, ...]}
    {"op": "beeswax.get_state", "handle": h}        → {"state": "FINISHED"}
    {"op": "beeswax.echo", "s": "..."}              → {"echo": "..."}
    {"op": "beeswax.close", "handle": h}            → {"ok": true}

``start_over=true`` raises (the reference raises "Does not support
start over", SQLSTATE optional-feature-not-implemented).  Both
protocol twins share one handle space and the same paged
non-materializing fetch.

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

    def fetch_tsv(self, fetch_size: int) -> list[str]:
        """Beeswax Results.data page: each row one tab-delimited ASCII
        string (impala-beeswax-server.cc FetchInternal renders rows via
        the output exprs' ASCII form; NULL prints as ``NULL``)."""
        return [
            "\t".join("NULL" if v is None else str(v) for v in row)
            for row in self.fetch(fetch_size)
        ]


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
        if op in ("beeswax.query", "beeswax.executeAndWait"):
            # reference: query() registers + starts async, executeAndWait()
            # blocks until running — both return only the handle; results
            # stream through fetch. Spark execution is lazy either way, so
            # both map to handle registration here.
            df = self.session.sql(req["sql"])
            with self._lock:
                h = next(self._next)
                self._ops[h] = _Operation(df)
            return {"handle": h}
        if op == "beeswax.fetch":
            if req.get("start_over"):
                return {"error": "Does not support start over"}  # parity:
                # impala-beeswax-server.cc:260 raises OPTIONAL_FEATURE_NOT_IMPLEMENTED
            o = self._ops.get(req.get("handle"))
            if o is None:
                return {"error": "Invalid query handle"}
            # clamp non-positive sizes (the thrift twin guards the same
            # way): fetch_size<=0 would return 0 rows without ever
            # setting eos, spinning a loop-until-has_more client forever
            fetch_size = int(req.get("fetch_size", 1024))
            data = o.fetch_tsv(fetch_size if fetch_size > 0 else 1024)
            return {"columns": o.columns, "data": data, "has_more": not o.eos}
        if op == "beeswax.get_results_metadata":
            o = self._ops.get(req.get("handle"))
            if o is None:
                return {"error": "Invalid query handle"}
            return {
                "schema": [
                    {"name": c, "type": t} for c, t in zip(o.columns, o.types)
                ]
            }
        if op == "beeswax.get_state":
            o = self._ops.get(req.get("handle"))
            if o is None:
                return {"error": "Invalid query handle"}
            # QueryState enum subset: execution is synchronous here, so a
            # live handle is always FINISHED (results ready to fetch)
            return {"state": "FINISHED"}
        if op == "beeswax.echo":
            return {"echo": req.get("s", "")}
        if op == "beeswax.close":
            self._ops.pop(req.get("handle"), None)
            return {"ok": True}
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
