"""BeeswaxService over the REAL thrift binary wire protocol.

The reference serves its shell/client traffic as a thrift
BeeswaxService (``common/thrift/beeswax.thrift``; C++ handlers in
``be/src/service/impala-beeswax-server.cc``; ``shell/impala_shell.py``
connects with TBufferedTransport + TBinaryProtocol).  This module is
that service re-expressed on Spark: the hand-rolled TBinaryProtocol
(thrift_proto.py) carries hand-mapped beeswax.thrift structs, so a
stock generated beeswaxd client can speak to it byte-for-byte —
upgrading round 3's "newline-JSON stand-in transport" delta to the
genuine wire format for the Beeswax surface.

Struct maps (field ids from beeswax.thrift):
    Query            {1: query string}
    QueryHandle      {1: id, 2: log_context}
    QueryExplanation {1: textual}
    Results          {1: ready, 2: columns, 3: data(TSV), 4: start_row, 5: has_more}
    ResultsMetadata  {1: Schema{1: list<FieldSchema{1 name, 2 type, 3 comment}>,
                                2: map<string,string>}}
    BeeswaxException {1: message, 2: log_context, 3: handle, 4: errorCode, 5: SQLState}
    QueryNotFoundException {}
    ConfigVariable   {1: key, 2: value, 3: description}

Methods: the full BeeswaxService surface (query, executeAndWait,
explain, fetch, get_state, get_results_metadata, echo, dump_config,
get_log, get_default_configuration, close, clean) PLUS the
ImpalaService extension the stock reference shell actually drives
(``common/thrift/ImpalaService.thrift:172-200``; call sites in
``shell/impala_shell.py``):

    PingImpalaService  → TPingImpalaServiceResp{1: version}   (:642, first RPC on connect)
    Cancel             → TStatus                              (:985, ^C)
    ResetCatalog       → TStatus  (deprecated; → clearCache)
    ResetTable         → TStatus  (deprecated; → refreshTable)
    GetRuntimeProfile  → string   (:999; Spark QueryExecution text)
    CloseInsert        → TInsertResult{1: map<string,i64>}    (:844, after DML)
    GetExecSummary     → TExecSummary{1: state}               (`summary` command)

Extension struct maps: TStatus {1: i32 code, 2: list<string> msgs};
TInsertResult rows_appended is keyed by partition in the reference —
Spark's DataWritingCommandExec metric exposes the TOTAL row count
(numOutputRows) but not per-partition splits, so the map carries one
entry under key "" (the shell only ever sums the values:
impala_shell.py:852).

Query.configuration options are scoped to the OPERATION lifetime (the
reference scopes them to the query's TQueryCtx): applied before
planning, held while the client fetches (so execution-time Spark confs
are genuinely active when the lazy plan runs), and restored at
close/CloseInsert/clean.  The server session is shared, so a per-key
owner table arbitrates overlapping clients: a key is restored only by
the operation that last applied it — a later conflicting apply takes
ownership and the earlier op's restore becomes a no-op (documented
delta: the reference gives every query a private TQueryCtx; one shared
SparkSession cannot, so overlapping conflicting options follow
last-writer-wins during the overlap).
"""

from __future__ import annotations

import itertools
import socket
import socketserver
import threading
from typing import Any

from impala_cut_spark import thrift_proto as tp
from impala_cut_spark.server import _Operation
from impala_cut_spark.session import ImpalaSession

QUERY_STATE_FINISHED = 4  # beeswax.thrift QueryState enum position
QUERY_STATE_EXCEPTION = 5
TSTATUS_OK = 0  # Status.thrift TStatusCode
TSTATUS_RUNTIME_ERROR = 4
EXEC_STATE_FINISHED = 4  # ExecStats.thrift TExecState
VERSION_STRING = "impala_cut_spark shell server (PySpark re-expression)"


class _NullCtx:
    """No-op context manager (lock already held)."""

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class BeeswaxError(Exception):
    """Maps to BeeswaxException on the wire."""


class QueryNotFound(Exception):
    """Maps to QueryNotFoundException on the wire."""


def _write_query_handle(w: tp.BinaryWriter, handle: str) -> None:
    w.field(tp.STRUCT, 0)
    w.field(tp.STRING, 1)
    w.write_string(handle)
    w.field(tp.STRING, 2)
    w.write_string("")
    w.stop()  # QueryHandle
    w.stop()  # result struct


def _read_handle(args: dict[int, Any], fid: int = 1) -> str:
    h = args.get(fid, {})
    return h.get(1, b"").decode() if isinstance(h, dict) else ""


class BeeswaxThriftServer:
    """Threaded TCP thrift server around one ImpalaSession — the
    thrift-wire twin of server.py's jsonl QueryServer, sharing its
    _Operation paged-fetch machinery."""

    def __init__(
        self,
        session: ImpalaSession | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
        auth=None,
    ):
        """``auth``: optional (user, password) → bool validator — when
        set, every connection must complete a SASL/PLAIN negotiation
        first (the reference's LDAP auth path: LdapAuthProvider wraps
        the server transport in PLAIN/SASL, auth-provider.h:114-121;
        the stand-in for its ldap_simple_bind_s credential check)."""
        self.session = session or ImpalaSession()
        self._ops: dict[str, _Operation] = {}
        self._next = itertools.count(1)
        self._lock = threading.Lock()
        self._auth = auth
        # Query.configuration scoping: key → handle of the operation
        # that last applied it (see module docstring); an op restores
        # only the keys it still owns at close time
        self._opt_owner: dict[str, str] = {}
        # connection ownership: handler-thread id → handles opened on
        # that connection and not yet closed.  Each connection is
        # served by exactly one ThreadingTCPServer thread, so the
        # thread id identifies the connection; Handler.handle()'s
        # finally block closes whatever the client left open — without
        # this, a crashed shell that shipped options (mem_limit,
        # default_order_by_limit…) mutated the shared session for every
        # future client (r7 ADVICE).
        self._conn_handles: dict[int, set[str]] = {}
        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self) -> None:
                rfile, wfile = self.rfile, self.wfile
                if outer._auth is not None:
                    from impala_cut_spark import sasl_transport as st

                    try:
                        st.server_negotiate(rfile, wfile, outer._auth)
                    except (st.SaslError, EOFError):
                        return  # reject: negotiation reply already sent
                    # reuse the SAME rfile/wfile pair (the buffered
                    # reader may have consumed bytes past negotiation)
                    rfile = wfile = st.FramedFile(rfile, wfile)
                tid = threading.get_ident()
                outer._conn_handles[tid] = set()
                try:
                    r = tp.BinaryReader(rfile)
                    while True:
                        try:
                            name, mtype, seqid = r.message_begin()
                        except EOFError:
                            return
                        args = r.read_struct()
                        wfile.write(outer._dispatch(name, seqid, args))
                        wfile.flush()
                finally:
                    # connection teardown: release every operation the
                    # client never closed (disconnect, crash, ^C) so
                    # its shipped options are restored for other clients
                    for h in outer._conn_handles.pop(tid, ()):
                        outer._close_op(h)

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.host, self.port = self._server.server_address

    # -- method dispatch ---------------------------------------------------

    def _dispatch(self, name: str, seqid: int, args: dict[int, Any]) -> bytes:
        w = tp.BinaryWriter()
        fn = getattr(self, f"_m_{name}", None)
        if fn is None:
            # a stock generated client has no IDL for this method, so a
            # REPLY with a declared-exception slot would be misparsed —
            # thrift's contract is an EXCEPTION message with
            # TApplicationException(UNKNOWN_METHOD)
            return tp.application_exception(
                name, seqid, f"Invalid method name: '{name}'"
            )
        try:
            w.message_begin(name, tp.REPLY, seqid)
            fn(w, args)
        except QueryNotFound:
            w = tp.BinaryWriter()
            w.message_begin(name, tp.REPLY, seqid)
            w.field(tp.STRUCT, 1)
            w.stop()  # empty QueryNotFoundException
            w.stop()
        except BeeswaxError as e:
            w = tp.BinaryWriter()
            w.message_begin(name, tp.REPLY, seqid)
            # fetch/CloseInsert/GetExecSummary declare
            # QueryNotFoundException at 1 and BeeswaxException at 2;
            # every other method declares BeeswaxException at 1
            exc_fid = 2 if name in ("fetch", "CloseInsert", "GetExecSummary") else 1
            w.field(tp.STRUCT, exc_fid)
            w.field(tp.STRING, 1)
            w.write_string(str(e))
            w.field(tp.I32, 4)
            w.write_i32(1)
            w.stop()
            w.stop()
        except Exception as e:  # noqa: BLE001 — handler bug must not
            # drop the connection with no reply; the thrift contract
            # for an undeclared server-side failure is an EXCEPTION
            # message carrying TApplicationException(INTERNAL_ERROR)
            return tp.application_exception(
                name, seqid, f"{type(e).__name__}: {e}", tp.INTERNAL_ERROR
            )
        return w.bytes()

    def _execute(self, args: dict[int, Any]) -> str:
        q = args.get(1, {})
        sql = q.get(1, b"").decode() if isinstance(q, dict) else ""
        # Query.configuration (beeswax.thrift field 3: list<string>
        # "k=v") — the reference shell ships its SET options with every
        # query and impalad applies them scoped to THAT query's
        # TQueryCtx (impala-beeswax-server.cc QueryToTQueryContext).
        # Options are held for the OPERATION lifetime — applied before
        # planning, restored at close — so execution-time Spark confs
        # are active when the client's fetch actually runs the plan.
        # The apply window is serialized under the server lock.
        shipped: list[tuple[str, str]] = []
        if isinstance(q, dict):
            for item in q.get(3) or []:
                s = item.decode() if isinstance(item, (bytes, bytearray)) else str(item)
                if "=" in s:
                    k, v = s.split("=", 1)
                    shipped.append((k.strip().lower(), v.strip()))
        with self._lock:
            h = str(next(self._next))
            before = self.session.options()
            restore: dict[str, str | None] = {}
            for k, _ in shipped:
                prev_owner = self._opt_owner.get(k)
                if prev_owner is not None and prev_owner in self._ops:
                    # the current session value is another live op's
                    # TRANSIENT setting — inherit ITS restore target,
                    # else closing last would re-impose the transient
                    restore[k] = self._ops[prev_owner]._restore.get(k)
                else:
                    restore[k] = before.get(k)
            for k, v in shipped:
                self.session.set_option(k, v)
                self._opt_owner[k] = h
            try:
                df = self.session.sql(sql)
            except Exception as e:  # noqa: BLE001 — analysis error → client
                self._release_options(h, restore, locked=True)
                raise BeeswaxError(f"{type(e).__name__}: {e}") from e
            op = _Operation(df)
            op._df = df  # for GetRuntimeProfile / GetExecSummary
            op._restore = restore
            op.rows_appended = self._insert_rows(df, sql)
            self._ops[h] = op
            owned = self._conn_handles.get(threading.get_ident())
            if owned is not None:  # None: direct in-process call, no conn
                owned.add(h)
        return h

    @staticmethod
    def _insert_rows(df, sql: str) -> dict[str, int] | None:
        """For DML, the total-rows-written metric of the eagerly-run
        write command (Spark's DataWritingCommandExec numOutputRows) —
        what CloseInsert reports.  None for non-DML."""
        import re

        if not re.match(r"^\s*(insert|load\s+data)\b", sql, re.IGNORECASE):
            return None
        total = 0
        try:
            cmd = df._jdf.queryExecution().executedPlan().commandPhysicalPlan()
            it = cmd.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    total = int(kv._2().value())
        except Exception:  # noqa: BLE001 — LOAD DATA has no write plan
            total = 0
        return {"": total}

    def _release_options(self, h: str, restore: dict[str, str | None], locked: bool = False) -> None:
        """Restore the option keys this operation still owns (a later
        conflicting apply takes ownership — last-writer-wins)."""
        ctx = _NullCtx() if locked else self._lock
        with ctx:
            for k, v in restore.items():
                if self._opt_owner.get(k) != h:
                    continue
                del self._opt_owner[k]
                if v is None:
                    self.session.unset_option(k)
                else:
                    self.session.set_option(k, v)

    def _close_op(self, handle: str) -> _Operation | None:
        op = self._ops.pop(handle, None)
        if op is not None:
            self._release_options(handle, getattr(op, "_restore", {}))
            owned = self._conn_handles.get(threading.get_ident())
            if owned is not None:
                owned.discard(handle)
        return op

    def _op(self, args: dict[int, Any]) -> _Operation:
        o = self._ops.get(_read_handle(args))
        if o is None:
            raise QueryNotFound()
        return o

    def _m_query(self, w: tp.BinaryWriter, args) -> None:
        _write_query_handle(w, self._execute(args))

    def _m_executeAndWait(self, w: tp.BinaryWriter, args) -> None:
        _write_query_handle(w, self._execute(args))

    def _m_explain(self, w: tp.BinaryWriter, args) -> None:
        q = args.get(1, {})
        sql = q.get(1, b"").decode() if isinstance(q, dict) else ""
        try:
            text = self.session.explain(sql)
        except Exception as e:  # noqa: BLE001
            raise BeeswaxError(f"{type(e).__name__}: {e}") from e
        w.field(tp.STRUCT, 0)
        w.field(tp.STRING, 1)
        w.write_string(text)
        w.stop()
        w.stop()

    def _m_fetch(self, w: tp.BinaryWriter, args) -> None:
        if args.get(2):
            raise BeeswaxError("Does not support start over")
        o = self._op(args)
        fetch_size = args.get(3, -1)
        if fetch_size is None or fetch_size <= 0:
            fetch_size = 1024
        start_row = getattr(o, "_beeswax_row", 0)
        data = o.fetch_tsv(fetch_size)
        o._beeswax_row = start_row + len(data)
        w.field(tp.STRUCT, 0)
        w.field(tp.BOOL, 1)
        w.write_bool(True)
        w.write_string_list(2, list(o.columns))
        w.write_string_list(3, data)
        w.field(tp.I64, 4)
        w.write_i64(start_row)
        w.field(tp.BOOL, 5)
        w.write_bool(not o.eos)
        w.stop()
        w.stop()

    def _m_get_state(self, w: tp.BinaryWriter, args) -> None:
        self._op(args)
        w.field(tp.I32, 0)
        w.write_i32(QUERY_STATE_FINISHED)
        w.stop()

    def _m_get_results_metadata(self, w: tp.BinaryWriter, args) -> None:
        o = self._op(args)
        w.field(tp.STRUCT, 0)
        w.field(tp.STRUCT, 1)  # Schema
        w.field(tp.LIST, 1)
        w.list_begin(tp.STRUCT, len(o.columns))
        for c, t in zip(o.columns, o.types):
            w.field(tp.STRING, 1)
            w.write_string(c)
            w.field(tp.STRING, 2)
            w.write_string(t)
            w.field(tp.STRING, 3)
            w.write_string("")
            w.stop()
        w.field(tp.MAP, 2)
        w.map_begin(tp.STRING, tp.STRING, 0)
        w.stop()  # Schema
        w.stop()  # ResultsMetadata
        w.stop()

    def _m_echo(self, w: tp.BinaryWriter, args) -> None:
        w.field(tp.STRING, 0)
        w.write_string(args.get(1, b""))
        w.stop()

    def _m_dump_config(self, w: tp.BinaryWriter, args) -> None:
        opts = ",".join(f"{k}={v}" for k, v in sorted(self.session.options().items()))
        w.field(tp.STRING, 0)
        w.write_string(opts)
        w.stop()

    def _m_get_log(self, w: tp.BinaryWriter, args) -> None:
        w.field(tp.STRING, 0)
        w.write_string("")
        w.stop()

    def _m_get_default_configuration(self, w: tp.BinaryWriter, args) -> None:
        items = sorted(self.session.options().items())
        w.field(tp.LIST, 0)
        w.list_begin(tp.STRUCT, len(items))
        for k, v in items:
            w.field(tp.STRING, 1)
            w.write_string(str(k))
            w.field(tp.STRING, 2)
            w.write_string(str(v))
            w.field(tp.STRING, 3)
            w.write_string("")
            w.stop()
        w.stop()

    def _m_close(self, w: tp.BinaryWriter, args) -> None:
        if self._close_op(_read_handle(args)) is None:
            raise QueryNotFound()
        w.stop()  # void

    def _m_clean(self, w: tp.BinaryWriter, args) -> None:
        # clean(1: LogContextId log_context) — LogContextId is a plain
        # STRING in beeswax.thrift, NOT a QueryHandle struct (r7
        # ADVICE: parsing it with _read_handle yielded '' for a string
        # field, so clean never released the operation or its shipped
        # options).  The handle id doubles as the log context; a
        # struct-shaped sender still resolves via _read_handle.
        h = args.get(1)
        handle = (
            h.decode() if isinstance(h, (bytes, bytearray)) else _read_handle(args)
        )
        self._close_op(handle)
        w.stop()  # void

    # -- ImpalaService extension (ImpalaService.thrift:172-200) -------------

    def _write_tstatus(self, w: tp.BinaryWriter, code: int = TSTATUS_OK,
                       msgs: tuple[str, ...] = ()) -> None:
        w.field(tp.STRUCT, 0)
        w.field(tp.I32, 1)
        w.write_i32(code)
        w.write_string_list(2, list(msgs))
        w.stop()  # TStatus
        w.stop()  # result

    def _m_PingImpalaService(self, w: tp.BinaryWriter, args) -> None:
        # first RPC the stock shell sends on connect
        # (shell/impala_shell.py:642) — it requires a parseable reply,
        # not TApplicationException, to consider the server an impalad
        w.field(tp.STRUCT, 0)
        w.field(tp.STRING, 1)
        w.write_string(f"{VERSION_STRING} [spark {self.session.spark.version}]")
        w.stop()  # TPingImpalaServiceResp
        w.stop()

    def _m_Cancel(self, w: tp.BinaryWriter, args) -> None:
        # every query here runs to completion at execute time, so
        # Cancel on a live handle is the reference's cancel-after-
        # finish case: TStatus(OK); an unknown handle throws
        # BeeswaxException per the IDL
        if self._ops.get(_read_handle(args)) is None:
            raise BeeswaxError("Invalid query handle")
        self._write_tstatus(w)

    def _m_ResetCatalog(self, w: tp.BinaryWriter, args) -> None:
        # deprecated alias of INVALIDATE METADATA — drop cached
        # relation data/metadata so the next access reloads
        self.session.spark.catalog.clearCache()
        self._write_tstatus(w)

    def _m_ResetTable(self, w: tp.BinaryWriter, args) -> None:
        # deprecated alias of REFRESH <table>; TResetTableReq
        # {1: db_name, 2: table_name}
        req = args.get(1, {})
        db = (req.get(1, b"") or b"").decode() if isinstance(req, dict) else ""
        tbl = (req.get(2, b"") or b"").decode() if isinstance(req, dict) else ""
        name = f"{db}.{tbl}" if db and db != "default" else tbl
        try:
            self.session.spark.catalog.refreshTable(name)
        except Exception as e:  # noqa: BLE001 — unknown table → error status
            self._write_tstatus(w, TSTATUS_RUNTIME_ERROR, (f"{type(e).__name__}: {e}",))
            return
        self._write_tstatus(w)

    def _m_GetRuntimeProfile(self, w: tp.BinaryWriter, args) -> None:
        # the reference returns the coordinator's runtime profile tree;
        # the Spark-side equivalent is the QueryExecution summary
        # (parsed/analyzed/optimized/physical plans)
        op = self._ops.get(_read_handle(args))
        if op is None:  # IDL declares only BeeswaxException here
            raise BeeswaxError("Invalid query handle")
        text = f"Query Runtime Profile (Spark QueryExecution):\n{op._df._jdf.queryExecution().toString()}"
        w.field(tp.STRING, 0)  # IDL: returns a bare string
        w.write_string(text)
        w.stop()

    def _m_CloseInsert(self, w: tp.BinaryWriter, args) -> None:
        # closes the handle and reports rows appended (the shell sums
        # the map's values: impala_shell.py:852); keyed "" — Spark's
        # write metric is the total, not per-partition (module doc)
        # single atomic pop — a get-then-close pair raced with a
        # concurrent close on the same handle (r7 ADVICE: op became
        # None between the two and the client got INTERNAL_ERROR
        # instead of QueryNotFoundException)
        op = self._close_op(_read_handle(args))
        if op is None:
            raise QueryNotFound()
        rows = op.rows_appended or {"": 0}
        w.field(tp.STRUCT, 0)
        w.field(tp.MAP, 1)
        w.map_begin(tp.STRING, tp.I64, len(rows))
        for k, v in rows.items():
            w.write_string(k)
            w.write_i64(int(v))
        w.stop()  # TInsertResult
        w.stop()

    def _m_GetExecSummary(self, w: tp.BinaryWriter, args) -> None:
        # TExecSummary{1: required TExecState state} — queries here are
        # complete by fetch time, so FINISHED; per-node stats are a
        # C++-runtime concept with no Spark twin (profile carries the
        # plan text instead)
        if self._ops.get(_read_handle(args)) is None:
            raise QueryNotFound()
        w.field(tp.STRUCT, 0)
        w.field(tp.I32, 1)
        w.write_i32(EXEC_STATE_FINISHED)
        w.stop()  # TExecSummary
        w.stop()

    # -- lifecycle ---------------------------------------------------------

    def serve_background(self) -> threading.Thread:
        t = threading.Thread(target=self._server.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self) -> None:
        self._server.shutdown()
        self._server.server_close()


class BeeswaxThriftClient:
    """Minimal TBinaryProtocol beeswax client (the impala_shell.py-side
    counterpart) — used by tests to drive the server exactly as a
    generated thrift client would."""

    def __init__(self, host: str, port: int, user: str | None = None, password: str = ""):
        """``user``: when given, run the SASL/PLAIN negotiation first —
        the stock shell's LDAP mode (TSaslClientTransport(…, "PLAIN",
        sock), shell/impala_shell.py:694)."""
        self._sock = socket.create_connection((host, port))
        self._f = self._sock.makefile("rwb")
        if user is not None:
            from impala_cut_spark import sasl_transport as st

            st.client_negotiate(self._f, user, password)
            self._f = st.FramedFile(self._f)
        self._seq = itertools.count(1)

    def _call(self, name: str, build_args) -> dict[int, Any]:
        w = tp.BinaryWriter()
        seqid = next(self._seq)
        w.message_begin(name, tp.CALL, seqid)
        build_args(w)
        w.stop()
        self._f.write(w.bytes())
        self._f.flush()
        r = tp.BinaryReader(self._f)
        rname, mtype, rseq = r.message_begin()
        if (rname, rseq) != (name, seqid):
            raise tp.TProtocolError(f"out-of-order reply {rname}/{rseq}")
        result = r.read_struct()
        tp.raise_if_exception(mtype, result)
        if 0 in result or not result:
            return result
        exc_fid, exc = next(iter(result.items()))
        if isinstance(exc, dict) and not exc:
            raise QueryNotFound()
        msg = exc.get(1, b"").decode() if isinstance(exc, dict) else str(exc)
        raise BeeswaxError(msg)

    @staticmethod
    def _query_args(sql: str, configuration: list[str] | None = None):
        def build(w: tp.BinaryWriter) -> None:
            w.field(tp.STRUCT, 1)
            w.field(tp.STRING, 1)
            w.write_string(sql)
            if configuration:
                # Query.configuration: list<string> "k=v" (beeswax.thrift)
                w.write_string_list(3, configuration)
            w.stop()

        return build

    @staticmethod
    def _handle_args(handle: str, fid: int = 1):
        def build(w: tp.BinaryWriter) -> None:
            w.field(tp.STRUCT, fid)
            w.field(tp.STRING, 1)
            w.write_string(handle)
            w.field(tp.STRING, 2)
            w.write_string("")
            w.stop()

        return build

    def query(self, sql: str, configuration: list[str] | None = None) -> str:
        return self._call("query", self._query_args(sql, configuration))[0][1].decode()

    def execute_and_wait(self, sql: str) -> str:
        return self._call("executeAndWait", self._query_args(sql))[0][1].decode()

    def explain(self, sql: str) -> str:
        return self._call("explain", self._query_args(sql))[0][1].decode()

    def fetch(self, handle: str, fetch_size: int = 1024, start_over: bool = False):
        def build(w: tp.BinaryWriter) -> None:
            self._handle_args(handle)(w)
            w.field(tp.BOOL, 2)
            w.write_bool(start_over)
            w.field(tp.I32, 3)
            w.write_i32(fetch_size)

        res = self._call("fetch", build)[0]
        return {
            "columns": [c.decode() for c in res[2]],
            "data": [d.decode() for d in res[3]],
            "start_row": res[4],
            "has_more": res[5],
        }

    def get_state(self, handle: str) -> int:
        return self._call("get_state", self._handle_args(handle))[0]

    def get_results_metadata(self, handle: str) -> list[tuple[str, str]]:
        schema = self._call("get_results_metadata", self._handle_args(handle))[0][1]
        return [(f[1].decode(), f[2].decode()) for f in schema[1]]

    def echo(self, s: str) -> str:
        def build(w: tp.BinaryWriter) -> None:
            w.field(tp.STRING, 1)
            w.write_string(s)

        return self._call("echo", build)[0].decode()

    def close_query(self, handle: str) -> None:
        self._call("close", self._handle_args(handle))

    def clean(self, log_context: str) -> None:
        # clean(1: LogContextId log_context) — a STRING field, exactly
        # as a stock generated client marshals it
        def build(w: tp.BinaryWriter) -> None:
            w.field(tp.STRING, 1)
            w.write_string(log_context)

        self._call("clean", build)

    # -- ImpalaService extension (what the stock shell drives) --------------

    def ping_impala_service(self) -> str:
        return self._call("PingImpalaService", lambda w: None)[0][1].decode()

    def cancel(self, handle: str) -> int:
        """→ TStatus.status_code."""
        return self._call("Cancel", self._handle_args(handle))[0][1]

    def reset_catalog(self) -> int:
        return self._call("ResetCatalog", lambda w: None)[0][1]

    def reset_table(self, db: str, table: str) -> int:
        def build(w: tp.BinaryWriter) -> None:
            w.field(tp.STRUCT, 1)
            w.field(tp.STRING, 1)
            w.write_string(db)
            w.field(tp.STRING, 2)
            w.write_string(table)
            w.stop()

        return self._call("ResetTable", build)[0][1]

    def get_runtime_profile(self, handle: str) -> str:
        return self._call("GetRuntimeProfile", self._handle_args(handle))[0].decode()

    def close_insert(self, handle: str) -> dict[str, int]:
        res = self._call("CloseInsert", self._handle_args(handle))[0]
        return {k.decode(): v for k, v in res.get(1, {}).items()}

    def get_exec_summary(self, handle: str) -> int:
        """→ TExecSummary.state."""
        return self._call("GetExecSummary", self._handle_args(handle))[0][1]

    def close(self) -> None:
        self._f.close()
        self._sock.close()


def main() -> None:  # pragma: no cover — interactive entry point
    import argparse

    from impala_cut_spark.sources.catalog import register_views

    ap = argparse.ArgumentParser(description="impala_cut_spark Beeswax thrift server")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=21000)  # reference beeswax default
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()
    session = ImpalaSession()
    register_views(session.spark, args.sf_dir)
    srv = BeeswaxThriftServer(session, host=args.host, port=args.port)
    print(f"BeeswaxService listening on {srv.host}:{srv.port} (thrift binary)", flush=True)
    srv._server.serve_forever()


if __name__ == "__main__":
    main()
