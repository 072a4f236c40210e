"""TCLIService (HiveServer2) over the real thrift binary wire protocol.

The reference's second client surface
(``be/src/service/impala-hs2-server.cc``; IDL
``common/thrift/cli_service.thrift``).  Like thrift_server.py's
BeeswaxService, the structs are hand-mapped from the IDL onto the
from-scratch TBinaryProtocol (thrift_proto.py), so a generated
TCLIService client — the thing an Impala JDBC/ODBC driver is —
interoperates byte-for-byte.

Protocol negotiation: OpenSession clamps the client's requested
TProtocolVersion to V6.  V6+ sessions get columnar TRowSets
(list<TColumn> with per-column nulls bitmaps — what a current
JDBC/ODBC driver expects); V1-V5 sessions keep the row-oriented
TRowSet the reference era served.

Method surface: OpenSession / CloseSession / GetInfo /
ExecuteStatement / GetOperationStatus / FetchResults (FETCH_NEXT +
FETCH_FIRST cursor restart) /
GetResultSetMetadata / CloseOperation / CancelOperation / GetLog and
the JDBC metadata operations GetCatalogs / GetSchemas / GetTables /
GetTableTypes / GetColumns / GetTypeInfo / GetFunctions (each returns
an operation whose result set follows the JDBC column conventions, fed
from the Spark catalog).

Value rendering follows impala-hs2-server.cc:852-930: integer types →
their exact TColumnValue arm, FLOAT/DOUBLE → doubleVal, TIMESTAMP /
STRING / DECIMAL → stringVal; NULL = the optional value field unset.
"""

from __future__ import annotations

import itertools
import re
import socket
import socketserver
import struct
import threading
from typing import Any, Callable

from impala_cut_spark import thrift_proto as tp
from impala_cut_spark.session import ImpalaSession

# TTypeId enum positions (cli_service.thrift)
_TYPE_IDS = {
    "boolean": 0, "tinyint": 1, "smallint": 2, "int": 3, "bigint": 4,
    "float": 5, "double": 6, "string": 7, "timestamp": 8, "binary": 9,
}
DECIMAL_TYPE_ID = 15

#: Spark simpleString dtype → (TColumnValue union field id, writer)
_VALUE_ARMS: dict[str, tuple[int, int]] = {
    "boolean": (1, tp.BOOL),
    "tinyint": (2, tp.BYTE),
    "smallint": (3, tp.I16),
    "int": (4, tp.I32),
    "bigint": (5, tp.I64),
    "float": (6, tp.DOUBLE),
    "double": (6, tp.DOUBLE),
}

SUCCESS, ERROR_STATUS, INVALID_HANDLE = 0, 3, 4
FINISHED_STATE, ERROR_STATE = 2, 5
OP_EXECUTE = 0
FETCH_NEXT = 0
FETCH_FIRST = 4  # TFetchOrientation — restart the result cursor
#: TProtocolVersion enum values (cli_service.thrift). V6 is the
#: columnar-TRowSet generation a current JDBC/ODBC driver negotiates;
#: the server accepts any requested version and clamps to V6.
PROTOCOL_V1 = 0
PROTOCOL_V6 = 5


class HS2Error(Exception):
    def __init__(self, message: str, code: int = ERROR_STATUS):
        super().__init__(message)
        self.code = code


def _type_id(dtype: str) -> int:
    if dtype.startswith("decimal"):
        return DECIMAL_TYPE_ID
    return _TYPE_IDS.get(dtype, _TYPE_IDS["string"])


def _like_to_regex(pattern: str | None) -> re.Pattern:
    """JDBC metadata patterns: % = any, _ = one char, None = all."""
    if pattern in (None, "", "%"):
        return re.compile(".*", re.IGNORECASE)
    esc = re.escape(pattern).replace("%", ".*").replace("_", ".")
    return re.compile(f"^{esc}$", re.IGNORECASE)


class _HS2Op:
    """One operation: schema (name, dtype) pairs + a paged row cursor.

    The cursor is a restartable iterator factory so FETCH_FIRST can
    re-run it (impala-hs2-server.cc restarts the fetch from the
    cached/re-executed results the same way)."""

    def __init__(self, columns: list[tuple[str, str]], rows, proto: int = PROTOCOL_V1):
        self.columns = columns
        self._restart = lambda: iter(rows)  # rows: re-iterable list
        self.proto = proto
        self.rewind()

    @classmethod
    def from_df(cls, df, proto: int = PROTOCOL_V1) -> "_HS2Op":
        op = cls.__new__(cls)
        op.columns = list(df.dtypes)
        op._restart = df.toLocalIterator  # lazy: nothing collected
        op.proto = proto
        op.rewind()
        return op

    def rewind(self) -> None:
        self._rows = iter(self._restart())
        self.start_row = 0
        self.eos = False

    def fetch(self, max_rows: int) -> list[tuple]:
        out = list(itertools.islice(self._rows, max_rows))
        if len(out) < max_rows:
            self.eos = True
        page_start = self.start_row
        self.start_row += len(out)
        self._page_start = page_start
        return out


class HS2ThriftServer:
    """Threaded TCP TCLIService around one ImpalaSession."""

    def __init__(
        self,
        session: ImpalaSession | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
        auth=None,
    ):
        """``auth``: optional (user, password) → bool validator — when
        set, connections must complete SASL/PLAIN first (the
        reference's LDAP path wraps BOTH the beeswax and HS2 services:
        be/src/rpc/auth-provider.h:114-121)."""
        self.session = session or ImpalaSession()
        self._auth = auth
        self._ops: dict[bytes, _HS2Op] = {}
        self._sessions: set[bytes] = set()
        #: per-session negotiated TProtocolVersion (V6 clients get
        #: columnar TRowSets; V1-V5 get row-oriented ones)
        self._session_proto: dict[bytes, int] = {}
        #: per-session option snapshots: {guid: {key: prior-or-None}}
        #: so CloseSession restores what OpenSession's configuration set
        self._session_opts: dict[bytes, dict[str, str | None]] = {}
        self._next = itertools.count(1)
        self._lock = threading.Lock()
        # connection ownership (same contract as thrift_server.py,
        # round 8): each connection is served by exactly one handler
        # thread, so the thread id keys the sessions/operations opened
        # on it; Handler.handle()'s finally block closes whatever the
        # client left open — a crashed JDBC client must not leave its
        # OpenSession configuration applied to the shared engine
        # session for every future client, nor leak operation state.
        self._conn_sessions: dict[int, set[bytes]] = {}
        self._conn_ops: dict[int, set[bytes]] = {}
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
                    rfile = wfile = st.FramedFile(rfile, wfile)
                tid = threading.get_ident()
                outer._conn_sessions[tid] = set()
                outer._conn_ops[tid] = set()
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
                    for g in outer._conn_ops.pop(tid, ()):
                        outer._ops.pop(g, None)
                    for g in outer._conn_sessions.pop(tid, ()):
                        outer._close_session(g)

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.host, self.port = self._server.server_address

    # -- wire helpers ------------------------------------------------------

    def _new_handle(self) -> bytes:
        with self._lock:
            return struct.pack(">QQ", 0, next(self._next))

    @staticmethod
    def _status(w: tp.BinaryWriter, code: int = SUCCESS, message: str | None = None) -> None:
        w.field(tp.STRUCT, 1)  # resp.status
        w.field(tp.I32, 1)
        w.write_i32(code)
        if message is not None:
            w.field(tp.STRING, 5)
            w.write_string(message)
        w.stop()

    @staticmethod
    def _handle_struct(w: tp.BinaryWriter, fid: int, guid: bytes, op_type: int | None = None) -> None:
        w.field(tp.STRUCT, fid)
        w.field(tp.STRUCT, 1)  # THandleIdentifier
        w.field(tp.STRING, 1)
        w.write_string(guid)
        w.field(tp.STRING, 2)
        w.write_string(b"\x00" * 16)
        w.stop()
        if op_type is not None:  # TOperationHandle extras
            w.field(tp.I32, 2)
            w.write_i32(op_type)
            w.field(tp.BOOL, 3)
            w.write_bool(True)
        w.stop()

    @staticmethod
    def _read_guid(args: dict[int, Any], fid: int = 1) -> bytes:
        h = args.get(fid, {})
        ident = h.get(1, {}) if isinstance(h, dict) else {}
        return ident.get(1, b"") if isinstance(ident, dict) else b""

    def _register(self, op: _HS2Op) -> bytes:
        guid = self._new_handle()
        self._ops[guid] = op
        owned = self._conn_ops.get(threading.get_ident())
        if owned is not None:  # None: direct in-process call, no conn
            owned.add(guid)
        return guid

    def _op(self, args: dict[int, Any]) -> _HS2Op:
        o = self._ops.get(self._read_guid(args))
        if o is None:
            raise HS2Error("Invalid operation handle", INVALID_HANDLE)
        return o

    # -- dispatch ----------------------------------------------------------

    def _dispatch(self, name: str, seqid: int, args: dict[int, Any]) -> bytes:
        fn: Callable | None = getattr(self, f"_m_{name}", None)
        if fn is None:
            # unknown method → thrift EXCEPTION message (see
            # thrift_proto.application_exception) — a generated client
            # would misparse an unsolicited REPLY struct
            return tp.application_exception(
                name, seqid, f"Invalid method name: '{name}'"
            )
        w = tp.BinaryWriter()
        w.message_begin(name, tp.REPLY, seqid)
        w.field(tp.STRUCT, 0)  # resp struct
        try:
            req = args.get(1, {})
            fn(w, req if isinstance(req, dict) else {})
        except HS2Error as e:
            w = tp.BinaryWriter()
            w.message_begin(name, tp.REPLY, seqid)
            w.field(tp.STRUCT, 0)
            self._status(w, e.code, str(e))
        except Exception as e:  # noqa: BLE001 — analysis errors → TStatus
            w = tp.BinaryWriter()
            w.message_begin(name, tp.REPLY, seqid)
            w.field(tp.STRUCT, 0)
            self._status(w, ERROR_STATUS, f"{type(e).__name__}: {e}")
        w.stop()  # resp struct
        w.stop()  # method-result struct
        return w.bytes()

    # -- session lifecycle -------------------------------------------------

    def _m_OpenSession(self, w: tp.BinaryWriter, req: dict) -> None:
        # TOpenSessionReq.configuration scopes to THIS HS2 session in
        # the reference (impala-hs2-server.cc OpenSession →
        # session_state->default_query_options) — snapshot prior values
        # so CloseSession can restore the shared engine session
        before = self.session.options()
        applied: dict[str, str | None] = {}
        for k, v in (req.get(4) or {}).items():
            try:
                key = k.decode().lower()
                self.session.set_option(key, v.decode())
                applied[key] = before.get(key)
            except Exception:  # noqa: BLE001 — unknown conf keys are advisory
                pass
        guid = self._new_handle()
        self._sessions.add(guid)
        if applied:
            self._session_opts[guid] = applied
        owned = self._conn_sessions.get(threading.get_ident())
        if owned is not None:
            owned.add(guid)
        # negotiate: serve the client's version, clamped to V6 (the
        # highest generation implemented; thrift enums are ordered so
        # min() is the correct handshake on both sides)
        try:
            requested = int(req.get(1, PROTOCOL_V1) or 0)
        except (TypeError, ValueError):
            requested = PROTOCOL_V1
        proto = min(requested, PROTOCOL_V6)
        self._session_proto[guid] = proto
        self._status(w)
        w.field(tp.I32, 2)
        w.write_i32(proto)
        self._handle_struct(w, 3, guid)

    def _close_session(self, guid: bytes) -> None:
        """Release a session: drop its registry entries and restore the
        options its OpenSession configuration set — shared by
        CloseSession and connection teardown (a crashed client must
        not leave options applied for every future client)."""
        self._sessions.discard(guid)
        self._session_proto.pop(guid, None)
        for key, prior in self._session_opts.pop(guid, {}).items():
            if prior is None:
                self.session.unset_option(key)
            else:
                self.session.set_option(key, prior)

    def _m_CloseSession(self, w: tp.BinaryWriter, req: dict) -> None:
        guid = self._read_guid(req)
        self._close_session(guid)
        owned = self._conn_sessions.get(threading.get_ident())
        if owned is not None:
            owned.discard(guid)
        self._status(w)

    def _proto(self, req: dict) -> int:
        return self._session_proto.get(self._read_guid(req, 1), PROTOCOL_V1)

    def _m_GetInfo(self, w: tp.BinaryWriter, req: dict) -> None:
        info_type = req.get(2, 0)
        value = {17: "Impala (impala_cut_spark)", 18: "1.0", 13: "impala_cut_spark"}.get(
            info_type, ""
        )
        self._status(w)
        w.field(tp.STRUCT, 2)  # TGetInfoValue union: stringValue
        w.field(tp.STRING, 1)
        w.write_string(value)
        w.stop()

    # -- statements --------------------------------------------------------

    def _m_ExecuteStatement(self, w: tp.BinaryWriter, req: dict) -> None:
        sql = req.get(2, b"").decode()
        df = self.session.sql(sql)
        guid = self._register(_HS2Op.from_df(df, self._proto(req)))
        self._status(w)
        self._handle_struct(w, 2, guid, OP_EXECUTE)

    def _m_GetOperationStatus(self, w: tp.BinaryWriter, req: dict) -> None:
        self._op(req)
        self._status(w)
        w.field(tp.I32, 2)
        w.write_i32(FINISHED_STATE)

    def _m_CancelOperation(self, w: tp.BinaryWriter, req: dict) -> None:
        self._op(req)  # synchronous execution: nothing to cancel
        self._status(w)

    def _m_CloseOperation(self, w: tp.BinaryWriter, req: dict) -> None:
        owned = self._conn_ops.get(threading.get_ident())
        if owned is not None:
            owned.discard(self._read_guid(req))
        if self._ops.pop(self._read_guid(req), None) is None:
            raise HS2Error("Invalid operation handle", INVALID_HANDLE)
        self._status(w)

    def _m_GetLog(self, w: tp.BinaryWriter, req: dict) -> None:
        self._op(req)
        self._status(w)
        w.field(tp.STRING, 2)
        w.write_string("")

    def _m_GetResultSetMetadata(self, w: tp.BinaryWriter, req: dict) -> None:
        o = self._op(req)
        self._status(w)
        w.field(tp.STRUCT, 2)  # TTableSchema
        w.field(tp.LIST, 1)
        w.list_begin(tp.STRUCT, len(o.columns))
        for pos, (name, dtype) in enumerate(o.columns):
            w.field(tp.STRING, 1)
            w.write_string(name)
            w.field(tp.STRUCT, 2)  # TTypeDesc
            w.field(tp.LIST, 1)
            w.list_begin(tp.STRUCT, 1)
            w.field(tp.STRUCT, 1)  # TTypeEntry union: primitiveEntry
            w.field(tp.I32, 1)
            w.write_i32(_type_id(dtype))
            w.stop()
            w.stop()  # TTypeEntry
            w.stop()  # TTypeDesc
            w.field(tp.I32, 3)
            w.write_i32(pos)
            w.stop()  # TColumnDesc
        w.stop()  # TTableSchema

    @staticmethod
    def _write_scalar(w: tp.BinaryWriter, wire: int, v) -> None:
        if wire == tp.BOOL:
            w.write_bool(bool(v))
        elif wire == tp.BYTE:
            w.write_byte(int(v))
        elif wire == tp.I16:
            w.write_i16(int(v))
        elif wire == tp.I32:
            w.write_i32(int(v))
        elif wire == tp.I64:
            w.write_i64(int(v))
        elif wire == tp.DOUBLE:
            w.write_double(float(v))
        else:
            w.write_string(str(v))

    #: TColumn union default slot values for NULL positions (columnar
    #: TRowSets store a placeholder plus a set bit in the nulls bitmap)
    _NULL_SLOT = {tp.BOOL: False, tp.BYTE: 0, tp.I16: 0, tp.I32: 0,
                  tp.I64: 0, tp.DOUBLE: 0.0, tp.STRING: ""}

    def _m_FetchResults(self, w: tp.BinaryWriter, req: dict) -> None:
        orientation = req.get(2, FETCH_NEXT)
        o = self._op(req)
        if orientation == FETCH_FIRST:
            o.rewind()  # re-run the bounded fetch cursor from row 0
        elif orientation != FETCH_NEXT:
            raise HS2Error("only FETCH_NEXT and FETCH_FIRST are supported")
        rows = o.fetch(int(req.get(3, 1024)) or 1024)
        self._status(w)
        w.field(tp.BOOL, 2)
        w.write_bool(not o.eos)
        w.field(tp.STRUCT, 3)  # TRowSet
        w.field(tp.I64, 1)
        w.write_i64(o._page_start)
        if o.proto >= PROTOCOL_V6:
            # columnar generation: rows (required field) stays empty,
            # values ride list<TColumn> at field 3 — one T<X>Column
            # {1: values, 2: nulls bitmap (LSB-first, 1 = NULL)} per
            # column, with NULL positions holding a default slot
            w.field(tp.LIST, 2)
            w.list_begin(tp.STRUCT, 0)
            w.field(tp.LIST, 3)
            w.list_begin(tp.STRUCT, len(o.columns))
            for ci, (_, dtype) in enumerate(o.columns):
                arm, wire = _VALUE_ARMS.get(dtype, (7, tp.STRING))
                nulls = bytearray((len(rows) + 7) // 8)
                w.field(tp.STRUCT, arm)  # TColumn union arm
                w.field(tp.LIST, 1)
                w.list_begin(wire, len(rows))
                for ri, row in enumerate(rows):
                    v = row[ci]
                    if v is None:
                        nulls[ri // 8] |= 1 << (ri % 8)
                        v = self._NULL_SLOT[wire]
                    self._write_scalar(w, wire, v)
                w.field(tp.STRING, 2)
                w.write_string(bytes(nulls))
                w.stop()  # T<X>Column
                w.stop()  # TColumn
            w.stop()  # TRowSet
            return
        w.field(tp.LIST, 2)
        w.list_begin(tp.STRUCT, len(rows))
        for row in rows:
            w.field(tp.LIST, 1)
            w.list_begin(tp.STRUCT, len(o.columns))
            for v, (_, dtype) in zip(row, o.columns):
                arm, wire = _VALUE_ARMS.get(dtype, (7, tp.STRING))
                w.field(tp.STRUCT, arm)  # TColumnValue union field
                if v is not None:  # NULL = optional value unset
                    w.field(wire, 1)
                    self._write_scalar(w, wire, v)
                w.stop()  # TIxxValue
                w.stop()  # TColumnValue
            w.stop()  # TRow
        w.stop()  # TRowSet

    # -- JDBC metadata operations -----------------------------------------

    def _meta_op(self, req: dict, columns: list[tuple[str, str]], rows: list[tuple]) -> bytes:
        return self._register(_HS2Op(columns, rows, proto=self._proto(req)))

    def _m_GetCatalogs(self, w: tp.BinaryWriter, req: dict) -> None:
        guid = self._meta_op(req, [("TABLE_CAT", "string")], [])
        self._status(w)
        self._handle_struct(w, 2, guid, 2)

    def _m_GetSchemas(self, w: tp.BinaryWriter, req: dict) -> None:
        pat = _like_to_regex((req.get(3) or b"%").decode())
        dbs = sorted(d.name for d in self.session.spark.catalog.listDatabases())
        rows = [(d, "") for d in dbs if pat.match(d)]
        guid = self._meta_op(req, [("TABLE_SCHEM", "string"), ("TABLE_CATALOG", "string")], rows)
        self._status(w)
        self._handle_struct(w, 2, guid, 3)

    def _m_GetTables(self, w: tp.BinaryWriter, req: dict) -> None:
        schema_pat = _like_to_regex((req.get(3) or b"%").decode())
        table_pat = _like_to_regex((req.get(4) or b"%").decode())
        rows = []
        for db in self.session.spark.catalog.listDatabases():
            if not schema_pat.match(db.name):
                continue
            for t in self.session.spark.catalog.listTables(db.name):
                if table_pat.match(t.name):
                    ttype = "VIEW" if t.tableType in ("TEMPORARY", "VIEW") else "TABLE"
                    rows.append(("", db.name, t.name, ttype, ""))
        rows.sort(key=lambda r: (r[1], r[2]))
        guid = self._meta_op(
            req,
            [("TABLE_CAT", "string"), ("TABLE_SCHEM", "string"), ("TABLE_NAME", "string"),
             ("TABLE_TYPE", "string"), ("REMARKS", "string")],
            rows,
        )
        self._status(w)
        self._handle_struct(w, 2, guid, 4)

    def _m_GetTableTypes(self, w: tp.BinaryWriter, req: dict) -> None:
        guid = self._meta_op(req, [("TABLE_TYPE", "string")], [("TABLE",), ("VIEW",)])
        self._status(w)
        self._handle_struct(w, 2, guid, 5)

    def _m_GetColumns(self, w: tp.BinaryWriter, req: dict) -> None:
        schema_pat = _like_to_regex((req.get(3) or b"%").decode())
        table_pat = _like_to_regex((req.get(4) or b"%").decode())
        col_pat = _like_to_regex((req.get(5) or b"%").decode())
        rows = []
        for db in self.session.spark.catalog.listDatabases():
            if not schema_pat.match(db.name):
                continue
            for t in self.session.spark.catalog.listTables(db.name):
                if not table_pat.match(t.name):
                    continue
                for pos, c in enumerate(
                    self.session.spark.catalog.listColumns(t.name, db.name if not t.isTemporary else None)
                ):
                    if col_pat.match(c.name):
                        rows.append(
                            ("", db.name, t.name, c.name, _type_id(c.dataType),
                             c.dataType.upper(), pos + 1)
                        )
        rows.sort(key=lambda r: (r[1], r[2], r[6]))
        guid = self._meta_op(
            req,
            [("TABLE_CAT", "string"), ("TABLE_SCHEM", "string"), ("TABLE_NAME", "string"),
             ("COLUMN_NAME", "string"), ("DATA_TYPE", "int"), ("TYPE_NAME", "string"),
             ("ORDINAL_POSITION", "int")],
            rows,
        )
        self._status(w)
        self._handle_struct(w, 2, guid, 6)

    def _m_GetTypeInfo(self, w: tp.BinaryWriter, req: dict) -> None:
        rows = [(name.upper(), tid) for name, tid in sorted(_TYPE_IDS.items(), key=lambda kv: kv[1])]
        rows.append(("DECIMAL", DECIMAL_TYPE_ID))
        guid = self._meta_op(req, [("TYPE_NAME", "string"), ("DATA_TYPE", "int")], rows)
        self._status(w)
        self._handle_struct(w, 2, guid, 1)

    def _m_GetFunctions(self, w: tp.BinaryWriter, req: dict) -> None:
        pat = _like_to_regex((req.get(4) or b"%").decode())
        from impala_cut_spark.dialect import CALL_REWRITES

        names = sorted(n for n in CALL_REWRITES if pat.match(n))
        guid = self._meta_op(
            req,
            [("FUNCTION_CAT", "string"), ("FUNCTION_SCHEM", "string"),
             ("FUNCTION_NAME", "string")],
            [("", "", n) for n in names],
        )
        self._status(w)
        self._handle_struct(w, 2, guid, 7)

    # -- lifecycle ---------------------------------------------------------

    def serve_background(self) -> threading.Thread:
        t = threading.Thread(target=self._server.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self) -> None:
        self._server.shutdown()
        self._server.server_close()


class HS2ThriftClient:
    """Minimal TCLIService TBinaryProtocol client (what a JDBC driver
    is, reduced to the tested surface)."""

    def __init__(self, host: str, port: int, user: str | None = None, password: str = ""):
        self._sock = socket.create_connection((host, port))
        self._f = self._sock.makefile("rwb")
        if user is not None:  # SASL/PLAIN (the LDAP client mode)
            from impala_cut_spark import sasl_transport as st

            st.client_negotiate(self._f, user, password)
            self._f = st.FramedFile(self._f)
        self._seq = itertools.count(1)
        self.session: bytes | None = None
        self.proto = PROTOCOL_V1  # negotiated at open_session

    def _call(self, name: str, build_req) -> dict[int, Any]:
        w = tp.BinaryWriter()
        seqid = next(self._seq)
        w.message_begin(name, tp.CALL, seqid)
        w.field(tp.STRUCT, 1)  # req struct at field 1
        build_req(w)
        w.stop()
        w.stop()
        self._f.write(w.bytes())
        self._f.flush()
        r = tp.BinaryReader(self._f)
        rname, mtype, rseq = r.message_begin()
        if (rname, rseq) != (name, seqid):
            raise tp.TProtocolError(f"out-of-order reply {rname}/{rseq}")
        result = r.read_struct()
        tp.raise_if_exception(mtype, result)
        resp = result[0]
        status = resp.get(1, {})
        if status.get(1, 0) != SUCCESS:
            raise HS2Error(status.get(5, b"").decode() or "HS2 error", status.get(1))
        return resp

    @staticmethod
    def _handle_req(guid: bytes, fid: int = 1):
        def build(w: tp.BinaryWriter) -> None:
            w.field(tp.STRUCT, fid)
            w.field(tp.STRUCT, 1)
            w.field(tp.STRING, 1)
            w.write_string(guid)
            w.field(tp.STRING, 2)
            w.write_string(b"\x00" * 16)
            w.stop()
            w.stop()

        return build

    def open_session(
        self,
        configuration: dict[str, str] | None = None,
        protocol: int = PROTOCOL_V6,
    ) -> bytes:
        def build(w: tp.BinaryWriter) -> None:
            w.field(tp.I32, 1)
            w.write_i32(protocol)
            if configuration:
                w.field(tp.MAP, 4)
                w.map_begin(tp.STRING, tp.STRING, len(configuration))
                for k, v in configuration.items():
                    w.write_string(k)
                    w.write_string(v)

        resp = self._call("OpenSession", build)
        self.proto = resp.get(2, PROTOCOL_V1)  # server-negotiated version
        self.session = resp[3][1][1]
        return self.session

    def close_session(self) -> None:
        self._call("CloseSession", self._handle_req(self.session))

    def execute(self, sql: str) -> bytes:
        def build(w: tp.BinaryWriter) -> None:
            self._handle_req(self.session)(w)
            w.field(tp.STRING, 2)
            w.write_string(sql)

        return self._call("ExecuteStatement", build)[2][1][1]

    def operation_state(self, op: bytes) -> int:
        return self._call("GetOperationStatus", self._handle_req(op))[2]

    def metadata(self, op: bytes) -> list[tuple[str, int]]:
        schema = self._call("GetResultSetMetadata", self._handle_req(op))[2]
        return [(c[1].decode(), c[2][1][0][1][1]) for c in schema[1]]

    def fetch(
        self, op: bytes, max_rows: int = 1024, orientation: int = FETCH_NEXT
    ) -> dict:
        def build(w: tp.BinaryWriter) -> None:
            self._handle_req(op)(w)
            w.field(tp.I32, 2)
            w.write_i32(orientation)
            w.field(tp.I64, 3)
            w.write_i64(max_rows)

        resp = self._call("FetchResults", build)
        rowset = resp.get(3, {})
        rows: list[tuple] = []
        if rowset.get(3):
            # columnar TRowSet (V6+): transpose list<TColumn>, applying
            # each column's nulls bitmap (LSB-first, 1 = NULL)
            cols = []
            for tcol in rowset[3]:
                (_, inner) = next(iter(tcol.items()))
                values = inner.get(1, [])
                nulls = inner.get(2, b"")
                col = []
                for i, v in enumerate(values):
                    if i // 8 < len(nulls) and nulls[i // 8] & (1 << (i % 8)):
                        col.append(None)
                    else:
                        col.append(v.decode() if isinstance(v, bytes) else v)
                cols.append(col)
            rows = [tuple(r) for r in zip(*cols)] if cols else []
        else:
            for trow in rowset.get(2, []):
                vals = []
                for cv in trow[1]:
                    (arm, inner) = next(iter(cv.items())) if cv else (7, {})
                    v = inner.get(1) if isinstance(inner, dict) else None
                    if isinstance(v, bytes):
                        v = v.decode()
                    vals.append(v)
                rows.append(tuple(vals))
        return {
            "rows": rows,
            "start_row": rowset.get(1, 0),
            "has_more": resp.get(2, False),
        }

    def fetch_all(self, op: bytes, page: int = 1024) -> list[tuple]:
        out: list[tuple] = []
        while True:
            fr = self.fetch(op, page)
            out.extend(fr["rows"])
            if not fr["has_more"]:
                return out

    def close_operation(self, op: bytes) -> None:
        self._call("CloseOperation", self._handle_req(op))

    def get_tables(self, schema: str = "%", table: str = "%") -> bytes:
        def build(w: tp.BinaryWriter) -> None:
            self._handle_req(self.session)(w)
            w.field(tp.STRING, 3)
            w.write_string(schema)
            w.field(tp.STRING, 4)
            w.write_string(table)

        return self._call("GetTables", build)[2][1][1]

    def get_columns(self, schema: str = "%", table: str = "%", column: str = "%") -> bytes:
        def build(w: tp.BinaryWriter) -> None:
            self._handle_req(self.session)(w)
            w.field(tp.STRING, 3)
            w.write_string(schema)
            w.field(tp.STRING, 4)
            w.write_string(table)
            w.field(tp.STRING, 5)
            w.write_string(column)

        return self._call("GetColumns", build)[2][1][1]

    def get_info(self, info_type: int) -> str:
        def build(w: tp.BinaryWriter) -> None:
            self._handle_req(self.session)(w)
            w.field(tp.I32, 2)
            w.write_i32(info_type)

        return self._call("GetInfo", build)[2][1].decode()

    def close(self) -> None:
        self._f.close()
        self._sock.close()


def main() -> None:  # pragma: no cover — interactive entry point
    import argparse

    from impala_cut_spark.sources.catalog import register_views

    ap = argparse.ArgumentParser(description="impala_cut_spark HS2 thrift server")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=21050)  # reference HS2 default
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()
    session = ImpalaSession()
    register_views(session.spark, args.sf_dir)
    srv = HS2ThriftServer(session, host=args.host, port=args.port)
    print(f"TCLIService listening on {srv.host}:{srv.port} (thrift binary)", flush=True)
    srv._server.serve_forever()


if __name__ == "__main__":
    main()
