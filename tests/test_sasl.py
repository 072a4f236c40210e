"""SASL/PLAIN auth layer (impala_cut_spark/sasl_transport.py) — the
reference's LDAP auth path: LdapAuthProvider wraps both thrift
services in PLAIN/SASL (be/src/rpc/auth-provider.h:114-121) and the
stock shell connects with TSaslClientTransport(…, "PLAIN", sock)
(shell/impala_shell.py:694)."""

from __future__ import annotations

import io
import struct

import pytest

from impala_cut_spark import sasl_transport as st
from impala_cut_spark.session import ImpalaSession
from impala_cut_spark.sources.catalog import register_views
from impala_cut_spark.thrift_server import BeeswaxThriftClient, BeeswaxThriftServer

CREDS = {"analyst": "s3cret", "etl": "hunter2"}


def _validate(user: str, password: str) -> bool:
    return CREDS.get(user) == password


@pytest.fixture(scope="module")
def auth_server(spark, sf_dir):
    register_views(spark, sf_dir)
    srv = BeeswaxThriftServer(ImpalaSession(spark), auth=_validate)
    srv.serve_background()
    yield srv
    srv.shutdown()


def test_authenticated_query_roundtrip(auth_server):
    """Full lifecycle over the SASL-framed transport: negotiate,
    query, fetch, extension ping, close."""
    c = BeeswaxThriftClient(auth_server.host, auth_server.port,
                            user="analyst", password="s3cret")
    try:
        assert "impala_cut_spark" in c.ping_impala_service()
        h = c.query("select n_name from nation where n_nationkey = 1")
        assert c.fetch(h)["data"] == ["NATION_1"]
        c.close_query(h)
    finally:
        c.close()


def test_bad_password_is_rejected(auth_server):
    with pytest.raises(st.SaslError, match="status 4"):
        BeeswaxThriftClient(auth_server.host, auth_server.port,
                            user="analyst", password="wrong")


def test_unknown_user_is_rejected(auth_server):
    with pytest.raises(st.SaslError):
        BeeswaxThriftClient(auth_server.host, auth_server.port,
                            user="mallory", password="s3cret")


def test_unauthenticated_client_cannot_talk(auth_server):
    """A client that skips negotiation sends a thrift CALL where the
    server expects a SASL START — the server must drop the connection,
    not process the query."""
    import socket

    s = socket.create_connection((auth_server.host, auth_server.port))
    f = s.makefile("rwb")
    try:
        # raw thrift message_begin bytes (what a no-auth client sends)
        f.write(struct.pack(">i", -2147418111) + struct.pack(">i", 4) + b"echo")
        f.flush()
        assert f.read(1) == b""  # connection closed, no reply
    finally:
        f.close()
        s.close()


def test_hs2_sasl_roundtrip(spark, sf_dir):
    """The HS2 service takes the same wrapper (the reference
    authenticates both ports)."""
    from impala_cut_spark.hs2_server import HS2ThriftClient, HS2ThriftServer

    register_views(spark, sf_dir)
    srv = HS2ThriftServer(ImpalaSession(spark), auth=_validate)
    srv.serve_background()
    try:
        c = HS2ThriftClient(srv.host, srv.port, user="etl", password="hunter2")
        c.open_session()
        op = c.execute("select 42 as answer")
        assert c.fetch_all(op) == [(42,)]
        c.close_session()
        c.close()
        with pytest.raises(st.SaslError):
            HS2ThriftClient(srv.host, srv.port, user="etl", password="nope")
    finally:
        srv.shutdown()


# -- wire-format unit checks -------------------------------------------------


def test_plain_negotiation_bytes():
    """Server-side negotiation against HAND-ENCODED thrift_sasl client
    bytes: START('PLAIN') then OK(authzid NUL authcid NUL passwd) must
    yield COMPLETE with an empty payload."""
    rbuf = io.BytesIO(
        bytes([st.START]) + struct.pack(">i", 5) + b"PLAIN"
        + bytes([st.OK]) + struct.pack(">i", 15) + b"\x00analyst\x00s3cret"
    )
    wbuf = io.BytesIO()
    user = st.server_negotiate(rbuf, wbuf, _validate)
    assert user == "analyst"
    assert wbuf.getvalue() == bytes([st.COMPLETE]) + struct.pack(">i", 0)


def test_framed_file_roundtrip_and_split_frames():
    """Data-phase framing: one flush = one frame; reads spanning
    multiple frames reassemble; EOF mid-read returns short (the
    thrift reader raises EOFError on that)."""

    class Pipe(io.BytesIO):
        pass

    raw = Pipe()
    w = st.FramedFile(raw)
    w.write(b"hello ")
    w.write(b"world")
    w.flush()
    w.write(b"!")
    w.flush()
    raw.seek(0)
    r = st.FramedFile(raw)
    assert r.read(12) == b"hello world!"
    assert r.read(1) == b""  # EOF

    # hostile frame length
    bad = st.FramedFile(io.BytesIO(struct.pack(">i", -9)))
    with pytest.raises(st.SaslError, match="frame length"):
        bad.read(1)


def test_framed_file_flush_splits_oversized_writes(monkeypatch):
    """flush() must emit multiple frames when the write buffer exceeds
    MAX_FRAME — read() (ours and thrift_sasl's) rejects any single
    frame over the cap, so the r7 single-frame flush made an oversized
    reply (a huge fetch page) unreadable to the peer (r7 ADVICE)."""
    monkeypatch.setattr(st.FramedFile, "MAX_FRAME", 8)
    raw = io.BytesIO()
    w = st.FramedFile(raw)
    payload = bytes(range(20))
    w.write(payload)
    w.flush()
    # on-wire: every frame ≤ MAX_FRAME
    raw.seek(0)
    frames = []
    while True:
        hdr = raw.read(4)
        if not hdr:
            break
        (ln,) = struct.unpack(">i", hdr)
        assert 0 < ln <= 8
        frames.append(raw.read(ln))
    assert len(frames) == 3
    # and the peer's reader reassembles the exact payload
    raw.seek(0)
    r = st.FramedFile(raw)
    assert r.read(len(payload)) == payload


# ---------------------------------------------------------------------------
# LDAP simple bind (impala_cut_spark/ldap_auth.py) — the real credential
# check behind PLAIN (reference authentication.cc SaslLdapCheckPass →
# ldap_sasl_bind_s), implemented from RFC 4511/X.690 and verified against
# an in-process fake directory that BER-decodes the BindRequest.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fake_ldap():
    import socketserver
    import threading

    from impala_cut_spark import ldap_auth as la

    DIRECTORY = {
        "uid=analyst,ou=people,dc=example,dc=com": "s3cret",
        "uid=etl,ou=people,dc=example,dc=com": "hunter2",
    }

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            try:
                buf = b""
                while True:
                    chunk = self.request.recv(4096)
                    if not chunk:
                        return
                    buf += chunk
                    tag, payload, nxt = la.parse_ber(buf)
                    msg, buf = buf[:nxt], buf[nxt:]
                    try:
                        mid, dn, pw = la.parse_bind_request(msg)
                    except la.LdapError:
                        return  # unbind or garbage — drop the connection
                    ok = DIRECTORY.get(dn) == pw and pw != ""
                    rc = la.SUCCESS if ok else la.INVALID_CREDENTIALS
                    self.request.sendall(
                        la.bind_response(mid, rc, "" if ok else "invalid credentials")
                    )
            except (ConnectionError, la.LdapError):
                pass

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    srv.daemon_threads = True
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address
    srv.shutdown()


def test_ldap_ber_roundtrip():
    from impala_cut_spark import ldap_auth as la

    msg = la.bind_request(7, "uid=analyst,ou=people,dc=example,dc=com", "pä§s")
    mid, dn, pw = la.parse_bind_request(msg)
    assert (mid, dn, pw) == (7, "uid=analyst,ou=people,dc=example,dc=com", "pä§s")
    resp = la.bind_response(7, la.INVALID_CREDENTIALS, "nope")
    assert la.parse_bind_response(resp) == (7, la.INVALID_CREDENTIALS, "nope")
    # long-form BER length (payload > 127 bytes) round-trips too
    big = la.bind_request(1, "uid=" + "x" * 300, "pw")
    assert la.parse_bind_request(big)[1] == "uid=" + "x" * 300


def test_ldap_simple_bind_against_fake_directory(fake_ldap):
    from impala_cut_spark import ldap_auth as la

    host, port = fake_ldap
    rc, _ = la.simple_bind(host, port, "uid=analyst,ou=people,dc=example,dc=com", "s3cret")
    assert rc == la.SUCCESS
    rc, diag = la.simple_bind(host, port, "uid=analyst,ou=people,dc=example,dc=com", "wrong")
    assert rc == la.INVALID_CREDENTIALS and diag


def test_ldap_validator_plugs_into_plain_negotiation(fake_ldap):
    """End-to-end: SASL/PLAIN negotiation validated by a REAL LDAP
    simple bind against the fake directory — the reference's exact
    auth chain (PLAIN initial response → ldap bind → COMPLETE)."""
    from impala_cut_spark import ldap_auth as la

    host, port = fake_ldap
    validate = la.ldap_validator(host, port, "uid=#UID,ou=people,dc=example,dc=com")
    # success path over the SASL wire
    rbuf, wbuf = io.BytesIO(), io.BytesIO()
    st._send(rbuf, st.START, b"PLAIN")
    st._send(rbuf, st.OK, b"\x00analyst\x00s3cret")
    rbuf.seek(0)
    assert st.server_negotiate(rbuf, wbuf, validate) == "analyst"
    # wrong password → SaslError + ERROR status on the wire
    rbuf, wbuf = io.BytesIO(), io.BytesIO()
    st._send(rbuf, st.START, b"PLAIN")
    st._send(rbuf, st.OK, b"\x00analyst\x00wrong")
    rbuf.seek(0)
    with pytest.raises(st.SaslError):
        st.server_negotiate(rbuf, wbuf, validate)
    # RFC 4513 §5.1.2: empty password must fail CLOSED (a directory
    # would treat it as an anonymous bind and answer success)
    assert not validate("analyst", "")


def test_ldap_validator_fails_closed_when_directory_down():
    from impala_cut_spark import ldap_auth as la

    validate = la.ldap_validator("127.0.0.1", 1, "uid=#UID", timeout=0.3)
    assert not validate("analyst", "s3cret")
