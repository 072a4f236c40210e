"""SASL/PLAIN thrift transport — the LDAP-auth wire layer.

The reference authenticates client connections by wrapping its thrift
transports in SASL (``be/src/rpc/auth-provider.h:33`` "using a
protocol such as Kerberos or PLAIN/SASL"; ``LdapAuthProvider`` at
:114-121 "only sets up PLAIN/SASL" and validates the credentials with
an LDAP simple bind — ``authentication.cc:33-77``).  The stock shell
side is ``TSaslClientTransport(sasl_factory, "PLAIN", sock)``
(``shell/impala_shell.py:694``) for LDAP mode.

This module re-expresses that layer from the PUBLIC thrift SASL wire
format (TSaslTransport framing, implemented by thrift_sasl /
TSaslServerTransport.java):

    negotiation message:  1-byte status | 4-byte BE length | payload
    statuses: START=1  OK=2  BAD=3  ERROR=4  COMPLETE=5
    client: START(mechanism) then OK(initial-response); server steps
    the mechanism and answers OK(challenge)… / COMPLETE / BAD|ERROR.
    data phase: every thrift message rides a 4-byte BE length frame
    (PLAIN negotiates no QOP, so payloads are the raw thrift bytes).

PLAIN initial response (RFC 4616): authzid NUL authcid NUL passwd.

Credential validation is a pluggable callable (user, password) → bool
— the stand-in for the reference's ``ldap_simple_bind_s``; the LDAP
client library itself is not in this container (documented delta, same
class as the image codecs).  GSSAPI/Kerberos requires a KDC and stays
out of scope (SURVEY §2: cluster plumbing).
"""

from __future__ import annotations

import struct
from typing import BinaryIO, Callable

START, OK, BAD, ERROR, COMPLETE = 1, 2, 3, 4, 5


class SaslError(Exception):
    """Negotiation failed (bad mechanism, bad credentials, bad frame)."""


def _read_exact(f: BinaryIO, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = f.read(n - len(buf))
        if not chunk:
            raise EOFError("connection closed mid-SASL")
        buf += chunk
    return buf


def _recv(f: BinaryIO) -> tuple[int, bytes]:
    status = _read_exact(f, 1)[0]
    (ln,) = struct.unpack(">i", _read_exact(f, 4))
    if ln < 0 or ln > 1 << 20:
        raise SaslError(f"bad SASL negotiation frame length {ln}")
    return status, _read_exact(f, ln) if ln else b""


def _send(f: BinaryIO, status: int, payload: bytes) -> None:
    f.write(bytes([status]) + struct.pack(">i", len(payload)) + payload)
    f.flush()


def server_negotiate(
    rfile: BinaryIO,
    wfile: BinaryIO,
    validate: Callable[[str, str], bool],
) -> str:
    """Server side: expect START("PLAIN") then the PLAIN initial
    response; validate; COMPLETE on success (returns the authenticated
    user), BAD/ERROR + SaslError on failure."""
    status, mech = _recv(rfile)
    if status != START:
        raise SaslError(f"expected START, got status {status}")
    if mech != b"PLAIN":
        _send(wfile, BAD, b"Unsupported mechanism: only PLAIN (LDAP auth path)")
        raise SaslError(f"unsupported mechanism {mech!r}")
    status, resp = _recv(rfile)
    if status not in (OK, COMPLETE):
        raise SaslError(f"expected initial response, got status {status}")
    parts = resp.split(b"\x00")
    if len(parts) != 3:
        _send(wfile, BAD, b"Malformed PLAIN initial response")
        raise SaslError("malformed PLAIN initial response")
    _authzid, user_b, passwd_b = parts
    user = user_b.decode("utf-8", "replace")
    if not validate(user, passwd_b.decode("utf-8", "replace")):
        # the reference surfaces an LDAP bind failure as an ERROR
        # negotiation message and drops the connection
        _send(wfile, ERROR, b"Authentication failed")
        raise SaslError(f"authentication failed for user {user!r}")
    _send(wfile, COMPLETE, b"")
    return user


def client_negotiate(f: BinaryIO, user: str, password: str) -> None:
    """Client side of PLAIN (the TSaslClientTransport.open sequence:
    START(mech) then OK(initial response), await COMPLETE)."""
    _send(f, START, b"PLAIN")
    _send(f, OK, b"\x00" + user.encode() + b"\x00" + password.encode())
    status, payload = _recv(f)
    if status != COMPLETE:
        raise SaslError(
            f"SASL negotiation failed (status {status}): "
            f"{payload.decode('utf-8', 'replace')}"
        )


class FramedFile:
    """Post-negotiation data phase: a file-like adapter that rides
    every read/write on 4-byte length frames (PLAIN = no QOP, so the
    payload is the raw thrift byte stream).  Presents read(n)/write/
    flush, which is all BinaryReader/Writer and socket makefiles use."""

    MAX_FRAME = 256 * 1024 * 1024  # defensive: matches thrift defaults

    def __init__(self, raw: BinaryIO, raw_w: BinaryIO | None = None):
        """``raw``/``raw_w``: separate read/write streams (a server
        handler's rfile/wfile pair — reusing them keeps any bytes the
        buffered reader consumed ahead during negotiation)."""
        self._raw = raw
        self._raw_w = raw_w if raw_w is not None else raw
        self._rbuf = b""
        self._wbuf = bytearray()

    def read(self, n: int) -> bytes:
        while len(self._rbuf) < n:
            hdr = self._raw.read(4)
            if not hdr:
                break  # EOF: return what we have (BinaryReader raises)
            if len(hdr) < 4:
                hdr += _read_exact(self._raw, 4 - len(hdr))
            (ln,) = struct.unpack(">i", hdr)
            if ln < 0 or ln > self.MAX_FRAME:
                raise SaslError(f"bad SASL data frame length {ln}")
            self._rbuf += _read_exact(self._raw, ln)
        out, self._rbuf = self._rbuf[:n], self._rbuf[n:]
        return out

    def write(self, b: bytes) -> int:
        self._wbuf += b
        return len(b)

    def flush(self) -> None:
        # split at MAX_FRAME: read() (ours and thrift_sasl's) rejects
        # frames over the cap, so one oversized reply — e.g. a huge
        # fetch page — must ship as several frames (thrift_sasl
        # likewise splits at its buffer size)
        while self._wbuf:
            chunk = bytes(self._wbuf[: self.MAX_FRAME])
            self._raw_w.write(struct.pack(">i", len(chunk)) + chunk)
            del self._wbuf[: self.MAX_FRAME]
        self._raw_w.flush()

    def close(self) -> None:
        for f in (self._raw, self._raw_w):
            try:
                f.close()
            except Exception:  # noqa: BLE001 — close is best-effort
                pass
