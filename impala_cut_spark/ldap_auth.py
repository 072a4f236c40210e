"""LDAP v3 simple bind — the credential check behind SASL/PLAIN.

The reference's LDAP auth path validates the PLAIN credentials with an
LDAP simple bind (``be/src/rpc/auth-provider.h:114-121``
``LdapAuthProvider``; ``authentication.cc`` SaslLdapCheckPass →
``ldap_sasl_bind_s``).  The container ships no LDAP client library, so
this module implements the bind itself from the PUBLIC protocol — RFC
4511 (LDAPMessage / BindRequest / BindResponse) over RFC 4511's BER
(X.690) encoding — the same from-scratch precedent as the thrift wire
layer and the image codecs.

Scope: exactly what the reference's check needs — open a TCP
connection, send one BindRequest (version 3, simple authentication),
read the BindResponse, success ⟺ resultCode 0, then UnbindRequest.
No search, no StartTLS, no SASL-in-LDAP (the reference passes
``-l --ldap_manual_config`` style simple binds).

``ldap_validator(...)`` adapts it to the ``(user, password) → bool``
contract the SASL/PLAIN servers take (sasl_transport.server_negotiate),
with the DN built from a template the way the reference builds it from
``--ldap_bind_pattern`` (e.g. ``uid=#UID,ou=people,dc=example,dc=com``).

Tested against an in-process fake LDAP server (tests/test_sasl.py)
that BER-decodes the BindRequest and answers success/invalidCredentials
— wire-level conformance both directions without libldap.
"""

from __future__ import annotations

import socket
import struct
from typing import Callable

#: RFC 4511 resultCode values this path cares about
SUCCESS = 0
INVALID_CREDENTIALS = 49


class LdapError(Exception):
    """Malformed LDAP reply or transport failure."""


# ---------------------------------------------------------------------------
# BER (X.690) primitives — definite lengths only, which RFC 4511 requires
# ---------------------------------------------------------------------------


def ber_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    body = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(body)]) + body


def ber(tag: int, payload: bytes) -> bytes:
    return bytes([tag]) + ber_len(len(payload)) + payload


def ber_int(v: int, tag: int = 0x02) -> bytes:
    if v == 0:
        return ber(tag, b"\x00")
    body = v.to_bytes((v.bit_length() // 8) + 1, "big", signed=True)
    # minimal two's complement: strip redundant leading 0x00
    while len(body) > 1 and body[0] == 0 and body[1] < 0x80:
        body = body[1:]
    return ber(tag, body)


def parse_ber(data: bytes, pos: int = 0) -> tuple[int, bytes, int]:
    """-> (tag, payload, next_pos)."""
    if pos + 2 > len(data):
        raise LdapError("truncated BER element")
    tag = data[pos]
    ln = data[pos + 1]
    pos += 2
    if ln & 0x80:
        k = ln & 0x7F
        if k == 0 or pos + k > len(data):
            raise LdapError("bad BER length")
        ln = int.from_bytes(data[pos : pos + k], "big")
        pos += k
    if pos + ln > len(data):
        raise LdapError("truncated BER payload")
    return tag, data[pos : pos + ln], pos + ln


def parse_ber_int(payload: bytes) -> int:
    return int.from_bytes(payload, "big", signed=True)


# ---------------------------------------------------------------------------
# LDAP messages
# ---------------------------------------------------------------------------


def bind_request(message_id: int, dn: str, password: str) -> bytes:
    """LDAPMessage { messageID, BindRequest [APPLICATION 0] { version=3,
    name, simple [CONTEXT 0] password } }"""
    op = (
        ber_int(3)
        + ber(0x04, dn.encode("utf-8"))
        + ber(0x80, password.encode("utf-8"))  # simple auth, primitive
    )
    body = ber_int(message_id) + ber(0x60, op)
    return ber(0x30, body)


def unbind_request(message_id: int) -> bytes:
    # UnbindRequest [APPLICATION 2] NULL — primitive, empty
    return ber(0x30, ber_int(message_id) + ber(0x42, b""))


def bind_response(message_id: int, result_code: int, diag: str = "") -> bytes:
    """Server-side twin (the test fake and any embedded directory):
    LDAPMessage { messageID, BindResponse [APPLICATION 1] { resultCode,
    matchedDN, diagnosticMessage } }"""
    op = ber_int(result_code, tag=0x0A) + ber(0x04, b"") + ber(
        0x04, diag.encode("utf-8")
    )
    return ber(0x30, ber_int(message_id) + ber(0x61, op))


def parse_bind_request(msg: bytes) -> tuple[int, str, str]:
    """-> (message_id, dn, password); raises LdapError on anything that
    is not a v3 simple BindRequest."""
    tag, body, _ = parse_ber(msg)
    if tag != 0x30:
        raise LdapError(f"not an LDAPMessage (tag {tag:#x})")
    tag, mid_b, pos = parse_ber(body)
    if tag != 0x02:
        raise LdapError("missing messageID")
    tag, op, _ = parse_ber(body, pos)
    if tag != 0x60:
        raise LdapError(f"not a BindRequest (tag {tag:#x})")
    tag, ver_b, pos = parse_ber(op)
    if tag != 0x02 or parse_ber_int(ver_b) != 3:
        raise LdapError("only LDAP v3 supported")
    tag, dn_b, pos = parse_ber(op, pos)
    if tag != 0x04:
        raise LdapError("missing bind DN")
    tag, pw_b, _ = parse_ber(op, pos)
    if tag != 0x80:
        raise LdapError("only simple authentication supported")
    return parse_ber_int(mid_b), dn_b.decode("utf-8"), pw_b.decode("utf-8")


def parse_bind_response(msg: bytes) -> tuple[int, int, str]:
    """-> (message_id, result_code, diagnostic)."""
    tag, body, _ = parse_ber(msg)
    if tag != 0x30:
        raise LdapError(f"not an LDAPMessage (tag {tag:#x})")
    tag, mid_b, pos = parse_ber(body)
    if tag != 0x02:
        raise LdapError("missing messageID")
    tag, op, _ = parse_ber(body, pos)
    if tag != 0x61:
        raise LdapError(f"not a BindResponse (tag {tag:#x})")
    tag, rc_b, pos = parse_ber(op)
    if tag != 0x0A:
        raise LdapError("missing resultCode")
    pos2 = pos
    tag, _matched, pos2 = parse_ber(op, pos2)
    tag, diag_b, _ = parse_ber(op, pos2)
    return parse_ber_int(mid_b), parse_ber_int(rc_b), diag_b.decode(
        "utf-8", "replace"
    )


def _read_ber_message(sock: socket.socket) -> bytes:
    """Read exactly one BER element off a socket (tag + length + body)."""

    def need(n: int, buf: bytes) -> bytes:
        while len(buf) < n:
            chunk = sock.recv(n - len(buf))
            if not chunk:
                raise LdapError("connection closed mid-reply")
            buf += chunk
        return buf

    buf = need(2, b"")
    ln = buf[1]
    hdr = 2
    if ln & 0x80:
        k = ln & 0x7F
        buf = need(2 + k, buf)
        ln = int.from_bytes(buf[2 : 2 + k], "big")
        hdr = 2 + k
    return need(hdr + ln, buf)


def simple_bind(
    host: str, port: int, dn: str, password: str, timeout: float = 5.0
) -> tuple[int, str]:
    """One LDAP v3 simple bind; -> (result_code, diagnostic)."""
    with socket.create_connection((host, port), timeout=timeout) as sock:
        sock.sendall(bind_request(1, dn, password))
        mid, rc, diag = parse_bind_response(_read_ber_message(sock))
        if mid != 1:
            raise LdapError(f"response messageID {mid} != 1")
        try:
            sock.sendall(unbind_request(2))
        except OSError:
            pass  # unbind is best-effort (RFC 4511 §4.3)
    return rc, diag


def ldap_validator(
    host: str,
    port: int,
    bind_pattern: str = "#UID",
    timeout: float = 5.0,
) -> Callable[[str, str], bool]:
    """(user, password) → bool via a real LDAP simple bind — the plug
    for sasl_transport.server_negotiate / the thrift+HS2 servers'
    ``validate=`` argument.  ``bind_pattern`` follows the reference's
    --ldap_bind_pattern: ``#UID`` is replaced with the SASL user name
    (e.g. ``uid=#UID,ou=people,dc=example,dc=com``).

    RFC 4513 §5.1.2: an empty password would be an UNAUTHENTICATED
    bind, which directories accept — it must fail closed here (the
    reference rejects empty passwords for the same reason,
    authentication.cc SaslLdapCheckPass)."""

    def validate(user: str, password: str) -> bool:
        if not password:
            return False
        dn = bind_pattern.replace("#UID", user)
        try:
            rc, _diag = simple_bind(host, port, dn, password, timeout=timeout)
        except (OSError, LdapError):
            return False  # unreachable/With a broken directory: fail closed
        return rc == SUCCESS

    return validate
