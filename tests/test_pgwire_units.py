"""pgwire unit surface that needs no server: placeholder rewriting,
parameter encoding, OID decoding, DSN parsing — plus property tests
(the live integration lives in test_sink_postgres.py)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from hypothesis import given
from hypothesis import strategies as st

from apitap_spark.sinks.pgwire import (
    _decode_field,
    _encode_param,
    _format_to_dollar,
    _parse_dsn,
)


def test_format_to_dollar_basic():
    assert _format_to_dollar("SELECT %s, %s") == "SELECT $1, $2"
    assert _format_to_dollar("LIKE '10%%' AND x = %s") == "LIKE '10%' AND x = $1"
    assert _format_to_dollar("no params") == "no params"
    # trailing lone % survives
    assert _format_to_dollar("x % y") == "x % y"


@given(st.lists(st.sampled_from(["%s", "%%", "a", "'t'", " "]), max_size=30))
def test_format_to_dollar_numbers_sequentially(parts):
    sql = "".join(parts)
    out = _format_to_dollar(sql)
    n = parts.count("%s")
    for i in range(1, n + 1):
        assert f"${i}" in out
    assert "%s" not in out


def test_param_encoding_covers_sink_types():
    assert _encode_param(None) is None
    assert _encode_param(True) == b"t" and _encode_param(False) == b"f"
    assert _encode_param(42) == b"42"
    assert _encode_param(2.5) == b"2.5"
    assert _encode_param(Decimal("1.10")) == b"1.10"
    assert _encode_param(b"\x00\xff") == b"\\x00ff"
    assert _encode_param("snow ❄") == "snow ❄".encode()
    assert (
        _encode_param(dt.datetime(2026, 8, 15, 10, 30, 0, 123456))
        == b"2026-08-15 10:30:00.123456"
    )
    assert _encode_param(dt.date(2026, 8, 15)) == b"2026-08-15"


@given(st.floats(allow_nan=False, allow_infinity=False))
def test_float_roundtrip_via_repr(x):
    # repr() is shortest-roundtrip in py3: decode(encode(x)) == x exactly
    assert _decode_field(_encode_param(x), 701) == x


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_int_roundtrip(x):
    assert _decode_field(_encode_param(x), 20) == x


def test_oid_decode_table():
    assert _decode_field(b"t", 16) is True
    assert _decode_field(b"f", 16) is False
    assert _decode_field(None, 20) is None
    assert _decode_field(b"1.5", 1700) == Decimal("1.5")
    assert _decode_field(b"\\x00ff", 17) == b"\x00\xff"
    assert _decode_field(b"2026-08-15", 1082) == dt.date(2026, 8, 15)
    assert _decode_field(b"2026-08-15 10:30:00", 1114) == dt.datetime(
        2026, 8, 15, 10, 30
    )
    assert _decode_field(b"plain", 25) == "plain"


def test_dsn_parse():
    p = _parse_dsn("host=127.0.0.1 port=54329 user=postgres dbname=postgres")
    assert p == {
        "host": "127.0.0.1",
        "port": "54329",
        "user": "postgres",
        "dbname": "postgres",
    }


# --- SCRAM-SHA-256 against the RFC 7677 §3 test vector ----------------------


class _ScramCapture:
    """Stand-in for Connection: records what _scram_final sends."""

    _send = None
    sent: list[tuple[bytes, bytes]]

    def __init__(self):
        self.sent = []

    def _send(self, mtype, body):  # noqa: F811 - shadow the placeholder
        self.sent.append((mtype, body))


def test_scram_final_matches_rfc7677_vector():
    """Drive _scram_final/_scram_verify with RFC 7677 §3's exchange
    (user 'user', password 'pencil'): the client-final message and the
    accepted server signature must be byte-identical to the RFC."""
    from apitap_spark.sinks.pgwire import Connection

    cap = _ScramCapture()
    st_ = {
        "nonce": b"rOprNGfwEbeRWgbNEkqO",
        "bare": b"n=user,r=rOprNGfwEbeRWgbNEkqO",
        "cbind": b"biws",  # no channel binding in the RFC vector
    }
    server_first = (
        b"r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
        b"s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
    )
    Connection._scram_final(cap, st_, server_first, "pencil")
    assert cap.sent == [(
        b"p",
        b"c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
        b"p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=",
    )]
    assert Connection._scram_verify(
        st_, b"v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4="
    )
    # a forged signature is rejected
    assert not Connection._scram_verify(
        st_, b"v=AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA="
    )


def test_scram_final_rejects_nonce_truncation():
    """A server echoing a nonce that does not EXTEND the client nonce is
    a MITM downgrade attempt; the client must abort."""
    import pytest

    from apitap_spark.sinks.pgwire import Connection, PgError

    cap = _ScramCapture()
    st_ = {"nonce": b"clientnonce", "bare": b"n=,r=clientnonce", "cbind": b"biws"}
    with pytest.raises(PgError):
        Connection._scram_final(
            cap, st_, b"r=other,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096", "pw"
        )
