"""Round-8 hypothesis property layer: the Transaction_payload_event TLV
codec and the resilient-dump position tracker, checked against
independently-written pure-Python references (the same third-engine
discipline as test_property_round7*).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from rust_cdc_spark.sources.binlog_file import (
    TP_COMPRESSION_NONE,
    RawEvent,
    _lenenc,
    decode_transaction_payload,
    iter_embedded_events,
)

_SETTINGS = settings(max_examples=200, deadline=None)


def _enc_lenenc(v: int) -> bytes:
    """Independent encoder (MySQL net_field_length, little-endian)."""
    if v < 0xFB:
        return bytes([v])
    if v < 2**16:
        return b"\xfc" + v.to_bytes(2, "little")
    if v < 2**24:
        return b"\xfd" + v.to_bytes(3, "little")
    return b"\xfe" + v.to_bytes(8, "little")


@_SETTINGS
@given(st.integers(min_value=0, max_value=2**63 - 1))
def test_lenenc_roundtrip(v):
    got, pos = _lenenc(_enc_lenenc(v) + b"trailing", 0)
    assert got == v and pos == len(_enc_lenenc(v))


def _frame(tc: int, body: bytes, ts: int = 1, log_pos: int = 0) -> bytes:
    size = 19 + len(body)
    return (
        ts.to_bytes(4, "little") + bytes([tc]) + (1).to_bytes(4, "little")
        + size.to_bytes(4, "little") + log_pos.to_bytes(4, "little")
        + b"\x00\x00" + body
    )


@st.composite
def tp_headers(draw):
    """A TLV header for an uncompressed payload with RANDOM field order
    and optional unknown field types — the forward-compat surface: a
    newer server may both reorder fields and add new ones."""
    payload = draw(st.binary(min_size=0, max_size=400))
    fields = [(1, _enc_lenenc(len(payload))), (2, _enc_lenenc(TP_COMPRESSION_NONE))]
    if draw(st.booleans()):
        fields.append((3, _enc_lenenc(len(payload))))
    for ftype in draw(st.lists(st.integers(min_value=4, max_value=250),
                               max_size=3)):
        fields.append((ftype, draw(st.binary(min_size=0, max_size=8))))
    order = draw(st.permutations(fields))
    header = b"".join(
        _enc_lenenc(t) + _enc_lenenc(len(v)) + v for t, v in order
    )
    return header + _enc_lenenc(0) + payload, payload


@_SETTINGS
@given(tp_headers())
def test_tp_header_field_order_and_unknown_fields(hp):
    body, payload = hp
    assert decode_transaction_payload(body) == payload


@_SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0x02, max_value=0x23),  # type code
            st.binary(min_size=0, max_size=64),           # body
            st.integers(min_value=0, max_value=2**31 - 1),  # ts
        ),
        min_size=0, max_size=8,
    ),
    st.integers(min_value=1, max_value=2**31 - 1),
)
def test_embedded_event_iteration_roundtrip(events, outer_pos):
    data = b"".join(_frame(tc, b, ts) for tc, b, ts in events)
    got = list(iter_embedded_events(data, outer_pos))
    assert [(e.type_code, e.body, e.timestamp) for e in got] == [
        (tc, b, ts) for tc, b, ts in events
    ]
    # every inner offset pins to the OUTER event's end position
    assert all(e.log_pos == outer_pos for e in got)
    assert all(isinstance(e, RawEvent) for e in got)


@_SETTINGS
@given(st.binary(min_size=1, max_size=40))
def test_truncated_embedded_stream_raises(junk):
    """A stream whose trailing bytes cannot form a whole event must
    raise (→ DLQ), never silently drop the tail."""
    whole = _frame(0x10, (7).to_bytes(8, "little"))
    # a truncated second frame: 19-byte header claiming more than exists
    bad_header = whole[:13] + (10**6).to_bytes(4, "little") + whole[17:19]
    data = whole + bad_header[: max(1, len(junk) % 19)]
    try:
        list(iter_embedded_events(data))
        raised = False
    except ValueError:
        raised = True
    assert raised


@_SETTINGS
@given(
    st.dictionaries(
        st.uuids().map(str),
        st.lists(
            st.tuples(st.integers(min_value=1, max_value=2**40),
                      st.integers(min_value=0, max_value=1000)),
            min_size=1, max_size=5,
        ),
        min_size=1, max_size=4,
    )
)
def test_gtid_set_binary_roundtrip(spec):
    """GtidSet SID-block codec: arbitrary uuid→interval maps survive
    encode→decode (intervals may overlap/adjoin — the set normalizes
    them identically on both sides)."""
    from rust_cdc_spark.streaming.gtid import GtidSet

    s = GtidSet()
    for u, ivs in spec.items():
        for lo, width in ivs:
            s._add_range(u, lo, lo + width)
    assert GtidSet.decode(s.encode()) == s
    # and the text form agrees too (same normalization path)
    assert GtidSet(str(GtidSet.decode(s.encode()))) == s
