"""MySQL 8.0 partial-JSON diff vectors — the value payload of
``PARTIAL_UPDATE_ROWS_EVENT`` (type 0x27, written when
``binlog_row_value_options=PARTIAL_JSON``).

Instead of re-logging a whole (possibly megabyte) JSON document on every
small update, the server logs a vector of diffs against the before-image:
``(operation, json-path, [JSONB value])`` triples, operation ∈
{REPLACE=0, INSERT=1, REMOVE=2}, path in MySQL JSON-path text form with
only concrete legs (``$.member``, ``$."quoted member"``, ``$[3]`` — no
wildcards ever appear in binlog diffs). Public format: libbinlogevents
``json_diff.cc`` (decode side) — re-derived here, not copied. The
reference has no arm for event 0x27 at all
(/root/reference/src/mysql/event/mod.rs:257-367), so a server running
partial JSON logging streams updates it cannot decode.

This decoder APPLIES the diffs to the decoded before-image at ingest
time, so downstream (collapse/MERGE/queries) always sees full document
text and nothing in the engine needs to know partial logging existed —
the same normalization philosophy as the fsp temporals. Per-event cost
is O(diff bytes), driver/executor-side decode path, never in a query.
"""

from __future__ import annotations

import json

from rust_cdc_spark.functions import mysql_types as MT
from rust_cdc_spark.functions.jsonb import decode_jsonb

OP_REPLACE = 0
OP_INSERT = 1
OP_REMOVE = 2
_OPS = {OP_REPLACE, OP_INSERT, OP_REMOVE}

# sentinel distinguishing "no value field" (REMOVE) from JSON null
_NO_VALUE = object()


def decode_diff_vector(buf: bytes) -> list[tuple[int, str, object]]:
    """Diff-vector bytes → ``[(op, path_text, value), ...]``.

    Wire layout per diff: u8 operation; lenenc path length + path bytes
    (utf8 text); for REPLACE/INSERT a lenenc value length + JSONB value
    (type byte + payload). REMOVE carries no value.
    """
    out: list[tuple[int, str, object]] = []
    pos = 0
    while pos < len(buf):
        op = buf[pos]
        pos += 1
        if op not in _OPS:
            raise ValueError(f"unknown JSON diff operation {op}")
        plen, pos = MT.read_lenenc_int(buf, pos)
        if pos + plen > len(buf):
            raise ValueError(
                f"JSON diff path truncated: {plen} bytes claimed,"
                f" {len(buf) - pos} remain"
            )
        path = bytes(buf[pos : pos + plen]).decode("utf-8")
        pos += plen
        if op == OP_REMOVE:
            out.append((op, path, _NO_VALUE))
            continue
        vlen, pos = MT.read_lenenc_int(buf, pos)
        if pos + vlen > len(buf):
            raise ValueError(
                f"JSON diff value truncated: {vlen} bytes claimed,"
                f" {len(buf) - pos} remain"
            )
        value = decode_jsonb(bytes(buf[pos : pos + vlen]))
        pos += vlen
        out.append((op, path, value))
    return out


def parse_json_path(path: str) -> list[str | int]:
    """Concrete MySQL JSON path → leg list (str member / int index).

    Grammar subset actually produced in binlog diffs: ``$`` root, then
    ``.member`` (unquoted ECMAScript identifier) or ``."any text"``
    (double-quoted, backslash escapes) or ``[N]`` array legs.
    """
    s = path.strip()
    if not s.startswith("$"):
        raise ValueError(f"JSON path must start with $: {path!r}")
    legs: list[str | int] = []
    i = 1
    n = len(s)
    while i < n:
        c = s[i]
        if c == ".":
            i += 1
            if i < n and s[i] == '"':
                # quoted member: JSON-string rules, reuse the JSON parser
                j = i + 1
                while j < n:
                    if s[j] == "\\":
                        j += 2
                        continue
                    if s[j] == '"':
                        break
                    j += 1
                if j >= n:
                    raise ValueError(f"unterminated quoted leg: {path!r}")
                legs.append(json.loads(s[i : j + 1]))
                i = j + 1
            else:
                j = i
                while j < n and s[j] not in ".[":
                    j += 1
                if j == i:
                    raise ValueError(f"empty member leg in {path!r}")
                legs.append(s[i:j])
                i = j
        elif c == "[":
            j = s.index("]", i)
            legs.append(int(s[i + 1 : j]))
            i = j + 1
        else:
            raise ValueError(f"unexpected {c!r} at {i} in {path!r}")
    return legs


def _navigate(doc, legs):
    cur = doc
    for leg in legs:
        if isinstance(leg, int):
            if not isinstance(cur, list) or leg >= len(cur):
                raise ValueError(f"path leg [{leg}] not in document")
            cur = cur[leg]
        else:
            if not isinstance(cur, dict) or leg not in cur:
                raise ValueError(f"path leg .{leg} not in document")
            cur = cur[leg]
    return cur


def apply_diffs(doc_text: str | None, diffs) -> str:
    """Apply a decoded diff vector to the before-image JSON text and
    return the after-image as compact JSON text (same rendering as
    ``decode_jsonb_text``). MySQL semantics: REPLACE requires the target
    to exist; INSERT adds a new object member or inserts/APPENDS an
    array element (an index past the end appends, matching
    JSON_ARRAY_INSERT's binlog usage); REMOVE deletes the target. A
    diff against a vanished target is an error (→ DLQ upstream), never
    a silent no-op — a replica that drifted must say so."""
    if doc_text is None:
        raise ValueError("partial JSON update against NULL before-image")
    doc = json.loads(doc_text)
    for op, path, value in diffs:
        legs = parse_json_path(path)
        if not legs:
            if op == OP_REPLACE:
                doc = value
                continue
            raise ValueError(f"operation {op} on root path")
        parent = _navigate(doc, legs[:-1])
        last = legs[-1]
        if op == OP_REPLACE:
            _navigate(parent, [last])  # existence check
            parent[last] = value
        elif op == OP_INSERT:
            if isinstance(last, int):
                if not isinstance(parent, list):
                    raise ValueError(f"array insert into non-array at {path!r}")
                parent.insert(last, value)
            else:
                if not isinstance(parent, dict) or last in parent:
                    raise ValueError(f"member insert conflict at {path!r}")
                parent[last] = value
        else:  # OP_REMOVE
            _navigate(parent, [last])  # existence check
            del parent[last]
    return json.dumps(doc, separators=(",", ":"), ensure_ascii=False)
