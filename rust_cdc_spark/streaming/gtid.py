"""GTID-set tracking: failover-safe resume for the CDC source.

(file, pos) offsets — the reference's ``LogEntry``,
/root/reference/src/snapshot/mod.rs:18-23 — are only meaningful on ONE
server: after a replica failover the new primary's binlog numbering is
unrelated, and a file/pos checkpoint replays or skips arbitrary spans.
MySQL's answer (public semantics: replication with global transaction
identifiers) is the GTID set: every transaction is tagged
``source_uuid:txn_no``, and a consumer tracks the set of executed
transactions as interval lists ``uuid:1-50:60-70,uuid2:1-5``. Resume
against ANY server = "send everything not in my executed set". The
reference decodes GtidEvent (/root/reference/src/mysql/event/mod.rs
GtidEvent variant) but only checkpoints file/pos; this closes that gap.

Scale/engine shape: the executed set is *driver/reader state*, size
O(#source servers × #interval fragments) — bytes, not data. The skip
check is applied per event inside the source's ``read()`` (before
anything enters the DataFrame), so at-least-once overlap from a
failover resume never reaches the merge.
"""

from __future__ import annotations


class GtidSet:
    """Interval-list set of executed transactions per source UUID.

    Text form matches MySQL's ``gtid_executed``:
    ``uuid:1-50:60:70-80,uuid2:1-3`` (ranges sorted, merged, inclusive).
    """

    def __init__(self, text: str = ""):
        self._by_uuid: dict[str, list[list[int]]] = {}
        text = (text or "").strip()
        if text:
            for part in text.split(","):
                fields = part.strip().split(":")
                uuid, ranges = fields[0], fields[1:]
                for r in ranges:
                    if "-" in r:
                        lo, hi = (int(x) for x in r.split("-"))
                    else:
                        lo = hi = int(r)
                    self._add_range(uuid, lo, hi)

    def _add_range(self, uuid: str, lo: int, hi: int) -> None:
        if lo > hi:
            raise ValueError(f"invalid GTID range {lo}-{hi}")
        ivs = self._by_uuid.setdefault(uuid, [])
        ivs.append([lo, hi])
        ivs.sort()
        merged = [ivs[0]]
        for s, e in ivs[1:]:
            if s <= merged[-1][1] + 1:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        self._by_uuid[uuid] = merged

    @staticmethod
    def _parse(gtid: str) -> tuple[str, int]:
        uuid, _, txn = gtid.rpartition(":")
        return uuid, int(txn)

    def contains(self, gtid: str | None) -> bool:
        if not gtid:
            return False
        uuid, txn = self._parse(gtid)
        for lo, hi in self._by_uuid.get(uuid, ()):
            if lo <= txn <= hi:
                return True
        return False

    def add(self, gtid: str) -> None:
        uuid, txn = self._parse(gtid)
        self._add_range(uuid, txn, txn)

    def union(self, other: "GtidSet") -> "GtidSet":
        out = GtidSet(str(self))
        for uuid, ivs in other._by_uuid.items():
            for lo, hi in ivs:
                out._add_range(uuid, lo, hi)
        return out

    def encode(self) -> bytes:
        """Binary SID-block form — the payload COM_BINLOG_DUMP_GTID
        carries (public wire format, little-endian): u64 n_sids, then
        per sid 16 raw UUID bytes, u64 n_intervals, and per interval
        u64 start / u64 end with END EXCLUSIVE (MySQL encodes
        [start, end+1) on the wire; the text form is inclusive)."""
        import struct
        import uuid as _uuid

        out = [struct.pack("<Q", len(self._by_uuid))]
        for u in sorted(self._by_uuid):
            ivs = self._by_uuid[u]
            out.append(_uuid.UUID(u).bytes)
            out.append(struct.pack("<Q", len(ivs)))
            for lo, hi in ivs:
                out.append(struct.pack("<QQ", lo, hi + 1))
        return b"".join(out)

    @classmethod
    def decode(cls, data: bytes) -> "GtidSet":
        """Inverse of :meth:`encode` (used by tests and by servers
        parsing a client's auto-position request)."""
        import struct
        import uuid as _uuid

        out = cls()
        (n_sids,) = struct.unpack_from("<Q", data, 0)
        pos = 8
        for _ in range(n_sids):
            u = str(_uuid.UUID(bytes=data[pos : pos + 16]))
            pos += 16
            (n_ivs,) = struct.unpack_from("<Q", data, pos)
            pos += 8
            for _ in range(n_ivs):
                lo, end = struct.unpack_from("<QQ", data, pos)
                pos += 16
                out._add_range(u, lo, end - 1)
        if pos != len(data):
            raise ValueError(
                f"GTID set payload has {len(data) - pos} trailing bytes"
            )
        return out

    def __str__(self) -> str:
        parts = []
        for uuid in sorted(self._by_uuid):
            ranges = ":".join(
                f"{lo}-{hi}" if lo != hi else str(lo)
                for lo, hi in self._by_uuid[uuid]
            )
            parts.append(f"{uuid}:{ranges}")
        return ",".join(parts)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, GtidSet) and self._by_uuid == other._by_uuid

    def __bool__(self) -> bool:
        return bool(self._by_uuid)
