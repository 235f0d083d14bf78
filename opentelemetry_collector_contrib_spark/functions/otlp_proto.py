"""Pure-Python protobuf wire codec for OTLP logs (``plog.ProtoMarshaler``
parity).

The reference exports logs as protobuf in two places:

- kafkaexporter's default encoding ``otlp_proto``
  (`exporter/kafkaexporter/marshaler.go:73-81` — ``plog.ProtoMarshaler``),
  one Kafka message per plog.Logs batch
  (`exporter/kafkaexporter/pdata_marshaler.go:21-32`);
- fileexporter's ``format: proto``
  (`exporter/fileexporter/marshaller.go:17-28`), each message prefixed by a
  4-byte big-endian uint32 length (`exporter/fileexporter/file_writer.go:40-50`).

Both serialize the public ``opentelemetry.proto.logs.v1.LogsData`` schema
(opentelemetry-proto, Apache-2.0):

    LogsData        { repeated ResourceLogs resource_logs = 1; }
    ResourceLogs    { Resource resource = 1; repeated ScopeLogs scope_logs = 2;
                      string schema_url = 3; }
    Resource        { repeated KeyValue attributes = 1; }
    ScopeLogs       { InstrumentationScope scope = 1;
                      repeated LogRecord log_records = 2; string schema_url = 3; }
    InstrumentationScope { string name = 1; string version = 2; }
    LogRecord       { fixed64 time_unix_nano = 1; enum severity_number = 2;
                      string severity_text = 3; AnyValue body = 5;
                      repeated KeyValue attributes = 6;
                      uint32 dropped_attributes_count = 7; fixed32 flags = 8;
                      bytes trace_id = 9; bytes span_id = 10;
                      fixed64 observed_time_unix_nano = 11; }
    AnyValue  oneof { string=1 bool=2 int64=3 double=4 ArrayValue=5
                      KeyValueList=6 bytes=7 }
    KeyValue        { string key = 1; AnyValue value = 2; }

This module is a hand-rolled wire-format writer/reader for exactly that
shape — no protobuf runtime needed, and the bytes are verifiable against
any standard protobuf implementation (golden tests pin hand-computed
frames). Proto3 rules honored: default-valued scalars are omitted; fields
are written in ascending field-number order (what the Go marshaler's
deterministic mode and protoc both produce for this message tree).

Determinism note: pcommon maps preserve insertion order while Spark map
columns have no defined order, so the ENCODER canonicalizes attribute maps
by sorting keys. Round-trips through this codec are byte-stable; byte
parity with a specific collector capture additionally requires the
capture's attribute order to be sorted (documented, not assumed).

The flat record dict shape mirrors ``sources/readers.read_otlp_json``:
``time_unix_nano`` (int ns), ``severity_number`` (int), ``severity_text``,
``body`` (str), ``attributes`` (dict str→str), ``resource`` (dict
str→str), ``scope_name``, ``trace_id`` / ``span_id`` (hex str).
"""

from __future__ import annotations

from typing import Any, Iterable

__all__ = [
    "encode_any_value",
    "encode_log_record",
    "encode_logs",
    "decode_logs",
    "frame",
    "unframe",
]


# ---------------------------------------------------------------- writer

def _varint(n: int) -> bytes:
    if n < 0:
        # proto3 int64/enum negatives occupy 10 bytes (two's complement)
        n += 1 << 64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _str(field: int, s: str | None) -> bytes:
    if not s:
        return b""  # proto3: empty string omitted
    return _ld(field, s.encode("utf-8"))


def _bytes(field: int, b: bytes | None) -> bytes:
    if not b:
        return b""
    return _ld(field, b)


def _uvarint_field(field: int, n: int | None) -> bytes:
    if not n:
        return b""  # proto3: zero omitted
    return _key(field, 0) + _varint(int(n))


def _fixed64(field: int, n: int | None) -> bytes:
    if not n:
        return b""
    return _key(field, 1) + int(n).to_bytes(8, "little")


def encode_any_value(v: Any) -> bytes:
    """``opentelemetry.proto.common.v1.AnyValue`` bytes for a Python value.

    str→string_value(1), bool→bool_value(2), int→int_value(3),
    float→double_value(4), list→array_value(5), dict→kvlist_value(6),
    bytes→bytes_value(7). None → empty message (ValueTypeEmpty).
    """
    if v is None:
        return b""
    if isinstance(v, bool):  # before int: bool is an int subclass
        return _key(2, 0) + _varint(1) if v else _key(2, 0) + _varint(0)
    if isinstance(v, str):
        return _str(1, v) if v else _ld(1, b"")
    if isinstance(v, int):
        return _key(3, 0) + _varint(v)
    if isinstance(v, float):
        import struct

        return _key(4, 1) + struct.pack("<d", v)
    if isinstance(v, (bytes, bytearray)):
        return _ld(7, bytes(v))
    if isinstance(v, (list, tuple)):
        inner = b"".join(_ld(1, encode_any_value(x)) for x in v)
        return _ld(5, inner)
    if isinstance(v, dict):
        inner = b"".join(
            _ld(1, _kv(k, v[k])) for k in sorted(v)
        )
        return _ld(6, inner)
    raise TypeError(f"unsupported AnyValue type {type(v).__name__}")


def _kv(key: str, value: Any) -> bytes:
    av = encode_any_value(value)
    return _str(1, key) + (_ld(2, av) if av else b"")


def _attrs(field: int, m: dict | None) -> bytes:
    if not m:
        return b""
    return b"".join(_ld(field, _kv(k, m[k])) for k in sorted(m))


def encode_log_record(rec: dict) -> bytes:
    """One ``LogRecord`` message body (unframed) from a flat record dict."""
    out = bytearray()
    out += _fixed64(1, rec.get("time_unix_nano"))
    out += _uvarint_field(2, rec.get("severity_number"))
    out += _str(3, rec.get("severity_text"))
    body = rec.get("body")
    if body is not None:
        # '' is a SET-but-empty body (Str("")) and must survive the round
        # trip as '' (AnyValue{string_value:""}); only None (ValueTypeEmpty
        # / unset) omits the field
        out += _ld(5, encode_any_value(body))
    out += _attrs(6, rec.get("attributes"))
    tid = rec.get("trace_id")
    if tid:
        out += _bytes(9, bytes.fromhex(tid) if isinstance(tid, str) else tid)
    sid = rec.get("span_id")
    if sid:
        out += _bytes(10, bytes.fromhex(sid) if isinstance(sid, str) else sid)
    out += _fixed64(11, rec.get("observed_time_unix_nano"))
    return bytes(out)


def encode_logs(records: Iterable[dict]) -> bytes:
    """``LogsData`` bytes for an iterable of flat record dicts.

    Records regroup by (resource, scope_name) — the tree levels the flat
    schema denormalized — in first-appearance order of each group, records
    in input order within a group (the plog tree is ordered; the caller
    controls ordering by sorting its input).
    """
    groups: dict[tuple, list[dict]] = {}
    resources: dict[tuple, dict] = {}
    for rec in records:
        res = rec.get("resource") or {}
        key = (tuple(sorted(res.items())), rec.get("scope_name") or "")
        groups.setdefault(key, []).append(rec)
        resources[key] = res
    out = bytearray()
    for key, recs in groups.items():
        res_msg = _attrs(1, resources[key])
        scope_msg = _str(1, key[1])
        sl = (_ld(1, scope_msg) if scope_msg else b"") + b"".join(
            _ld(2, encode_log_record(r)) for r in recs
        )
        rl = (_ld(1, res_msg) if res_msg else b"") + _ld(2, sl)
        out += _ld(1, rl)
    return bytes(out)


# ---------------------------------------------------------------- reader

def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _fields(buf: bytes) -> Iterable[tuple[int, int, Any]]:
    """Yield (field_number, wire_type, raw value) over a message body."""
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 1:
            val = buf[pos:pos + 8]
            if len(val) != 8:
                raise ValueError("truncated fixed64 field")
            pos += 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            if len(val) != ln:
                raise ValueError("truncated length-delimited field")
            pos += ln
        elif wire == 5:
            val = buf[pos:pos + 4]
            if len(val) != 4:
                raise ValueError("truncated fixed32 field")
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _decode_any(buf: bytes) -> Any:
    import struct

    for field, _w, val in _fields(buf):
        if field == 1:
            return val.decode("utf-8")
        if field == 2:
            return bool(val)
        if field == 3:
            return val - (1 << 64) if val >= 1 << 63 else val
        if field == 4:
            return struct.unpack("<d", val)[0]
        if field == 5:
            return [
                _decode_any(v) for f, _ww, v in _fields(val) if f == 1
            ]
        if field == 6:
            return dict(
                _decode_kv(v) for f, _ww, v in _fields(val) if f == 1
            )
        if field == 7:
            return bytes(val)
    return None  # ValueTypeEmpty


def _decode_kv(buf: bytes) -> tuple[str, Any]:
    key, value = "", None
    for field, _w, val in _fields(buf):
        if field == 1:
            key = val.decode("utf-8")
        elif field == 2:
            value = _decode_any(val)
    return key, value


def _decode_record(buf: bytes) -> dict:
    rec: dict[str, Any] = {
        "time_unix_nano": 0,
        "severity_number": 0,
        "severity_text": "",
        "body": None,
        "attributes": {},
        "trace_id": "",
        "span_id": "",
        "observed_time_unix_nano": 0,
    }
    for field, _w, val in _fields(buf):
        if field == 1:
            rec["time_unix_nano"] = int.from_bytes(val, "little")
        elif field == 2:
            rec["severity_number"] = val
        elif field == 3:
            rec["severity_text"] = val.decode("utf-8")
        elif field == 5:
            rec["body"] = _decode_any(val)
        elif field == 6:
            k, v = _decode_kv(val)
            rec["attributes"][k] = v
        elif field == 9:
            rec["trace_id"] = val.hex()
        elif field == 10:
            rec["span_id"] = val.hex()
        elif field == 11:
            rec["observed_time_unix_nano"] = int.from_bytes(val, "little")
    return rec


def decode_logs(buf: bytes) -> list[dict]:
    """``LogsData`` (or ``ExportLogsServiceRequest`` — same wire shape)
    bytes → flat record dicts, resource/scope denormalized onto each record
    (the columnar inverse of ``encode_logs``; mirrors
    `pkg/stanza/adapter/converter.go:285-340`'s flatten direction)."""
    out: list[dict] = []
    for field, _w, rl_buf in _fields(buf):
        if field != 1:
            continue
        resource: dict[str, Any] = {}
        scopes: list[bytes] = []
        for f2, _w2, v2 in _fields(rl_buf):
            if f2 == 1:  # Resource
                for f3, _w3, v3 in _fields(v2):
                    if f3 == 1:
                        k, v = _decode_kv(v3)
                        resource[k] = v
            elif f2 == 2:
                scopes.append(v2)
        for sl_buf in scopes:
            scope_name = ""
            recs: list[bytes] = []
            for f2, _w2, v2 in _fields(sl_buf):
                if f2 == 1:  # InstrumentationScope
                    for f3, _w3, v3 in _fields(v2):
                        if f3 == 1:
                            scope_name = v3.decode("utf-8")
                elif f2 == 2:
                    recs.append(v2)
            for rbuf in recs:
                rec = _decode_record(rbuf)
                rec["resource"] = dict(resource)
                rec["scope_name"] = scope_name
                out.append(rec)
    return out


# ------------------------------------------------------------- framing

def frame(messages: Iterable[bytes]) -> bytes:
    """fileexporter's on-disk proto framing: each marshaled message is
    preceded by a 4-byte big-endian uint32 length
    (`exporter/fileexporter/file_writer.go:40-50`, used for ``proto`` and
    for compressed JSON)."""
    out = bytearray()
    for m in messages:
        out += len(m).to_bytes(4, "big") + m
    return bytes(out)


def unframe(data: bytes) -> list[bytes]:
    """Inverse of :func:`frame`; raises on a torn tail."""
    out: list[bytes] = []
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 4 > n:
            raise ValueError("torn frame header")
        ln = int.from_bytes(data[pos:pos + 4], "big")
        pos += 4
        if pos + ln > n:
            raise ValueError("torn frame body")
        out.append(data[pos:pos + ln])
        pos += ln
    return out
