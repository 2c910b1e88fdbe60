"""Pure-Python Avro binary codec for the reference's Message record (O2).

The spark-avro jar is absent in this environment, so ``from_avro``
(sources/avro.py) cannot execute.  The reference's record is flat —
4 strings + 1 long (/root/reference/src/main/resources/Message.avsc:1-11) —
and the Avro binary encoding for it is exactly: per field in schema order,
strings as ``zigzag-varint(byte_length) || utf8 bytes`` and longs as
``zigzag-varint(value)`` (Apache Avro 1.x specification, "Binary
Encoding").  This module implements that encoding directly and exposes the
decoder as an Arrow-batched ``mapInPandas`` operator, making the O2 decode
path (AvroDeserializationSchema.java:34-50) actually executable and
correctness-gated here, jar or no jar.

Scale posture: decoding is the one other place (with multimodal) where
Python is justified — byte-twiddling per record.  mapInPandas streams
Arrow batches; on a jar-equipped cluster, swap in ``from_avro`` (same
output schema) for JVM-side decode — the surrounding plan is identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: Decoder output: the MessageObject fields (MessageObject.java:8-12).
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("msg_id", T.StringType()),
        T.StructField("username", T.StringType()),
        T.StructField("jid", T.StringType()),
        T.StructField("sent_time_ms", T.LongType()),
        T.StructField("stanza", T.StringType()),
    ]
)


def _write_varint(out: bytearray, u: int) -> None:
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _write_long(out: bytearray, n: int) -> None:
    _write_varint(out, _zigzag(n))


def _write_str(out: bytearray, s: str) -> None:
    b = s.encode("utf-8")
    _write_long(out, len(b))
    out.extend(b)


def encode_message(
    msg_id: str, username: str, jid: str, sent_time_ms: int, stanza: str
) -> bytes:
    """Avro binary encoding of one Message record, field order per the
    schema (msgId, username, jid, sentTime, stanza)."""
    out = bytearray()
    _write_str(out, msg_id)
    _write_str(out, username)
    _write_str(out, jid)
    _write_long(out, sent_time_ms)
    _write_str(out, stanza)
    return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    u = shift = 0
    while True:
        if pos >= len(buf):
            # raise the codec's own error class, not a bare IndexError: a
            # truncated record surfacing through the Arrow-batched decode
            # must read as wire corruption, not a code bug (found by the
            # truncation fuzz in tests/test_avro_py.py)
            raise ValueError("truncated Avro record: varint runs past the buffer")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return u, pos
        shift += 7


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    u, pos = _read_varint(buf, pos)
    return _unzigzag(u), pos


def _read_str(buf: bytes, pos: int) -> tuple[str, int]:
    n, pos = _read_long(buf, pos)
    if n < 0 or pos + n > len(buf):
        raise ValueError("truncated Avro record: string runs past the buffer")
    return buf[pos : pos + n].decode("utf-8"), pos + n


def decode_message_bytes(buf: bytes) -> tuple[str, str, str, int, str]:
    """Binary Avro -> field tuple (mirrors AvroDeserializationSchema
    deserialize(), AvroDeserializationSchema.java:34-50)."""
    msg_id, pos = _read_str(buf, 0)
    username, pos = _read_str(buf, pos)
    jid, pos = _read_str(buf, pos)
    sent_time_ms, pos = _read_long(buf, pos)
    stanza, pos = _read_str(buf, pos)
    if pos != len(buf):
        raise ValueError(f"trailing {len(buf) - pos} bytes after Message record")
    return msg_id, username, jid, sent_time_ms, stanza


def decode_messages(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Arrow-batched decode of a binary Avro column into typed fields —
    the O1->O2 hop runnable without the spark-avro jar."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [decode_message_bytes(bytes(v)) for v in pdf[value_col]]
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.mapInPandas(batches, DECODED_SCHEMA)
