"""Pure-Python Avro codec: spec-level known-answer vectors plus a negative
case.  The end-to-end Spark path is gated by the msg_avro_roundtrip query."""

from __future__ import annotations

import pytest

from flink_kafka_consumer_cassandra_output_spark.sources import avro_py


def test_known_answer_bytes():
    """Hand-computed Avro binary per the spec: strings are
    zigzag-varint(byte_len) + utf8; longs are zigzag varints."""
    got = avro_py.encode_message("ab", "u", "j@h", 3, "x")
    expect = bytes(
        [0x04, ord("a"), ord("b")]       # "ab": zigzag(2)=4
        + [0x02, ord("u")]                # "u": zigzag(1)=2
        + [0x06, ord("j"), ord("@"), ord("h")]  # "j@h": zigzag(3)=6
        + [0x06]                          # long 3: zigzag(3)=6
        + [0x02, ord("x")]                # "x"
    )
    assert got == expect
    assert avro_py.decode_message_bytes(got) == ("ab", "u", "j@h", 3, "x")


def test_negative_long_and_multibyte_varint():
    # zigzag(-1)=1; epoch ms needs multi-byte varints
    for n in (-1, 0, 1471000000000, -(2**40)):
        b = avro_py.encode_message("m", "u", "j", n, "s")
        assert avro_py.decode_message_bytes(b)[3] == n


def test_utf8_multibyte_strings():
    stanza = '<message type="T"><body>café 😀</body></message>'
    b = avro_py.encode_message("id", "üser", "j", 1, stanza)
    m, u, _, _, s = avro_py.decode_message_bytes(b)
    assert (m, u, s) == ("id", "üser", stanza)


def test_trailing_garbage_rejected():
    b = avro_py.encode_message("m", "u", "j", 1, "s") + b"\x00"
    with pytest.raises(ValueError, match="trailing"):
        avro_py.decode_message_bytes(b)
