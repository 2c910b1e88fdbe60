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


def test_roundtrip_fuzz():
    """Hypothesis round-trip over the full field domain: arbitrary unicode
    strings (including surrogete-free astral planes, empties, and
    whitespace) and the whole signed-64 long range — decode(encode(x))
    must equal x bit-for-bit, and every encoding must decode without
    trailing bytes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    text = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),  # no surrogates
        max_size=60,
    )

    @settings(max_examples=120, deadline=None, derandomize=True)
    @given(text, text, text, st.integers(-(2**63), 2**63 - 1), text)
    def check(m, u, j, n, s):
        b = avro_py.encode_message(m, u, j, n, s)
        assert avro_py.decode_message_bytes(b) == (m, u, j, n, s)

    check()


def test_truncation_always_raises_fuzz():
    """Every strict prefix of a valid encoding must raise, never silently
    return a record — the wire-corruption half of the round-trip
    property."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None, derandomize=True)
    @given(st.integers(-(2**62), 2**62), st.integers(0, 10**9))
    def check(n, cutseed):
        b = avro_py.encode_message("msg", "user", "j@host", n, "stanza-body")
        cut = cutseed % (len(b) - 1) if len(b) > 1 else 0
        with pytest.raises(ValueError):
            avro_py.decode_message_bytes(b[:cut])

    check()
