"""Hypothesis property suites for the pure-Python primitives (no Spark):
the Avro binary codec and the simhash banding guarantee.  These run in
milliseconds and pin the algebraic claims the docstrings make."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_kafka_consumer_cassandra_output_spark.operators.similarity import (
    SIMHASH_BAND_WIDTHS,
    SIMHASH_RADIUS,
    simhash_band_offsets,
)
from flink_kafka_consumer_cassandra_output_spark.sources import avro_py

# Valid Avro string payloads: any unicode text (surrogates excluded -- they
# are not encodable UTF-8, same constraint the JVM codec has).
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)
_long = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=300, deadline=None)
@given(_text, _text, _text, _long, _text)
def test_avro_codec_roundtrip_property(msg_id, username, jid, sent_ms, stanza):
    """decode(encode(x)) == x for the full int64 range and arbitrary
    unicode incl. emoji/astral chars (AvroDeserializationSchema.java:34-50
    parity claim)."""
    buf = avro_py.encode_message(msg_id, username, jid, sent_ms, stanza)
    assert avro_py.decode_message_bytes(buf) == (msg_id, username, jid, sent_ms, stanza)


@settings(max_examples=300, deadline=None)
@given(_text, _text, _text, _long, _text, st.integers(min_value=1, max_value=8))
def test_avro_codec_rejects_truncation(msg_id, username, jid, sent_ms, stanza, cut):
    """A truncated buffer must raise, never return garbage silently --
    the engine analog of the reference's decode-failure -> task-failure
    path (AvroDeserializationSchema.java:47-49)."""
    buf = avro_py.encode_message(msg_id, username, jid, sent_ms, stanza)
    truncated = buf[: max(0, len(buf) - cut)]
    try:
        out = avro_py.decode_message_bytes(truncated)
    except (ValueError, IndexError, UnicodeDecodeError):
        return  # rejected loudly: correct
    # only acceptable if truncation removed nothing semantically impossible:
    # with cut >= 1 bytes gone, a successful decode must NOT equal the input
    assert out != (msg_id, username, jid, sent_ms, stanza)


def _bands(sketch: int) -> list[int]:
    return [
        (sketch >> off) & ((1 << w) - 1)
        for off, w in zip(simhash_band_offsets(), SIMHASH_BAND_WIDTHS)
    ]


@settings(max_examples=500, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**32 - 1),
    st.sets(st.integers(min_value=0, max_value=31), max_size=SIMHASH_RADIUS),
)
def test_simhash_banding_pigeonhole_property(sketch, flip_bits):
    """The lossless-prefilter claim: flip at most SIMHASH_RADIUS bits of any
    32-bit sketch and at least one band is untouched, so the band equi-join
    can never drop a pair within the radius."""
    other = sketch
    for b in flip_bits:
        other ^= 1 << b
    assert bin(sketch ^ other).count("1") <= SIMHASH_RADIUS
    shared = [a == b for a, b in zip(_bands(sketch), _bands(other))]
    assert any(shared), f"no shared band after flipping {sorted(flip_bits)}"


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_simhash_bands_partition_the_sketch(sketch):
    """Bands reassemble to the sketch exactly: widths cover all 32 bits with
    no overlap and no gap."""
    acc = 0
    for val, off in zip(_bands(sketch), simhash_band_offsets()):
        acc |= val << off
    assert acc == sketch
    assert sum(SIMHASH_BAND_WIDTHS) == 32
