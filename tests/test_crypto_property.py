"""Property-based crypto round-trip: decrypt(encrypt(x)) == x for arbitrary
text (Encryptor.java:15-43 semantics), batched into one DataFrame per
example set so Spark jobs stay cheap."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_kafka_consumer_cassandra_output_spark.functions import crypto

# UTF-8-encodable text (no lone surrogates), incl. >BMP emoji and empties.
texts = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        max_size=300,
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts)
def test_roundtrip_arbitrary_text(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "pt string")
    enc = crypto.aes_encrypt_b64(F.col("pt"))
    out = df.select("pt", crypto.aes_decrypt_b64(enc).alias("dec")).collect()
    for row in out:
        assert row.dec == row.pt
