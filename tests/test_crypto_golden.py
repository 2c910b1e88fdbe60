"""AES known-answer vectors against the Java reference semantics.

The reference encrypts with AES/CBC/PKCS5Padding under key "gokturk  gokturk"
and IV "vezir   tonyukuk", then Base64-encodes the raw ciphertext UNCHUNKED
via commons-codec Base64.encodeBase64String
(/root/reference/src/main/java/com/cansever/consumer/Encryptor.java:15-28,
key/IV at CassandraOutputFormat.java:39-40).

Golden ciphertexts below were computed once with the public ``cryptography``
library (AES-128-CBC + PKCS7(==PKCS5 for AES) + base64.b64encode) and are
hard-coded so the test has no optional dependency.  The >57-byte-ciphertext
vector is the regression case for Spark's MIME-chunked ``base64`` (a \\r\\n
every 76 chars), which broke byte parity in round 1.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_kafka_consumer_cassandra_output_spark.functions import crypto

#: (plaintext, commons-codec-style unchunked base64(AES-CBC ciphertext))
GOLDEN = [
    ("hello", "ltmXMDnXEdTKfWfHiKxgRA=="),
    (
        '<message type="T"><body>click:87</body></message>',
        "QksF3jnPTQk3sWVmgU/yGXzp4QPmyiERYDvPIwVWH95xZeZF3qXiahb9UJew2F6D"
        "ImsVPo4wTwUWKTvCruespA==",
    ),
    (
        # 128-byte ciphertext: exercises the unchunked-base64 requirement
        '<message type="P"><body>view:' + "x" * 80 + "</body></message>",
        "mecBG7fAYref33VPLxBAF6ykAq4CYESa43dQunLGoDl8xjE5mJAGJCeFlZ6DiqGg"
        "Spe1myKghQhWyBEz2jvQYdxIXT4G/LcZidM87vRU2P9Fsxw4wOVJJz1YvCKEo4/v"
        "oyWJOkaN9LWP2nhPO8QpIubkAEpA2VJ/GphiDIK7RY8=",
    ),
    ("café üñ \U0001F600", "oS7DqxBM0GAuOQK7hUenqQ=="),
]


def test_encrypt_matches_java_golden(spark):
    df = spark.createDataFrame([(pt,) for pt, _ in GOLDEN], "pt string")
    out = df.select(crypto.aes_encrypt_b64(F.col("pt")).alias("ct"), "pt").collect()
    expect = dict(GOLDEN)
    for row in out:
        assert row.ct == expect[row.pt], f"cipher divergence for {row.pt!r}"
        assert "\r" not in row.ct and "\n" not in row.ct


def test_decrypt_inverts_golden(spark):
    df = spark.createDataFrame([(pt, ct) for pt, ct in GOLDEN], "pt string, ct string")
    out = df.select("pt", crypto.aes_decrypt_b64(F.col("ct")).alias("dec")).collect()
    for row in out:
        assert row.dec == row.pt


def test_null_stanza_propagates_to_null(spark):
    # O9: the reference drops rows whose encryption failed
    # (CassandraOutputFormat.java:105); here NULL-in -> NULL-out -> filtered.
    df = spark.createDataFrame([(None,), ("x",)], "pt string")
    out = df.select(crypto.aes_encrypt_b64(F.col("pt")).alias("ct"))
    assert out.filter(F.col("ct").isNull()).count() == 1
    assert crypto.null_drop(out, "ct").count() == 1
