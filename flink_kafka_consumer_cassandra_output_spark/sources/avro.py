"""Avro record decoding (reference operators O2/O3/O4).

The reference decodes Kafka ``byte[]`` payloads against a fixed Avro schema
declared inline (/root/reference/src/main/java/com/cansever/consumer/
AvroDeserializationSchema.java:22-32; duplicate resource copy
src/main/resources/Message.avsc:1-11) into a 5-field POJO.

Spark twin: ``from_avro(col("value"), MESSAGE_AVSC)`` -- a single projection,
schema parsed once at plan time (the analog of the reference's lazy
``Schema.Parser`` reuse, AvroDeserializationSchema.java:62-70).  Type
metadata extraction (O4) is implicit: the DataFrame schema is carried by
Catalyst.

``from_avro`` lives in the external ``spark-avro`` module; when the jar is
absent (this container) the builder raises a clear error and tests skip --
the decoded shape is covered instead by :data:`MESSAGE_SCHEMA` consumers.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Verbatim twin of the reference schema (Message.avsc:1-11).
MESSAGE_AVSC = json.dumps(
    {
        "namespace": "com.cansever.consumer.message",
        "type": "record",
        "name": "Message",
        "fields": [
            {"name": "msgId", "type": "string"},
            {"name": "username", "type": "string"},
            {"name": "jid", "type": "string"},
            {"name": "sentTime", "type": "long"},
            {"name": "stanza", "type": "string"},
        ],
    }
)

#: The same record as a Spark schema (MessageObject.java:8-12; epoch ms long).
MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("msgId", T.StringType(), False),
        T.StructField("username", T.StringType(), False),
        T.StructField("jid", T.StringType(), False),
        T.StructField("sentTime", T.LongType(), False),
        T.StructField("stanza", T.StringType(), False),
    ]
)


def avro_available() -> bool:
    try:
        from pyspark.sql.avro.functions import from_avro  # noqa: F401
        return True
    except ImportError:  # pragma: no cover
        return False


def decode_message(value: Column) -> Column:
    """O2: binary Avro -> struct column (AvroDeserializationSchema.java:34-50)."""
    from pyspark.sql.avro.functions import from_avro

    return from_avro(value, MESSAGE_AVSC)


def decode_kafka_stream(df: DataFrame) -> DataFrame:
    """Kafka frame -> typed message columns (the O1->O2 hop)."""
    return df.select(decode_message(F.col("value")).alias("m")).select("m.*")
