"""XMPP stanza parsing (reference operator O21).

The reference vendors ~900 LoC of pull-parser code
(/root/reference/src/main/java/com/cansever/consumer/message/XmppPacketReader.java:308-435,
MXParser.java) that is constructed but never invoked on data
(CassandraOutputFormat.java:56-64 builds it; ``writeRecord`` never calls it).
The *intended* capability -- turning the stanza XML fragment into typed
fields -- is expressed here with Spark's builtin ``xpath_*`` SQL functions:
no vendored parser, JVM-side evaluation, namespace-agnostic paths (the
reference strips jabber:* namespaces, XmppPacketReader.java:373-379).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def xpath_str(col: Column, path: str) -> Column:
    """Extract the first text match of an XPath from an XML string column."""
    return F.xpath_string(col, F.lit(path))


def stanza_body(col: Column) -> Column:
    """``<message ...><body>TEXT</body></message>`` -> TEXT."""
    return F.xpath_string(col, F.lit("/message/body/text()"))


def stanza_type(col: Column) -> Column:
    """The ``type`` attribute of the message element (feeds taxonomy O22)."""
    return F.xpath_string(col, F.lit("/message/@type"))


def stanza_is_message(col: Column) -> Column:
    """True when the fragment's root element is ``message``."""
    return F.xpath_boolean(col, F.lit("boolean(/message)"))
