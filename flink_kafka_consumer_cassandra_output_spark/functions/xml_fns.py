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


def stanza_type_fast(col: Column) -> Column:
    """Hot-path variant of :func:`stanza_type` via ``regexp_extract``.

    ~10x cheaper than per-row XPath evaluation (measured at sf0.1: the
    xpath-based taxonomy queries ran 7-16s vs ~1s with regexp) and exactly
    equivalent on the reference's single-element stanzas, where the first
    ``type="..."`` attribute is the message type.  Use this in per-message
    classification at scale; keep :func:`stanza_type` for full XML fidelity.
    """
    return F.regexp_extract(col, 'type="([^"]*)"', 1)


def stanza_body_fast(col: Column) -> Column:
    """Hot-path body extraction (same rationale as :func:`stanza_type_fast`)."""
    return F.regexp_extract(col, "<body>(.*)</body>", 1)


def stanza_is_message(col: Column) -> Column:
    """True when the fragment's root element is ``message``."""
    return F.xpath_boolean(col, F.lit("boolean(/message)"))


#: Schema for the one-parse stanza struct: the message element's ``type``
#: attribute (attributePrefix default "_") and its body text.
STANZA_XML_SCHEMA = "STRUCT<_type: STRING, body: STRING>"


def stanza_struct(col: Column) -> Column:
    """Parse the stanza ONCE into a typed struct via Spark 4's ``from_xml``.

    Preferred O21 form at scale: a single XML parse yields every field,
    where chained ``xpath_string`` calls re-parse the document per field
    (measured 20x slower for two fields at sf0.1).  The xpath functions
    above remain for ad-hoc path queries.
    """
    return F.from_xml(col, F.lit(STANZA_XML_SCHEMA))
