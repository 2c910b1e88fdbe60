"""Adversarial XMPP stanza corpus through the three O21 parse paths.

The reference's vendored parser has explicit handling the synthesized-stanza
tests never exercised: jabber:* default namespaces are STRIPPED
(XmppPacketReader.java:373-379), CDATA sections are merged into text
(MXParser.java:92-146), entity references are resolved (MXParser.java:217-224),
and the char validator deliberately passes emoji (MXParser.java:371-387).
These goldens pin what each engine path does on that input class:

- ``stanza_struct`` (from_xml, the scale path),
- ``stanza_body``/``stanza_type`` (xpath, full XML fidelity),
- ``stanza_body_fast``/``stanza_type_fast`` (regexp hot path).

Where a path diverges from the reference parser's behavior, the golden says
so in a comment -- the point is that the divergences are KNOWN and chosen
(the regexp fast path trades XML fidelity for ~10x throughput and is only
used where stanzas are machine-generated single-element messages).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_kafka_consumer_cassandra_output_spark.functions import xml_fns as X

#: (name, stanza, expect) where expect maps path -> golden value.
#: ref= comments state the reference parser's behavior for that case.
CASES = [
    (
        "plain",
        '<message type="chat"><body>hello</body></message>',
        # ref: element message, body text "hello" -- all paths agree.
        dict(st=("chat", "hello"), xp_body="hello", xp_type="chat",
             re_body="hello", re_type="chat"),
    ),
    (
        "ns_default_jabber_client",
        '<message xmlns="jabber:client" type="chat"><body>hi</body></message>',
        # ref: XmppPacketReader.java:373-379 strips jabber:client, so the
        # element is plain "message".  from_xml and xpath both ignore the
        # default namespace here => all paths MATCH the reference.
        dict(st=("chat", "hi"), xp_body="hi", xp_type="chat",
             re_body="hi", re_type="chat"),
    ),
    (
        "ns_prefixed",
        '<m:message xmlns:m="jabber:client" type="chat">'
        "<m:body>hi</m:body></m:message>",
        # ref: prefixed jabber:client would still be stripped (QName check is
        # on the URI).  xpath matches local names (parser not namespace-aware)
        # => matches ref; from_xml finds the type attribute but NOT the
        # prefixed <m:body> child (DIVERGES: body is null); the regexp body
        # path needs a literal <body> tag (DIVERGES: empty).
        dict(st=("chat", None), xp_body="hi", xp_type="chat",
             re_body="", re_type="chat"),
    ),
    (
        "cdata_body",
        "<message type=\"chat\"><body><![CDATA[a <b> & c]]></body></message>",
        # ref: MXParser.java:92-146 merges CDATA into the text => "a <b> & c".
        # from_xml and xpath MATCH; the regexp path returns the raw wrapper
        # (DIVERGES -- CDATA never occurs in machine-generated stanzas).
        dict(st=("chat", "a <b> & c"), xp_body="a <b> & c", xp_type="chat",
             re_body="<![CDATA[a <b> & c]]>", re_type="chat"),
    ),
    (
        "entity_escapes",
        '<message type="chat"><body>a &lt;tag&gt; &amp; more</body></message>',
        # ref: MXParser.java:217-224 resolves entities => "a <tag> & more".
        # from_xml and xpath MATCH; regexp returns the raw escapes (DIVERGES).
        dict(st=("chat", "a <tag> & more"), xp_body="a <tag> & more",
             xp_type="chat", re_body="a &lt;tag&gt; &amp; more", re_type="chat"),
    ),
    (
        "nested_mixed_content",
        '<message type="chat"><body>hello <b>world</b> end</body></message>',
        # ref: dom4j Element.getText() concatenates the element's OWN text
        # nodes => "hello  end".  Three engines, three answers: from_xml
        # serializes the whole mixed content; xpath text() takes the FIRST
        # text node; regexp returns the raw inner markup.  All pinned.
        dict(st=("chat", "hello <b>world</b> end"), xp_body="hello ",
             xp_type="chat", re_body="hello <b>world</b> end", re_type="chat"),
    ),
    (
        "attribute_name_trap",
        '<message subtype="x" type="chat"><body>t</body></message>',
        # XML-aware paths read the real type attribute; the regexp pattern
        # 'type="..."' first matches INSIDE subtype= (DIVERGES: "x") -- the
        # documented fidelity limit of the hot path.
        dict(st=("chat", "t"), xp_body="t", xp_type="chat",
             re_body="t", re_type="x"),
    ),
    (
        "emoji_passthrough",
        '<message type="chat"><body>\U0001f389 party</body></message>',
        # ref: MXParser.java:371-387 widens char validation precisely to let
        # emoji through; Spark strings are UTF-8 so every path passes them.
        dict(st=("chat", "\U0001f389 party"), xp_body="\U0001f389 party",
             xp_type="chat", re_body="\U0001f389 party", re_type="chat"),
    ),
    (
        "multiline_pretty_printed",
        '<message type="chat">\n  <body>line1\nline2</body>\n</message>',
        # XML-aware paths are whitespace-tolerant; the regexp body pattern
        # uses '.' which does not cross newlines (DIVERGES: empty).
        dict(st=("chat", "line1\nline2"), xp_body="line1\nline2",
             xp_type="chat", re_body="", re_type="chat"),
    ),
]


@pytest.fixture(scope="module")
def parsed(spark):
    df = spark.createDataFrame(
        [(n, s) for n, s, _ in CASES], "name string, stanza string"
    )
    rows = df.select(
        "name",
        X.stanza_struct(F.col("stanza")).alias("st"),
        X.stanza_body(F.col("stanza")).alias("xp_body"),
        X.stanza_type(F.col("stanza")).alias("xp_type"),
        X.stanza_body_fast(F.col("stanza")).alias("re_body"),
        X.stanza_type_fast(F.col("stanza")).alias("re_type"),
        X.stanza_is_message(F.col("stanza")).alias("is_msg"),
    ).collect()
    return {r.name: r for r in rows}


@pytest.mark.parametrize("name,stanza,expect", CASES, ids=[c[0] for c in CASES])
def test_stanza_goldens(parsed, name, stanza, expect):
    r = parsed[name]
    st = (r.st["_type"], r.st["body"]) if r.st is not None else None
    assert st == expect["st"], f"{name}: from_xml {st!r} != {expect['st']!r}"
    assert r.xp_body == expect["xp_body"], f"{name}: xpath body {r.xp_body!r}"
    assert r.xp_type == expect["xp_type"], f"{name}: xpath type {r.xp_type!r}"
    assert r.re_body == expect["re_body"], f"{name}: regexp body {r.re_body!r}"
    assert r.re_type == expect["re_type"], f"{name}: regexp type {r.re_type!r}"
    assert r.is_msg is True  # every case has a message root


def test_fast_paths_match_xml_paths_on_reference_class_stanzas(parsed):
    """On the stanza class the reference actually emits (machine-generated,
    single-element, no CDATA/entities/nesting, type= is the only attribute
    ending in 'type'), the hot regexp paths agree with the XML-aware paths
    -- the precondition for using them in per-message classification."""
    for name in ("plain", "ns_default_jabber_client", "emoji_passthrough"):
        r = parsed[name]
        assert r.re_body == r.xp_body and r.re_type == r.xp_type, name
