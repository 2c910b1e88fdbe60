"""Runtime configuration loading (reference operator O19).

The reference reads a ``.properties`` file and passes keys prefixed
``kafka.message.backup.`` -- prefix stripped -- verbatim to the Kafka client
(/root/reference/src/main/java/com/cansever/consumer/BackupMessageConsumer.java:25-31,66-87;
example keys at conf/message-consumer.properties:1-12).  Same pattern here:
a flat dict loader plus prefix-filtered namespacing, used by the Kafka
source builder to forward ``kafka.*`` options.
"""

from __future__ import annotations

import os
from pathlib import Path

KAFKA_PREFIX = "kafka.message.backup."

#: Env flag honored by builders that materialize eagerly at plan-build time
#: (localCheckpoint intermediates, the iterative connected-components loop).
#: When set, those builders return a schema-identical lazy plan instead of
#: running jobs, so schema-only consumers (tests/test_registry_lint.py's
#: registry-wide output-type lint, plan dumps) stay cheap.  Never set in the
#: driver/bench/oracle paths -- results there come from the full pipelines.
SCHEMA_ONLY_ENV = "SPARK_GRAFT_SCHEMA_ONLY"


def schema_only_builds() -> bool:
    """True when builders should skip eager materialization (schema lint)."""
    return os.environ.get(SCHEMA_ONLY_ENV, "") not in ("", "0")


def read_properties(path: str | Path) -> dict[str, str]:
    """Minimal Java-properties reader: ``key=value`` lines, ``#``/``!``
    comments, blank lines ignored (mirrors ``readProperties``,
    BackupMessageConsumer.java:66-75).

    Supported subset, documented deliberately: ``java.util.Properties.load``
    additionally accepts ``:`` separators, backslash escapes and line
    continuations; the shipped reference config
    (conf/message-consumer.properties) uses plain ``k=v`` only, which is
    what this parser guarantees."""
    props: dict[str, str] = {}
    for raw in Path(path).read_text().splitlines():
        line = raw.strip()
        if not line or line.startswith(("#", "!")):
            continue
        if "=" in line:
            k, _, v = line.partition("=")
            props[k.strip()] = v.strip()
    return props


def filter_kafka_properties(props: dict[str, str], prefix: str = KAFKA_PREFIX) -> dict[str, str]:
    """Strip the namespace prefix and return only the Kafka client keys
    (mirrors ``filterKafkaProperties``, BackupMessageConsumer.java:77-87)."""
    return {k[len(prefix):]: v for k, v in props.items() if k.startswith(prefix)}
