"""Structured Streaming twin of the batch engine (reference operator O17).

The reference is a streaming job whose only fault-tolerance feature is
checkpointing (/root/reference/src/main/java/com/cansever/consumer/
BackupMessageConsumer.java:34); delivery into the sink is at-most-once
(fire-and-forget async writes, CassandraOutputFormat.java:109-132).  This
package runs the SAME transform functions as the batch path under
``readStream``/``writeStream`` with ``checkpointLocation``, upgrading
delivery to exactly-once via Spark's file-sink commit log -- same
semantics, stronger guarantee (SURVEY.md section 3.3).
"""

from .pipeline import (  # noqa: F401
    run_detail_stream,
    run_summary_stream,
    run_summary_stream_watermarked,
    stream_events,
    windowed_event_counts,
)
