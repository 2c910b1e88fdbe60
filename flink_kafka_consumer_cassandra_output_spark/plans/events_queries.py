"""Event-time queries over the ``events`` fixture: tumbling windows,
sessionization, JSON scalar functions -- the batch-checkable twins of the
streaming surface."""
