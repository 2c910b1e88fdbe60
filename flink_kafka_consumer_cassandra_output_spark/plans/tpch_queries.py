"""General query surface over the TPC-H-ish fixtures (SURVEY.md section 2's
"absent operator categories" checklist): scans, joins, aggregations,
windows, sorts/top-k, set ops, scalar functions."""
