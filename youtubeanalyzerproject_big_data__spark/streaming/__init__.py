"""Structured Streaming layer.

The reference has no streaming (SURVEY.md par.2.7 closing note) -- its XML
"streaming" loader is an out-of-band batch ETL.  This package adds the
streaming surface a modern engine needs: windowed aggregation with
watermarks, and stateful sessionization.  Every streaming query has a
batch-equivalent twin so correctness is oracle-checkable on static data.
"""
