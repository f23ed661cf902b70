"""Sinks: snapshot-committed partitioned tables with per-partition lineage."""
