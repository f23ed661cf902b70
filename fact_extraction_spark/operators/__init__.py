"""Spark operators: each module is one pipeline stage or operator family.

All operators take and return DataFrames; none collect to the driver. UDFs
are Arrow-batched pandas UDFs (never row-at-a-time Python).
"""
