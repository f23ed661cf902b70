"""fact_extraction_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch reimplementation of the query/data-processing capabilities of
``janetzki/fact_extraction`` (distant-supervision triple extraction from a
web-page corpus), designed Spark-first:

* stage 1 — byte-deterministic article-text extraction (Arrow UDF over the
  ``html`` column of a Common-Crawl-style ``pages`` table),
* stage 2 — batched mention detection against a broadcast alias/redirect
  dictionary (Aho-Corasick trie built once per executor inside a pandas UDF)
  plus tf-idf context-similarity ranking of link candidates,
* stage 3 — lexical token-window pattern learning/matching (groupBy-based
  commutative merge replacing the reference's recursive tree merge) emitting
  ``(subj, pred, obj, score, evidence)`` triples,
* canonicalization via iterative connected components,
* snapshot-committed partitioned triple tables with per-partition lineage
  rows for checkpoint/resume.

Everything hot is DataFrame ops + Arrow/pandas UDFs; no per-row Python, no
driver-side loops over collected data.
"""

__version__ = "0.1.0"
