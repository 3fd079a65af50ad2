"""grisp_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch reimagination of the capabilities of kermitt2/grisp
(reference snapshot at /root/reference, GPL-3.0): gazetteer / label
statistics, anchor-prior entity linking, redirect-style
canonicalization, and graph materialization — re-expressed as
DataFrame jobs over Parquet/Iceberg transcript tables, plus the
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB corpus needs.

Nothing in this package is a port: the reference is a sequence of
Hadoop MapReduce jobs with LMDB side-joins; here every stage is a
declarative Spark plan (Catalyst-optimized) with vectorized
pandas/Arrow UDFs only where built-in functions cannot express the
semantics (trie-based mention detection, numpy embedding scoring).
"""

__version__ = "0.1.0"
