"""PySpark-native constraint-validation engine.

A from-scratch re-expression of the capabilities of
jimmc414/invoice_anomaly_detection_sieve (reference at /root/reference) as an
idiomatic Spark engine: per-partition profile learning, uniqueness /
referential / row-predicate / distribution-drift constraints over an
interleaved text+media documents table, pairwise duplicate scoring with a
blocking self-join, verdict fusion, and a resumable per-partition ledger.

Everything is DataFrame-first: column expressions where possible, Arrow
vectorized pandas UDFs (mapInPandas / applyInPandas) only for the
Jaro-Winkler / Hungarian-assignment kernels that SQL cannot express.
No per-row Python UDFs anywhere.
"""

__version__ = "0.1.0"
