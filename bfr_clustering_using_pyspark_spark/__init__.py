"""PySpark-native analytics engine with the capabilities of
harshsjani/BFR-Clustering-using-PySpark (BFR streaming clustering),
extended with a general analytics query surface and LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing).

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, broadcast joins for small dims, Arrow-batched pandas UDFs
only where built-ins can't express the semantics (vectorized distance
kernels in the clustering core).
"""

__version__ = "0.1.0"
