"""wpvectordb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of jtgraham38/WPVectorDb, rebuilt Spark-first.

The reference (/root/reference, PHP/MySQL) is a WordPress vector database:
write-time vector derivation (normalize / magnitude / sign-bit binary code),
a three-stage top-k similarity search (metadata filter -> Hamming candidate
generation -> exact cosine rerank -> metadata sort), an EAV filter/sort DSL,
and a retry-capable batch job queue.  This package re-expresses every one of
those operators as lazy DataFrame plans over Catalyst-native expressions (no
row-at-a-time UDFs in any hot path), and extends the surface with the
LLM-data-pipeline operators a 100 TB training corpus needs: exact and
near-duplicate detection (MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), approximate nearest neighbour search (brute-force and
IVF), text analysis (language id, quality scoring, token stats,
fingerprinting), event windowing / sessionization, and multimodal binary
column plumbing.
"""

__version__ = "0.1.0"
