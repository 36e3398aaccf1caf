"""Large-scale training-data pipeline operators.

Beyond the reference's own operator set: deduplication (exact, MinHash
LSH, SimHash, n-gram Jaccard, embedding cosine), similarity search
(brute-force + LSH-bucketed ANN), text analysis (language id, quality
scoring, token counting, fingerprinting), and multimodal column
plumbing. All hot paths are JVM column expressions or Arrow-batched
pandas UDFs — never per-row Python.
"""
