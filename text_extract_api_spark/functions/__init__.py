"""Large-scale training-data pipeline operators.

Beyond the reference's own per-document operators, a 100 TB corpus engine
needs corpus-level ops: deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard), similarity search over embeddings, and text analysis
(language ID, quality scoring, token counting, fingerprinting). All are
built from JVM-side column expressions wherever possible so they stay in
whole-stage codegen and have exact DuckDB-oracle parity.
"""
