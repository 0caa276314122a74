"""Large-scale training-data operators (BASELINE.json north-star):
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard), approximate
nearest-neighbor similarity search, text analysis, and multimodal column
plumbing — all pure DataFrame transforms designed for the 100 TB path.
"""
