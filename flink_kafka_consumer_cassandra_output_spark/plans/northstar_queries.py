"""North-star LLM-data-pipeline operators (BASELINE.json ``north_star``):
dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity search,
text analysis, multimodal plumbing."""
