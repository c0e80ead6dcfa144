"""Extension operators (north-star LLM-data-pipeline surface):

- :mod:`.dedup` — exact, MinHash+LSH, SimHash, n-gram Jaccard
- :mod:`.similarity` — cosine top-k (brute-force / hyperplane LSH), near-dup pairs
- :mod:`.ivf` — IVF approximate nearest neighbor
- :mod:`.text` — language-ID, quality, token stats, fingerprints
- :mod:`.multimodal` — binary-column plumbing, Arrow-batched decode/frames
- :mod:`.asof` — as-of (point-in-time) join
- :mod:`.skew` — salted join for hot keys
"""
