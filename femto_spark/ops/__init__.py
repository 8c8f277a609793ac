"""Training-data pipeline operators over web-text corpora.

Beyond FEMTO's operator set (SURVEY.md §2), these are the operations a
100 TB training-data pipeline needs as first-class citizens: deduplication
(exact, MinHash+LSH, SimHash, n-gram Jaccard), similarity search over
embeddings (brute-force cosine, LSH-bucketed), text analysis (language ID,
quality scoring, token counting, fingerprinting), and multimodal column
plumbing. All are DataFrame-declarative where possible; numpy inside
Arrow-batched UDFs where not.
"""

from . import dedup, multimodal, similarity, textstats  # noqa: F401
