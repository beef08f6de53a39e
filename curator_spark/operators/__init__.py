"""Large-scale training-data operators: deduplication, similarity
search, text analysis, multimodal plumbing — the ops a 100 TB curation
pipeline needs beyond the reference's own surface."""
