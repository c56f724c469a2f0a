"""Training-data-pipeline extensions (north-star operators beyond the
reference's own surface): deduplication, similarity search, text analysis,
multimodal column plumbing."""
