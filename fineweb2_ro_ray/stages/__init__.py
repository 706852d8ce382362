"""Composite operators: deduplication, similarity search, analysis,
multimodal plumbing."""
