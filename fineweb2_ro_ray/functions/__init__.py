"""Scalar / per-turn functions: text statistics, LID, perplexity, scrubbing."""
