"""Engine operators: flatten, limits, LLM classify, dedup, similarity,
sessionization, multimodal plumbing."""
