"""Dataflow operators: URL-seen anti-join, politeness-budget windows,
dedup family, similarity search, multimodal plumbing."""
