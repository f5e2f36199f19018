"""Training-data pipeline operators (deduplication, similarity search,
text analysis, multimodal plumbing) — the operations a 100 TB pretraining
corpus pipeline needs on top of the FTS core."""
