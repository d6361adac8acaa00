"""LLM-training-data pipeline operators: dedup, similarity search, text analysis, multimodal."""
