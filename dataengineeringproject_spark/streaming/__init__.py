"""Structured Streaming analogs of the batch operators (SURVEY.md
§7.2.9; north star: Kafka + watermarked windows, BASELINE.json)."""
