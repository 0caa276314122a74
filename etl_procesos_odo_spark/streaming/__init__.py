"""Structured Streaming variants of the reference's temporal aggregates
(SURVEY.md §2.10): tumbling-window counts, watermarked dedup.
"""
