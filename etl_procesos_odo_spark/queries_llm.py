"""LLM-training-data query surface: dedup, similarity search, text
analysis over ``documents`` / ``embeddings`` (BASELINE.json north-star).

Filled in incrementally; see queries_relational.py for the oracle-parity
conventions.
"""

from __future__ import annotations
