"""North-star LLM-data-pipeline query surface (SURVEY §2.3 last rows):
dedup family, similarity search, text analysis, multimodal plumbing.

Populated incrementally; each SQL-expressible op carries a DuckDB oracle,
approximate ops (MinHash/SimHash/LSH) are rows-only + pytest-verified
against exact methods.
"""

from __future__ import annotations
