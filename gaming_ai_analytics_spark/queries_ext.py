"""Extension operator queries (SURVEY.md §2.11): dedup, similarity
search, text analysis, multimodal, pipeline/metric-view surfaces.

Populated incrementally; see queries_core.py for the conventions.
"""

from __future__ import annotations
