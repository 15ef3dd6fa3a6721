"""Canonical column-name and domain-constant registry.

Analog of the reference's ``GameConstants`` class
(reference: src/notebooks/utilities.py:10-16), which pins the canonical
join-key / score column names used across the pipeline, plus the
``GAME_TYPES`` IN-list (reference: utilities.py:11,
src/notebooks/modelling/auxillary_dims.py:118).

We keep both the reference-domain (Steam) names — used by the pipeline
parity modules — and the synthetic-star-schema names used by the driver
fixtures (FIXTURES.md §B).
"""

from __future__ import annotations


class GameConstants:
    """Reference-domain canonical names (utilities.py:10-16)."""

    GAME_ID = "appid"
    REVIEW_ID = "recommendationid"
    GENERATED_SCORE = "sentiment_score"
    WEIGHTED_SCORE = "weighted_score"
    DIM_ID = "id"
    GAME_TYPES = ["game", "demo", "dlc"]


class Star:
    """Synthetic star schema (driver fixtures, FIXTURES.md §B)."""

    TABLES = (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    )
    # Small dimensions that should always be broadcast in joins.
    BROADCAST_DIMS = ("region", "nation", "supplier", "part", "customer")


class Layers:
    """Layered table naming (utilities.py:20-30: f"{layer}_{table}")."""

    RAW = "raw"
    STAGE = "stage"
    LINKAGE = "linkage"
    DIM = "dim"
    FACT = "fact"
    METRIC = "metric"
