"""Pipeline configuration.

Replaces the reference's Databricks job parameters + ``dbutils.widgets``
plumbing (reference: src/job/workflow.json:20-24,36-42 and
src/notebooks/utilities.py:21-36) with a plain dataclass.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class PipelineConfig:
    """All knobs the reference passed as notebook widgets.

    - ``warehouse_dir``: where layered tables are persisted (replaces
      catalog.schema addressing; tables live as parquet dirs
      ``{warehouse_dir}/{layer}_{name}``).
    - ``raw_location``: CSV landing zone (workflow.json:22).
    - ``batch_size``: scoring batch throttle (workflow.json:40;
      reviews_fact.py:178).
    - ``scorer_backend``: pluggable LLM-scorer backend name; the
      reference hard-wired an HTTP endpoint (workflow.json:41) — we
      default to the deterministic local backend.
    """

    warehouse_dir: str = field(
        default_factory=lambda: os.environ.get(
            "SPARK_GRAFT_WAREHOUSE", "/tmp/gaa_warehouse"
        )
    )
    raw_location: str = ""
    batch_size: int = 50_000
    scorer_backend: str = "lexicon"
    translator_backend: str = "identity"
    table_format: str = "parquet"
