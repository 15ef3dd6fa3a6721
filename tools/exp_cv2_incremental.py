"""Curation-v2 build-state-once/run-nightly decomposition (r13,
VERDICT r12 ask #2).

The claim behind ``traindata_curation_v2_incremental``
(queries_traindata.py): the corpus-side work — gate + ExactSubstr +
survivor dedup + gram/MinHash index builds + BPE train + packing
offsets — is paid ONCE per corpus release, and the recurring nightly
cost is the increment run alone (gate → incremental span removal →
within-increment dedup → saved-index cross probe → saved-vocab
pricing → offset-continued packing).  Measured against the full
rebuild (``traindata_curation_v2``), which re-pays the whole pipeline
every night:

- ``t_state_build``: persisted corpus state build (once);
- ``t_nightly``: ONE increment through the five stages against that
  state (the recurring cost; the increment's stage-boundary cache is
  cleared first so the measurement includes its materialization, as
  a real new nightly batch would);
- ``t_full_rebuild``: the full pipeline on (corpus ∪ increment) in
  the same JVM — the alternative nightly cost without persisted
  state.

Nightly is timed BEFORE the full rebuild in the same JVM so warm-up
bias favors the side we argue against.

Usage: python tools/exp_cv2_incremental.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".benchdata", "sf10")


def main() -> None:
    from gaming_ai_analytics_spark import registry
    from gaming_ai_analytics_spark.session import get_spark

    registry.queries()  # load query modules (circular-import guard)
    import gaming_ai_analytics_spark.queries_traindata as qt

    spark = get_spark("cv2-incremental")

    t0 = time.perf_counter()
    qt._cv2i_state(spark, SF)
    t_state = time.perf_counter() - t0

    # nightly: a fresh increment batch (clear its boundary cache so
    # the run pays the materialization a new batch would)
    qt._CV2I_BUILT.pop(SF + "#inc", None)
    t0 = time.perf_counter()
    n_delta = qt.q_traindata_curation_v2_incremental(spark, SF).count()
    t_nightly = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_full = qt.q_traindata_curation_v2(spark, SF).count()
    t_full = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "sf_dir": SF,
                "t_state_build": round(t_state, 1),
                "t_nightly": round(t_nightly, 1),
                "t_full_rebuild": round(t_full, 1),
                "nightly_speedup": round(t_full / t_nightly, 2),
                "n_delta_rows": n_delta,
                "n_full_rows": n_full,
            }
        )
    )


if __name__ == "__main__":
    main()
