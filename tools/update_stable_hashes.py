"""Re-record the stable-tier source-hash baseline.

Run AFTER a round whose driver window (or a local full verify) proved
the stable-tier queries green: the recorded hash asserts "this exact
source text is the one that was proved correct".  Any later edit to a
stable query's function drifts its hash, and tests/test_registry.py
then holds that name to the CORE staleness cap until it is re-proved
and this tool is re-run.

Usage: python tools/update_stable_hashes.py [name ...]
    With no args, re-records every stable-tier name (first-time setup
    or after a full local verify).  With names, re-records only those
    (after a targeted re-proof).
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from gaming_ai_analytics_spark import registry  # noqa: E402

OUT = (
    pathlib.Path(__file__).resolve().parent.parent
    / "tests"
    / "stable_plan_hashes.json"
)


def main(argv: list[str]) -> int:
    names = set(registry.queries())
    stable = sorted(names - registry.CORE_TIER)
    targets = argv or stable
    unknown = [n for n in targets if n not in stable]
    if unknown:
        print(f"not stable-tier (or not registered): {unknown}")
        return 1
    recorded: dict[str, str] = (
        json.loads(OUT.read_text()) if OUT.exists() else {}
    )
    # drop names that left the stable tier
    recorded = {n: h for n, h in recorded.items() if n in stable}
    changed = 0
    for n in targets:
        h = registry.source_hash(n)
        if h is None:
            print(f"UNHASHABLE (move to CORE_TIER): {n}")
            return 1
        if recorded.get(n) != h:
            changed += 1
        recorded[n] = h
    OUT.write_text(json.dumps(dict(sorted(recorded.items())), indent=1) + "\n")
    print(f"recorded {len(targets)} stable hashes ({changed} changed) -> {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
