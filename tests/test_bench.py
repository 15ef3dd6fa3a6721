"""Bench-harness unit tests (no Spark session).

The r13 host regime exposed a harness robustness hole: the sf1 DuckDB
tier-2 child hit its 1800 s subprocess cap and the parent lost EVERY
tier-2 comparator row to one exception. The child now streams one JSON
line per finished query; the parent salvages those on timeout. These
tests pin the salvage parser's three regimes.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _parse_duck_child_stdout  # noqa: E402


def test_parse_complete_child_uses_final_summary():
    stdout = "\n".join(
        [
            json.dumps({"q": "a", "s": 1.0}),
            json.dumps({"q": "b", "s": 2.0}),
            json.dumps({"total": 3.0, "queries": {"a": 1.0, "b": 2.0}}),
        ]
    )
    total, queries, partial = _parse_duck_child_stdout(stdout)
    assert total == 3.0
    assert queries == {"a": 1.0, "b": 2.0}
    assert partial is False


def test_parse_timed_out_child_salvages_streamed_rows():
    # killed mid-stream: no summary line, possibly a truncated last line
    stdout = "\n".join(
        [
            json.dumps({"q": "a", "s": 1.0}),
            json.dumps({"q": "b", "s": 2.0}),
            '{"q": "c", "s": 4.',  # truncated by the kill
        ]
    )
    total, queries, partial = _parse_duck_child_stdout(stdout)
    assert total is None  # a partial sum must never pose as the total
    assert queries == {"a": 1.0, "b": 2.0}
    assert partial is True


def test_parse_empty_child_output():
    total, queries, partial = _parse_duck_child_stdout("")
    assert total is None
    assert queries is None
    assert partial is True
