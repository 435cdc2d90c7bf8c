"""Golden-response e2e tests (reference style: tests/server_suite.go —
query string in, EXACT response JSON out) at sf0.001."""

from __future__ import annotations

import pytest

from opengemini_spark.api import handle_query

SF = "/root/testdata/sf0.001"

GOLDEN = [
    (
        "SELECT count(value) AS n FROM events GROUP BY event_type",
        "s",
        {
            "results": [
                {
                    "statement_id": 0,
                    "series": [
                        {"name": "events", "tags": {"event_type": "click"},
                         "columns": ["time", "n"], "values": [[0, 210]]},
                        {"name": "events", "tags": {"event_type": "error"},
                         "columns": ["time", "n"], "values": [[0, 201]]},
                        {"name": "events", "tags": {"event_type": "purchase"},
                         "columns": ["time", "n"], "values": [[0, 202]]},
                        {"name": "events", "tags": {"event_type": "signup"},
                         "columns": ["time", "n"], "values": [[0, 199]]},
                        {"name": "events", "tags": {"event_type": "view"},
                         "columns": ["time", "n"], "values": [[0, 188]]},
                    ],
                }
            ]
        },
    ),
    (
        "SHOW TAG VALUES FROM events WITH KEY = event_type",
        None,
        {
            "results": [
                {
                    "statement_id": 0,
                    "series": [
                        {"name": "events", "columns": ["key", "value"],
                         "values": [["event_type", "click"],
                                    ["event_type", "error"],
                                    ["event_type", "purchase"],
                                    ["event_type", "signup"],
                                    ["event_type", "view"]]}
                    ],
                }
            ]
        },
    ),
]

# windowed golden: first days of the per-day error-count series
GOLDEN_WINDOW_HEAD = [
    [1704067200, 11, 7.66],
    [1704153600, 6, 16.99],
    [1704240000, 9, 7.72],
    [1704326400, 5, 9.77],
    [1704412800, 3, 52.33],
]


@pytest.mark.parametrize("q,epoch,expect", GOLDEN, ids=["group_by_tag", "show_tag_values"])
def test_golden_exact(spark, q, epoch, expect):
    assert handle_query(spark, SF, q, epoch=epoch) == expect


def test_golden_windowed_head(spark):
    out = handle_query(
        spark, SF,
        "SELECT count(value) AS n, min(value) AS mn FROM events "
        "WHERE event_type = 'error' GROUP BY time(1d), event_type",
        epoch="s",
    )
    blk = out["results"][0]["series"][0]
    assert blk["name"] == "events"
    assert blk["tags"] == {"event_type": "error"}
    assert blk["columns"] == ["time", "n", "mn"]
    assert blk["values"][:5] == GOLDEN_WINDOW_HEAD
    assert len(blk["values"]) == 30
