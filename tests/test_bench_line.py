"""Pin bench.py's printed-line contract (VERDICT r17 task 2).

The round driver keeps only the LAST 2000 bytes of bench.py's stdout and
parses ONE JSON line out of it.  r17's line led with the bulky
spread/cold/construct diagnostics, so truncation cut off the line's
START and the automated round-over-round comparison went blind
(PERF_r17: prev_bench_ok=false, n_common=0).  These tests pin the fix:
the printed line is the compact record (queries + totals + control)
and stays inside the tail capture even at worst-case field widths, so
adding a headline row that silently overflows the budget fails here,
not in the next round's PERF report.
"""

import json

import bench


def _worst_case_compact() -> dict:
    # every per-query median at worst realistic width (4+3 digits), every
    # total/control likewise — wider than any value ever recorded
    return {
        "metric": "headline_queries_total",
        "unit": "sec",
        "queries": {name: 9999.999 for name in bench.HEADLINE},
        "value": 99999.999,
        "exec_total": 99999.999,
        "v1_total": 99999.999,
        "control": 9999.999,
        "control_spread": [9999.999, 9999.999],
        "reps": 3,
        "sf": 0.1,
    }


def test_compact_line_fits_driver_tail_capture():
    line = json.dumps(_worst_case_compact())
    assert len(line) <= 1900, (
        f"bench.py's printed JSON line would be {len(line)} bytes at "
        "worst-case widths; the driver's tail capture keeps only 2000 "
        "bytes, so the line must stay comfortably under it (trim the "
        "headline set's printed fields or shorten names)"
    )


def test_compact_line_has_contract_fields():
    d = _worst_case_compact()
    # the driver contract: one JSON line with these fields
    for field in ("metric", "value", "unit", "queries", "sf"):
        assert field in d
    # v1/v2 anchors and the drift control must survive in the printed line
    for field in ("exec_total", "v1_total", "control", "control_spread"):
        assert field in d


def test_full_record_superset_keys():
    """BENCH.json keeps the diagnostics the printed line dropped."""
    import inspect

    src = inspect.getsource(bench.main)
    # the full record written to BENCH.json must carry the diagnostics
    for key in ("spread", "cold", "construct"):
        assert f'full["{key}"]' in src, (
            f"bench.py no longer writes '{key}' into BENCH.json; the "
            "committed artifact must keep the full diagnostics"
        )
