"""Plan-shape regression gate (VERDICT r6 #6): regenerates the
plan-audit fingerprints in-suite at the smoke SF so the committed
docs/PLAN_AUDIT.md invariants can't silently go stale.

Two invariants are load-bearing for the 100 TB story and are asserted
hard here:

- NO audited plan may contain a row-at-a-time Python eval
  (BatchEvalPython) — the one shape that is never acceptable
  (SURVEY §4 O9); kernel drops must be Arrow-vectorized.
- The scan-stage-only operators (pii_scrub, filter_range_term) must
  stay at ZERO data-moving exchanges — their whole design is that a
  100x scale-up costs exactly one pass over the scan.

The full fingerprint table (shuffle/broadcast/codegen counts per
query) remains `tools/plan_audit.py`'s artifact; this test keeps the
non-negotiable subset green on every pytest run.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from plan_audit import AUDIT_SET, fingerprint  # noqa: E402

# operators documented as scan-stage-only: any exchange appearing in
# their plan is a regression, not tuning
_SCAN_STAGE_ONLY = {"pii_scrub": 0, "filter_range_term": 0}


@pytest.fixture(scope="module")
def audit_fps(spark, sf_dir):
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    return {name: fingerprint(qs[name](spark, sf_dir)) for name in AUDIT_SET}


def test_no_row_at_a_time_python_eval(audit_fps):
    offenders = {n: fp for n, fp in audit_fps.items() if fp["py_row"]}
    assert not offenders, (
        f"row-at-a-time BatchEvalPython crept into: {offenders} — "
        "rewrite the kernel as a pandas/Arrow UDF"
    )


def test_scan_stage_operators_stay_shuffle_free(audit_fps):
    for name, budget in _SCAN_STAGE_ONLY.items():
        got = audit_fps[name]["shuffles"]
        assert got <= budget, (
            f"{name} grew a shuffle ({got} > {budget}): it is documented "
            "as scan-stage-only (docs/PLAN_AUDIT.md)"
        )


def test_pushdown_still_reaches_parquet(audit_fps):
    """filter_range_term's predicates must reach the scan: a plan whose
    parquet scans all carry empty PushedFilters re-reads every row
    group at 100 TB."""
    assert audit_fps["filter_range_term"]["pushed"] >= 1


def test_vectorized_python_counts_are_sane(audit_fps):
    """The detail-header anchoring fix (ADVICE r6): one ArrowEvalPython
    node must count once, not twice. knn_ivfflat_exact has exactly one
    Arrow kernel drop in its probe stage."""
    assert audit_fps["knn_ivfflat_exact"]["py"] == 1
