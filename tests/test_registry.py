"""Registry-contract guards (VERDICT r3 #1 / "What's wrong" #3): the
driver CORRECTNESS check verifies only the FIRST 50 ``queries()``
entries, so a registry that grows past 50 silently ships unverified
operators. These tests make the truncation loud at build time instead
of judge time.
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E

DRIVER_QUERY_CAP = 50
REPO = os.path.dirname(os.path.abspath(E.__file__))


def test_registry_fits_driver_cap():
    qs = E.queries()
    assert len(qs) <= DRIVER_QUERY_CAP, (
        f"queries() has {len(qs)} entries but the driver only verifies the "
        f"first {DRIVER_QUERY_CAP}; trim or consolidate "
        f"(tail at risk: {list(qs)[DRIVER_QUERY_CAP:]})"
    )


def test_every_oracle_has_a_query():
    qs, os_ = set(E.queries()), set(E.oracle_sql())
    assert os_ <= qs, f"oracle_sql keys without a queries() entry: {os_ - qs}"


def test_registry_keys_all_driver_verified_or_declared_new():
    """Every registry key must appear in the newest CORRECTNESS artifact
    OR be declared in NEWLY_ADDED (added since that artifact). Catches
    the r3 failure mode where 4 tail entries rotted unverified."""
    arts = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: os.path.basename(p),
    )
    if not arts:
        return
    with open(arts[-1]) as fh:
        seen = set(json.load(fh))
    missing = set(E.queries()) - seen - set(E.NEWLY_ADDED)
    assert not missing, (
        f"registry keys neither driver-verified (per {os.path.basename(arts[-1])}) "
        f"nor declared in NEWLY_ADDED: {sorted(missing)}"
    )
