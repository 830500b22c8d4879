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


#: keep >= 2 free slots under the driver cap so a new operator row
#: never again forces an eviction at add time (VERDICT r10 #3 — the
#: registry had been pinned at exactly 50)
REGISTRY_HEADROOM = 2


def test_registry_fits_driver_cap():
    qs = E.queries()
    # one assert: the headroom bound subsumes the bare cap (a count
    # over the cap also exceeds cap-minus-headroom), so a separate
    # cap assert could never be the one that fires
    assert len(qs) <= DRIVER_QUERY_CAP - REGISTRY_HEADROOM, (
        f"queries() has {len(qs)} entries — keep >= {REGISTRY_HEADROOM} "
        f"slots of headroom under the {DRIVER_QUERY_CAP}-row driver cap "
        f"(consolidate redundant rows into variants unions; driver-"
        f"unverified tail: {list(qs)[DRIVER_QUERY_CAP:]})"
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


def test_scratch_dirs_cleaned_at_exit():
    """VERDICT r4 #6: the entry's temp stores must not leak into /tmp.
    _scratch_dir defers rmtree to interpreter exit (the driver collects
    the DataFrame after the callable returns, so the dir must outlive
    the call) — verify the atexit hook actually fires, and that no raw
    mkdtemp call remains outside the helper."""
    import subprocess

    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, %r); "
            "import __spark_entry__ as E; print(E._scratch_dir('gamma_leaktest_'))"
            % REPO,
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    path = out.stdout.strip().splitlines()[-1]
    assert "gamma_leaktest_" in path
    assert not os.path.exists(path), f"scratch dir survived exit: {path}"

    src = open(E.__file__).read()
    # one mkdtemp allowed: the helper's own
    assert src.count("tempfile.mkdtemp(") == 1, "raw mkdtemp outside _scratch_dir"
