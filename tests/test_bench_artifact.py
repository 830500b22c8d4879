"""Bench artifact-pipeline contract (VERDICT r10 "what's wrong" #1).

The driver captures only the last 2,000 chars of bench.py's output and
parses the JSON line from that tail. r10's printed line (queries +
canaries + the 43-name order permutation) outgrew it and the round's
artifact landed with parsed=null, losing 24 of 43 per-query timings.

These tests pin the three-part fix, no Spark session needed:
  1. slim_for_stdout() keeps the printed line <= LINE_BUDGET even for
     a suite larger than today's, and never drops the queries dict;
  2. write_full_artifact() persists the complete dict to
     docs/bench_runs/ so history never depends on stdout capture;
  3. recover_prev() extracts prior-round timings from a parsed
     artifact, from a full JSON line inside the tail, AND from the r10
     truncated-mid-line shape (regression-tested against the real
     BENCH_r10.json checked into the repo).
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fake_out(n_queries: int) -> dict:
    """A result dict shaped like main()'s, sized past today's suite.
    Name lengths mirror the real suite (today's 43 entries average ~18
    chars, max 26: knn_graph_distributed_10kq)."""
    names = [f"bench_entry_{i:02d}_name" for i in range(n_queries)]
    queries = {n: round(0.137 * (i + 1), 3) for i, n in enumerate(names)}
    return {
        "metric": "gamma_spark headline suite wall time",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "canary": {"jvm": 1.234, "arrow": 2.345},
        "canary_s": 3.579,
        "canary2": {"membw": 4.567},
        "canary2_s": 4.567,
        "order_seed": 10,
        "order": names,
        "splits": {n: {"build_s": 1.0, "search_s": 2.0} for n in names[:6]},
        "shared_prev_total": 65.861,
        "shared_prev_n": n_queries,
        "shared_prev_artifact": "BENCH_r10.json",
        "shared_prev_total_norm": 58.697,
        "shared_prev_total_norm2": 68.477,
        "full": "docs/bench_runs/run_20260816_000000_sf0.1.json",
    }


class TestSlimForStdout:
    def test_line_fits_budget_at_50_entries(self):
        line = bench.slim_for_stdout(_fake_out(50))
        assert len(line) <= bench.LINE_BUDGET
        d = json.loads(line)
        # the driver contract fields survive
        assert d["unit"] == "sec"
        assert len(d["queries"]) == 50
        assert d["sf"] == 0.1
        # the bulk fields are side-file-only
        for k in bench._SIDE_ONLY_FIELDS:
            assert k not in d

    def test_line_fits_budget_at_65_entries(self):
        # headroom: a suite half again today's size must still parse
        # in-budget; near the ceiling a couple of cheap entries may be
        # cut (recorded via queries_truncated; side file keeps all)
        line = bench.slim_for_stdout(_fake_out(65))
        assert len(line) <= bench.LINE_BUDGET
        d = json.loads(line)
        assert len(d["queries"]) >= 60
        assert len(d["queries"]) + d.get("queries_truncated", 0) == 65

    def test_absurd_suite_truncates_gracefully(self):
        # last-resort path: an impossibly verbose suite still yields a
        # parseable in-budget line carrying the MOST EXPENSIVE entries
        # plus an explicit truncation count (full dict is in the side
        # file); it must never silently bust the budget again
        out = _fake_out(40)
        out["queries"] = {
            f"an_extremely_verbose_benchmark_entry_name_number_{i:03d}":
            float(i) for i in range(80)
        }
        line = bench.slim_for_stdout(out)
        assert len(line) <= bench.LINE_BUDGET
        d = json.loads(line)
        assert d["queries_truncated"] == 80 - len(d["queries"])
        assert len(d["queries"]) > 10
        # the expensive tail survives, the cheap head is what's cut
        assert "an_extremely_verbose_benchmark_entry_name_number_079" in d["queries"]

    def test_error_strings_kept(self):
        out = _fake_out(10)
        out["queries"]["broken_entry"] = "error:RuntimeError"
        d = json.loads(bench.slim_for_stdout(out))
        assert d["queries"]["broken_entry"] == "error:RuntimeError"


class TestWriteFullArtifact:
    def test_roundtrip(self, tmp_path):
        out = _fake_out(43)
        rel = bench.write_full_artifact(out, str(tmp_path))
        assert rel and rel.startswith(os.path.join("docs", "bench_runs"))
        with open(tmp_path / rel) as fh:
            full = json.load(fh)
        # nothing slimmed in the side file
        assert full["order"] == out["order"]
        assert full["splits"] == out["splits"]
        assert full["canary"] == out["canary"]
        latest = tmp_path / "docs" / "bench_runs" / "latest_full.json"
        assert json.load(open(latest))["queries"] == out["queries"]


class TestRecoverPrev:
    def test_prefers_parsed(self):
        got = bench.recover_prev({"parsed": {"queries": {"a": 1.0}}, "tail": "x"})
        assert got == {"queries": {"a": 1.0}}

    def test_full_line_in_tail(self):
        inner = json.dumps({"queries": {"a": 1.5, "b": 2.5}, "canary_s": 3.0})
        got = bench.recover_prev({"parsed": None, "tail": f"noise\n{inner}\n"})
        assert got["queries"] == {"a": 1.5, "b": 2.5}

    def test_truncated_mid_line_regex_recovery(self):
        tail = ('.107, "events_sliding_window": 0.335, "dedup_minhash'
                '_verified": 1.265, "ivf_build_search_512q": 0.983}, '
                '"sf": 0.1, "canary_s": 7.5, "canary2_s": 9.25, '
                '"shared_prev_total": 65.861}\n')
        got = bench.recover_prev({"parsed": None, "tail": tail})
        assert got["queries"]["events_sliding_window"] == 0.335
        assert got["queries"]["ivf_build_search_512q"] == 0.983
        assert got["canary_s"] == 7.5
        assert got["canary2_s"] == 9.25

    def test_real_r10_artifact_recovers(self):
        """The actual parsed=null artifact this contract exists for."""
        path = os.path.join(REPO, "BENCH_r10.json")
        if not os.path.exists(path):
            pytest.skip("BENCH_r10.json not present")
        with open(path) as fh:
            prev = json.load(fh)
        if prev.get("parsed") is not None:
            pytest.skip("artifact not in the truncated shape")
        got = bench.recover_prev(prev)
        # r10 post-mortem: 19 of 43 per-query timings survive the tail
        assert len(got["queries"]) >= 15
        assert all(isinstance(v, float) for v in got["queries"].values())

    def test_main_uses_recover_prev_when_parsed_null(self):
        # the shared_prev reader must not silently fall back to {}
        src = open(os.path.join(REPO, "bench.py")).read()
        assert "recover_prev(prev)" in src
