from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")

# --- slow split (r5 verdict item 4): `pytest -m "not slow"` is the quick
# iteration path (~2-3 min); the FULL suite remains the default — no
# addopts filter, so plain `pytest tests/` still runs everything.
_SLOW_FILES = {
    "test_queries_oracle.py",   # the 150+-query DuckDB parity harness at sf0.01
    "test_streaming.py",        # e2e streaming: sockets, sidecars, spool roundtrips
    "test_checkpointing.py",    # reliable-checkpoint e2e (checkpoint dir lifecycles)
    "test_properties.py",       # hypothesis model checks (many examples × Spark jobs)
}
# Individually heavy model/e2e tests outside those files (>4 s each in the
# r6 duration profile); matched on nodeid substrings so same-named tests in
# other classes stay quick.
_SLOW_TESTS = (
    "TestIvfPqIndexPersistence::",
    "TestIvfPq::",
    "TestIvfRecall::",
    "TestIvfProbeSemDedup::test_multi_probe_reroutes_boundary_points",
    "TestBm25::test_matches_python_model",
    "TestCompactionCrashSafety::test_streaming_appends_during_compaction_not_lost",
    "TestZorderWrite::",
    "TestRowwiseMinhash::test_equals_groupby_form_and_no_exchange",
    "TestBpeTokenCounts::test_counts_shrink_with_merges",
    "TestExactQuantileThreshold::test_matches_rank_rule_with_negatives_and_ties",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.fspath.basename in _SLOW_FILES or any(
            pat in item.nodeid for pat in _SLOW_TESTS
        ):
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    from filebeat_to_clickhouse_spark.session import get_spark

    s = get_spark("fbck-tests", cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")))
    yield s
    s.stop()
