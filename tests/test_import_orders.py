"""The query catalog must be complete no matter which pipeline module
a process imports first (Ray workers unpickling a UDF import that
UDF's module before anything else), and a genuinely broken catalog
module must fail imports loudly rather than silently shrinking the
catalog.  Each scenario runs in a fresh subprocess because import
order is process-global state."""

from __future__ import annotations

import subprocess
import sys

import pytest

N_QUERIES = 86
N_ORACLES = 65

_FIRST = ["queries", "queries_ext", "queries_webtext", "queries_readers",
          "entity_resolution", "evaluation", "offline_build", "table_linking"]


def _run(code: str) -> str:
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd="/root/repo", timeout=120)
    return (r.stdout + r.stderr).strip()


@pytest.mark.parametrize("first", _FIRST)
def test_catalog_complete_any_import_order(first):
    out = _run(f"""
import refined_ray.pipelines.{first}
from refined_ray.pipelines.queries import QUERIES, oracles
assert len(QUERIES) == {N_QUERIES}, len(QUERIES)
assert len(oracles()) == {N_ORACLES}, len(oracles())
print("ok")
""")
    assert out.endswith("ok"), out[-500:]


@pytest.mark.parametrize("broken", ["queries_ext", "queries_webtext",
                                    "queries_readers"])
def test_genuine_import_failure_propagates(broken):
    out = _run(f"""
import sys
class Blocker:
    def find_module(self, name, path=None):
        return self if name == "refined_ray.pipelines.{broken}" else None
    def load_module(self, name):
        raise ImportError("simulated genuine breakage")
sys.meta_path.insert(0, Blocker())
try:
    import refined_ray.pipelines.queries
    print("BAD: catalog imported despite broken module")
except ImportError:
    print("ok")
""")
    assert out.endswith("ok"), out[-500:]
