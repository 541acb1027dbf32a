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

N_QUERIES = 139
N_ORACLES = 118

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


_BLOCKER = """
import sys
from importlib.machinery import ModuleSpec
class _Loader:
    def create_module(self, spec):
        raise ImportError("simulated genuine breakage", name=spec.name)
    def exec_module(self, module):
        raise ImportError("simulated genuine breakage")
class Blocker:
    def find_spec(self, name, path=None, target=None):
        if name == "refined_ray.pipelines.{broken}":
            return ModuleSpec(name, _Loader())
        return None
sys.meta_path.insert(0, Blocker())
"""


@pytest.mark.parametrize("broken", ["queries_ext", "queries_webtext",
                                    "queries_readers"])
def test_genuine_import_failure_propagates(broken):
    out = _run(_BLOCKER.format(broken=broken) + """
try:
    import refined_ray.pipelines.queries
    print("BAD: catalog imported despite broken module")
except ImportError:
    print("ok")
""")
    assert out.endswith("ok"), out[-500:]


def test_broken_sibling_fails_worker_first_import_too():
    """The subtle case: a worker imports queries_webtext FIRST (so it
    is legitimately mid-import) while queries_ext is genuinely broken.
    The guard must not mistake the broken sibling for the circular
    re-entry and hand back a silently shrunken catalog."""
    out = _run(_BLOCKER.format(broken="queries_ext") + """
try:
    import refined_ray.pipelines.queries_webtext
    print("BAD: webtext imported despite broken queries_ext")
except ImportError:
    print("ok")
""")
    assert out.endswith("ok"), out[-500:]
