"""Session-scoped Ray fixture — ONE ray.init per pytest session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False, ignore_reinit_error=True)
    from refined_ray import configure_data_context

    configure_data_context()
    yield ray
    ray.shutdown()
