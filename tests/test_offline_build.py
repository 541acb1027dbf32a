"""Offline corpus-build DAG (≙ preprocess_all.py artifact DAG):
end artifact matches the DuckDB twin; checkpointed run resumes and
yields identical output with clean schemas; index/description
artifacts have the promised shapes."""

from __future__ import annotations

import duckdb
import pytest

from conftest import SF_SMALL
from refined_ray.pipelines.offline_build import (
    SQL_OFFLINE_PEM, offline_build, q_offline_pem)


def _canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def direct_pem(ray_session):
    return _canon(q_offline_pem(SF_SMALL).to_pandas())


def test_offline_pem_matches_duckdb_oracle(direct_pem):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_SMALL}/documents.parquet'")
    theirs = _canon(con.execute(SQL_OFFLINE_PEM).fetchdf())
    assert len(direct_pem) == len(theirs) > 0
    for c in direct_pem.columns:
        assert (direct_pem[c].values == theirs[c].values).all(), c


def test_offline_build_checkpointed_resume(ray_session, tmp_path, direct_pem):
    import json
    import os

    root = str(tmp_path / "cp")
    first = _canon(offline_build(SF_SMALL, checkpoint_root=root).to_pandas())
    # same values AND same schema as the uncheckpointed dataflow (no
    # hive-partition `stage` column resurrected from the dir name)
    assert list(first.columns) == list(direct_pem.columns)
    assert first.equals(direct_pem)

    stages = sorted(os.listdir(os.path.join(root, "out")))
    assert stages == ["stage=descriptions", "stage=entity_index",
                      "stage=links", "stage=pages", "stage=pem"]

    # rerun: every stage manifest keeps its original completion time
    before = {s: json.load(open(os.path.join(root, "manifest", f"{s}.json")))
              for s in stages}
    second = _canon(offline_build(SF_SMALL, checkpoint_root=root).to_pandas())
    after = {s: json.load(open(os.path.join(root, "manifest", f"{s}.json")))
             for s in stages}
    assert second.equals(first)
    assert before == after  # nothing rebuilt

    # a parameter change upstream invalidates and rebuilds
    third = _canon(offline_build(SF_SMALL, checkpoint_root=root, stride=7).to_pandas())
    assert not third.equals(first)  # different link density
    rebuilt = json.load(open(os.path.join(root, "manifest", "stage=pages.json")))
    assert rebuilt["fingerprint"] != before["stage=pages"]["fingerprint"]


def test_offline_artifact_shapes(ray_session, tmp_path):
    from refined_ray import read_parquet_clean
    from refined_ray.functions.embeddings import EMBED_DIM

    root = str(tmp_path / "cp")
    pem = offline_build(SF_SMALL, checkpoint_root=root).to_pandas()

    idx = read_parquet_clean(f"{root}/out/stage=entity_index",
                             partitioning=None).to_pandas()
    # contiguous 0..n-1 over the sorted distinct entities of the PEM
    assert sorted(idx.entity) == sorted(pem.entity.unique())
    assert sorted(idx.entity_idx) == list(range(len(idx)))
    assert idx.sort_values("entity").entity_idx.is_monotonic_increasing

    desc = read_parquet_clean(f"{root}/out/stage=descriptions",
                              partitioning=None).to_pandas()
    assert len(desc) == len(idx)
    assert all(len(v) == EMBED_DIM for v in desc.description_emb)
