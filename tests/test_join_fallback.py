"""Force the flagship scorer's JOIN path (payload over the broadcast
byte budget) and assert it produces the same clusters as the broadcast
path — the fallback was previously only exercised implicitly."""

from __future__ import annotations


def test_join_fallback_equals_broadcast(ray_session, monkeypatch):
    import refined_ray.pipelines.entity_resolution as er

    sf = "/root/testdata/sf0.001"
    base = er.er_cluster_pages(sf).to_pandas().sort_values("url").reset_index(drop=True)

    # budget of 0 bytes → er_edges must take attach_payloads + PairScorer
    monkeypatch.setattr(er, "BROADCAST_MAX_BYTES", 0)
    joined = er.er_cluster_pages(sf).to_pandas().sort_values("url").reset_index(drop=True)

    assert len(base) == len(joined)
    assert (base.url.values == joined.url.values).all()
    assert (base.cluster_id.values == joined.cluster_id.values).all()


def test_person_coref_broadcast_join_parity(ray_session, monkeypatch):
    """q_person_coref's over-budget hash-join attachment path must emit
    exactly the broadcast path's rows (round-2 verdict item #2: the
    else-branch was NotImplementedError)."""
    import refined_ray.pipelines.queries_ext as qx

    sf = "/root/testdata/sf0.001"
    bcast = sorted(((r["doc_id"], r["mention_ord"], r["surface"],
                     r["qcode"], round(r["prob"], 12))
                    for r in qx.q_person_coref(sf).take_all()))
    monkeypatch.setattr(qx, "PERSON_COREF_BROADCAST_MAX_ROWS", 0)
    joined = sorted(((r["doc_id"], r["mention_ord"], r["surface"],
                      r["qcode"], round(r["prob"], 12))
                     for r in qx.q_person_coref(sf).take_all()))
    assert len(bcast) > 0
    assert bcast == joined
