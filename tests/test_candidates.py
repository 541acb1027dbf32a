"""Tests for candidate generation: person coref (D5/T7), candidate
padding (O1), seeded negative sampling (O5) — behavioral contract per
reference candidate_generator.py:28-159."""

from __future__ import annotations

import numpy as np

from refined_ray.stages.candidates import add_candidates_to_doc, get_candidates

PEM = {
    "ada lovelace": [("Q7259", 0.95), ("Q999", 0.03)],
    "london": [("Q84", 0.85), ("Q92561", 0.10)],
}
HUMANS = {"Q7259"}


def test_full_name_then_short_name_shares_candidates():
    cands = add_candidates_to_doc(["Ada Lovelace", "Ada"], PEM, HUMANS, max_candidates=3)
    # "ada" is not in PEM but inherits the human candidate, pem capped at 0.80
    assert cands[1][0] == ("Q7259", 0.80)
    # the non-human low-pem candidate (Q999, 0.03) does NOT propagate
    assert all(q != "Q999" for q, _ in cands[1])


def test_short_name_in_other_doc_does_not_inherit():
    # separate doc → fresh coref dict → "Ada" alone has no candidates
    cands = add_candidates_to_doc(["Ada"], PEM, HUMANS, max_candidates=3)
    assert cands[0] == [("Q0", 0.0)] * 3


def test_backward_coref_resolves_short_name_before_full_name():
    no_back = add_candidates_to_doc(["Ada", "Ada Lovelace"], PEM, HUMANS,
                                    max_candidates=3, backward_coref=False)
    assert no_back[0] == [("Q0", 0.0)] * 3
    back = add_candidates_to_doc(["Ada", "Ada Lovelace"], PEM, HUMANS,
                                 max_candidates=3, backward_coref=True)
    assert back[0][0] == ("Q7259", 0.80)


def test_non_person_multiword_does_not_propagate():
    pem = {"london bridge": [("Q130206", 0.90)]}
    cands = add_candidates_to_doc(["London Bridge", "London"], pem, HUMANS,
                                  max_candidates=2)
    # Q130206 is not human → "london" gets nothing
    assert cands[1] == [("Q0", 0.0)] * 2


def test_direct_candidates_merge_with_coref_dedup_by_qcode():
    pem = dict(PEM)
    pem["ada"] = [("Q7259", 0.40), ("Q1111", 0.35)]
    cands = add_candidates_to_doc(["Ada Lovelace", "Ada"], pem, HUMANS,
                                  max_candidates=3)
    # coref copy (0.80) outranks the direct 0.40 entry; dedup keeps best
    assert cands[1][0] == ("Q7259", 0.80)
    assert ("Q1111", 0.35) in cands[1]
    assert sum(1 for q, _ in cands[1] if q == "Q7259") == 1


def test_padding_to_max_candidates():
    coref = {}
    out = get_candidates("London", PEM, HUMANS, coref, max_candidates=5)
    assert len(out) == 5
    assert out[:2] == [("Q84", 0.85), ("Q92561", 0.10)]
    assert out[2:] == [("Q0", 0.0)] * 3


def test_unknown_surface_is_all_padding():
    out = get_candidates("zzz", PEM, HUMANS, {}, max_candidates=4)
    assert out == [("Q0", 0.0)] * 4


def test_negative_sampling_seeded_and_gold_kept():
    pem = {"x": [(f"Q{i}", (100 - i) / 100) for i in range(20)]}
    coref = {}
    rng = np.random.default_rng(7)
    out = get_candidates("x", pem, set(), coref, sample_k=6,
                         gold_qcode="Q10", rng=rng)
    assert len(out) == 6
    assert out[0] == ("Q10", 0.90)        # gold first (it is in top-30)
    assert all(q != "Q10" for q, _ in out[1:])
    # popular negatives = head of the list
    assert out[1] == ("Q0", 1.00) and out[2] == ("Q1", 0.99) and out[3] == ("Q2", 0.98)
    # deterministic under the same seed
    out2 = get_candidates("x", pem, set(), {}, sample_k=6,
                          gold_qcode="Q10", rng=np.random.default_rng(7))
    assert out == out2


def test_negative_sampling_gold_out_of_top30_dropped():
    pem = {"x": [(f"Q{i}", (100 - i) / 100) for i in range(40)]}
    out = get_candidates("x", pem, set(), {}, sample_k=4, gold_qcode="Q39",
                         rng=np.random.default_rng(1))
    assert all(q != "Q39" for q, _ in out)
    assert len(out) == 4
