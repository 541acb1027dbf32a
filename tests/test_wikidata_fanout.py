"""Offline DAG steps 2-3 + 8-10 (≙ preprocess_all.py:161-175, 242-252):
the one-pass 16-sink Wikidata fan-out, the redirect build, and the
class-selection → class-matrix → class-labels chain, composed as
fingerprint-chained checkpointed stages with kill-and-resume."""

from __future__ import annotations

import json
import os

import pytest

from refined_ray.pipelines.offline_build import offline_build_wikidata
from refined_ray.sources.jsonl import write_wikidata_dump
from refined_ray.sources.sqldump import (page_tuple, redirect_tuple,
                                         write_sql_dump)
from refined_ray.stages.wikidata_fanout import (FANOUT_SINKS, read_sink,
                                                wikidata_fanout)


def _claim(q):
    return {"mainsnak": {"datatype": "wikibase-item", "snaktype": "value",
                         "datavalue": {"value": {"id": q}}}}


def _mini_dump(path):
    """Hand-checkable entity set.  DAG: Q10 -P279-> Q11 (no parents).

    Q1  P31=[Q10]            -> matrix classes: anc(Q10) = {Q11}
    Q2  P31=[Q10, Q11]       -> {Q11} (direct Q11 implied by Q10)
    Q10 P279=[Q11]           -> subclass key: direct gets Q16889133;
                                anc({Q11, Q16889133}) = {} -> matrix []
    Q3  P106=[Q10] (bare)    -> {Q11}
    Q4  P17=[Q10] (bracket)  -> <country,Q10> has no ancestors and
                                remove_self drops it: matrix [] (the
                                reference quirk, kept faithful)
    Q6  P31=[Q5]             -> human_qcodes member; Q5 has no parents
    P99 property             -> pcodes sink only
    """
    ents = [
        {"id": "Q1", "labels": {"en": {"value": "one"}}, "descriptions": {},
         "aliases": {}, "claims": {"P31": [_claim("Q10")]},
         "sitelinks": {"enwiki": {"title": "One"}}},
        {"id": "Q2", "labels": {"en": {"value": "two"}}, "descriptions": {},
         "aliases": {"en": [{"value": "deux"}, {"value": "zwei"}]},
         "claims": {"P31": [_claim("Q10"), _claim("Q11")]}},
        {"id": "Q10", "labels": {"en": {"value": "genus"}},
         "descriptions": {"en": {"value": "a class"}}, "aliases": {},
         "claims": {"P279": [_claim("Q11")]}},
        {"id": "Q3", "labels": {"en": {"value": "three"}},
         "descriptions": {}, "aliases": {},
         "claims": {"P106": [_claim("Q10")]}},
        {"id": "Q4", "labels": {"en": {"value": "four"}},
         "descriptions": {}, "aliases": {},
         "claims": {"P17": [_claim("Q10")],
                    # novalue decoy: counts toward statements, no value
                    "P31": [{"mainsnak": {}}]}},
        {"id": "Q6", "labels": {"en": {"value": "six"}}, "descriptions": {},
         "aliases": {}, "claims": {"P31": [_claim("Q5")]}},
        {"id": "P99", "labels": {"en": {"value": "prop"}},
         "descriptions": {}, "aliases": {}, "claims": {}},
    ]
    write_wikidata_dump(ents, path)


def _mini_sql(d):
    # ns-1 decoys pad the INSERT lines past the reference's 500-byte
    # short-line gate without adding resolvable redirects
    pages = [page_tuple(1, 0, "One")] + \
        [page_tuple(100 + i, 1, f"TalkDecoy{i}") for i in range(30)]
    reds = [redirect_tuple(1, 0, "One_redirect"),
            redirect_tuple(777, 0, "Dangling")] + \
        [redirect_tuple(100 + i, 1, f"BadNs{i}") for i in range(30)]
    write_sql_dump(os.path.join(d, "page.sql.gz"), "page", pages)
    write_sql_dump(os.path.join(d, "redirect.sql.gz"), "redirect", reds)


def test_fanout_sinks_and_gates(ray_session, tmp_path):
    dump = str(tmp_path / "dump.json.bz2")
    _mini_dump(dump)
    counts = wikidata_fanout(dump, str(tmp_path / "fan"))
    assert counts["qcode_to_label"] == 6          # every Q entity
    assert counts["pcodes"] == 1                  # the P-item
    assert counts["triples"] == 6
    assert counts["instance_of_p31"] == 3         # Q1, Q2, Q6 (Q4 novalue-only)
    assert counts["subclass_p279"] == 1
    assert counts["country_p17"] == 1
    assert counts["occupation_p106"] == 1
    assert counts["human_qcodes"] == 1            # Q6 via Q5
    assert counts["disambiguation_qcodes"] == 0
    assert counts["aliases"] == 1 and counts["desc"] == 1
    assert counts["enwiki"] == 1 and counts["sitelinks_cnt"] == 1
    # novalue claim counts toward statements but yields no relation row
    st = {r["qcode"]: r["values"]
          for r in read_sink(str(tmp_path / "fan"), "statements_cnt").take_all()}
    assert st["Q4"] == 2  # the P17 claim + the novalue P31 claim
    al = {r["qcode"]: list(r["values"])
          for r in read_sink(str(tmp_path / "fan"), "aliases").take_all()}
    assert al["Q2"] == ["deux", "zwei"]


@pytest.fixture()
def dag_inputs(tmp_path):
    dump = str(tmp_path / "dump.json.bz2")
    _mini_dump(dump)
    _mini_sql(str(tmp_path))
    return (dump, str(tmp_path / "page.sql.gz"),
            str(tmp_path / "redirect.sql.gz"), str(tmp_path / "cp"))


def _matrix_dict(arts):
    return {r["qcode"]: [int(x) for x in r["class_ids"] if x]
            for r in arts["class_matrix"].take_all()}


def test_offline_wikidata_dag_semantics(ray_session, dag_inputs):
    dump, page_sql, red_sql, root = dag_inputs
    arts = offline_build_wikidata(dump, page_sql, red_sql, root, n_classes=5)

    # step 3: ns-0 resolvable redirect only (talk page + dangling dropped)
    reds = arts["redirects"].take_all()
    assert [(r["wiki_title"], r["dest_title"]) for r in reds] == \
        [("One", "One_redirect")]

    # step 8: closure counts with remove_self=False over instance_of —
    # Q1:{Q10,Q11}, Q2:{Q10,Q11}, Q6:{Q5} -> Q10:2, Q11:2, Q5:1;
    # top by (count desc, class asc): Q10=1, Q11=2, Q5=3
    chosen = {r["class"]: (r["n"], r["class_idx"])
              for r in arts["class_selection"].take_all()}
    assert chosen == {"Q10": (2, 1), "Q11": (2, 2), "Q5": (1, 3)}

    # step 9: strict-implied ∩ chosen per the docstring walk-through
    mat = _matrix_dict(arts)
    q11_idx = chosen["Q11"][1]
    assert mat["Q1"] == [q11_idx]
    assert mat["Q2"] == [q11_idx]
    assert mat["Q3"] == [q11_idx]
    assert mat["Q4"] == []          # bracket-class quirk
    assert mat["Q10"] == []         # direct {Q16889133} has no ancestors
    assert mat["Q6"] == []          # Q5 direct, no ancestors
    idx = {r["qcode"]: r["entity_idx"]
           for r in arts["class_matrix"].take_all()}
    assert sorted(idx.values()) == list(range(6))

    # step 10: labels resolve, plain qcode falls back to itself
    labels = {r["class"]: r["class_label"]
              for r in arts["class_labels"].take_all()}
    assert labels["Q10"] == "genus"
    assert labels["Q11"] == "Q11"  # no label in dump
    assert labels["Q5"] == "Q5"


def test_offline_wikidata_dag_resume(ray_session, dag_inputs):
    dump, page_sql, red_sql, root = dag_inputs
    first = offline_build_wikidata(dump, page_sql, red_sql, root, n_classes=5)
    mat1 = _matrix_dict(first)
    stages = ["stage=wd_fanout", "stage=redirects", "stage=class_selection",
              "stage=class_matrix", "stage=class_labels"]
    assert sorted(os.listdir(os.path.join(root, "out"))) == sorted(stages)
    man1 = {s: json.load(open(os.path.join(root, "manifest", f"{s}.json")))
            for s in stages}
    assert man1["stage=wd_fanout"]["rows"] > 0  # recursive file walk found sinks

    # full rerun: nothing rebuilds
    offline_build_wikidata(dump, page_sql, red_sql, root, n_classes=5)
    man2 = {s: json.load(open(os.path.join(root, "manifest", f"{s}.json")))
            for s in stages}
    assert man1 == man2

    # kill-after-stage-N: later stages' artifacts gone, earlier intact
    for s in ("stage=class_matrix", "stage=class_labels"):
        os.remove(os.path.join(root, "manifest", f"{s}.json"))
    third = offline_build_wikidata(dump, page_sql, red_sql, root, n_classes=5)
    man3 = {s: json.load(open(os.path.join(root, "manifest", f"{s}.json")))
            for s in stages}
    for s in ("stage=wd_fanout", "stage=redirects", "stage=class_selection"):
        assert man3[s] == man1[s]          # upstream untouched
    assert man3["stage=class_matrix"]["completed_at"] != \
        man1["stage=class_matrix"]["completed_at"]
    assert _matrix_dict(third) == mat1     # rebuilt output identical

    # upstream param change invalidates the dependent chain
    fourth = offline_build_wikidata(dump, page_sql, red_sql, root, n_classes=2)
    man4 = json.load(open(os.path.join(root, "manifest",
                                       "stage=class_selection.json")))
    assert man4["fingerprint"] != man1["stage=class_selection"]["fingerprint"]
    assert len(fourth["class_selection"].take_all()) == 2
    # but the fan-out (independent of n_classes) is untouched
    man4f = json.load(open(os.path.join(root, "manifest",
                                        "stage=wd_fanout.json")))
    assert man4f == man1["stage=wd_fanout"]


def test_fanout_sink_names_match_reference_files():
    # the 16 reference output files (process_wikidata_dump.py:95-111)
    assert len(FANOUT_SINKS) == 16
    assert set(FANOUT_SINKS) == {
        "sitelinks_cnt", "statements_cnt", "enwiki", "desc", "aliases",
        "qcode_to_label", "instance_of_p31", "country_p17", "sport_p641",
        "occupation_p106", "subclass_p279", "pcodes", "human_qcodes",
        "disambiguation_qcodes", "triples", "located_in_p131"}
