"""Golden tests for sentence splitting (M7) and the Wikidata entity
projection (M5)."""

from __future__ import annotations

from refined_ray.functions.sentences import sentence_texts, split_sentences
from refined_ray.functions.wikidata import project_entity


def test_basic_sentences():
    assert sentence_texts("One two. Three four! Five?") == \
        ["One two.", "Three four!", "Five?"]


def test_spans_are_offsets_into_original():
    text = "Hello there. Bye now."
    spans = split_sentences(text)
    assert spans == [(0, 12), (13, 21)]
    assert [text[s:e] for s, e in spans] == ["Hello there.", "Bye now."]


def test_abbreviation_does_not_split():
    assert sentence_texts("Dr. Smith arrived. He sat.") == \
        ["Dr. Smith arrived.", "He sat."]
    assert sentence_texts("See fig. 3 for details. Done.") == \
        ["See fig. 3 for details.", "Done."]


def test_initial_does_not_split():
    assert sentence_texts("J. Smith spoke. All clapped.") == \
        ["J. Smith spoke.", "All clapped."]


def test_decimal_number_does_not_split():
    assert sentence_texts("Pi is 3.14 roughly. Yes.") == \
        ["Pi is 3.14 roughly.", "Yes."]


def test_multi_punct_and_trailing_text():
    assert sentence_texts("What?! Really... yes") == ["What?!", "Really...", "yes"]


def test_no_terminal_punctuation_single_sentence():
    assert sentence_texts("no punctuation at all") == ["no punctuation at all"]


def test_empty_text():
    assert split_sentences("") == []


# ---------------------------- M5 projection ----------------------------

ENTITY = {
    "id": "Q42",
    "labels": {"en": {"language": "en", "value": "Douglas Adams"}},
    "descriptions": {"en": {"language": "en", "value": "English writer"}},
    "aliases": {"en": [{"value": "DNA"}, {"value": "Douglas Noel Adams"}]},
    "sitelinks": {"enwiki": {"site": "enwiki", "title": "Douglas Adams"},
                  "dewiki": {"site": "dewiki", "title": "Douglas Adams"}},
    "claims": {
        "P31": [{"mainsnak": {"datavalue": {"value": {"id": "Q5"}}}}],
        "P106": [{"mainsnak": {"datavalue": {"value": {"id": "Q36180"}}}},
                 {"mainsnak": {"datavalue": {"value": {"id": "Q214917"}}}}],
        "P569": [{"mainsnak": {"datavalue": {"value": "+1952-03-11T00:00:00Z"}}}],
    },
}


def test_project_entity_fields():
    row = project_entity(ENTITY)
    assert row["qcode"] == "Q42"
    assert row["label"] == "Douglas Adams"
    assert row["description"] == "English writer"
    assert row["aliases"] == ["DNA", "Douglas Noel Adams"]
    assert row["sitelinks_count"] == 2
    assert row["enwiki_title"] == "Douglas Adams"
    assert row["statements_count"] == 4
    assert row["P31"] == ["Q5"]
    assert row["P106"] == ["Q36180", "Q214917"]
    assert row["P17"] == []


def test_project_entity_skips_properties_and_malformed():
    assert project_entity({"id": "P31"}) is None
    assert project_entity({}) is None
    # claim without a datavalue (deleted/novalue snak) is skipped
    row = project_entity({"id": "Q1", "claims": {"P31": [{"mainsnak": {}}]}})
    assert row["P31"] == []


# ------------------------ S1 dump-array reader ------------------------


def test_read_wikidata_dump_bz2(ray_session, tmp_path):
    import bz2
    import json

    from refined_ray.functions.wikidata import entity_schema
    from refined_ray.sources.jsonl import read_wikidata_dump

    q1 = {"id": "Q1", "labels": {"en": {"value": "universe"}},
          "sitelinks": {"enwiki": {"title": "Universe"}},
          "claims": {"P31": [{"mainsnak": {"datavalue": {"value": {"id": "Q36906466"}}}}]}}
    prop = {"id": "P31", "labels": {"en": {"value": "instance of"}}}
    dump = tmp_path / "latest-all.json.bz2"
    # faithful dump-array shape: [ wrapper, entity lines with trailing
    # commas, last entity bare, ] wrapper
    body = "[\n" + json.dumps(ENTITY) + ",\n" + json.dumps(prop) + ",\n" \
        + json.dumps(q1) + "\n]\n"
    dump.write_bytes(bz2.compress(body.encode()))

    ds = read_wikidata_dump(str(dump))
    rows = sorted(ds.take_all(), key=lambda r: r["qcode"])
    assert [r["qcode"] for r in rows] == ["Q1", "Q42"]  # P31 dropped
    assert rows[1]["label"] == "Douglas Adams"
    assert rows[1]["P106"] == ["Q36180", "Q214917"]
    assert rows[0]["enwiki_title"] == "Universe"
    assert rows[0]["P31"] == ["Q36906466"]
    assert ds.schema().base_schema.equals(entity_schema())
