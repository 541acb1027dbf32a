"""Tests for the benchmark-file readers (S5/S6) and the collation
stage (M9/O4) — the semantics the SQL oracles can't express."""

from __future__ import annotations

import bz2
import json
import os

import numpy as np
import pyarrow as pa
import pytest


# ---------------------------------------------------------------------
# S5: read_aida_means
# ---------------------------------------------------------------------


def test_aida_means_unescape_and_quote_strip(ray_session, tmp_path):
    from refined_ray.sources.benchmarks import read_aida_means

    path = str(tmp_path / "means.tsv.bz2")
    lines = [
        '"Zürich FC"\tZ\\xfcrich_FC',        # \xXX escape
        '"naive"\tna\\u00efve',              # \uXXXX escape
        '"plain name"\tPlain_name',          # no escape: identity
        '"tab less"\tA_B',
    ]
    with bz2.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")

    rows = {r["surface_form"]: r["wiki_page"]
            for r in read_aida_means(path).take_all()}
    assert rows == {
        "Zürich FC": "Zürich_FC",
        "naive": "naïve",
        "plain name": "Plain_name",
        "tab less": "A_B",
    }


# ---------------------------------------------------------------------
# S6: read_el_docs
# ---------------------------------------------------------------------


def _write_jsonl(path, docs):
    with open(path, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")


WIKI = "http://en.wikipedia.org/wiki/"


def test_el_docs_redirect_disambiguation_and_nil(ray_session, tmp_path):
    from refined_ray.sources.benchmarks import read_el_docs

    path = str(tmp_path / "docs.jsonl")
    _write_jsonl(path, [
        {"doc_id": 1, "text": "Paris is big",
         "spans": [{"start": 0, "length": 5, "uris": [WIKI + "Paris_(city)"]}]},
        {"doc_id": 2, "text": "Java rocks",
         "spans": [{"start": 0, "length": 4, "uris": [WIKI + "Java"]}]},
        {"doc_id": 3, "text": "Unknown thing",
         "spans": [{"start": 0, "length": 7, "uris": [WIKI + "Missing"]}]},
        {"doc_id": 4, "text": "no wiki uri",
         "spans": [{"start": 0, "length": 2, "uris": ["http://other.org/x"]}]},
        {"doc_id": 5, "text": "spanless", "spans": []},
    ])
    t2q = {"Paris": "Q90", "Java": "Q251", "Java_(disambiguation)": "Q1027"}
    redirects = {"Paris_(city)": "Paris", "Java": "Java_(disambiguation)"}

    # default: filter_not_in_kb drops unknown + disambiguation targets
    out = read_el_docs(
        path, title_to_qcode=t2q, redirects=redirects,
        disambiguation_qcodes={"Q1027"}).take_all()
    by_doc = {r["doc_id"]: r for r in out}
    assert set(by_doc) == {1}  # doc2 → disambiguation, doc3 unknown, doc4 no wiki uri
    assert by_doc[1]["gold_qcode"] == "Q90"
    assert by_doc[1]["gold_title"] == "Paris_(city)"  # title pre-redirect, as the reference keeps it
    assert by_doc[1]["surface"] == "Paris"
    assert by_doc[1]["span_start"] == 0 and by_doc[1]["span_ln"] == 5

    # filter off: unknown qcode becomes the NIL sentinel Q0
    out2 = read_el_docs(path, title_to_qcode=t2q, redirects=redirects,
                        filter_not_in_kb=False).take_all()
    by_doc2 = {r["doc_id"]: r for r in out2}
    assert by_doc2[3]["gold_qcode"] == "Q0"
    assert 4 not in by_doc2  # no wiki uri is dropped in both modes


def test_el_docs_surface_is_original_case_slice(ray_session, tmp_path):
    from refined_ray.sources.benchmarks import read_el_docs

    path = str(tmp_path / "docs2.jsonl")
    _write_jsonl(path, [
        {"doc_id": 7, "text": "The EU summit",
         "spans": [{"start": 4, "length": 2, "uris": [WIKI + "European_Union"]}]},
    ])
    (row,) = read_el_docs(path, title_to_qcode={"European_Union": "Q458"}).take_all()
    assert row["surface"] == "EU"


# ---------------------------------------------------------------------
# M9/O4: collate_windows
# ---------------------------------------------------------------------


def _collate(texts, **kw):
    from refined_ray.stages.collate import collate_windows_batch

    b = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    return collate_windows_batch(b, **kw)


def test_collate_fixed_pad_values_and_mask_arithmetic():
    from refined_ray.functions.tokenize import tokenize_hash_arrow
    from refined_ray.stages.collate import PAD_VALUE

    texts = ["alpha beta gamma", "one two three four five six seven", "x"]
    out = _collate(texts, max_seq=4, max_batch_size=2)
    assert out.schema.field("token_ids").type == pa.list_(pa.int64(), 4)

    tok_h, starts, _ = tokenize_hash_arrow(pa.array(texts))
    tok_h = tok_h.view(np.int64)
    rows = out.to_pylist()
    # every (doc, window) present, ids match the hash kernel, pads zero
    for r in rows:
        d, w, n = r["doc_id"], r["window_idx"], r["n_tokens"]
        assert r["n_pad"] == 4 - n
        src = tok_h[starts[d] + w * 4: starts[d] + w * 4 + n]
        assert r["token_ids"][:n] == list(src)
        assert all(v == PAD_VALUE for v in r["token_ids"][n:])
    # doc 1 has 7 tokens → windows of 4 and 3
    by = {(r["doc_id"], r["window_idx"]): r["n_tokens"] for r in rows}
    assert by == {(0, 0): 3, (1, 0): 4, (1, 1): 3, (2, 0): 1}


def test_collate_length_sort_and_microbatching():
    texts = ["a b c d e f", "g", "h i j", "k l m n o", "p q"]
    out = _collate(texts, max_seq=8, max_batch_size=2)
    rows = out.to_pylist()
    # stable descending by n_tokens, chopped into micro-batches of 2
    lens = [r["n_tokens"] for r in sorted(rows, key=lambda r: rows.index(r))]
    assert lens == sorted(lens, reverse=True)
    mb = [r["microbatch"] for r in rows]
    assert mb == [0, 0, 1, 1, 2]


def test_collate_pad_to_longest_per_microbatch():
    texts = ["a b c d e", "f g h", "i j", "k"]
    out = _collate(texts, max_seq=8, max_batch_size=2, pad_to_longest=True)
    rows = out.to_pylist()
    # mb0 = lens (5,3) → pad to 5; mb1 = lens (2,1) → pad to 2
    for r in rows:
        pad_len = r["n_tokens"] + r["n_pad"]
        assert len(r["token_ids"]) == pad_len
    pads = {(r["microbatch"]): r["n_tokens"] + r["n_pad"] for r in rows}
    assert pads == {0: 5, 1: 2}


def test_collate_empty_and_tokenless_docs():
    out = _collate([])
    assert out.num_rows == 0
    out2 = _collate(["", "???", "word"], max_seq=4)
    rows = out2.to_pylist()
    assert [(r["doc_id"], r["n_tokens"]) for r in rows] == [(2, 1)]
    out3 = _collate(["", "..."])
    assert out3.num_rows == 0


def test_collate_windows_dataset_roundtrip(ray_session):
    import ray.data as rd

    from refined_ray.stages.collate import collate_windows

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 11], type=pa.int64()),
        "text": pa.array(["one two three four five", "six"], type=pa.string()),
    }))
    rows = collate_windows(ds, max_seq=3).take_all()
    got = {(r["doc_id"], r["window_idx"]): r["n_tokens"] for r in rows}
    assert got == {(10, 0): 3, (10, 1): 2, (11, 0): 1}


# ---------------------------------------------------------------------
# M8 e2e: sentence-boundary windows (never split a sentence) —
# ≙ Doc._to_batch_elements_e2e (doc_types.py:275-369)
# ---------------------------------------------------------------------


def _reference_e2e_fold(counts, max_seq):
    """Naive line-by-line transcription of the reference's greedy fold
    (doc_types.py:300-368) over per-sentence token counts — the oracle
    for greedy_sentence_pack."""
    windows, cur = [], 0
    for s in counts:
        if s == 0:
            continue  # sent_to_tokens only holds sentences with tokens
        if cur + s > max_seq and cur > 0:
            windows.append(cur)
            cur = 0
        if s + cur <= max_seq:
            cur += s
        else:
            # len(cur)==0 and s > max_seq: split into max_seq chunks,
            # each flushed as its own window (incl. the remainder)
            for off in range(0, s, max_seq):
                windows.append(min(max_seq, s - off))
            cur = 0
    if cur > 0:
        windows.append(cur)
    return windows


def test_greedy_sentence_pack_matches_reference_fold():
    from refined_ray.stages.collate import greedy_sentence_pack

    rng = np.random.default_rng(7)
    for _ in range(200):
        counts = rng.integers(0, 40, size=rng.integers(0, 12)).tolist()
        for max_seq in (1, 3, 16, 64):
            got = greedy_sentence_pack(np.asarray(counts), max_seq).tolist()
            assert got == _reference_e2e_fold(counts, max_seq), (counts, max_seq)
            # every token lands in exactly one window, in order
            assert sum(got) == sum(counts)


def test_greedy_sentence_pack_branches():
    from refined_ray.stages.collate import greedy_sentence_pack

    # fit, flush, long-sentence split with remainder, trailing flush
    assert greedy_sentence_pack(np.array([3, 3]), 8).tolist() == [6]
    assert greedy_sentence_pack(np.array([5, 5]), 8).tolist() == [5, 5]
    # a long sentence's remainder chunk is flushed, NOT left open:
    # the next sentence starts a fresh window (reference flushes after
    # every split part)
    assert greedy_sentence_pack(np.array([20, 2]), 8).tolist() == [8, 8, 4, 2]
    assert greedy_sentence_pack(np.array([16, 2]), 8).tolist() == [8, 8, 2]
    assert greedy_sentence_pack(np.array([]), 8).tolist() == []
    assert greedy_sentence_pack(np.array([0, 4, 0]), 8).tolist() == [4]


def _sent_windows(texts, **kw):
    from refined_ray.stages.collate import sentence_windows_batch

    b = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    return sentence_windows_batch(b, **kw)


def test_sentence_windows_never_split_sentence():
    # two 3-token sentences + one 2-token sentence, max_seq=4: the
    # fixed-size chunker would emit [4, 4]; the sentence variant keeps
    # sentences whole → [3, 3, 2]
    text = "one two three. four five six. seven eight."
    out = _sent_windows([text], max_seq=4).to_pylist()
    sizes = [r["n_tokens"] for r in sorted(out, key=lambda r: r["window_idx"])]
    assert sizes == [3, 3, 2]


def test_sentence_windows_token_ids_match_fixed_collate_tokens():
    # token ids must be the same hash stream the fixed collate uses,
    # gathered at sentence-aligned offsets
    from refined_ray.functions.tokenize import tokenize_hash_arrow

    text = "alpha beta gamma. delta epsilon. zeta"
    tok_h, _, _ = tokenize_hash_arrow(pa.array([text]))
    tok_h = tok_h.view(np.int64)
    out = _sent_windows([text], max_seq=3).to_pylist()
    out.sort(key=lambda r: r["window_idx"])
    got = [r["token_ids"][:r["n_tokens"]] for r in out]
    # greedy fold packs the 2-token and 1-token sentences together
    assert [len(g) for g in got] == [3, 3]
    assert np.concatenate(got).tolist() == tok_h.tolist()


def test_sentence_windows_abbreviation_not_boundary():
    # "dr." is an abbreviation: no boundary, so the whole text is ONE
    # 4-token sentence and must stay in one window at max_seq=4
    out = _sent_windows(["dr. smith greets patients"], max_seq=4).to_pylist()
    assert [r["n_tokens"] for r in out] == [4]
    # while a real boundary in the same shape splits windows
    out2 = _sent_windows(["word. smith greets patients"], max_seq=3).to_pylist()
    sizes = [r["n_tokens"]
             for r in sorted(out2, key=lambda r: r["window_idx"])]
    assert sizes == [1, 3]


def test_sentence_windows_long_sentence_and_empty_docs():
    long = " ".join(f"tok{i}" for i in range(10))  # one 10-token sentence
    out = _sent_windows(["", long, "..."], max_seq=4).to_pylist()
    assert all(r["doc_id"] == 1 for r in out)
    sizes = [r["n_tokens"] for r in sorted(out, key=lambda r: r["window_idx"])]
    assert sizes == [4, 4, 2]
    assert _sent_windows([], max_seq=4).num_rows == 0
    assert _sent_windows(["", "???"], max_seq=4).num_rows == 0


def test_collate_windows_sentences_dataset(ray_session):
    import ray.data as rd

    from refined_ray.stages.collate import collate_windows_sentences

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 11], type=pa.int64()),
        "text": pa.array(["one two three. four five six.",
                          "seven eight. nine"], type=pa.string()),
    }))
    rows = collate_windows_sentences(ds, max_seq=4).take_all()
    got = {(r["doc_id"], r["window_idx"]): r["n_tokens"] for r in rows}
    assert got == {(10, 0): 3, (10, 1): 3, (11, 0): 3}


def test_sentence_windows_lowercase_length_shift_boundary():
    # 'İ'.lower() is TWO chars ('i' + combining dot): token offsets
    # (lowered space) shift right of the original-space sentence
    # boundaries.  In "İİx y. zz ww." the token 'y' starts at lowered
    # offset 6 == the ORIGINAL-space end of sentence 1, so without
    # translating boundaries into lowered space it is misassigned to
    # sentence 2 (packing [3,3]); correctly aligned it stays in
    # sentence 1 (packing [4,2] at max_seq=4).
    out = _sent_windows(["İİx y. zz ww."], max_seq=4).to_pylist()
    sizes = [r["n_tokens"] for r in sorted(out, key=lambda r: r["window_idx"])]
    assert sizes == [4, 2]


def test_sentence_windows_single_step_advance_past_empty_sentences():
    # Round-3 ADVICE: the reference advances the sentence cursor AT
    # MOST ONE step per token (doc_types.py:287-294), so tokens after
    # punctuation-only sentences land on prev+1, not their raw
    # searchsorted slot.  Per-sentence counts for this text are
    # [2, 1, 1, 2] (reference), NOT [2, 0, 0, 4] (plain searchsorted);
    # at max_seq=3 the greedy pack is therefore [3, 3], not [2, 3, 1].
    text = "Hello world. ??? !!! Next sentence here okay."
    out = _sent_windows([text], max_seq=3).to_pylist()
    sizes = [r["n_tokens"] for r in sorted(out, key=lambda r: r["window_idx"])]
    assert sizes == [3, 3]
