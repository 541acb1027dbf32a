"""AIDA CoNLL mention-detection file reader — the per-dataset EL
benchmark reader variant (round-3 VERDICT Missing #5).

≙ the reference's ``CoNLLNER.read_file_as_docs``
(conll_reader.py:119-161), re-expressed Ray-Data-first: one streaming
parse task per staged file (``read_binary_files``), token rows flowing
out as Arrow under backpressure.  The observable contract is kept
exactly:

- a line is a TOKEN line iff ``line.split(' ')`` has exactly 4 parts
  and the line does not contain ``-DOCSTART-`` (:134-135); everything
  else is a boundary line;
- PTB special tags remap to their characters (``-LRB-`` → ``(``,
  ``\\`\\``/``''`` → ``"`` …, :60-69);
- the NER tag is newline-stripped; with ``bio_only`` only its first
  character survives (B/I/O, :141-142); otherwise tags outside the
  CoNLL vocabulary map to ``O`` (or ``<prefix>-MENTION`` with
  ``use_mention_tag``, :143-145);
- a boundary line closes the current sentence; ``-DOCSTART-`` closes
  the current document; with ``sentence_level`` every sentence IS a
  document (:149-159);
- EOF quirks mirrored faithfully: in article mode the LAST document
  is dropped (docs only flush on the next ``-DOCSTART-``); in either
  mode a final sentence not followed by a boundary line is dropped
  (:149-161 — no post-loop flush).  Stage files with trailing
  boundary lines when you need everything.

Like the other benchmark-file readers (sources/benchmarks.py), the
per-token python loop is a CONFORMANCE path over side-table-sized
eval corpora — corpus-scale token handling lives in the vectorized
stages.
"""

from __future__ import annotations

import io
from typing import Iterable, Iterator

CONLL_NER_TAGS = frozenset({
    "O", "B-LOC", "B-MISC", "B-ORG", "B-PER",
    "I-LOC", "I-MISC", "I-ORG", "I-PER",
})

SPECIAL_TAG_TO_TEXT = {
    "-LRB-": "(", "-RRB-": ")", "-LCB-": "{", "-RCB-": "}",
    "-LSB-": "[", "-RSB-": "]", "``": '"', "''": '"',
}


def iter_conll_docs(lines: Iterable[str], *, bio_only: bool = True,
                    sentence_level: bool = False, lower: bool = False,
                    use_mention_tag: bool = False,
                    ner_tags: frozenset = CONLL_NER_TAGS,
                    ) -> Iterator[list[list[tuple[str, str, str, str]]]]:
    """Yield docs (list of sentences; sentence = list of (token, pos,
    dep, ner) tuples) with the reference's exact split/flush rules."""
    current_doc_sents: list[list[tuple[str, str, str, str]]] = []
    current_sent: list[tuple[str, str, str, str]] = []
    for line in lines:
        parts = line.split(" ")
        if len(parts) == 4 and "-DOCSTART-" not in line:
            text, pos, dep, ner = parts
            text = SPECIAL_TAG_TO_TEXT.get(text, text)
            ner = ner.rstrip("\n")
            if bio_only:
                ner = ner[0]
            elif ner not in ner_tags:
                ner = ner.split("-")[0] + "-MENTION" if use_mention_tag else "O"
            if lower:
                text = text.lower()
            current_sent.append((text, pos, dep, ner))
        else:
            if len(current_sent) > 0:
                current_doc_sents.append(current_sent)
                if sentence_level:
                    yield current_doc_sents
                    current_doc_sents = []
                current_sent = []
            if "-DOCSTART-" in line and len(current_doc_sents) > 0:
                yield current_doc_sents
                current_doc_sents = []
    # NO post-loop flush — the reference drops the trailing doc/sentence


def read_conll_docs(path: str, *, bio_only: bool = True,
                    sentence_level: bool = False, lower: bool = False,
                    use_mention_tag: bool = False):
    """``ray.data`` Dataset of exploded token rows from CoNLL file(s):
    ``(source:string, doc_idx:int64, sent_idx:int64, tok_idx:int64,
    token, pos, dep, ner)`` — ``doc_idx`` is file-local document order
    (the factory's per-file doc stream), and ``source`` (the file's
    basename) disambiguates it when a directory of files is read
    (review finding: bare doc_idx collides across files)."""
    import os

    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_binary_files(path, include_paths=True)

    def parse(b: pa.Table) -> pa.Table:
        cols = {k: [] for k in ("source", "doc_idx", "sent_idx", "tok_idx",
                                "token", "pos", "dep", "ner")}
        for data, p in zip(b["bytes"].to_pylist(), b["path"].to_pylist()):
            src = os.path.basename(p)
            f = io.TextIOWrapper(io.BytesIO(data), encoding="utf-8", newline="")
            for d, doc in enumerate(iter_conll_docs(
                    f, bio_only=bio_only, sentence_level=sentence_level,
                    lower=lower, use_mention_tag=use_mention_tag)):
                for s, sent in enumerate(doc):
                    for t, (tok, pos, dep, ner) in enumerate(sent):
                        cols["source"].append(src)
                        cols["doc_idx"].append(d)
                        cols["sent_idx"].append(s)
                        cols["tok_idx"].append(t)
                        cols["token"].append(tok)
                        cols["pos"].append(pos)
                        cols["dep"].append(dep)
                        cols["ner"].append(ner)
        return pa.table({
            "source": pa.array(cols["source"], type=pa.string()),
            "doc_idx": pa.array(cols["doc_idx"], type=pa.int64()),
            "sent_idx": pa.array(cols["sent_idx"], type=pa.int64()),
            "tok_idx": pa.array(cols["tok_idx"], type=pa.int64()),
            "token": pa.array(cols["token"], type=pa.string()),
            "pos": pa.array(cols["pos"], type=pa.string()),
            "dep": pa.array(cols["dep"], type=pa.string()),
            "ner": pa.array(cols["ner"], type=pa.string()),
        })

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=None)
