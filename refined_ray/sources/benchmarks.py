"""Benchmark-file readers — the reference's evaluation-corpus formats.

Two conformance readers the reference ships that round 1 skipped for
lack of sandbox files (SURVEY §2.1 S5/S6); here they read
deterministic synthetic fixtures staged from the test tables:

- ``read_aida_means``  ≙ ``load_aida_means`` (reference
  loaders.py:197-205): a bz2-compressed TSV of
  ``"surface_form"\\twiki_page`` lines where the surface form is
  wrapped in literal double quotes and the wiki page may contain
  python ``unicode-escape`` sequences (``caf\\xe9`` → ``café``).

- ``read_el_docs``     ≙ the standard-format EL benchmark readers
  (reference dataset_factory.py:22-185: AIDA/MSNBC/…): JSONL docs
  ``{doc_id, text, spans:[{start, length, uris}]}`` exploded into a
  mention table, with the J2 title → redirect → qcode broadcast
  chain (reference wikidata_mapper.py:16-28) and the
  ``filter_not_in_kb`` / disambiguation-page / NIL ``Q0`` semantics
  of dataset_factory.py:62-106.

Benchmark corpora are side-table sized (the reference streams them
per line on one core); the per-span explode loop here is a
conformance path, not a 100-TB hot path — corpus-scale span handling
lives in the vectorized stages (stages/spans.py, queries M10-M12).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

WIKI_URI_PREFIX = "http://en.wikipedia.org/wiki/"


def _unescape_unicode(arr: pa.Array) -> pa.Array:
    """python ``unicode-escape`` decode, vectorized around the common
    case: values without a backslash pass through untouched (zero
    copies); only escaped values (rare in real AIDA-means data) take
    the per-value python decode."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    has_esc = pc.match_substring(arr, "\\")
    if not pc.any(has_esc).as_py():
        return arr
    vals = arr.to_pylist()
    out = [v.encode("utf-8").decode("unicode-escape")
           if v is not None and "\\" in v else v
           for v in vals]
    return pa.array(out, type=pa.string())


def read_aida_means(path: str):
    """bz2 TSV ``"surface"\\twiki_page`` → Dataset(surface_form, wiki_page).

    Matches the reference's parse exactly (loaders.py:197-205): split
    on the first tab, strip the first+last character of the surface
    form (its literal quotes), unicode-unescape the wiki page.  A
    compressed file reads as one task (bz2 is not splittable) — fine
    for a ≤20M-line side table; convert once to parquet for corpus use.
    """
    import os

    import ray.data as rd

    from .. import configure_data_context

    configure_data_context()
    kwargs = {}
    if os.path.splitext(path)[1] == ".bz2":
        kwargs["arrow_open_stream_args"] = {"compression": "bz2"}
        kwargs["file_extensions"] = None
    lines = rd.read_text(path, **kwargs)

    def parse(b: pa.Table) -> pa.Table:
        txt = b["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        parts = pc.split_pattern(txt, "\t", max_splits=1)
        surface = pc.list_element(parts, 0)
        wiki = pc.list_element(parts, 1)
        # blind [1:-1] like the reference: first char, then last char
        surface = pc.replace_substring_regex(
            surface, pattern="^.", replacement="", max_replacements=1)
        surface = pc.replace_substring_regex(
            surface, pattern=".$", replacement="", max_replacements=1)
        return pa.table({"surface_form": surface,
                         "wiki_page": _unescape_unicode(wiki)})

    return lines.map_batches(parse, batch_format="pyarrow")


def read_el_docs(
    path: str,
    *,
    title_to_qcode: dict[str, str] | None = None,
    redirects: dict[str, str] | None = None,
    disambiguation_qcodes=(),
    filter_not_in_kb: bool = True,
    uri_prefix: str = WIKI_URI_PREFIX,
):
    """Standard-format EL benchmark JSONL → exploded gold-mention table.

    One output row per resolvable gold span:
    ``(doc_id, span_start, span_ln, surface, gold_title, gold_qcode)``.

    Reference semantics (dataset_factory.py:56-106):
    - only ``uris`` under ``uri_prefix`` count; first match wins;
    - spans with no wiki uri are dropped;
    - title resolves through the redirect chain then ``title_to_qcode``
      (J2, wikidata_mapper.py:16-28);
    - with ``filter_not_in_kb`` (default), spans whose qcode is
      unknown or a disambiguation page are dropped; without it,
      unknown qcodes become the NIL sentinel ``"Q0"``.

    The lookup dicts are shipped once via ``ray.put`` and shared by
    every read task (broadcast side tables, not per-batch pickles).
    """
    import ray

    from .jsonl import read_jsonl

    ds = read_jsonl(path)
    side_ref = ray.put((dict(title_to_qcode or {}), dict(redirects or {}),
                        frozenset(disambiguation_qcodes)))

    def explode(b: pa.Table, _ref=side_ref) -> pa.Table:
        t2q, red, dis = ray.get(_ref)
        out = {"doc_id": [], "span_start": [], "span_ln": [],
               "surface": [], "gold_title": [], "gold_qcode": []}
        for row in b.to_pylist():
            text = row["text"]
            for sp in row.get("spans") or ():
                titles = [u[len(uri_prefix):] for u in sp.get("uris") or ()
                          if u.startswith(uri_prefix)]
                if not titles:
                    continue
                title = titles[0]
                qcode = t2q.get(red.get(title, title))
                if filter_not_in_kb and (qcode is None or qcode in dis):
                    continue
                if qcode is None:
                    qcode = "Q0"
                start, ln = int(sp["start"]), int(sp["length"])
                out["doc_id"].append(int(row["doc_id"]))
                out["span_start"].append(start)
                out["span_ln"].append(ln)
                out["surface"].append(text[start:start + ln])
                out["gold_title"].append(title)
                out["gold_qcode"].append(qcode)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
            "span_start": pa.array(out["span_start"], type=pa.int64()),
            "span_ln": pa.array(out["span_ln"], type=pa.int64()),
            "surface": pa.array(out["surface"], type=pa.string()),
            "gold_title": pa.array(out["gold_title"], type=pa.string()),
            "gold_qcode": pa.array(out["gold_qcode"], type=pa.string()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def read_el_docs_standard(
    path: str,
    *,
    title_to_qcode: dict[str, str] | None = None,
    redirects: dict[str, str] | None = None,
    disambiguation_qcodes=(),
    filter_not_in_kb: bool = True,
    include_nil: bool = False,
):
    """Standard-format (MSNBC / AQUAINT / ACE2004 / CWEB / WIKI)
    benchmark JSONL → exploded gold-mention table — the second
    per-dataset reader variant (≙ dataset_factory.py:117-185, used by
    get_msnbc_docs/get_aquaint_docs/get_ace2004_docs/get_cweb_docs/
    get_wiki_docs).

    Differs from the AIDA uri format (``read_el_docs``): mentions live
    under ``mentions`` with a ``wiki_name`` field; ``None``/"NIL"
    wiki_names are NIL mentions (no gold row); spaces in the name
    become underscores BEFORE the redirect→qcode resolution; the
    emitted gold_title is the underscored name as staged (redirects
    affect only the qcode, :147-166).  Same output schema as
    ``read_el_docs``.

    ``include_nil`` keeps the NIL mentions as rows with NULL
    gold_title/gold_qcode — the evaluation harness needs them for the
    ``md_spans`` set and the NIL prediction filter (the reference notes
    at evaluation.py:84-92 that 'the data reader must not filter them
    out for this argument to work')."""
    import ray

    from .jsonl import read_jsonl

    ds = read_jsonl(path)
    side_ref = ray.put((dict(title_to_qcode or {}), dict(redirects or {}),
                        frozenset(disambiguation_qcodes)))

    def explode(b: pa.Table, _ref=side_ref) -> pa.Table:
        t2q, red, dis = ray.get(_ref)
        out = {"doc_id": [], "span_start": [], "span_ln": [],
               "surface": [], "gold_title": [], "gold_qcode": []}

        def emit(row, sp, title, qcode):
            start, ln = int(sp["start"]), int(sp["length"])
            out["doc_id"].append(int(row["doc_id"]))
            out["span_start"].append(start)
            out["span_ln"].append(ln)
            out["surface"].append(row["text"][start:start + ln])
            out["gold_title"].append(title)
            out["gold_qcode"].append(qcode)

        for row in b.to_pylist():
            for sp in row.get("mentions") or ():
                title = sp.get("wiki_name")
                if title is None or title == "NIL":
                    if include_nil:
                        emit(row, sp, None, None)
                    continue
                title = title.replace(" ", "_")
                qcode = t2q.get(red.get(title, title))
                if filter_not_in_kb and (qcode is None or qcode in dis):
                    continue
                if qcode is None:
                    qcode = "Q0"
                emit(row, sp, title, qcode)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
            "span_start": pa.array(out["span_start"], type=pa.int64()),
            "span_ln": pa.array(out["span_ln"], type=pa.int64()),
            "surface": pa.array(out["surface"], type=pa.string()),
            "gold_title": pa.array(out["gold_title"], type=pa.string()),
            "gold_qcode": pa.array(out["gold_qcode"], type=pa.string()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def read_webqsp_docs(path: str):
    """WebQSP EL benchmark JSONL → gold-mention table — the third
    per-dataset reader variant (≙ dataset_factory.py:262-310,
    get_webqsp_docs): ``mentions`` is a list of [start, end) character
    pairs zipped positionally with ``wikidata_id`` qcodes (no title
    mapping at all), and spans are re-sorted by start offset before
    emission (:279-281).  Output: (doc_id, span_start, span_ln,
    surface, gold_qcode)."""
    from .jsonl import read_jsonl

    ds = read_jsonl(path)

    def explode(b: pa.Table) -> pa.Table:
        out = {"doc_id": [], "span_start": [], "span_ln": [],
               "surface": [], "gold_qcode": []}
        for row in b.to_pylist():
            text = row["text"]
            spans = [(int(m[0]), int(m[1]), q)
                     for m, q in zip(row.get("mentions") or (),
                                     row.get("wikidata_id") or ())]
            spans.sort(key=lambda s: s[0])
            for start, end, qcode in spans:
                out["doc_id"].append(int(row["doc_id"]))
                out["span_start"].append(start)
                out["span_ln"].append(end - start)
                out["surface"].append(text[start:end])
                out["gold_qcode"].append(qcode)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
            "span_start": pa.array(out["span_start"], type=pa.int64()),
            "span_ln": pa.array(out["span_ln"], type=pa.int64()),
            "surface": pa.array(out["surface"], type=pa.string()),
            "gold_qcode": pa.array(out["gold_qcode"], type=pa.string()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")
