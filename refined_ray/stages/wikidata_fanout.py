"""Wikidata dump → 16 lookup sinks in ONE pass (offline DAG step 2).

≙ the reference's ``build_wikidata_lookups``
(process_wikidata_dump.py:94-211): a single sequential read of the
``latest-all.json.bz2`` dump array fans out into 16 ``.part``-then-
rename JSON sinks, each gated on the entity actually carrying that
field.  Here the dump streams through ``ray.data.read_text`` and every
parse task writes ITS OWN block's gated subsets straight into 16
partitioned Parquet sink directories — still one pass over the raw
bytes (the expensive part), but the sinks fill in parallel and a
retried task REPLACES its files instead of duplicating rows (the
content-hash naming contract of ``stages/exchange.py``).

Sink names mirror the reference's filenames (:95-111); each holds
``(qcode, values)`` rows except the two bare-qcode membership sets:

  qcode_to_label, desc, enwiki           values: string
  aliases                                values: list<string>
  sitelinks_cnt, statements_cnt          values: int64 (> 0 gated)
  instance_of_p31, subclass_p279,
  country_p17, sport_p641,
  occupation_p106, located_in_p131       values: list<string> (non-empty)
  pcodes                                 values: string (P-items' label)
  human_qcodes, disambiguation_qcodes    qcode only (membership)
  triples                                qcode + all six relation lists

Membership gates are the reference's nested ones (:170-177): an
entity only reaches ``human_qcodes`` / ``disambiguation_qcodes``
through a non-empty P31 containing the marker classes (Q5/Q15632617,
Q4167410/Q22808320).  ``statements_cnt`` counts every claim
(malformed/novalue snaks included — they increment the count but
contribute no relation value, matching ``extract_useful_info``).

At 100 TB-dump scale: the dump is pre-split into shards (a directory
path), one read task per shard, no driver state — per-sink counts
travel back as one tiny marker row per (task, sink).
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.wikidata import RELATIONS, project_entity

HUMAN_MARKERS = ("Q5", "Q15632617")
DISAMBIG_MARKERS = ("Q4167410", "Q22808320")

# every sink name ≙ a reference output file (process_wikidata_dump.py:95-111)
FANOUT_SINKS = (
    "sitelinks_cnt", "statements_cnt", "enwiki", "desc", "aliases",
    "qcode_to_label", "instance_of_p31", "country_p17", "sport_p641",
    "occupation_p106", "subclass_p279", "pcodes", "human_qcodes",
    "disambiguation_qcodes", "triples", "located_in_p131",
)

_REL_SINK = {"P31": "instance_of_p31", "P279": "subclass_p279",
             "P17": "country_p17", "P641": "sport_p641",
             "P106": "occupation_p106", "P131": "located_in_p131"}


def _sink_tables(lines: list[str]) -> dict[str, pa.Table]:
    """Parse one block of dump lines → the 16 gated sink tables.
    Line handling ≙ the reference loop (:132-141): wrapper lines
    (len < 3) skipped, trailing comma stripped; P-items feed the
    pcodes sink, Q-items everything else."""
    rows: dict[str, dict[str, list]] = {
        s: {"qcode": [], "values": []} for s in FANOUT_SINKS}
    triples = {"qcode": [], **{pid: [] for pid in RELATIONS}}

    for line in lines:
        if len(line) < 3:
            continue
        ent = json.loads(line.rstrip().rstrip(","))
        eid = ent.get("id") or ""
        if eid.startswith("P"):
            label = ((ent.get("labels") or {}).get("en") or {}).get("value")
            rows["pcodes"]["qcode"].append(eid)
            rows["pcodes"]["values"].append(label)
            continue
        p = project_entity(ent)
        if p is None:
            continue
        q = p["qcode"]
        if p["sitelinks_count"]:
            rows["sitelinks_cnt"]["qcode"].append(q)
            rows["sitelinks_cnt"]["values"].append(p["sitelinks_count"])
        if p["statements_count"]:
            rows["statements_cnt"]["qcode"].append(q)
            rows["statements_cnt"]["values"].append(p["statements_count"])
        if p["enwiki_title"]:
            rows["enwiki"]["qcode"].append(q)
            rows["enwiki"]["values"].append(p["enwiki_title"])
        if p["description"]:
            rows["desc"]["qcode"].append(q)
            rows["desc"]["values"].append(p["description"])
        if p["aliases"]:
            rows["aliases"]["qcode"].append(q)
            rows["aliases"]["values"].append(p["aliases"])
        if p["label"]:
            rows["qcode_to_label"]["qcode"].append(q)
            rows["qcode_to_label"]["values"].append(p["label"])
        for pid in RELATIONS:
            if p[pid]:
                rows[_REL_SINK[pid]]["qcode"].append(q)
                rows[_REL_SINK[pid]]["values"].append(p[pid])
        if p["P31"]:  # the reference nests both sets under the P31 gate
            if any(m in p["P31"] for m in HUMAN_MARKERS):
                rows["human_qcodes"]["qcode"].append(q)
            if any(m in p["P31"] for m in DISAMBIG_MARKERS):
                rows["disambiguation_qcodes"]["qcode"].append(q)
        triples["qcode"].append(q)
        for pid in RELATIONS:
            triples[pid].append(p[pid])

    out: dict[str, pa.Table] = {}
    str_sinks = {"enwiki", "desc", "qcode_to_label", "pcodes"}
    for s in FANOUT_SINKS:
        if s == "triples":
            continue
        qcodes = rows[s]["qcode"]
        cols = {"qcode": pa.array(qcodes, type=pa.string())}
        if s in ("human_qcodes", "disambiguation_qcodes"):
            pass  # membership sets: qcode only
        elif s in ("sitelinks_cnt", "statements_cnt"):
            cols["values"] = pa.array(rows[s]["values"], type=pa.int64())
        elif s in str_sinks:
            cols["values"] = pa.array(rows[s]["values"], type=pa.string())
        else:
            cols["values"] = pa.array(rows[s]["values"],
                                      type=pa.list_(pa.string()))
        out[s] = pa.table(cols)
    tcols = {"qcode": pa.array(triples["qcode"], type=pa.string())}
    for pid in RELATIONS:
        tcols[pid] = pa.array(triples[pid], type=pa.list_(pa.string()))
    out["triples"] = pa.table(tcols)
    return out


def _content_name(tbl: pa.Table) -> str:
    h = hashlib.blake2b(digest_size=12)
    for col in tbl.itercolumns():
        for chunk in (col.chunks if isinstance(col, pa.ChunkedArray)
                      else [col]):
            for buf in chunk.buffers():
                if buf is not None:
                    h.update(buf)
    return h.hexdigest()


def wikidata_fanout(dump_path: str, out_root: str) -> dict[str, int]:
    """One streaming pass over the dump; 16 partitioned Parquet sinks
    under ``out_root/<sink>/``.  Returns per-sink row counts.

    The caller owns atomicity of ``out_root`` as a whole (the DAG
    wraps this in ``StageCheckpointer.run_custom_stage``, which builds
    into a ``.part`` dir and promotes by rename — the reference's
    ``.part`` contract, :87-92 and :209-211, at stage granularity).
    Within the stage, part files are content-hash named so a retried
    task replaces rather than duplicates."""
    import ray.data as rd

    from ..sources.jsonl import _COMPRESSION_BY_EXT

    for s in FANOUT_SINKS:
        os.makedirs(os.path.join(out_root, s), exist_ok=True)

    kwargs = {}
    comp = _COMPRESSION_BY_EXT.get(os.path.splitext(dump_path)[1])
    if comp:
        kwargs["arrow_open_stream_args"] = {"compression": comp}
        kwargs["file_extensions"] = None
    ds = rd.read_text(dump_path, **kwargs)

    def fan(b: pa.Table) -> pa.Table:
        tables = _sink_tables(b["text"].to_pylist())
        sinks, counts = [], []
        for s, tbl in tables.items():
            if tbl.num_rows == 0:
                continue
            path = os.path.join(out_root, s,
                                f"part-{_content_name(tbl)}.parquet")
            tmp = path + ".tmp"
            pq.write_table(tbl, tmp)
            os.replace(tmp, path)  # retry-idempotent: same content, same name
            sinks.append(s)
            counts.append(tbl.num_rows)
        return pa.table({"sink": pa.array(sinks, type=pa.string()),
                         "n": pa.array(counts, type=pa.int64())})

    marker = ds.map_batches(fan, batch_format="pyarrow")
    totals = {s: 0 for s in FANOUT_SINKS}
    for row in marker.take_all():  # one row per (task, non-empty sink)
        totals[row["sink"]] += row["n"]
    return totals


def read_sink(out_root: str, sink: str):
    """Dataset over one fan-out sink (empty-schema Dataset when the
    sink matched no entity — a valid outcome for small dumps)."""
    import ray.data as rd

    d = os.path.join(out_root, sink)
    files = [os.path.join(d, f) for f in sorted(os.listdir(d))
             if f.endswith(".parquet")] if os.path.isdir(d) else []
    if not files:
        return rd.from_arrow(_empty_sink_table(sink))
    return rd.read_parquet(files)


def _empty_sink_table(sink: str) -> pa.Table:
    if sink == "triples":
        fields = [("qcode", pa.string())] + [
            (pid, pa.list_(pa.string())) for pid in RELATIONS]
        return pa.schema(fields).empty_table()
    if sink in ("human_qcodes", "disambiguation_qcodes"):
        return pa.schema([("qcode", pa.string())]).empty_table()
    if sink in ("sitelinks_cnt", "statements_cnt"):
        vt = pa.int64()
    elif sink in ("enwiki", "desc", "qcode_to_label", "pcodes"):
        vt = pa.string()
    else:
        vt = pa.list_(pa.string())
    return pa.schema([("qcode", pa.string()), ("values", vt)]).empty_table()
