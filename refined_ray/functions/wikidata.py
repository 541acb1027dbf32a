"""Wikidata raw-entity projection (M5 ≙ reference extract_useful_info,
offline_data_generation/process_wikidata_dump.py:10-48): one raw
entity JSON → the flat record the downstream lookups consume.

Projected fields: qcode, English label/description, alias list,
sitelink count, enwiki title, and the object qcodes of the relations
the engine uses (P31 instance-of, P279 subclass-of, P17 country,
P641 sport, P106 occupation, P131 located-in).

Pure function over one parsed JSON dict → usable as
``ds.map_batches`` over a JSONL dump read (sources/jsonl.py) or
``flat_map``; no state, no ordering assumptions.
"""

from __future__ import annotations

RELATIONS = ("P31", "P279", "P17", "P641", "P106", "P131")


def _claim_object_qcodes(entity: dict, pid: str) -> list[str]:
    out = []
    for claim in entity.get("claims", {}).get(pid, []):
        try:
            val = claim["mainsnak"]["datavalue"]["value"]
        except (KeyError, TypeError):
            continue
        if isinstance(val, dict) and "id" in val:
            out.append(val["id"])
    return out


def project_entity(entity: dict) -> dict | None:
    """Raw Wikidata entity dict → flat projection (None for non-items)."""
    qcode = entity.get("id")
    if not qcode or not qcode.startswith("Q"):
        return None
    labels = entity.get("labels", {})
    descs = entity.get("descriptions", {})
    aliases = entity.get("aliases", {})
    sitelinks = entity.get("sitelinks", {})
    row = {
        "qcode": qcode,
        "label": (labels.get("en") or {}).get("value"),
        "description": (descs.get("en") or {}).get("value"),
        "aliases": [a.get("value") for a in aliases.get("en", []) if a.get("value")],
        "sitelinks_count": len(sitelinks),
        "enwiki_title": (sitelinks.get("enwiki") or {}).get("title"),
        "statements_count": sum(len(v) for v in entity.get("claims", {}).values()),
    }
    for pid in RELATIONS:
        row[pid] = _claim_object_qcodes(entity, pid)
    return row


def project_entities_batch(rows: list[dict]) -> list[dict]:
    out = []
    for r in rows:
        p = project_entity(r)
        if p is not None:
            out.append(p)
    return out


def entity_schema():
    """Pinned Arrow schema for projected entities — stable even for
    empty batches (Ray 2.49 warns on schema drift across blocks)."""
    import pyarrow as pa

    fields = [
        ("qcode", pa.string()),
        ("label", pa.string()),
        ("description", pa.string()),
        ("aliases", pa.list_(pa.string())),
        ("sitelinks_count", pa.int64()),
        ("enwiki_title", pa.string()),
        ("statements_count", pa.int64()),
    ] + [(pid, pa.list_(pa.string())) for pid in RELATIONS]
    return pa.schema(fields)


def entities_to_table(rows: list[dict]):
    """Projected entity dicts → Arrow table with the pinned schema."""
    import pyarrow as pa

    schema = entity_schema()
    if not rows:
        return schema.empty_table()
    cols = {f.name: [r[f.name] for r in rows] for f in schema}
    return pa.table({n: pa.array(v, type=schema.field(n).type)
                     for n, v in cols.items()})
