"""Per-stage / per-partition lineage manifests + resume logic.

≙ the reference's resume-by-artifact gating (preprocess_all.py:149-336:
every step skipped when its output file exists; `.part` → atomic
rename at process_wikidata_dump.py:94-211), made partition-granular:

  <root>/out/stage=<name>/part-*.parquet      stage output (Parquet)
  <root>/manifest/stage=<name>.json           lineage record

A manifest records the stage's input fingerprint, row counters, per-file
row counts (the per-partition lineage), schema and wall time.  A rerun
with the same fingerprint skips the stage and re-reads its Parquet; a
changed fingerprint invalidates this stage and every stage after it.
Writes go to a temp dir then atomic-rename, so a killed run never
leaves a half manifest behind.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from datetime import datetime

import pyarrow.parquet as pq


def _read_clean(path):
    from .. import read_parquet_clean

    # partitioning=None: the checkpoint dir itself is named
    # ``stage=<name>`` — hive inference would resurrect it as a column
    return read_parquet_clean(path, partitioning=None)


class StageCheckpointer:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "manifest"), exist_ok=True)
        os.makedirs(os.path.join(root, "out"), exist_ok=True)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.root, "manifest", f"stage={stage}.json")

    def _out_dir(self, stage: str) -> str:
        return os.path.join(self.root, "out", f"stage={stage}")

    def manifest(self, stage: str) -> dict | None:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def is_complete(self, stage: str, fingerprint: str) -> bool:
        m = self.manifest(stage)
        return bool(m and m.get("fingerprint") == fingerprint and os.path.isdir(self._out_dir(stage)))

    def invalidate_from(self, stage: str) -> None:
        for p in (self._manifest_path(stage), self._out_dir(stage)):
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
            elif os.path.exists(p):
                os.remove(p)

    def _promote_and_record(self, stage: str, fingerprint: str,
                            tmp_dir: str, t0: float, counters: dict) -> None:
        """Shared tail of every stage runner: atomic ``.part`` → final
        rename, then write the manifest (recursive partition walk —
        handles both flat Dataset output and nested custom sinks)."""
        out_dir = self._out_dir(stage)
        os.rename(tmp_dir, out_dir)
        wall = time.perf_counter() - t0

        partitions = []
        total_rows = 0
        for dirpath, _dirs, files in sorted(os.walk(out_dir)):
            for fn in sorted(files):
                if fn.endswith(".parquet"):
                    p = os.path.join(dirpath, fn)
                    n = pq.read_metadata(p).num_rows
                    partitions.append(
                        {"file": os.path.relpath(p, out_dir), "rows": n})
                    total_rows += n
        man = {
            "stage": stage,
            "fingerprint": fingerprint,
            "rows": total_rows,
            "partitions": partitions,
            "wall_sec": round(wall, 3),
            "counters": counters,
            # microsecond precision: a rebuild within the same second
            # must still be distinguishable from the run it replaced
            "completed_at": datetime.now().isoformat(timespec="microseconds"),
        }
        tmp = self._manifest_path(stage) + ".part"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
        os.rename(tmp, self._manifest_path(stage))

    def run_stage(self, stage: str, fingerprint: str, build_fn, counters: dict | None = None):
        """Run build_fn() → Dataset and checkpoint it, or re-read the
        prior Parquet when the manifest matches.  Returns a Dataset."""
        out_dir = self._out_dir(stage)
        if self.is_complete(stage, fingerprint):
            return _read_clean(out_dir)

        self.invalidate_from(stage)
        t0 = time.perf_counter()
        ds = build_fn()
        tmp_dir = out_dir + ".part"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        ds.write_parquet(tmp_dir)
        self._promote_and_record(stage, fingerprint, tmp_dir, t0,
                                 counters or {})
        return _read_clean(out_dir)

    def run_custom_stage(self, stage: str, fingerprint: str, build_fn):
        """Like ``run_stage`` for stages that write their OWN file
        layout (e.g. the 16-sink Wikidata fan-out): ``build_fn(tmp_dir)``
        populates a temp dir and returns a counters dict; the
        checkpointer does the atomic promote + manifest.  Returns the
        final output dir path."""
        out_dir = self._out_dir(stage)
        if self.is_complete(stage, fingerprint):
            return out_dir

        self.invalidate_from(stage)
        t0 = time.perf_counter()
        tmp_dir = out_dir + ".part"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)
        counters = build_fn(tmp_dir) or {}
        self._promote_and_record(stage, fingerprint, tmp_dir, t0, counters)
        return out_dir

    def update_counters(self, stage: str, counters: dict) -> None:
        """Merge computed counters into an existing manifest (atomic)."""
        man = self.manifest(stage)
        if man is None:
            return
        man["counters"] = {**man.get("counters", {}), **counters}
        tmp = self._manifest_path(stage) + ".part"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
        os.rename(tmp, self._manifest_path(stage))
