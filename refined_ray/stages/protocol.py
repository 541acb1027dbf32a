"""The engine's user-extension surface (SURVEY §2.10): a ``Stage``
protocol + pipeline builder.

≙ the reference's plug-point ABCs — ``CandidateGenerator``
(candidate_generator.py:10-27), ``Preprocessor`` (preprocessor.py:21-111)
and the dataset-factory reader registry (dataset_factory.py:12-) — as a
Ray-Data-native contract: a stage is a NAMED ``map_batches`` transform
(plain batch function, or an actor CLASS for stateful stages) with a
declared column contract and per-stage resource options.

Users extend the engine by composing their own ``Stage`` list and
calling ``build_pipeline`` — swapping a scorer, adding a filter, or
replacing the decoder stub with a real decoder is a one-Stage change;
the streaming executor still sees one fused lazy plan (no
materialization between stages).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import pyarrow as pa


@dataclass(frozen=True)
class Stage:
    """One pipeline step.

    - ``fn``: a batch callable ``pa.Table -> pa.Table`` (stateless) or
      a class with ``__init__``/``__call__`` (stateful — Ray runs it as
      an actor pool; pass ``concurrency`` via ``options``).
    - ``requires``: input columns the transform reads; validated on
      every batch (cheap — schema names only), so a mis-wired pipeline
      fails with the stage's NAME instead of a deep KeyError.
    - ``options``: ``map_batches`` kwargs (``batch_size``,
      ``concurrency``, ``num_cpus``, ``fn_constructor_kwargs``, …).
    """

    name: str
    fn: Callable[[pa.Table], pa.Table] | type
    requires: tuple[str, ...] = ()
    provides: tuple[str, ...] = ()
    options: dict[str, Any] = field(default_factory=dict)

    def apply(self, ds):
        opts = {"batch_format": "pyarrow", **self.options}
        if isinstance(self.fn, type):
            # actor-pool stage: the class validates its own inputs in
            # __call__ (it names its columns via constructor kwargs)
            return ds.map_batches(self.fn, **opts)
        fn, req, name = self.fn, self.requires, self.name

        def checked(b: pa.Table) -> pa.Table:
            if req:
                missing = [c for c in req if c not in b.schema.names]
                if missing:
                    raise KeyError(
                        f"stage '{name}': missing input columns {missing} "
                        f"(batch has {b.schema.names})")
            return fn(b)

        checked.__name__ = name
        return ds.map_batches(checked, **opts)


def build_pipeline(ds, stages):
    """Apply stages in order; returns the (still lazy) Dataset."""
    names = [s.name for s in stages]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate stage names: {names}")
    for s in stages:
        ds = s.apply(ds)
    return ds
