"""Class-DAG ancestor closure, type-implication pruning and the
entity class check (M14/M15 ≙ reference ClassHandler,
doc_preprocessing/class_handler.py:22-122 and Refined._prune_span_ner,
inference/processor.py:413-452).

The subclass DAG is SMALL side state (the reference selects ~1.4k
classes): it broadcasts once per job (``ray.put``) and each actor holds
a memoized ancestor closure — the reference's two bounded lru-style
caches (class_handler.py:18-20) map to the per-actor ``_anc`` memo.

Semantics (verified by tests/test_classdag.py + the recursive-CTE
DuckDB oracles in pipelines/queries_ext.py):

- ancestors(c): STRICT transitive ancestors over parent edges.
- implied(direct, remove_self=True): ∪ strict-ancestors of each class;
  with remove_self=False the direct classes are included too.
- prune(classes): drop ids containing "<" (relation-qualified ids) and
  every class implied by another — leaves the minimal antichain.
- class_check(predicted, entity_classes): passes iff the predicted
  types intersect the entity's implied closure, or the entity has no
  classes at all (reference class_handler.py:104-122).
"""

from __future__ import annotations


class ClassDAG:
    def __init__(self, parents: dict[str, list[str]]):
        self.parents = parents
        self._anc: dict[str, frozenset[str]] = {}

    def ancestors(self, cls: str) -> frozenset[str]:
        """Strict transitive ancestors of one class (memoized, iterative
        DFS — cycle-safe: a back edge contributes no new nodes)."""
        memo = self._anc
        if cls in memo:
            return memo[cls]
        out: set[str] = set()
        stack = [cls]
        seen = {cls}
        while stack:
            node = stack.pop()
            for p in self.parents.get(node, ()):
                if p not in seen:
                    seen.add(p)
                    out.add(p)
                    if p in memo:  # splice a memoized subtree
                        out.update(memo[p])
                    else:
                        stack.append(p)
        result = frozenset(out)
        memo[cls] = result
        return result

    def implied(self, direct: frozenset[str], remove_self: bool = True) -> frozenset[str]:
        out: set[str] = set() if remove_self else set(direct)
        for c in direct:
            out.update(self.ancestors(c))
        return frozenset(out)

    def prune(self, classes: frozenset[str]) -> frozenset[str]:
        kept = frozenset(c for c in classes if "<" not in c)
        return kept - self.implied(kept, remove_self=True)

    def class_check(self, predicted_classes: set[str], entity_classes: set[str]) -> bool:
        """True = check passed (≙ failed_class_check=False)."""
        entity_classes = {c for c in entity_classes if "<" not in c}
        closure = self.implied(frozenset(entity_classes), remove_self=False)
        return bool(predicted_classes & closure) or not closure


def prune_span_types(
    predicted_types: list[tuple[str, float]],
    dag: ClassDAG,
    coarse_map: dict[str, str] | None = None,
) -> tuple[list[tuple[str, float]], str | None]:
    """≙ _prune_span_ner (processor.py:413-452): drop impliable types
    from one span's predictions, then pick the coarse type as the
    highest-confidence pruned type with a coarse mapping."""
    minimal = dag.prune(frozenset(t for t, _ in predicted_types))
    pruned = [(t, c) for t, c in predicted_types if t in minimal]
    coarse = None
    if coarse_map:
        mapped = sorted(((coarse_map[t], c) for t, c in pruned if t in coarse_map),
                        key=lambda x: -x[1])
        coarse = mapped[0][0] if mapped else None
    return pruned, coarse
