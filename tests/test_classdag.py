"""Tests for the class-DAG operators (M14/M15 ≙ reference
class_handler.py:22-122)."""

from __future__ import annotations

from refined_ray.stages.classdag import ClassDAG, prune_span_types

#        root
#       /    \
#   animal   machine
#     |    \    |
#   mammal  pet robot    (pet has two parents: animal via edge, and owner-thing)
#     |
#   human
DAG = ClassDAG({
    "animal": ["root"],
    "machine": ["root"],
    "mammal": ["animal"],
    "pet": ["animal", "ownable"],
    "robot": ["machine"],
    "human": ["mammal"],
})


def test_ancestors_strict_and_transitive():
    assert DAG.ancestors("human") == {"mammal", "animal", "root"}
    assert DAG.ancestors("pet") == {"animal", "ownable", "root"}
    assert DAG.ancestors("root") == frozenset()


def test_implied_remove_self():
    direct = frozenset({"human", "robot"})
    implied = DAG.implied(direct, remove_self=True)
    assert implied == {"mammal", "animal", "root", "machine"}
    assert DAG.implied(direct, remove_self=False) == implied | direct


def test_direct_class_implied_by_sibling_is_dropped():
    # "animal" is an ancestor of "human" → pruned even though direct
    assert DAG.prune(frozenset({"human", "animal"})) == {"human"}


def test_prune_keeps_minimal_antichain():
    assert DAG.prune(frozenset({"human", "robot", "mammal", "root"})) == \
        {"human", "robot"}


def test_prune_filters_relation_qualified_ids():
    assert DAG.prune(frozenset({"human", "country<P17>"})) == {"human"}


def test_cycle_safe():
    dag = ClassDAG({"a": ["b"], "b": ["c"], "c": ["a"]})
    assert dag.ancestors("a") == {"b", "c"}


def test_class_check_semantics():
    # predicted type in the entity's closure → pass
    assert DAG.class_check({"animal"}, {"human"})
    # predicted type outside the closure → fail
    assert not DAG.class_check({"machine"}, {"human"})
    # entity with no classes at all → pass (reference: len(closure)==0)
    assert DAG.class_check({"anything"}, set())


def test_prune_span_types_with_coarse_map():
    preds = [("human", 0.9), ("mammal", 0.8), ("robot", 0.7)]
    pruned, coarse = prune_span_types(preds, DAG,
                                      coarse_map={"human": "PERSON", "robot": "MACHINE"})
    assert pruned == [("human", 0.9), ("robot", 0.7)]  # mammal implied by human
    assert coarse == "PERSON"  # highest-confidence mapped pruned type


def test_memo_reuse_consistent():
    dag = ClassDAG({"human": ["mammal"], "mammal": ["animal"], "animal": []})
    a1 = dag.ancestors("mammal")
    a2 = dag.ancestors("human")  # splices the memoized "mammal" set
    assert a1 == {"animal"}
    assert a2 == {"mammal", "animal"}
