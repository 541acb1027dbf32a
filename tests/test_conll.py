"""Unit tests for the AIDA CoNLL doc splitter (sources/conll.py —
reference contract: conll_reader.py:119-161).  The distributed path is
oracle-gated by the ``aida_conll`` catalog query."""

from refined_ray.sources.conll import iter_conll_docs


def _docs(lines, **kw):
    return list(iter_conll_docs(lines, **kw))


BASIC = [
    "-DOCSTART- (1 testa)\n",
    "John NNP _ B-PER\n",
    "Smith NNP _ I-PER\n",
    "\n",
    "runs VBZ _ O\n",
    "\n",
    "-DOCSTART- (2 testa)\n",
    "Mary NNP _ B-PER\n",
    "\n",
]


def test_article_mode_drops_trailing_doc():
    # the reference only flushes a doc at the NEXT -DOCSTART-: doc 2 is
    # lost at EOF
    docs = _docs(BASIC)
    assert len(docs) == 1
    assert [[t[0] for t in s] for s in docs[0]] == [["John", "Smith"], ["runs"]]


def test_sentence_level_yields_each_sentence():
    docs = _docs(BASIC, sentence_level=True)
    assert [[t[0] for t in s] for d in docs for s in d] == [
        ["John", "Smith"], ["runs"], ["Mary"]]


def test_trailing_sentence_without_boundary_dropped():
    # no blank line after the last token line → the sentence never flushes
    docs = _docs(["-DOCSTART- (1)\n", "a NNP _ O\n", "\n",
                  "b NNP _ O\n"], sentence_level=True)
    assert [[t[0] for t in s] for d in docs for s in d] == [["a"]]


def test_special_tags_and_lower():
    lines = ["-DOCSTART- (1)\n", "-LRB- NNP _ O\n", "`` SYM _ O\n",
             "Big NNP _ B-ORG\n", "\n", "-DOCSTART- (2)\n", "x X _ O\n", "\n"]
    (doc,) = _docs(lines, lower=True)
    assert [t[0] for t in doc[0]] == ["(", '"', "big"]


def test_bio_only_strips_type():
    lines = ["-DOCSTART- (1)\n", "a N _ B-PER\n", "b N _ I-ORG\n",
             "c N _ O\n", "\n", "-DOCSTART- (2)\n", "x X _ O\n", "\n"]
    (doc,) = _docs(lines, bio_only=True)
    assert [t[3] for t in doc[0]] == ["B", "I", "O"]


def test_unknown_tag_maps_to_o_or_mention():
    lines = ["-DOCSTART- (1)\n", "a N _ B-GPE\n", "b N _ B-PER\n", "\n",
             "-DOCSTART- (2)\n", "x X _ O\n", "\n"]
    (doc,) = _docs(lines, bio_only=False)
    assert [t[3] for t in doc[0]] == ["O", "B-PER"]
    (doc,) = _docs(lines, bio_only=False, use_mention_tag=True)
    assert [t[3] for t in doc[0]] == ["B-MENTION", "B-PER"]


def test_docstart_with_four_parts_is_still_boundary():
    lines = ["-DOCSTART- (1 testa x)\n", "a N _ O\n", "\n",
             "-DOCSTART- (2 testa x)\n", "b N _ O\n", "\n"]
    (doc,) = _docs(lines)
    assert [t[0] for t in doc[0]] == ["a"]
