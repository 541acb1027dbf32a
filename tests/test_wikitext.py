"""Golden tests for the wikitext markup cleaner (functions/wikitext.py).

Every GOLDENS entry was differentially verified BYTE-IDENTICAL against
the reference extractor (wiki_extractor.py, run with the option set
clean_wikipedia.py uses: --json --links --extract_categories
--filter_disambig_pages) on 2026-08-19, plus a 60-page randomized
property round (seed 20260819) — all byte-identical.  The single
documented deviation: the reference source's mojibake guillemet
literals ('\xc2\xab' bytes re-decoded) are emitted as the intended
\u00ab/\u00bb here; goldens store the intended form.

``expected`` is None for pages the reference FILTERS (disambig).
"""

from __future__ import annotations

import pytest

from refined_ray.functions.wikitext import (
    clean_wiki_pages,
    clean_wikitext,
    drop_nested,
    extract_categories,
    is_disambig_page,
    replace_internal_links,
    unescape_entities,
)

GOLDENS = [
    {
        "title": "Alpha",
        "wikitext": "'''Alpha''' is a ''test'' page about [[Corpus|data]]s and [[w:Page|wiki page]] stuff.\n{{Infobox|a=1|b={{nested|x}}}}\n&lt;!-- a comment --&gt;\n== Overview ==\nSome overview text with a [[Plain link]] and a [[Category:Dropped|inline]] link.\n{| class=\"wikitable\"\n|-\n| a || b\n|}\nSee [http://example.org/a the site] and &lt;ref&gt;a citation&lt;/ref&gt; done.__NOTOC__\n* bullet one\n* bullet two\n: indented line\nAfter the list.\n[[Category:Tests]]\n[[Category:Pages|sortkey]]\n",
        "expected": "Alpha\n\nAlpha is a \"test\" page about <a href=\"Corpus\">data</a>s and <a href=\"w%3APage\">wiki page</a> stuff.\nSome overview text with a <a href=\"Plain%20link\">Plain link</a> and a link.\n\nSee <a href=\"http%3A//example.org/a\">the site</a> and done.\nAfter the list.\n",
        "categories": ["Dropped", "Tests", "Pages"],
    },
    {
        "title": "Beta quotes",
        "wikitext": "'''''Bold italic''''' then ''\"quoted italic\"'' then \"\"double quoted\"\" residue ''' here '' tail.\nA [[File:Image.png|thumb|caption here]] image and [[:File:Other.png|colon file]].\nMath &lt;math&gt;x^2&lt;/math&gt; and code &lt;code&gt;print&lt;/code&gt; and &lt;math&gt;y&lt;/math&gt; again.\nSelf closing &lt;br/&gt; and &lt;ref name=\"x\"/&gt; refs.\nIgnored &lt;b&gt;bold tag&lt;/b&gt; and &lt;span class=\"x\"&gt;span content&lt;/span&gt; kept.\nDiscarded &lt;div class=\"y\"&gt;div content&lt;/div&gt; gone.\n&amp;amp;nbsp; entity &amp;lt;not a tag&amp;gt; and &amp;#65; and &amp;#x42; chars.\n",
        "expected": "Beta quotes\n\nBold italic then \"quoted italic\" then \"double quoted\" residue \"' here \" tail.\nA image and .\nMath formula_1 and code codice_1 and formula_2 again.\nSelf closing and refs.\nIgnored bold tag and span content kept.\nDiscarded gone.\n&nbsp; entity <not a tag> and A and B chars.\n",
        "categories": [],
    },
    {
        "title": "Gamma links",
        "wikitext": "Link with trail [[run]]ning and pipe trail [[Walk|walk]]ed.\nMulti pipe [[a|b|c]] and nested [[Help:IPA|[andora]]] like.\nExternal bare http://example.org/plain no brackets.\nBracketed no anchor [http://example.org/x] here.\nImage ext [http://example.org/pic.png http://example.org/pic.png] done.\n&lt;&lt; guillemets &gt;&gt; and 4 dots .... and double  space and ,, and ,. done.\n=== Deep section ===\n==== Deeper ====\nContent under sections.\nAn unclosed {{template runs to a }} close.\nA line (entirely parenthesized)\n----\n...-\npreformatted line? no: leading space below\n leading space line\nEnd line.\n",
        "expected": "Gamma links\n\nLink with trail <a href=\"run\">run</a>ning and pipe trail <a href=\"Walk\">walk</a>ed.\nMulti pipe <a href=\"a\">b|c</a> and nested ] like.\nExternal bare http://example.org/plain no brackets.\nBracketed no anchor <a href=\"http%3A//example.org/x\"></a> here.\nImage ext <a href=\"http%3A//example.org/pic.png\"><img src=\"http://example.org/pic.png\" alt=\"\"></a> done.\n« guillemets » and 4 dots ... and double space and , and . done.\nContent under sections.\nAn unclosed close.\nA line (entirely parenthesized)\npreformatted line? no: leading space below\nEnd line.\n",
        "categories": [],
    },
    {
        "title": "Delta disambig",
        "wikitext": "{{disambiguation}}\nThis page should be filtered out entirely.\n",
        "expected": None,
        "categories": None,
    },
    {
        "title": "Lists",
        "wikitext": "Intro line.\n* one\n** one one\n*# mixed num\n# num one\n# num two\n#: def in num\n; term\n: def\nAfter list immediately.\n* reopen\nAnother after.\n\n* list then blank ends it\nPost blank.\n",
        "expected": "Lists\n\nIntro line.\nAfter list immediately.\nAnother after.\n\nPost blank.\n",
        "categories": [],
    },
    {
        "title": "Placeholders",
        "wikitext": "First &lt;math&gt;a+b&lt;/math&gt; then &lt;math&gt;c&lt;/math&gt; then &lt;math&gt;a+b&lt;/math&gt; again.\nCode &lt;code&gt;x=1&lt;/code&gt; and &lt;CODE spam=\"y\"&gt;z&lt;/CODE&gt; mixed case.\nNowiki &lt;nowiki&gt;{{not dropped}} [[not a link]]&lt;/nowiki&gt; end.\nSyntax &amp;lt;syntaxhighlight lang=\"py\"&amp;gt;a &amp;amp;amp; b&amp;lt;/syntaxhighlight&amp;gt; after.\n",
        "expected": "Placeholders\n\nFirst formula_1 then formula_2 then formula_1 again.\nCode codice_1 and codice_2 mixed case.\nNowiki <nowiki> <a href=\"not%20a%20link\">not a link</a></nowiki> end.\nSyntax <syntaxhighlight lang=\"py\">a &amp; b</syntaxhighlight> after.\n",
        "categories": [],
    },
    {
        "title": "Unbalanced",
        "wikitext": "Open {{never closed at all stays.\nOpen {{one {{two }} tail after partial.\nClose }} without open passes through.\nTable {| only open\nPipe | starts line\nEnd brace at end }\n",
        "expected": "Unbalanced\n\nOpen without open passes through.\nTable {| only open\nPipe | starts line\n",
        "categories": [],
    },
    {
        "title": "NestedDiscard",
        "wikitext": "Before &lt;div&gt;outer &lt;div&gt;inner&lt;/div&gt; tail&lt;/div&gt; after.\nSub &lt;sub&gt;x&lt;/sub&gt; sup &lt;sup&gt;y&lt;/sup&gt; small &lt;small&gt;z&lt;/small&gt;.\nGallery &lt;gallery&gt;pic1 pic2&lt;/gallery&gt; done.\n",
        "expected": "NestedDiscard\n\nBefore after.\nSub sup small .\nGallery done.\n",
        "categories": [],
    },
    {
        "title": "Sections",
        "wikitext": "== Empty one ==\n== Another empty ==\n=== Sub! ===\nText under sub.\n== Q? ==\nMore text.\n==Tight==\nFinal.\n",
        "expected": "Sections\n\nText under sub.\nMore text.\nFinal.\n",
        "categories": [],
    },
    {
        "title": "LinkEdge",
        "wikitext": "Nested label [[Help:IPA for X|[andora]]] done.\nPipe first [[a|b|c]] multi.\nEmpty label [[Title|]] empty.\nColon lead [[:w:Foo|bar]] and [[:File:X|drop]] both.\nAnchor hash [[Page#Section|sec link]] done.\nExternal with label [https://ex.org/y label words] and [//proto.rel label2].\nInterlang [[fr:Page]] dropped.\nmailto [mailto:a@b.c mail me] done.\n",
        "expected": "LinkEdge\n\nNested label ] done.\nPipe first <a href=\"a\">b|c</a> multi.\nEmpty label <a href=\"Title\"></a> empty.\nColon lead <a href=\"%3Aw%3AFoo\">bar</a> and both.\nAnchor hash <a href=\"Page%23Section\">sec link</a> done.\nExternal with label <a href=\"https%3A//ex.org/y\">label words</a> and <a href=\"//proto.rel\">label2</a>.\nInterlang dropped.\nmailto <a href=\"mailto%3Aa%40b.c\">mail me</a> done.\n",
        "categories": [],
    },
]

@pytest.mark.parametrize("page", GOLDENS, ids=[g["title"] for g in GOLDENS])
def test_golden_page(page):
    if page["expected"] is None:
        assert is_disambig_page(page["wikitext"])
        return
    assert not is_disambig_page(page["wikitext"])
    clean, cats = clean_wikitext(page["title"], page["wikitext"])
    assert clean == page["expected"]
    assert cats == page["categories"]


def test_drop_nested_balanced():
    assert drop_nested("a {{x {{y}} z}} b", r"{{", r"}}") == "a  b"
    assert drop_nested("{{a}}{{b}}", r"{{", r"}}") == ""
    assert drop_nested("no braces", r"{{", r"}}") == "no braces"


def test_drop_nested_unbalanced_contracts():
    # unmatched close passes through
    assert drop_nested("x }} y", r"{{", r"}}") == "x }} y"
    # trailing unclosed open with a later close: drops through last close
    assert drop_nested("a {{one {{two }} tail", r"{{", r"}}") == "a  tail"
    # trailing unclosed open, no close at all: stays verbatim
    assert drop_nested("a {{never closed", r"{{", r"}}") == "a {{never closed"


def test_internal_link_namespace_gate():
    assert replace_internal_links("[[w:Page|ok]]") == '<a href="w%3APage">ok</a>'
    assert replace_internal_links("[[File:X.png|thumb|cap]]") == ""
    assert replace_internal_links("[[fr:Page]]") == ""
    # trail merging
    assert replace_internal_links("[[run]]ning") == '<a href="run">run</a>ning'


def test_unescape_entities_contract():
    # name2codepoint names + numeric forms; UNKNOWN references stay
    assert unescape_entities("&amp; &#65; &#x42; &bogus; &nbsp;") == \
        "& A B &bogus; \xa0"


def test_extract_categories_sortkey_excluded():
    cats = extract_categories("x [[Category:A]] y [[Category:B|sort]]")
    assert cats == ["A", "B"]


def test_clean_wiki_pages_dataset(ray_session):
    import ray

    rows = [{"page_id": i + 1, "revid": i, "title": g["title"],
             "text": g["wikitext"]} for i, g in enumerate(GOLDENS)]
    out = clean_wiki_pages(ray.data.from_items(rows)).take_all()
    kept = {g["title"]: g for g in GOLDENS if g["expected"] is not None}
    assert {r["title"] for r in out} == set(kept)
    for r in out:
        g = kept[r["title"]]
        assert r["clean_text"] == g["expected"]
        assert list(r["categories"]) == g["categories"]
        assert "text" not in r  # wide raw column dropped
