"""Wikitext markup → clean text: the bounded WikiExtractor behavior set.

≙ the reference's Extractor.extract / transform / wiki2text / clean
(wiki_extractor.py:606-838), dropNested/dropSpans (:2023-2097),
replaceInternalLinks/makeInternalLink (:2099-2415),
replaceExternalLinks/makeExternalLink (:2452-2516) and compact
(:2520-2645), under the option set the reference actually runs with
(clean_wikipedia.py:41-50): ``--links --json --extract_categories
--filter_disambig_pages``, i.e. keepLinks=True, toHTML=False,
keepSections=False, keepLists=False.

SCOPE (documented deviation): template *expansion*
(wiki_extractor.py:841-1114 plus the parser-function/magic-word
machinery behind it) is out of scope for this engine — transclusions
are DROPPED, which is the reference's own behavior under
``--no_templates`` (transform1's else branch, wiki_extractor.py:
698-707).  Everything else in the behavior set is implemented:
nested ``{{…}}``/``{|…|}`` drop, bold/italic quote resolution,
internal links with pipe/trail/namespace semantics (anchors preserved
as ``<a href>`` so M4 offset re-alignment works downstream), external
links, magic-word behavioral switches, HTML comments, self-closing +
ignored-tag strip, discarded elements, entity unescape at the
reference's two call points, placeholder tags (math→formula_N,
code→codice_N), the whitespace/punctuation cleanup pass, and the
``compact()`` line walk.

Input contract: page text as stored in the dump, i.e. XML-escaped
once (``&lt;ref&gt;`` for a literal ``<ref>``) — what
``sources.xmldump.read_xml_pages(unescape_entities=False)`` emits and
what the reference's ``pages_from`` feeds its Extractor.  The
unescape happens mid-pipeline exactly where the reference does it
(wiki2text tail, :757-763, and again in clean, :798-800), so
escape-order-sensitive behavior (e.g. the nowiki regex matching the
*unescaped* literal only) is preserved.

On *unbalanced* brace input the reference's dropNested has
order-dependent quirks (:2036-2070); this scanner keeps the common
contracts — balanced regions drop exactly, a trailing unclosed open
group drops through the last close seen after it (or stays verbatim
if no close follows) and unmatched closes pass through — and leaves
the pathological interleavings unspecified.
"""

from __future__ import annotations

import re
from html.entities import name2codepoint
from urllib.parse import quote

# ---------------------------------------------------------------------
# Option constants (wiki_extractor.py:112-207 defaults + the
# clean_wikipedia.py invocation).  Tag NAMES and the url-protocol list
# are format contracts from MediaWiki, kept verbatim.
# ---------------------------------------------------------------------

ACCEPTED_NAMESPACES = ("w", "wiktionary", "wikt")

_SELF_CLOSING_TAGS = ("br", "hr", "nobr", "ref", "references", "nowiki")

_IGNORED_TAGS = (
    "abbr", "b", "big", "blockquote", "center", "cite", "em",
    "font", "h1", "h2", "h3", "h4", "hiero", "i", "kbd",
    "p", "plaintext", "s", "span", "strike", "strong",
    "tt", "u", "var",
)

_DISCARD_ELEMENTS = (
    "gallery", "timeline", "noinclude", "pre",
    "table", "tr", "td", "th", "caption", "div",
    "form", "input", "select", "option", "textarea",
    "ul", "li", "ol", "dl", "dt", "dd", "menu", "dir",
    "ref", "references", "img", "imagemap", "source", "small",
    "sub", "sup", "indicator",
)

_PLACEHOLDER_TAGS = (("math", "formula"), ("code", "codice"))

_MAGIC_SWITCHES = (
    "__NOTOC__", "__FORCETOC__", "__TOC__", "__NEWSECTIONLINK__",
    "__NONEWSECTIONLINK__", "__NOGALLERY__", "__HIDDENCAT__",
    "__NOCONTENTCONVERT__", "__NOCC__", "__NOTITLECONVERT__", "__NOTC__",
    "__START__", "__END__", "__INDEX__", "__NOINDEX__",
    "__STATICREDIRECT__", "__DISAMBIG__",
)

# MediaWiki DefaultSettings $wgUrlProtocols (format contract)
_URL_PROTOCOLS = (
    "bitcoin:", "ftp://", "ftps://", "geo:", "git://", "gopher://",
    "http://", "https://", "irc://", "ircs://", "magnet:", "mailto:",
    "mms://", "news:", "nntp://", "redis://", "sftp://", "sip:", "sips:",
    "sms:", "ssh://", "svn://", "tel:", "telnet://", "urn:",
    "worldwind://", "xmpp:", "//",
)

# ---------------------------------------------------------------------
# Compiled patterns (module level: compiled once per worker process)
# ---------------------------------------------------------------------

_NOWIKI = re.compile(r"<nowiki>.*?</nowiki>")
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_CATEGORY = re.compile(r"\[\[Category:([^|\]]+)(?:|[^\]]+)?\]\]")

_BOLD_ITALIC = re.compile(r"'''''(.*?)'''''")
_BOLD = re.compile(r"'''(.*?)'''")
_ITALIC_QUOTE = re.compile(r"''\"([^\"]*?)\"''")
_ITALIC = re.compile(r"''(.*?)''")
_QUOTE_QUOTE = re.compile(r'""([^"]*?)""')

_MAGIC_RE = re.compile("|".join(_MAGIC_SWITCHES))
_SYNTAXHIGHLIGHT = re.compile(
    r"&lt;syntaxhighlight .*?&gt;(.*?)&lt;/syntaxhighlight&gt;", re.DOTALL)
_ENTITY = re.compile(r"&#?(\w+);")

_SELF_CLOSING_PATTERNS = tuple(
    re.compile(r"<\s*%s\b[^>]*/\s*>" % t, re.DOTALL | re.IGNORECASE)
    for t in _SELF_CLOSING_TAGS)
_IGNORED_TAG_PATTERNS = tuple(
    (re.compile(r"<%s\b.*?>" % t, re.IGNORECASE | re.DOTALL),
     re.compile(r"</\s*%s>" % t, re.IGNORECASE))
    for t in _IGNORED_TAGS)
_PLACEHOLDER_PATTERNS = tuple(
    (re.compile(r"<\s*%s(\s*| [^>]+?)>.*?<\s*/\s*%s\s*>" % (t, t),
                re.DOTALL | re.IGNORECASE), repl)
    for t, repl in _PLACEHOLDER_TAGS)
_DISCARD_DELIMS = tuple(
    (r"<\s*%s\b[^>/]*>" % t, r"<\s*/\s*%s>" % t) for t in _DISCARD_ELEMENTS)

_SPACES = re.compile(r" {2,}")
_DOTS = re.compile(r"\.{4,}")
# NOTE: the next two are literal character *sequences* in the reference
# (wiki_extractor.py:806-807 — almost certainly intended as character
# classes but shipped as sequences, so they nearly never fire); kept
# byte-faithful because parity means replicating what runs, not what
# was meant.
_PUNCT_SEQ_AFTER = re.compile(r" (,:\.\)\]»)")
_PUNCT_SEQ_BEFORE = re.compile(r"(\[\(«) ")
_PUNCT_ONLY_LINE = re.compile(r"\n\W+?\n", re.UNICODE)

_LINK_DELIM = re.compile(r"\[\[|\]\]")
_LINK_TAIL = re.compile(r"\w+")
_SECTION = re.compile(r"(==+)\s*(.*?)\s*\1")

_EXT_LINK_URL_CLASS = r'[^][<>"\x00-\x20\x7F\s]'
_EXT_ANCHOR_CLASS = r"[^][\x00-\x08\x0a-\x1F]"
_EXT_LINK_BRACKETED = re.compile(
    r"\[((?:" + "|".join(re.escape(p) for p in _URL_PROTOCOLS) + r")"
    + _EXT_LINK_URL_CLASS + r"+)"
    + r"\s*((?:" + _EXT_ANCHOR_CLASS + r"|\[\[" + _EXT_ANCHOR_CLASS
    + r"+\]\])*?)\]",
    re.S | re.U | re.IGNORECASE)
_EXT_IMAGE = re.compile(
    r'^(http://|https://)([^][<>"\x00-\x20\x7F\s]+)'
    r"/([A-Za-z0-9_.,~%\-+&;#*?!=()@\x80-\xFF]+)\.(gif|png|jpg|jpeg)$",
    re.S | re.U | re.IGNORECASE)

# Anchored per-LINE (keepPage uses .match), so only line-leading
# disambig templates mark a page (wiki_extractor.py:213-230)
_DISAMBIG_LINE = re.compile(r"{{disambig(uation)?(\|[^}]*)?}}|__DISAMBIG__")


# ---------------------------------------------------------------------
# Balanced-delimiter scanners
# ---------------------------------------------------------------------

def drop_nested(text: str, open_pat: str, close_pat: str) -> str:
    """Remove every balanced ``open…close`` region (nesting tracked).

    One combined-regex pass instead of the reference's alternating
    re-search loop (:2023-2072); contract in the module docstring.
    """
    pat = re.compile("(%s)|(%s)" % (open_pat, close_pat), re.IGNORECASE)
    spans: list[tuple[int, int]] = []
    depth = 0
    start = -1
    last_close_end = -1
    for m in pat.finditer(text):
        if m.group(1) is not None:
            if depth == 0:
                start = m.start()
            depth += 1
        elif depth:
            depth -= 1
            last_close_end = m.end()
            if depth == 0:
                spans.append((start, m.end()))
                start = -1
    if depth and last_close_end > start >= 0:
        # unclosed trailing group: close at the last close seen, like
        # the reference's close-all-pending termination (:2040-2047)
        spans.append((start, last_close_end))
    if not spans:
        return text
    out: list[str] = []
    pos = 0
    for s, e in spans:
        out.append(text[pos:s])
        pos = e
    out.append(text[pos:])
    return "".join(out)


def _balanced_link_spans(text: str):
    """(start, end) spans of top-level balanced ``[[ … ]]`` regions.
    A ``]]`` outside any open region is skipped — same observable rule
    as findBalanced's alternating pattern set (:1294-1333)."""
    depth = 0
    start = 0
    for m in _LINK_DELIM.finditer(text):
        if m.group(0) == "[[":
            if depth == 0:
                start = m.start()
            depth += 1
        elif depth:
            depth -= 1
            if depth == 0:
                yield start, m.end()


# ---------------------------------------------------------------------
# Links
# ---------------------------------------------------------------------

def make_internal_link(title: str, label: str, keep_links: bool = True) -> str:
    """Namespace-gated link rendering (≙ makeInternalLink, :2404-2415):
    a ``ns:`` prefix outside ACCEPTED_NAMESPACES drops the link
    entirely (Category:, File:, Template:, …)."""
    colon = title.find(":")
    if colon > 0 and title[:colon] not in ACCEPTED_NAMESPACES:
        return ""
    if colon == 0:
        colon2 = title.find(":", colon + 1)
        if colon2 > 1 and title[colon + 1:colon2] not in ACCEPTED_NAMESPACES:
            return ""
    if keep_links:
        return '<a href="%s">%s</a>' % (quote(title.encode("utf-8")), label)
    return label


def replace_internal_links(text: str, keep_links: bool = True) -> str:
    """``[[title|…|label]]trail`` → rendered link + trail
    (≙ replaceInternalLinks, :2099-2137).  The label is the text after
    the pipe the reference lands on: the first pipe, advanced to the
    last pipe before each nested ``[[…]]`` region."""
    out: list[str] = []
    cur = 0
    for s, e in _balanced_link_spans(text):
        m = _LINK_TAIL.match(text, e)
        if m:
            trail = m.group(0)
            end = m.end()
        else:
            trail = ""
            end = e
        inner = text[s + 2:e - 2]
        pipe = inner.find("|")
        if pipe < 0:
            title = inner
            label = title
        else:
            title = inner[:pipe].rstrip()
            curp = pipe + 1
            for s1, e1 in _balanced_link_spans(inner):
                last = inner.rfind("|", curp, s1)
                if last >= 0:
                    pipe = last
                curp = e1
            label = inner[pipe + 1:].strip()
        out.append(text[cur:s])
        out.append(make_internal_link(title, label, keep_links))
        out.append(trail)
        cur = end
    out.append(text[cur:])
    return "".join(out)


def replace_external_links(text: str, keep_links: bool = True) -> str:
    """``[URL anchor]`` → rendered link (≙ replaceExternalLinks +
    makeExternalLink/-Image, :2452-2516)."""
    out: list[str] = []
    cur = 0
    for m in _EXT_LINK_BRACKETED.finditer(text):
        out.append(text[cur:m.start()])
        cur = m.end()
        url = m.group(1)
        label = m.group(2)
        mi = _EXT_IMAGE.match(label)
        if mi:
            label = ('<img src="%s" alt="">' % label) if keep_links else ""
        if keep_links:
            out.append('<a href="%s">%s</a>'
                       % (quote(url.encode("utf-8")), label))
        else:
            out.append(label)
    out.append(text[cur:])
    return "".join(out)


# ---------------------------------------------------------------------
# Entities
# ---------------------------------------------------------------------

def unescape_entities(text: str) -> str:
    """HTML/XML character references → characters; unknown references
    stay verbatim (≙ unescape, :325-347 — name2codepoint names plus
    decimal/hex numeric forms, NOT the full html.unescape table)."""
    def _fix(m: re.Match) -> str:
        whole, code = m.group(0), m.group(1)
        try:
            if whole[1] == "#":
                if whole[2] in "xX":
                    return chr(int(code[1:], 16))
                return chr(int(code))
            return chr(name2codepoint[code])
        except (ValueError, KeyError, OverflowError):
            return whole
    return _ENTITY.sub(_fix, text)


def _unescape_outside_syntaxhighlight(text: str) -> str:
    """Unescape entities, keeping <syntaxhighlight> bodies verbatim
    (≙ wiki2text's tail loop, :755-763)."""
    out: list[str] = []
    cur = 0
    for m in _SYNTAXHIGHLIGHT.finditer(text):
        out.append(unescape_entities(text[cur:m.start()]))
        out.append(m.group(1))
        cur = m.end()
    out.append(unescape_entities(text[cur:]))
    return "".join(out)


# ---------------------------------------------------------------------
# The four pipeline steps
# ---------------------------------------------------------------------

def transform(text: str) -> str:
    """Drop transclusions outside <nowiki> protection (≙ transform +
    transform1's no-expansion branch, :682-707)."""
    out: list[str] = []
    cur = 0
    for m in _NOWIKI.finditer(text):
        out.append(drop_nested(text[cur:m.start()], r"{{", r"}}"))
        out.append(m.group(0))
        cur = m.end()
    out.append(drop_nested(text[cur:], r"{{", r"}}"))
    return "".join(out)


def wiki2text(text: str, keep_links: bool = True) -> str:
    """Markup → text-with-anchors (≙ wiki2text, :709-763)."""
    text = drop_nested(text, r"{{", r"}}")
    text = drop_nested(text, r"{\|", r"\|}")
    text = _BOLD_ITALIC.sub(r"\1", text)
    text = _BOLD.sub(r"\1", text)
    text = _ITALIC_QUOTE.sub(r'"\1"', text)
    text = _ITALIC.sub(r'"\1"', text)
    text = _QUOTE_QUOTE.sub(r'"\1"', text)
    text = text.replace("'''", "").replace("''", '"')
    text = replace_internal_links(text, keep_links)
    text = replace_external_links(text, keep_links)
    text = _MAGIC_RE.sub("", text)
    return _unescape_outside_syntaxhighlight(text)


def clean(text: str) -> str:
    """Strip residual HTML and normalize punctuation/whitespace
    (≙ clean, :765-838; keep_tables/toHTML branches out of the
    invocation's option set and omitted)."""
    spans: list[tuple[int, int]] = []
    for m in _COMMENT.finditer(text):
        spans.append((m.start(), m.end()))
    for pat in _SELF_CLOSING_PATTERNS:
        for m in pat.finditer(text):
            spans.append((m.start(), m.end()))
    for left, right in _IGNORED_TAG_PATTERNS:
        for m in left.finditer(text):
            spans.append((m.start(), m.end()))
        for m in right.finditer(text):
            spans.append((m.start(), m.end()))
    if spans:
        # dropSpans contract (:2076-2090): a span starting inside an
        # already-cut region is skipped entirely (not merged)
        spans.sort()
        out: list[str] = []
        offset = 0
        for s, e in spans:
            if offset <= s:
                out.append(text[offset:s])
                offset = e
        out.append(text[offset:])
        text = "".join(out)

    for open_pat, close_pat in _DISCARD_DELIMS:
        text = drop_nested(text, open_pat, close_pat)

    text = unescape_entities(text)

    for pat, repl in _PLACEHOLDER_PATTERNS:
        index = 1
        for m in pat.finditer(text):
            text = text.replace(m.group(), "%s_%d" % (repl, index))
            index += 1

    # documented deviation: the reference's literals here are the
    # mojibake 'Â«'/'Â»' (:806 — '«' UTF-8 bytes re-decoded as
    # Latin-1, a source-encoding artifact); we emit the intended
    # guillemets
    text = text.replace("<<", "«").replace(">>", "»")
    text = text.replace("\t", " ")
    text = _SPACES.sub(" ", text)
    text = _DOTS.sub("...", text)
    text = _PUNCT_SEQ_AFTER.sub(r"\1", text)
    text = _PUNCT_SEQ_BEFORE.sub(r"\1", text)
    text = _PUNCT_ONLY_LINE.sub("\n", text)
    text = text.replace(",,", ",").replace(",.", ".")
    return text


def compact(text: str, keep_sections: bool = False,
            keep_lists: bool = False) -> list[str]:
    """Line walk: headers/lists/indents/table-residue handling
    (≙ compact, :2520-2645, toHTML=False branches only)."""
    page: list[str] = []
    headers: dict[int, str] = {}
    empty_section = False
    list_level = ""
    list_count: list[int] = []
    for line in text.split("\n"):
        if not line:
            if list_level:
                page.append(line)
                list_level = ""
                list_count = []
                empty_section = False
            elif page and page[-1]:
                page.append("")
            continue
        m = _SECTION.match(line)
        if m:
            title = m.group(2)
            lev = len(m.group(1))
            if title and title[-1] not in "!?":
                title += "."
            headers[lev] = title
            for i in [k for k in headers if k > lev]:
                del headers[i]
            empty_section = True
            list_level = ""
            list_count = []
            continue
        elif line.startswith("++"):
            title = line[2:-2]
            if title:
                if title[-1] not in "!?":
                    title += "."
                page.append(title)
        elif line[0] == ":":
            continue
        elif line[0] in "*#;:":
            # level walk transcribed from :2577-2620 — the pair source
            # is the level string as it was at loop entry, while pops
            # and pushes rebind the live level (items themselves are
            # dropped unless keep_lists)
            i = 0
            entry_level = list_level
            counts = list(list_count)
            for k in range(max(len(entry_level), len(line))):
                c = entry_level[k] if k < len(entry_level) else ""
                n = line[k] if k < len(line) else ""
                if not n or n not in "*#;:":  # shorter or different
                    if c:
                        list_level = list_level[:-1]
                        counts = counts[:-1]
                        continue
                    break
                if c != n and (not c or (c not in ";:" and n not in ";:")):
                    if c:
                        list_level = list_level[:-1]
                        counts = counts[:-1]
                    list_level += n
                    counts.append(0)
                i += 1
            list_count = counts
            last_char = line[i - 1]
            item = line[i:].strip()
            if item and keep_lists:
                if keep_sections:
                    for _, v in sorted(headers.items()):
                        page.append("Section::::" + v)
                headers.clear()
                list_count[i - 1] += 1
                bullet = ("BULLET::::%d. " % list_count[i - 1]
                          if last_char == "#" else "BULLET::::- ")
                page.append("{0:{1}s}".format(bullet, len(list_level)) + item)
        elif list_level:
            list_level = ""
            list_count = []
            page.append(line)
        elif line[0] in "{|" or line[-1] == "}":
            continue
        elif (line[0] == "(" and line[-1] == ")") or line.strip(".-") == "":
            continue
        elif headers:
            if keep_sections:
                for _, v in sorted(headers.items()):
                    page.append("Section::::" + v)
            headers.clear()
            page.append(line)
            empty_section = False
        elif not empty_section:
            if line[0] != " ":  # drop preformatted
                page.append(line)
    return page


# ---------------------------------------------------------------------
# Page-level entry points
# ---------------------------------------------------------------------

def extract_categories(text: str) -> list[str]:
    """Category names, sortkeys excluded (≙ extract's findall, :661)."""
    return _CATEGORY.findall(text)


def is_disambig_page(text: str) -> bool:
    """Line-anchored disambiguation-template detection (≙ keepPage's
    filter_disambig_pages loop, :221-231)."""
    return any(_DISAMBIG_LINE.match(line) for line in text.split("\n"))


def clean_wikitext(title: str, text: str, *, keep_links: bool = True,
                   keep_sections: bool = False, keep_lists: bool = False
                   ) -> tuple[str, list[str]]:
    """Full page transform → (clean_text, categories).

    ``clean_text`` matches the reference's JSON ``text`` field shape
    (write_output, :559-583): title line, blank line, cleaned body
    lines joined by newlines.
    """
    text = transform(text)
    categories = extract_categories(text)
    text = wiki2text(text, keep_links)
    lines = compact(clean(text), keep_sections, keep_lists)
    return "\n".join([title + "\n"] + lines), categories


def clean_wiki_pages(pages, *, keep_links: bool = True,
                     filter_disambig: bool = True, **map_kwargs):
    """Dataset(page_id, revid, title, text, …) →
    Dataset(page_id, revid, title, clean_text, categories).

    The per-row Python loop is deliberate: nested-brace scanning has
    no Arrow kernel and this is a one-time ingest-side pass (same
    rationale as extract_links_batch).  Regexes are module-level so
    they compile once per worker process, and the wide raw ``text``
    column is dropped on output.
    """
    import pyarrow as pa

    def _batch(b: pa.Table) -> pa.Table:
        titles = b["title"].to_pylist()
        texts = b["text"].to_pylist()
        keep = []
        clean_texts: list[str] = []
        cats: list[list[str]] = []
        for i, (ti, tx) in enumerate(zip(titles, texts)):
            tx = tx or ""
            if filter_disambig and is_disambig_page(tx):
                continue
            ct, cg = clean_wikitext(ti or "", tx, keep_links=keep_links)
            keep.append(i)
            clean_texts.append(ct)
            cats.append(cg)
        kept = b.drop_columns(["text"]).take(keep)
        return kept.append_column(
            "clean_text", pa.array(clean_texts, type=pa.large_string())
        ).append_column(
            "categories", pa.array(cats, type=pa.list_(pa.string())))

    return pages.map_batches(_batch, batch_format="pyarrow", **map_kwargs)
