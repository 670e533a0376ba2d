"""Markdown→HTML conversion + HTML block transformer.

Behavioral analogues of the reference's convert-md-to-html job
(/root/reference/src/utils/markdownToHtml.ts — pandoc subprocess) and block
transformer (/root/reference/src/utils/htmlTransformer.ts):

- ``markdown_to_html``: pure-Python conversion of the pandoc-markdown
  subset the corpus uses (ATX/setext headings, paragraphs, blockquotes,
  nested ordered/unordered lists, definition lists, line blocks, pipe
  tables, fenced code, horizontal rules, inline/reference links, inline
  code, bold / italic, smart punctuation — pandoc's default-on `smart`
  extension) — replaces the external pandoc binary (not available here,
  and a subprocess per document would be the wrong shape for map_batches
  anyway).
- ``transform_html_blocks``: select leaf content elements (p, h1-h6,
  blockquote, li, td, th), skip empty, sequence 1..n, stamp
  ``data-id="{doc_id}:block-{seq:03d}"``, emit {block_id, plain_text,
  element_type, char_count} (htmlTransformer.ts:48-54,110-147).
- ``extract_blocks_from_transformed``: inverse reader for pre-transformed
  HTML (htmlTransformer.ts:167-188).
"""

from __future__ import annotations

import re

BLOCK_TAGS = ("p", "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "li", "td", "th")

_BOLD_RE = re.compile(r"\*\*(.+?)\*\*")
_ITAL_RE = re.compile(r"(?<!\*)\*(?!\*)(.+?)(?<!\*)\*(?!\*)")
_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*)$")
_CODE_RE = re.compile(r"`([^`]+)`")
_LINK_RE = re.compile(r"\[([^\]]+)\]\(([^)\s]+)\)")
_REF_LINK_RE = re.compile(r"\[([^\]]+)\]\[([^\]]*)\]")
_REF_DEF_RE = re.compile(r'^\s*\[([^\]]+)\]:\s*(\S+)(?:\s+"[^"]*")?\s*$')
_OL_RE = re.compile(r"^\d+[.)]\s+(.*)$")
_UL_RE = re.compile(r"^[-*]\s+(.*)$")
_HR_RE = re.compile(r"^(-{3,}|\*{3,}|_{3,})$")
_SETEXT_H1_RE = re.compile(r"^=+$")
_SETEXT_H2_RE = re.compile(r"^-+$")
_FENCE_RE = re.compile(r"^```")
_TABLE_SEP_RE = re.compile(r"^\|?\s*:?-{3,}:?\s*(\|\s*:?-{3,}:?\s*)*\|?$")
_DEF_RE = re.compile(r"^:\s+(.*)$")
_LINE_BLOCK_RE = re.compile(r"^\|(?:\s(.*))?$")

# smart punctuation (pandoc's `smart` extension, ON in `--from markdown`):
# a quote OPENS at string start or after whitespace / an opening bracket /
# a dash; otherwise it closes (apostrophes close by the same rule)
_OPEN_CTX = r"(?:^|(?<=[\s(\[{–—‘“-]))"
_DQ_OPEN_RE = re.compile(_OPEN_CTX + '"')
_SQ_OPEN_RE = re.compile(_OPEN_CTX + "'")


def _smart(text: str) -> str:
    """Straight quotes → curly, ``---``/``--`` → em/en dash, ``...`` → …."""
    text = text.replace("...", "…")
    text = text.replace("---", "—").replace("--", "–")
    text = _DQ_OPEN_RE.sub("“", text).replace('"', "”")
    text = _SQ_OPEN_RE.sub("‘", text).replace("'", "’")
    return text


def _escape(text: str) -> str:
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _inline(text: str, refs: dict[str, str] | None = None) -> str:
    text = _escape(text)
    # Extract code-span contents into placeholders first so the other inline
    # substitutions never touch markup inside them (pandoc: `a*b*c` stays
    # literal and its punctuation stays straight), then restore.
    spans: list[str] = []

    def _stash(m: re.Match) -> str:
        spans.append(m.group(1))
        return f"\x00{len(spans) - 1}\x00"

    text = _CODE_RE.sub(_stash, text)
    # stash inline-link URLS before smart punctuation: pandoc smartens link
    # TEXT but never the target (-- / ... / ' inside a URL must survive)
    urls: list[str] = []

    def _stash_url(m: re.Match) -> str:
        urls.append(m.group(2))
        return f"[{m.group(1)}](\x02{len(urls) - 1}\x02)"

    text = _LINK_RE.sub(_stash_url, text)
    # smart punctuation BEFORE link substitution so href attribute quotes
    # stay straight
    text = _smart(text)
    text = _BOLD_RE.sub(r"<strong>\1</strong>", text)
    text = _ITAL_RE.sub(r"<em>\1</em>", text)
    text = _LINK_RE.sub(r'<a href="\2">\1</a>', text)
    for i, url in enumerate(urls):
        text = text.replace(f"\x02{i}\x02", url)
    if refs:
        def _ref(m: re.Match) -> str:
            label = (m.group(2) or m.group(1)).lower()  # [t][] collapses to t
            url = refs.get(label)
            return f'<a href="{url}">{m.group(1)}</a>' if url else m.group(0)

        text = _REF_LINK_RE.sub(_ref, text)
    for i, body in enumerate(spans):
        text = text.replace(f"\x00{i}\x00", f"<code>{body}</code>")
    return text


def _split_table_row(line: str) -> list[str]:
    cells = line.strip().strip("|").split("|")
    return [c.strip() for c in cells]


class _ListStack:
    """Nested ordered/unordered list builder emitting pandoc-shaped HTML
    (`<ul><li>a<ul><li>a1</li></ul></li></ul>`); flat lists render exactly
    as the previous single-level implementation did."""

    def __init__(self, inline):
        self._inline = inline
        self._stack: list[dict] = []  # {indent, tag, items: [html]}

    def __bool__(self) -> bool:
        return bool(self._stack)

    def _render_top(self) -> str:
        top = self._stack.pop()
        items = "".join(f"<li>{i}</li>" for i in top["items"])
        return f"<{top['tag']}>{items}</{top['tag']}>"

    def _close_one(self) -> str | None:
        html = self._render_top()
        if self._stack:
            self._stack[-1]["items"][-1] += html  # nest inside parent item
            return None
        return html

    def add(self, indent: int, tag: str, item: str) -> str | None:
        """Add an item; returns finished top-level list html when a sibling
        list of a different tag forces a close at the top level."""
        out = None
        while self._stack and indent < self._stack[-1]["indent"]:
            out = self._close_one() or out
        if self._stack and indent >= self._stack[-1]["indent"] + 2:
            # deeper: open a nested list under the last item
            self._stack.append({"indent": indent, "tag": tag, "items": [self._inline(item)]})
            return out
        if self._stack and self._stack[-1]["tag"] != tag:
            out = self._close_one() or out
        if not self._stack:
            self._stack.append({"indent": indent, "tag": tag, "items": []})
        self._stack[-1]["items"].append(self._inline(item))
        return out

    def flush(self) -> str | None:
        out = None
        while self._stack:
            out = self._close_one() or out
        return out


def markdown_to_html(md: str) -> str:
    """Deterministic markdown→HTML5: ATX + setext headings, paragraphs,
    blockquotes, nested ordered/unordered lists, pipe tables, fenced code
    blocks, horizontal rules, inline/reference links, raw-HTML block
    passthrough (the pandoc subset of
    /root/reference/src/utils/markdownToHtml.ts:53-98 the corpus uses)."""
    lines = md.split("\n")

    # pre-pass: collect reference-link definitions and drop their lines
    refs: dict[str, str] = {}
    body_lines: list[str] = []
    in_fence = False
    for raw in lines:
        if _FENCE_RE.match(raw.strip()):
            in_fence = not in_fence
            body_lines.append(raw)
            continue
        d = None if in_fence else _REF_DEF_RE.match(raw)
        if d:
            refs[d.group(1).lower()] = _escape(d.group(2))
        else:
            body_lines.append(raw)

    def inline(text: str) -> str:
        return _inline(text, refs)

    out: list[str] = []
    paragraph: list[str] = []
    lists = _ListStack(inline)
    table_rows: list[str] = []
    code_lines: list[str] | None = None  # inside a fence when not None
    deflist: list[tuple[str, list[str]]] = []  # [(term, [definitions])]
    line_block: list[str] | None = None

    def flush_paragraph():
        if paragraph:
            out.append(f"<p>{inline(' '.join(paragraph))}</p>")
            paragraph.clear()

    def flush_deflist():
        if deflist:
            items = "".join(
                f"<dt>{inline(term)}</dt>"
                + "".join(f"<dd>{inline(d)}</dd>" for d in defs)
                for term, defs in deflist
            )
            out.append(f"<dl>{items}</dl>")
            deflist.clear()

    def flush_line_block():
        nonlocal line_block
        if line_block is not None:
            out.append(
                '<div class="line-block">'
                + "<br />".join(inline(l) for l in line_block)
                + "</div>"
            )
            line_block = None

    def flush_list():
        html = lists.flush()
        if html:
            out.append(html)

    def flush_table():
        if not table_rows:
            return
        rows = list(table_rows)
        table_rows.clear()
        # pipe table: row 2 is the header separator; without one, every row
        # is a body row (pandoc's headerless table)
        header: list[str] | None = None
        if len(rows) >= 2 and _TABLE_SEP_RE.match(rows[1]):
            header = _split_table_row(rows[0])
            rows = rows[2:]
        parts = ["<table>"]
        if header is not None:
            parts.append(
                "<tr>" + "".join(f"<th>{inline(c)}</th>" for c in header) + "</tr>"
            )
        for r in rows:
            parts.append(
                "<tr>" + "".join(f"<td>{inline(c)}</td>" for c in _split_table_row(r)) + "</tr>"
            )
        parts.append("</table>")
        out.append("".join(parts))

    for raw in body_lines:
        line = raw.rstrip()
        stripped = line.strip()

        if code_lines is not None:  # inside a fenced code block
            if _FENCE_RE.match(stripped):
                out.append(f"<pre><code>{_escape(chr(10).join(code_lines))}</code></pre>")
                code_lines = None
            else:
                code_lines.append(line)
            continue

        is_table_row = stripped.startswith("|") and stripped.count("|") >= 2
        lb = None if is_table_row else _LINE_BLOCK_RE.match(stripped)
        if table_rows and not is_table_row:
            flush_table()
        if line_block is not None and lb is None:
            flush_line_block()
        m = _HEADING_RE.match(stripped)
        ol = _OL_RE.match(stripped)
        ul = _UL_RE.match(stripped)
        dd = _DEF_RE.match(stripped)
        indent = len(raw) - len(raw.lstrip(" "))
        # ordering invariant: an open <dl> always precedes the pending
        # paragraph (starting a deflist pops/flushes the paragraph), so
        # every flush site drains the deflist FIRST
        if _FENCE_RE.match(stripped):
            flush_deflist()
            flush_paragraph()
            flush_list()
            code_lines = []
        elif lb:
            flush_deflist()
            flush_paragraph()
            flush_list()
            if line_block is None:
                line_block = []
            line_block.append(lb.group(1) or "")
        elif dd and (paragraph or deflist):
            # definition line: the term is the pending paragraph line
            # (pandoc: `Term\n:   definition`); consecutive `: x` lines add
            # more <dd>s to the same term
            if paragraph:
                term = paragraph.pop()
                if paragraph:
                    # REAL intervening text between two term groups: close
                    # the open <dl> BEFORE the paragraph so blocks stay in
                    # source order (adjacent term groups share one <dl>)
                    flush_deflist()
                    flush_paragraph()
                deflist.append((term, []))
            deflist[-1][1].append(dd.group(1).strip())
        elif is_table_row:
            flush_deflist()
            flush_paragraph()
            flush_list()
            table_rows.append(stripped)
        elif paragraph and _SETEXT_H1_RE.match(stripped):
            out.append(f"<h1>{inline(' '.join(paragraph))}</h1>")
            paragraph.clear()
        elif paragraph and _SETEXT_H2_RE.match(stripped):
            out.append(f"<h2>{inline(' '.join(paragraph))}</h2>")
            paragraph.clear()
        elif m:
            flush_deflist()
            flush_paragraph()
            flush_list()
            level = len(m.group(1))
            out.append(f"<h{level}>{inline(m.group(2).strip())}</h{level}>")
        elif _HR_RE.match(stripped):
            flush_deflist()
            flush_paragraph()
            flush_list()
            out.append("<hr />")
        elif stripped.startswith(">"):
            flush_deflist()
            flush_paragraph()
            flush_list()
            out.append(f"<blockquote><p>{inline(stripped[1:].strip())}</p></blockquote>")
        elif ul:
            flush_deflist()
            flush_paragraph()
            html = lists.add(indent, "ul", ul.group(1).strip())
            if html:
                out.append(html)
        elif ol:
            flush_deflist()
            flush_paragraph()
            html = lists.add(indent, "ol", ol.group(1).strip())
            if html:
                out.append(html)
        elif stripped == "":
            flush_deflist()
            flush_paragraph()
            flush_list()
        elif stripped.startswith("<") and not paragraph and not lists:
            # raw HTML block passthrough (pandoc: native blocks survive)
            flush_table()
            out.append(stripped)
        else:
            flush_list()
            paragraph.append(stripped)
    if code_lines is not None:  # unterminated fence: pandoc closes it at EOF
        out.append(f"<pre><code>{_escape(chr(10).join(code_lines))}</code></pre>")
    flush_deflist()
    flush_paragraph()
    flush_list()
    flush_table()
    flush_line_block()
    return "\n".join(out)


def generate_block_id(doc_id: str, sequence: int) -> str:
    return f"{doc_id}:block-{sequence:03d}"


_TAG_RE = re.compile(
    r"<(?P<tag>p|h[1-6]|blockquote|li|td|th)(?P<attrs>[^>]*)>(?P<body>.*?)</(?P=tag)>",
    re.DOTALL | re.IGNORECASE,
)
_STRIP_TAGS_RE = re.compile(r"<[^>]+>")
_DATA_ID_RE = re.compile(r'data-id="([^"]+)"')


def _plain_text(html_fragment: str) -> str:
    text = _STRIP_TAGS_RE.sub("", html_fragment)
    text = text.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
    return text.strip()


def transform_html_blocks(doc_id: str, html: str) -> dict:
    """Stamp data-id on every non-empty leaf content element; return
    {transformed_html, blocks: [{block_id, plain_text, element_type,
    char_count}], total_blocks}.

    Leaf rule: a blockquote whose body contains nested block tags is a
    container — its children are the blocks (mirrors the reference skipping
    container duplication, htmlTransformer.ts:30-46)."""
    blocks: list[dict] = []
    seq = 0

    def repl(m: re.Match) -> str:
        nonlocal seq
        tag = m.group("tag").lower()
        body = m.group("body")
        if tag == "blockquote" and _TAG_RE.search(body):
            # container: transform children instead
            inner = _TAG_RE.sub(repl, body)
            return f"<{tag}{m.group('attrs')}>{inner}</{tag}>"
        plain = _plain_text(body)
        if not plain:
            return m.group(0)
        seq += 1
        block_id = generate_block_id(doc_id, seq)
        blocks.append(
            {
                "block_id": block_id,
                "plain_text": plain,
                "element_type": tag,
                "char_count": len(plain),
            }
        )
        return f'<{tag}{m.group("attrs")} data-id="{block_id}">{body}</{tag}>'

    transformed = _TAG_RE.sub(repl, html)
    return {"transformed_html": transformed, "blocks": blocks, "total_blocks": len(blocks)}


def extract_blocks_from_transformed(html: str) -> list[dict]:
    """Read blocks back from HTML that already carries data-id attributes."""
    blocks = []
    for m in _TAG_RE.finditer(html):
        id_match = _DATA_ID_RE.search(m.group("attrs"))
        if not id_match:
            continue
        plain = _plain_text(m.group("body"))
        if not plain:
            continue
        blocks.append(
            {
                "block_id": id_match.group(1),
                "plain_text": plain,
                "element_type": m.group("tag").lower(),
                "char_count": len(plain),
            }
        )
    return blocks
