"""Markdown→HTML conversion + HTML block transformer.

Behavioral analogues of the reference's convert-md-to-html job
(/root/reference/src/utils/markdownToHtml.ts — pandoc subprocess) and block
transformer (/root/reference/src/utils/htmlTransformer.ts):

- ``markdown_to_html``: pure-Python conversion of the markdown subset the
  corpus uses (headings, paragraphs, blockquotes, ordered/unordered lists,
  pipe tables, horizontal rules, links, inline code, bold / italic) —
  replaces the external pandoc binary (not available here, and a subprocess
  per document would be the wrong shape for map_batches anyway).
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
_OL_RE = re.compile(r"^\d+[.)]\s+(.*)$")
_HR_RE = re.compile(r"^(-{3,}|\*{3,}|_{3,})$")
_TABLE_SEP_RE = re.compile(r"^\|?\s*:?-{3,}:?\s*(\|\s*:?-{3,}:?\s*)*\|?$")


def _inline(text: str) -> str:
    text = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    # Extract code-span contents into placeholders first so the other inline
    # substitutions never touch markup inside them (pandoc: `a*b*c` stays
    # literal), then restore.
    spans: list[str] = []

    def _stash(m: re.Match) -> str:
        spans.append(m.group(1))
        return f"\x00{len(spans) - 1}\x00"

    text = _CODE_RE.sub(_stash, text)
    text = _BOLD_RE.sub(r"<strong>\1</strong>", text)
    text = _ITAL_RE.sub(r"<em>\1</em>", text)
    text = _LINK_RE.sub(r'<a href="\2">\1</a>', text)
    for i, body in enumerate(spans):
        text = text.replace(f"\x00{i}\x00", f"<code>{body}</code>")
    return text


def _split_table_row(line: str) -> list[str]:
    cells = line.strip().strip("|").split("|")
    return [c.strip() for c in cells]


def markdown_to_html(md: str) -> str:
    """Minimal deterministic markdown→HTML5 (headings, paragraphs, quotes,
    ordered/unordered lists, pipe tables, horizontal rules)."""
    out: list[str] = []
    paragraph: list[str] = []
    list_items: list[str] = []
    list_tag = "ul"
    table_rows: list[str] = []

    def flush_paragraph():
        if paragraph:
            out.append(f"<p>{_inline(' '.join(paragraph))}</p>")
            paragraph.clear()

    def flush_list():
        if list_items:
            items = "".join(f"<li>{_inline(i)}</li>" for i in list_items)
            out.append(f"<{list_tag}>{items}</{list_tag}>")
            list_items.clear()

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
                "<tr>" + "".join(f"<th>{_inline(c)}</th>" for c in header) + "</tr>"
            )
        for r in rows:
            parts.append(
                "<tr>" + "".join(f"<td>{_inline(c)}</td>" for c in _split_table_row(r)) + "</tr>"
            )
        parts.append("</table>")
        out.append("".join(parts))

    for raw in md.split("\n"):
        line = raw.rstrip()
        stripped = line.strip()
        is_table_row = stripped.startswith("|") and stripped.count("|") >= 2
        if table_rows and not is_table_row:
            flush_table()
        m = _HEADING_RE.match(stripped)
        ol = _OL_RE.match(stripped)
        if is_table_row:
            flush_paragraph()
            flush_list()
            table_rows.append(stripped)
        elif m:
            flush_paragraph()
            flush_list()
            level = len(m.group(1))
            out.append(f"<h{level}>{_inline(m.group(2).strip())}</h{level}>")
        elif _HR_RE.match(stripped):
            flush_paragraph()
            flush_list()
            out.append("<hr />")
        elif stripped.startswith(">"):
            flush_paragraph()
            flush_list()
            out.append(f"<blockquote><p>{_inline(stripped[1:].strip())}</p></blockquote>")
        elif stripped.startswith(("- ", "* ")):
            flush_paragraph()
            if list_items and list_tag != "ul":
                flush_list()
            list_tag = "ul"
            list_items.append(stripped[2:].strip())
        elif ol:
            flush_paragraph()
            if list_items and list_tag != "ol":
                flush_list()
            list_tag = "ol"
            list_items.append(ol.group(1).strip())
        elif stripped == "":
            flush_paragraph()
            flush_list()
        else:
            flush_list()
            paragraph.append(stripped)
    flush_paragraph()
    flush_list()
    flush_table()
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
