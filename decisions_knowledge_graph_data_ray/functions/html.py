"""Markdown→HTML conversion + HTML block transformer.

Behavioral analogues of the reference's convert-md-to-html job
(/root/reference/src/utils/markdownToHtml.ts — pandoc subprocess) and block
transformer (/root/reference/src/utils/htmlTransformer.ts):

- ``markdown_to_html``: pure-Python conversion of the pandoc-markdown
  subset the corpus uses (ATX/setext headings, paragraphs, blockquotes,
  nested ordered/unordered lists, definition lists, line blocks, pipe
  tables with column alignment, grid tables, footnotes (reference-style,
  pandoc's HTML5 endnotes section), fenced code, horizontal rules,
  inline/reference links, inline code, bold / italic, smart punctuation —
  pandoc's default-on `smart` extension, heading attribute blocks
  (`{#id .class key=val}`, `{-}` = `.unnumbered` — pandoc
  `header_attributes`) and heading auto-identifiers with duplicate `-N`
  suffixing (pandoc `auto_identifiers`)) — replaces the external pandoc
  binary (not available here, and a subprocess per document would be the
  wrong shape for map_batches anyway), inline (^[...]) notes numbered in
  appearance order with reference notes, multi-block footnote bodies
  (4-space-indented continuation paragraphs), and fenced-code attribute
  blocks (```python bare language class or ```{.cls #id key=val}). Still
  not full pandoc: single-paragraph grid-table cells, no attribute blocks
  on inline spans / links, no lazy (unindented) footnote continuation, and
  a footnote reference inside a heading contributes its number to the
  auto-identifier's input only as stripped text.
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
_FN_DEF_RE = re.compile(r"^\[\^([^\]\s]+)\]:\s*(.*)$")
_FN_REF_RE = re.compile(r"\[\^([^\]\s]+)\]")
# pandoc inline_notes: ^[body] with at most one nesting level of brackets;
# the combined alternation with [^label] keeps NUMBERING in left-to-right
# appearance order across both note kinds (pandoc renumbers that way)
_FN_ANY_RE = re.compile(r"\^\[((?:[^\[\]]|\[[^\[\]]*\])*)\]|\[\^([^\]\s]+)\]")
_GRID_BORDER_RE = re.compile(r"^\+(-+\+)+$")
_GRID_HSEP_RE = re.compile(r"^\+([:=]=*:?\+)+$")
_GRID_LINE_RE = re.compile(r"^[+|].*[+|]$")
_HR_RE = re.compile(r"^(-{3,}|\*{3,}|_{3,})$")
_SETEXT_H1_RE = re.compile(r"^=+$")
_SETEXT_H2_RE = re.compile(r"^-+$")
_FENCE_RE = re.compile(r"^```")
_TABLE_SEP_RE = re.compile(r"^\|?\s*:?-+:?\s*(\|\s*:?-+:?\s*)*\|?$")
_DEF_RE = re.compile(r"^:\s+(.*)$")
_LINE_BLOCK_RE = re.compile(r"^\|(?:\s(.*))?$")

# pandoc header_attributes: a trailing {...} block on a heading line
_ATTR_BLOCK_RE = re.compile(r"\s*\{([^{}]*)\}\s*$")
_ATTR_TOKEN_RE = re.compile(
    r'[#.][^\s"=]+'          # #id / .class
    r'|[^\s"=]+="[^"]*"'     # key="quoted value"
    r"|[^\s\"=]+=[^\s\"]*"   # key=bare
    r"|-"                    # {-} == .unnumbered
)
_FN_ANCHOR_RE = re.compile(r'<a href="#fn\d+".*?</a>')


def _parse_attr_block(spec: str) -> tuple[str | None, list[str], list[tuple[str, str]]]:
    """{#id .c1 key=val key2="v 2" -} → (id, classes, key-values)."""
    ident: str | None = None
    classes: list[str] = []
    kvs: list[tuple[str, str]] = []
    for tok in _ATTR_TOKEN_RE.findall(spec):
        if tok.startswith("#"):
            if ident is None:
                ident = tok[1:]
        elif tok.startswith("."):
            classes.append(tok[1:])
        elif tok == "-":
            classes.append("unnumbered")
        else:
            k, _, v = tok.partition("=")
            kvs.append((k, v[1:-1] if v.startswith('"') else v))
    return ident, classes, kvs


def _auto_identifier(plain: str) -> str:
    """pandoc auto_identifiers (T.P.Shared.inlineListToIdentifier): keep
    [alnum _ - . space], spaces → hyphens, lowercase, drop everything up to
    the first letter, 'section' when nothing is left."""
    s = "".join(c for c in plain if c.isalnum() or c in "_-. ")
    s = s.replace(" ", "-").lower()
    i = 0
    while i < len(s) and not s[i].isalpha():
        i += 1
    return s[i:] or "section"


def _unique_id(base: str, used: set[str]) -> str:
    """pandoc uniqueIdent: -1, -2, ... suffixes on collision."""
    if base not in used:
        used.add(base)
        return base
    n = 1
    while f"{base}-{n}" in used:
        n += 1
    used.add(f"{base}-{n}")
    return f"{base}-{n}"

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


def _unescape(text: str) -> str:
    """Exact inverse of _escape (for inline-note bodies captured from
    already-escaped text but re-rendered — and re-escaped — later)."""
    return text.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")


def _inline(text: str, refs: dict[str, str] | None = None, fn_sub=None, note_sub=None) -> str:
    text = _escape(text)
    # Extract code-span contents into placeholders first so the other inline
    # substitutions never touch markup inside them (pandoc: `a*b*c` stays
    # literal and its punctuation stays straight), then restore.
    spans: list[str] = []

    def _stash(m: re.Match) -> str:
        spans.append(m.group(1))
        return f"\x00{len(spans) - 1}\x00"

    text = _CODE_RE.sub(_stash, text)
    # footnote references ([^label] → numbered sup anchors) stash before
    # smart punctuation so the anchor's attribute quotes stay straight
    fn_spans: list[str] = []
    # one left-to-right pass over BOTH note kinds, so inline ^[body] notes
    # and [^label] refs number in appearance order; a [^ref] or [link](url)
    # inside a note body survives raw into the stored body (the endnotes
    # section re-renders it through _inline later)
    if fn_sub is not None or note_sub is not None:
        def _stash_any(m: re.Match) -> str:
            if m.group(1) is not None:
                if note_sub is None:
                    return m.group(0)
                fn_spans.append(note_sub(_unescape(m.group(1))))
                return f"\x03{len(fn_spans) - 1}\x03"
            if fn_sub is None:
                return m.group(0)
            html = fn_sub(m.group(2))
            if html is None:  # undefined label: pandoc leaves it literal
                return m.group(0)
            fn_spans.append(html)
            return f"\x03{len(fn_spans) - 1}\x03"

        text = _FN_ANY_RE.sub(_stash_any, text)
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
    for i, html in enumerate(fn_spans):
        text = text.replace(f"\x03{i}\x03", html)
    for i, body in enumerate(spans):
        text = text.replace(f"\x00{i}\x00", f"<code>{body}</code>")
    return text


def _split_table_row(line: str) -> list[str]:
    cells = line.strip().strip("|").split("|")
    return [c.strip() for c in cells]


def _parse_aligns(sep_cells: list[str]) -> list[str | None]:
    """Column alignment from a separator row's colon placement
    (pandoc: `:---` left, `---:` right, `:--:` center, `---` default)."""
    aligns: list[str | None] = []
    for c in sep_cells:
        c = c.strip()
        left, right = c.startswith(":"), c.endswith(":")
        aligns.append(
            "center" if left and right else "right" if right else "left" if left else None
        )
    return aligns


def _cell(tag: str, body: str, align: str | None) -> str:
    style = f' style="text-align: {align};"' if align else ""
    return f"<{tag}{style}>{body}</{tag}>"


def _render_grid_table(lines: list[str], inline) -> str:
    """Grid table (pandoc `grid_tables`): column cuts from the first border
    line's '+' positions; a `+===+` line separates header rows from body
    rows and carries optional alignment colons; multiple `|` lines between
    two border lines are ONE row with multi-line cells (joined by a single
    space — the subset's single-paragraph-cell shape)."""
    cuts = [i for i, ch in enumerate(lines[0]) if ch == "+"]
    ncols = len(cuts) - 1

    def cells_of(line: str) -> list[str]:
        padded = line.ljust(cuts[-1] + 1)
        return [padded[cuts[k] + 1 : cuts[k + 1]].strip() for k in range(ncols)]

    hsep_idx = next((i for i, l in enumerate(lines) if _GRID_HSEP_RE.match(l)), None)
    aligns: list[str | None] = [None] * ncols
    if hsep_idx is not None:
        aligns = _parse_aligns(cells_of(lines[hsep_idx]))
        # pad the parse: the '=' runs include the colon chars themselves
        aligns = (aligns + [None] * ncols)[:ncols]

    header_groups: list[list[str]] = []
    body_groups: list[list[str]] = []
    current: list[str] = []
    seen_hsep = hsep_idx is None  # headerless → everything is body
    for i, l in enumerate(lines):
        if _GRID_BORDER_RE.match(l) or (hsep_idx is not None and i == hsep_idx):
            if current:
                (body_groups if seen_hsep else header_groups).append(current)
                current = []
            if hsep_idx is not None and i == hsep_idx:
                seen_hsep = True
        else:
            current.append(l)
    if current:
        body_groups.append(current)

    def row_cells(group: list[str]) -> list[str]:
        per_line = [cells_of(l) for l in group]
        return [
            " ".join(filter(None, (pl[k] for pl in per_line))).strip()
            for k in range(ncols)
        ]

    parts = ["<table>"]
    for g in header_groups:
        parts.append(
            "<tr>" + "".join(
                _cell("th", inline(c), a) for c, a in zip(row_cells(g), aligns)
            ) + "</tr>"
        )
    for g in body_groups:
        parts.append(
            "<tr>" + "".join(
                _cell("td", inline(c), a) for c, a in zip(row_cells(g), aligns)
            ) + "</tr>"
        )
    parts.append("</table>")
    return "".join(parts)


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

    # pre-pass: collect reference-link + footnote definitions, drop their
    # lines. A footnote body may span multiple blocks: paragraphs indented
    # >= 4 spaces after the definition line belong to the note (pandoc
    # footnote continuation; lazy unindented continuation is out of subset).
    refs: dict[str, str] = {}
    fn_defs: dict[str, str] = {}
    body_lines: list[str] = []
    in_fence = False
    i = 0
    while i < len(lines):
        raw = lines[i]
        if _FENCE_RE.match(raw.strip()):
            in_fence = not in_fence
            body_lines.append(raw)
            i += 1
            continue
        d = None if in_fence else _REF_DEF_RE.match(raw)
        f = None if in_fence else _FN_DEF_RE.match(raw.strip())
        if f:
            first = f.group(2).strip()
            paras: list[str] = [first] if first else []
            j = i + 1
            pending_blank = False
            while j < len(lines):
                nxt = lines[j]
                if not nxt.strip():
                    pending_blank = True
                    j += 1
                    continue
                if len(nxt) - len(nxt.lstrip(" ")) >= 4:
                    seg = nxt.strip()
                    if pending_blank or not paras:
                        paras.append(seg)
                    else:
                        paras[-1] += " " + seg
                    pending_blank = False
                    j += 1
                else:
                    break
            if pending_blank:
                # the blank run we consumed still separates surrounding
                # blocks: put one blank back
                body_lines.append("")
            fn_defs.setdefault(f.group(1), "\n\n".join(paras))  # first def wins
            i = j
            continue
        elif d:
            refs[d.group(1).lower()] = _escape(d.group(2))
        else:
            body_lines.append(raw)
        i += 1

    # footnote numbering follows first-REFERENCE order (pandoc renumbers;
    # inline ^[...] notes share the same sequence in appearance order)
    fn_order: list[str] = []

    def _fn_anchor(n: int) -> str:
        return (
            f'<a href="#fn{n}" class="footnote-ref" id="fnref{n}" '
            f'role="doc-noteref"><sup>{n}</sup></a>'
        )

    def fn_sub(label: str) -> str | None:
        if label not in fn_defs:
            return None
        if label not in fn_order:
            fn_order.append(label)
        return _fn_anchor(fn_order.index(label) + 1)

    def note_sub(body: str) -> str:
        key = f"\x02inline-{len(fn_defs)}"
        fn_defs[key] = body.strip()
        fn_order.append(key)
        return _fn_anchor(len(fn_order))

    def inline(text: str) -> str:
        return _inline(text, refs, fn_sub, note_sub)

    used_ids: set[str] = set()

    def heading(level: int, text: str) -> str:
        """Heading with pandoc header_attributes + auto_identifiers."""
        ident: str | None = None
        classes: list[str] = []
        kvs: list[tuple[str, str]] = []
        am = _ATTR_BLOCK_RE.search(text)
        if am:
            ident, classes, kvs = _parse_attr_block(am.group(1))
            text = text[: am.start()].strip()
        body = inline(text)
        if ident is None:
            plain = _plain_text(_FN_ANCHOR_RE.sub("", body))
            ident = _unique_id(_auto_identifier(plain), used_ids)
        else:
            used_ids.add(ident)
        attrs = f' id="{_escape(ident)}"'
        if classes:
            attrs += f' class="{_escape(" ".join(classes))}"'
        for k, v in kvs:
            attrs += f' {k}="{_escape(v)}"'
        return f"<h{level}{attrs}>{body}</h{level}>"

    out: list[str] = []
    paragraph: list[str] = []
    lists = _ListStack(inline)
    table_rows: list[str] = []
    code_lines: list[str] | None = None  # inside a fence when not None
    fence_attrs = ""  # attribute string of the open fence's <pre>
    deflist: list[tuple[str, list[str]]] = []  # [(term, [definitions])]
    line_block: list[str] | None = None
    grid_rows: list[str] | None = None  # inside a grid table when not None

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
        # is a body row (pandoc's headerless table). Colons in the separator
        # carry column alignment (`:--` left, `--:` right, `:-:` center) →
        # style="text-align: ..." on th/td, pandoc's HTML5 shape.
        header: list[str] | None = None
        aligns: list[str | None] = []
        if len(rows) >= 2 and _TABLE_SEP_RE.match(rows[1]):
            header = _split_table_row(rows[0])
            aligns = _parse_aligns(_split_table_row(rows[1]))
            rows = rows[2:]

        def _aligned(cells: list[str], tag: str) -> str:
            padded = aligns + [None] * (len(cells) - len(aligns))
            return "".join(_cell(tag, inline(c), a) for c, a in zip(cells, padded))

        parts = ["<table>"]
        if header is not None:
            parts.append("<tr>" + _aligned(header, "th") + "</tr>")
        for r in rows:
            parts.append("<tr>" + _aligned(_split_table_row(r), "td") + "</tr>")
        parts.append("</table>")
        out.append("".join(parts))

    def flush_grid():
        nonlocal grid_rows
        if grid_rows is not None:
            out.append(_render_grid_table(grid_rows, inline))
            grid_rows = None

    for raw in body_lines:
        line = raw.rstrip()
        stripped = line.strip()

        if code_lines is not None:  # inside a fenced code block
            if _FENCE_RE.match(stripped):
                out.append(
                    f"<pre{fence_attrs}><code>{_escape(chr(10).join(code_lines))}</code></pre>"
                )
                code_lines = None
            else:
                code_lines.append(line)
            continue

        if grid_rows is not None:  # inside a grid table
            if _GRID_LINE_RE.match(stripped):
                grid_rows.append(stripped)
                continue
            flush_grid()  # table ended; fall through to process this line
        elif _GRID_BORDER_RE.match(stripped):
            flush_deflist()
            flush_paragraph()
            flush_list()
            grid_rows = [stripped]
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
            # fenced_code_attributes: ```python (bare language class) or
            # ```{.python .numberLines #id key=val}
            info = stripped.lstrip("`").strip()
            fence_attrs = ""
            if info.startswith("{") and info.endswith("}"):
                ident, classes, kvs = _parse_attr_block(info[1:-1])
                if ident:
                    fence_attrs += f' id="{_escape(ident)}"'
                if classes:
                    fence_attrs += f' class="{_escape(" ".join(classes))}"'
                for k, v in kvs:
                    fence_attrs += f' {k}="{_escape(v)}"'
            elif info:
                fence_attrs = f' class="{_escape(info.split()[0])}"'
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
            out.append(heading(1, " ".join(paragraph)))
            paragraph.clear()
        elif paragraph and _SETEXT_H2_RE.match(stripped):
            out.append(heading(2, " ".join(paragraph)))
            paragraph.clear()
        elif m:
            flush_deflist()
            flush_paragraph()
            flush_list()
            out.append(heading(len(m.group(1)), m.group(2).strip()))
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
        out.append(f"<pre{fence_attrs}><code>{_escape(chr(10).join(code_lines))}</code></pre>")
    flush_deflist()
    flush_paragraph()
    flush_list()
    flush_table()
    flush_line_block()
    flush_grid()
    if fn_order:
        # pandoc's HTML5 endnotes section: <section class="footnotes"> with
        # an <ol> of notes; multi-block bodies render one <p> per paragraph
        # and the backref anchor closes the LAST paragraph
        def _fn_item(i: int, lab: str) -> str:
            backref = (
                f'<a href="#fnref{i + 1}" class="footnote-back" '
                f'role="doc-backref">↩︎</a>'
            )
            paras = [p for p in fn_defs[lab].split("\n\n") if p] or [""]
            ps = [f"<p>{inline(p)}</p>" for p in paras]
            ps[-1] = ps[-1][: -len("</p>")] + backref + "</p>"
            return f'<li id="fn{i + 1}">{"".join(ps)}</li>'

        items = "".join(_fn_item(i, lab) for i, lab in enumerate(fn_order))
        out.append(
            '<section class="footnotes footnotes-end-of-document" '
            f'role="doc-endnotes"><hr /><ol>{items}</ol></section>'
        )
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
