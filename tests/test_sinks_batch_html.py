"""Tests for sinks/summaries (S5-S7/A1/A4/J9/D6), batch-API plumbing (S3/S4),
and the md→html + block transformer (M11/M12)."""

import datetime

import pyarrow as pa

import ray.data as rd

from decisions_knowledge_graph_data_ray.functions import html as H
from decisions_knowledge_graph_data_ray.stages import batch_api as B


# ---------------------------------------------------------------------------
# html (M11/M12)
# ---------------------------------------------------------------------------


def test_markdown_to_html_basic():
    md = "# Title\n\nFirst paragraph **bold** here.\n\n> quoted text\n\n- item one\n- item two"
    html = H.markdown_to_html(md)
    assert '<h1 id="title">Title</h1>' in html
    assert "<p>First paragraph <strong>bold</strong> here.</p>" in html
    assert "<blockquote><p>quoted text</p></blockquote>" in html
    assert "<li>item one</li>" in html


def test_markdown_to_html_extended_subset():
    md = (
        "1. first\n2. second\n\n"
        "| Col A | Col B |\n| --- | --- |\n| a1 | b1 |\n| a2 | b2 |\n\n"
        "---\n\n"
        "See [the act](https://example.org/act) and `art. 5`."
    )
    html = H.markdown_to_html(md)
    assert "<ol><li>first</li><li>second</li></ol>" in html
    assert "<table><tr><th>Col A</th><th>Col B</th></tr>" in html
    assert "<tr><td>a1</td><td>b1</td></tr><tr><td>a2</td><td>b2</td></tr></table>" in html
    assert "<hr />" in html
    assert '<a href="https://example.org/act">the act</a>' in html
    assert "<code>art. 5</code>" in html


def test_markdown_table_cells_become_blocks():
    # td/th cells from a pipe table flow through the block transformer
    md = "| H |\n| --- |\n| cell text |"
    res = H.transform_html_blocks("T", H.markdown_to_html(md))
    texts = {b["plain_text"]: b["element_type"] for b in res["blocks"]}
    assert texts == {"H": "th", "cell text": "td"}


def test_markdown_mixed_list_types_split():
    md = "- a\n- b\n1. c\n2. d"
    html = H.markdown_to_html(md)
    assert "<ul><li>a</li><li>b</li></ul>" in html
    assert "<ol><li>c</li><li>d</li></ol>" in html


def test_markdown_headerless_table():
    md = "| only | body |\n| row2 | here |"
    html = H.markdown_to_html(md)
    assert "<th>" not in html
    assert "<tr><td>only</td><td>body</td></tr>" in html


def test_transform_html_blocks_stamps_sequential_ids():
    html = "<p>one</p><h2>two</h2><p></p><p>three</p>"
    res = H.transform_html_blocks("DOC1", html)
    assert res["total_blocks"] == 3  # empty <p> skipped
    assert [b["block_id"] for b in res["blocks"]] == [
        "DOC1:block-001", "DOC1:block-002", "DOC1:block-003",
    ]
    assert res["blocks"][1]["element_type"] == "h2"
    assert 'data-id="DOC1:block-001"' in res["transformed_html"]


def test_blocks_roundtrip():
    md = "# T\n\npara one here.\n\npara two here."
    res = H.transform_html_blocks("D", H.markdown_to_html(md))
    back = H.extract_blocks_from_transformed(res["transformed_html"])
    assert [b["block_id"] for b in back] == [b["block_id"] for b in res["blocks"]]
    assert [b["plain_text"] for b in back] == [b["plain_text"] for b in res["blocks"]]


# ---------------------------------------------------------------------------
# batch api (S3/S4/M5/M16)
# ---------------------------------------------------------------------------


def test_salvage_parse_json_paths():
    assert B.salvage_parse_json('{"a": 1}') == {"a": 1}
    assert B.salvage_parse_json('text ```json\n{"a": 2}\n``` more') == {"a": 2}
    assert B.salvage_parse_json('prefix {"a": 3} suffix') == {"a": 3}
    assert B.salvage_parse_json("no json at all") is None
    assert B.salvage_parse_json("x" * 200_000) is None  # 100KB cap
    assert B.salvage_parse_json("[1,2]") is None  # dict required


def test_custom_id_deterministic_not_positional():
    a = B.custom_id_for("extract", "CONV:BE:000001")
    assert a == B.custom_id_for("extract", "CONV:BE:000001")
    assert a != B.custom_id_for("extract", "CONV:BE:000002")
    assert a.startswith("extract-")
    assert a.endswith("CONV:BE:000001")


def test_batch_request_response_roundtrip(ray_session, tmp_path):
    docs = rd.from_items(
        [
            {"conv_id": "C1", "text": "hello"},
            {"conv_id": "C2", "text": "world"},
        ]
    )
    reqs = B.to_batch_requests(docs, "job1", "Extract from: {text}")
    out = str(tmp_path / "reqs")
    B.write_batch_requests(reqs, out)
    back = rd.read_json(out).to_pandas()
    assert len(back) == 2
    assert set(back.columns) == {"custom_id", "method", "body"}

    responses = rd.from_items(
        [
            {"custom_id": B.custom_id_for("job1", "C1"), "content": '{"k": 1}', "finish_reason": "stop"},
            {"custom_id": B.custom_id_for("job1", "C2"), "content": "garbage", "finish_reason": "stop"},
            {"custom_id": "x", "content": '{"k": 2}', "finish_reason": "length"},
        ]
    )
    parsed = B.parse_batch_responses(responses).to_pandas()
    # key by custom_id: block order is not guaranteed under load
    got = {r.custom_id: (r.ok, r.error) for r in parsed.itertuples()}
    assert got[B.custom_id_for("job1", "C1")] == (True, "")
    assert got[B.custom_id_for("job1", "C2")][0] is not True
    assert got["x"] == (False, "finish_reason=length")


# ---------------------------------------------------------------------------
# sinks / summaries / upsert / anti-join
# ---------------------------------------------------------------------------


def test_run_summary_and_failure_histogram(ray_session):
    from decisions_knowledge_graph_data_ray.stages.sinks import run_summary

    rows = [
        {"conv_id": "a", "valid": True, "failure_reason": ""},
        {"conv_id": "b", "valid": True, "failure_reason": ""},
        {"conv_id": "c", "valid": False, "failure_reason": "Schema Validation"},
        {"conv_id": "d", "valid": False, "failure_reason": "Request Error"},
        {"conv_id": "e", "valid": False, "failure_reason": "Schema Validation"},
    ]
    s = run_summary(rd.from_items(rows))
    assert s["total"] == 5 and s["successful"] == 2 and s["failed"] == 3
    assert abs(s["success_rate"] - 0.4) < 1e-9
    assert s["errors_by_type"] == {"Schema Validation": 2, "Request Error": 1}


def test_citation_statistics(ray_session, tiny_transcripts, world):
    import ray.data as rd2

    from decisions_knowledge_graph_data_ray.pipelines.kg import run_kg_pipeline
    from decisions_knowledge_graph_data_ray.stages.sinks import citation_statistics

    res = run_kg_pipeline(rd2.from_arrow(tiny_transcripts))
    stats = citation_statistics(res["extractions"]).to_pandas()
    dims = set(stats["dimension"])
    assert dims == {"treatment", "jurisdiction", "confidence"}
    assert (stats["n"] > 0).all()


def test_upsert_latest(ray_session):
    from decisions_knowledge_graph_data_ray.stages.sinks import upsert_latest

    t0 = datetime.datetime(2026, 1, 1)
    t1 = datetime.datetime(2026, 1, 2)
    base = rd.from_items(
        [
            {"key": "a", "ts": t0, "value": "old-a"},
            {"key": "b", "ts": t0, "value": "old-b"},
        ]
    )
    overlay = rd.from_items(
        [
            {"key": "a", "ts": t1, "value": "new-a"},  # newer → wins
            {"key": "b", "ts": t0, "value": "retry-b"},  # tie → overlay wins
            {"key": "c", "ts": t0, "value": "new-c"},  # new key
        ]
    )
    out = upsert_latest(base, overlay, "key", "ts").to_pandas().sort_values("key")
    assert dict(zip(out["key"], out["value"])) == {"a": "new-a", "b": "retry-b", "c": "new-c"}


def test_anti_join_processed(ray_session):
    from decisions_knowledge_graph_data_ray.stages.sinks import anti_join_processed

    ds = rd.from_items([{"conv_id": f"C{i}"} for i in range(10)])
    out = anti_join_processed(ds, {"C1", "C3", "C5"}, "conv_id").to_pandas()
    assert len(out) == 7
    assert set(out["conv_id"]).isdisjoint({"C1", "C3", "C5"})


def test_write_triples_partitioned(ray_session, tmp_path):
    import glob

    from decisions_knowledge_graph_data_ray.stages.sinks import write_triples

    triples = rd.from_items(
        [
            {"subj": f"s{i}", "pred": "p", "obj": f"o{i}", "conv_id": "c", "score": None}
            for i in range(100)
        ]
    )
    out = str(tmp_path / "graph")
    write_triples(triples, out, num_shards=4)
    shard_dirs = glob.glob(f"{out}/shard=*")
    assert len(shard_dirs) >= 2  # hash-partitioned directories
    back = rd.read_parquet(out)
    assert back.count() == 100


def test_markdown_nested_lists():
    md = "- a\n  - a1\n  - a2\n- b\n"
    html = H.markdown_to_html(md)
    assert html == "<ul><li>a<ul><li>a1</li><li>a2</li></ul></li><li>b</li></ul>"
    md2 = "1. first\n   - x\n   - y\n2. second\n"
    html2 = H.markdown_to_html(md2)
    assert html2 == "<ol><li>first<ul><li>x</li><li>y</li></ul></li><li>second</li></ol>"
    # three levels deep, closing two levels at once
    md3 = "- a\n  - b\n    - c\n- d\n"
    assert (
        H.markdown_to_html(md3)
        == "<ul><li>a<ul><li>b<ul><li>c</li></ul></li></ul></li><li>d</li></ul>"
    )


def test_markdown_setext_headings():
    md = "Title line\n====\n\nSub heading\n---\n\nplain para\n"
    html = H.markdown_to_html(md)
    assert '<h1 id="title-line">Title line</h1>' in html
    assert '<h2 id="sub-heading">Sub heading</h2>' in html
    assert "<p>plain para</p>" in html
    # a dash rule with no pending paragraph stays a horizontal rule
    assert "<hr />" not in html
    assert "<hr />" in H.markdown_to_html("para\n\n---\n")


def test_markdown_reference_links():
    md = "See [the act][loi] and [short][].\n\n[loi]: https://example.org/loi\n[short]: https://example.org/s\n"
    html = H.markdown_to_html(md)
    assert '<a href="https://example.org/loi">the act</a>' in html
    assert '<a href="https://example.org/s">short</a>' in html
    # unknown label stays literal
    assert "[nope][missing]" in H.markdown_to_html("x [nope][missing] y\n")


def test_markdown_fenced_code_and_html_passthrough():
    md = "before\n\n```\ncode *not em* & <raw>\n```\n\n<div class=\"x\">kept</div>\n"
    html = H.markdown_to_html(md)
    assert "<pre><code>code *not em* &amp; &lt;raw&gt;</code></pre>" in html
    assert '<div class="x">kept</div>' in html
    # reference-style definitions inside fences are NOT link definitions
    md2 = "```\n[label]: https://example.org\n```\n"
    assert "[label]: https://example.org" in H.markdown_to_html(md2)


def test_markdown_definition_lists_line_blocks_smart():
    """Round-4 M11 widening: definition lists, line blocks, smart
    punctuation (pandoc `--from markdown` has the smart extension ON —
    markdownToHtml.ts:55-60)."""
    # definition list: multiple defs per term, multiple terms, one <dl>
    html = H.markdown_to_html(
        "Term A\n:   first def\n:   second def\nTerm B\n:   only def\n\nafter"
    )
    assert html.splitlines() == [
        "<dl><dt>Term A</dt><dd>first def</dd><dd>second def</dd>"
        "<dt>Term B</dt><dd>only def</dd></dl>",
        "<p>after</p>",
    ]
    # paragraph before the term stays a paragraph, in order
    assert H.markdown_to_html("intro\nTerm\n:   def").splitlines() == [
        "<p>intro</p>",
        "<dl><dt>Term</dt><dd>def</dd></dl>",
    ]
    # line block (single leading pipe is NOT a table row)
    assert (
        H.markdown_to_html("| line one\n| line two\n\npara").splitlines()[0]
        == '<div class="line-block">line one<br />line two</div>'
    )
    # smart punctuation: quotes, apostrophes, dashes, ellipsis
    assert H.markdown_to_html('He said "hi" -- it\'s l\'article... done---now') == (
        "<p>He said “hi” – it’s l’article… done—now</p>"
    )
    # code spans keep straight punctuation
    assert H.markdown_to_html("run `--flag 'x'` now") == (
        "<p>run <code>--flag 'x'</code> now</p>"
    )
    # pipe tables still win over line blocks
    assert "<table>" in H.markdown_to_html("| a | b |\n|---|---|\n| 1 | 2 |")


def test_smart_punctuation_never_touches_urls():
    """Pandoc smartens link TEXT but never the target: URLs containing
    --, ..., or apostrophes must survive verbatim."""
    html = H.markdown_to_html("see [it's \"docs\"](https://ex.com/a--b/c...d/it's)")
    assert 'href="https://ex.com/a--b/c...d/it\'s"' in html
    assert "it’s “docs”" in html  # link text IS smartened


def test_definition_list_interrupted_by_paragraph_keeps_source_order():
    html = H.markdown_to_html("T1\n:   d1\nintro text\nT2\n:   d2")
    assert html.splitlines() == [
        "<dl><dt>T1</dt><dd>d1</dd></dl>",
        "<p>intro text</p>",
        "<dl><dt>T2</dt><dd>d2</dd></dl>",
    ]


def test_markdown_footnotes_golden():
    """Footnotes (markdownToHtml.ts runs full pandoc; this is the HTML5
    endnotes shape): numbered by first reference, sup anchors, backrefs."""
    md = (
        "Een eerste zin.[^noot] En nog een verwijzing[^b].\n"
        "\n"
        "Tweede alinea verwijst opnieuw.[^noot]\n"
        "\n"
        "[^b]: Tweede noot met **nadruk**.\n"
        "[^noot]: Eerste noot.\n"
    )
    html = H.markdown_to_html(md)
    # numbering follows first-REFERENCE order: noot=1, b=2
    assert (
        '<a href="#fn1" class="footnote-ref" id="fnref1" role="doc-noteref">'
        "<sup>1</sup></a>" in html
    )
    assert "<sup>2</sup></a>." in html
    # the repeated reference reuses number 1
    assert html.count('href="#fn1"') == 2
    sec = html.split("<section", 1)[1]
    assert '<li id="fn1"><p>Eerste noot.' in sec
    assert "<strong>nadruk</strong>" in sec
    assert '<a href="#fnref1" class="footnote-back" role="doc-backref">↩︎</a>' in sec
    # undefined labels stay literal
    assert "[^missing]" in H.markdown_to_html("tekst[^missing] zonder definitie")


def test_markdown_pipe_table_alignment_golden():
    md = "| L | R | C | D |\n|:---|---:|:--:|---|\n| a | b | c | d |\n"
    html = H.markdown_to_html(md)
    assert '<th style="text-align: left;">L</th>' in html
    assert '<th style="text-align: right;">R</th>' in html
    assert '<th style="text-align: center;">C</th>' in html
    assert "<th>D</th>" in html  # default alignment carries no style
    assert '<td style="text-align: left;">a</td>' in html
    assert "<td>d</td>" in html


def test_markdown_grid_table_golden():
    md = (
        "+---------------+----------+\n"
        "| Vrucht        | Prijs    |\n"
        "+:==============+=========:+\n"
        "| Banaan        | $1.34    |\n"
        "+---------------+----------+\n"
        "| lange cel     | $2.10    |\n"
        "| over twee     |          |\n"
        "+---------------+----------+\n"
        "\n"
        "Naloopalinea.\n"
    )
    html = H.markdown_to_html(md)
    assert '<th style="text-align: left;">Vrucht</th>' in html
    assert '<th style="text-align: right;">Prijs</th>' in html
    assert '<td style="text-align: left;">Banaan</td>' in html
    # multi-line cell joins with a single space
    assert "lange cel over twee" in html
    assert "<p>Naloopalinea.</p>" in html


def test_markdown_grid_table_headerless():
    md = (
        "+------+------+\n"
        "| a    | b    |\n"
        "+------+------+\n"
        "| c    | d    |\n"
        "+------+------+\n"
    )
    html = H.markdown_to_html(md)
    assert "<th" not in html
    assert "<td>a</td>" in html and "<td>d</td>" in html


def test_footnote_and_table_blocks_flow_through_transformer():
    """The block transformer sees footnote <li>s and aligned <td>s as leaf
    blocks like any other (M12 shape holds for the new constructs)."""
    md = (
        "Intro.[^1]\n\n| X |\n|---:|\n| y |\n\n[^1]: De noot.\n"
    )
    res = H.transform_html_blocks("D", H.markdown_to_html(md))
    kinds = [b["element_type"] for b in res["blocks"]]
    texts = [b["plain_text"] for b in res["blocks"]]
    assert "th" in kinds and "td" in kinds and "li" in kinds
    assert any("De noot." in t for t in texts)


def test_markdown_heading_attribute_blocks():
    from decisions_knowledge_graph_data_ray.functions.html import markdown_to_html

    html = markdown_to_html(
        '## Scope {#scope .special note="two words"}\n\n'
        "# Conclusion {-}\n\n"
        "Setext {#sx}\n====\n"
    )
    assert '<h2 id="scope" class="special" note="two words">Scope</h2>' in html
    assert '<h1 id="conclusion" class="unnumbered">Conclusion</h1>' in html
    assert '<h1 id="sx">Setext</h1>' in html


def test_markdown_auto_identifiers():
    from decisions_knowledge_graph_data_ray.functions.html import markdown_to_html

    html = markdown_to_html("# Dup\n\n# Dup\n\n### 1. Numbered Start\n\n# ***\n")
    assert '<h1 id="dup">Dup</h1>' in html
    assert '<h1 id="dup-1">Dup</h1>' in html
    # identifier drops everything up to the first letter (pandoc rule)
    assert '<h3 id="numbered-start">1. Numbered Start</h3>' in html
    # nothing left -> 'section'
    assert '<h1 id="section">***</h1>' in html


def test_markdown_inline_notes_golden():
    """pandoc inline_notes: ^[body] shares the footnote numbering sequence
    with [^label] refs in left-to-right appearance order."""
    md = "A^[first] and B[^r] and C^[third *em*].\n\n[^r]: second ref\n"
    html = H.markdown_to_html(md)
    import re as _re

    assert _re.findall(r'#fn(\d)" class="footnote-ref"', html) == ["1", "2", "3"]
    sec = html.split("<section", 1)[1]
    assert '<li id="fn1"><p>first<a href="#fnref1"' in sec
    assert '<li id="fn2"><p>second ref<a href="#fnref2"' in sec
    assert "<em>em</em>" in sec  # note bodies get inline formatting
    # a link inside a note body renders in the endnotes, not inline
    html2 = H.markdown_to_html("zie^[de [bron](http://x.y/a) hier].")
    assert '<a href="http://x.y/a">bron</a>' in html2.split("<section", 1)[1]


def test_markdown_multiblock_footnote_golden():
    """4-space-indented continuation paragraphs belong to the footnote;
    the backref closes the LAST paragraph (pandoc)."""
    md = (
        "Ref[^a]. Tussen[^b].\n"
        "\n"
        "[^a]: para one\n"
        "    continues.\n"
        "\n"
        "    para two.\n"
        "\n"
        "Next paragraph.\n"
        "\n"
        "[^b]: single.\n"
    )
    html = H.markdown_to_html(md)
    assert "<p>Next paragraph.</p>" in html
    sec = html.split("<section", 1)[1]
    assert "<p>para one continues.</p><p>para two." in sec
    # backref on the last paragraph only
    li_a = sec.split('<li id="fn1">', 1)[1].split("</li>", 1)[0]
    assert li_a.count("footnote-back") == 1 and li_a.endswith(
        'role="doc-backref">↩︎</a></p>'
    )
    assert '<li id="fn2"><p>single.<a href="#fnref2"' in sec


def test_markdown_fence_attributes_golden():
    """fenced_code_attributes: bare info word -> language class; full
    {...} block -> id/classes/key-vals on <pre>."""
    assert '<pre class="python"><code>x = 1</code></pre>' in H.markdown_to_html(
        "```python\nx = 1\n```"
    )
    html = H.markdown_to_html('```{.python .numberLines #code1 start="5"}\ny < 2\n```')
    assert '<pre id="code1" class="python numberLines" start="5"><code>y &lt; 2</code></pre>' in html
    # bare fence unchanged; info never leaks into the body
    assert "<pre><code>plain</code></pre>" in H.markdown_to_html("```\nplain\n```")
