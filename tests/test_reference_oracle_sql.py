"""The SQL port of normalize_text is string-exact vs the Python normalizer.

normalize_text (functions/reference_extractor.py:42-48, a behavioral port of
referenceExtractorN8N.ts:77-87) uses zero-width lookaheads and re.sub's
sequential consuming scan — neither exists in DuckDB's RE2. The oracle for
kg_references instead uses a closed form (__ray_entry__._norm_docs_ctes):
sentinel-split URL de-spacing and token-chain-parity broken-word collapse.
These tests pin the equivalence on crafted edge cases, adversarial fuzz, and
the sf0.001 corpus; tools/check_oracle.py then hash-gates the full
kg_references query at sf0.01.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from decisions_knowledge_graph_data_ray.functions.reference_extractor import (
    extract_references,
    normalize_text,
)

import __ray_entry__ as entry


def _sql_normalize(texts: list[str]) -> list[str]:
    """Run the oracle's normalize CTE chain over arbitrary strings."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE raw (conv_id INT, dtext VARCHAR)"
    )
    con.executemany(
        "INSERT INTO raw VALUES (?, ?)", list(enumerate(texts))
    )
    rows = con.execute(
        f"""
        WITH docs AS (SELECT conv_id, dtext FROM raw),
        {entry._norm_from_docs_ctes()}
        SELECT d.conv_id, coalesce(n.ntext, d.dtext)
        FROM docs d LEFT JOIN norm n USING (conv_id)
        ORDER BY d.conv_id
        """
    ).fetchall()
    out = {cid: t for cid, t in rows}
    return [out[i] for i in range(len(texts))]


EDGE_CASES = [
    "",
    "a",
    "a b",
    "a b c",
    "a b c d e f",  # chain parity: alternating collapse
    "article 6 du Code civil",  # single-char token chain via the digit
    "op 12 januari 2020",
    "werd het middel verworpen.",
    "numac 1990A12345 werd gepubliceerd.",
    "CELEX: 32016R0679 / numac 2001B00042.",
    "Voir https://www.ejustice.just.fgov.be/cgi?cn_search=1990061201 pour le texte.",
    "https://eur-lex.europa.eu/legal-content/FR/TXT/?uri=CELEX:32016R0679 et la suite",
    "http://a b c  double space ends the url span",
    "https://x https://y deux urls",
    "https://glued.example/ahttps://second.example/b no space between",
    "trailing url https://end.example/x",
    "l'article 6, §1 EVRM",  # punctuation + non-ASCII § and word chars
    "intégral après é accenté",  # non-ASCII letters count as punct under re.ASCII
    "a  b (double space, no collapse across)",
    "1 2 3 4 5 6 7 8 9",  # all single-char tokens: maximal chain
    "w. x. y. z.",
    "a\nb\nc\nd",  # newline gaps
    "Deze zaak ECLI:BE:CASS:2020:ARR.123 betreft.",
]


def test_sql_normalize_edge_cases():
    got = _sql_normalize(EDGE_CASES)
    want = [normalize_text(t) for t in EDGE_CASES]
    for raw, g, w in zip(EDGE_CASES, got, want):
        assert g == w, f"divergence on {raw!r}:\n  py : {w!r}\n  sql: {g!r}"


def test_sql_normalize_fuzz():
    rng = random.Random(20260819)
    parts = [
        "https://a", "http://b c", "x", "ab", "abc", "abcd", "1", "12",
        "  ", " ", "\n", "\n\n", "a b c d e f", "6,", "w.", "§1", "é",
        "CELEX: 32016R0679", "numac 1990A12345", "/eli/x/y/z/2001000042",
    ]
    cases = [
        "".join(rng.choice(parts) for _ in range(rng.randrange(0, 10)))
        for _ in range(400)
    ]
    got = _sql_normalize(cases)
    want = [normalize_text(t) for t in cases]
    bad = [(c, w, g) for c, w, g in zip(cases, want, got) if w != g]
    assert not bad, f"{len(bad)} divergent, first: {bad[0]!r}"


def test_sql_normalize_corpus_sf0001():
    from decisions_knowledge_graph_data_ray.sources.transcripts import (
        transcripts_path,
    )

    path = transcripts_path("/root/testdata/sf0.001")
    con = duckdb.connect()
    docs = con.execute(
        f"""SELECT conv_id,
                   string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx)
            FROM read_parquet('{path}') GROUP BY conv_id ORDER BY conv_id"""
    ).fetchall()
    got = _sql_normalize([d for _, d in docs])
    for (cid, doc), g in zip(docs, got):
        assert g == normalize_text(doc), f"divergence in {cid}"


def test_sql_references_match_python_sf0001(tmp_path):
    """End-to-end: the references CTE chain equals extract_references on the
    sf0.001 corpus (the sf0.01 hash gate runs in tools/check_oracle.py)."""
    from decisions_knowledge_graph_data_ray.sources.transcripts import (
        transcripts_path,
    )

    path = transcripts_path("/root/testdata/sf0.001")
    con = duckdb.connect()
    sql = entry._kg_references_sql().replace(
        entry._sf001_transcripts_path(), path
    )
    sql_rows = con.execute(sql).fetchall()

    docs = con.execute(
        f"""SELECT conv_id,
                   string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx)
            FROM read_parquet('{path}') GROUP BY conv_id"""
    ).fetchall()
    py_rows = sorted(
        (cid, kind, v)
        for cid, doc in docs
        for kind, vals in extract_references(doc).items()
        for v in vals
    )
    assert sql_rows == py_rows
