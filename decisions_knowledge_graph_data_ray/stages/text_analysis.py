"""Text-analysis stages over a documents table (doc_id, text, ...).

Vectorized ``map_batches`` transforms: language ID, quality scoring, token
counting, fingerprinting. Definitions live in functions/text_stats.py and
are mirrored by the DuckDB oracle SQL in __ray_entry__ where expressible.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions import text_stats as T

# lowercase word tokens for tf-idf / repetition (the prep.py convention:
# SQL-reproducible as regexp_extract_all(lower(text), '[a-z0-9]+'))
import re

_WORD_RE = re.compile(r"[a-z0-9]+")


def _token_counts(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    return batch.append_column(
        "n_ws_tokens", pa.array([T.whitespace_token_count(t) for t in texts], pa.int64())
    ).append_column(
        "n_word_tokens", pa.array([T.word_token_count(t) for t in texts], pa.int64())
    )


def token_counts(docs: ray.data.Dataset) -> ray.data.Dataset:
    """doc_id + whitespace / BPE-ish token counts."""
    return docs.map_batches(_token_counts, batch_format="pyarrow")


def _lang_id(batch: pa.Table) -> pa.Table:
    return batch.append_column(
        "lang_pred", pa.array([T.detect_language(t) for t in batch["text"].to_pylist()], pa.string())
    )


def language_id(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(_lang_id, batch_format="pyarrow")


def _quality(batch: pa.Table) -> pa.Table:
    metrics = [T.quality_metrics(t) for t in batch["text"].to_pylist()]
    for name, typ in (
        ("n_chars", pa.int64()),
        ("n_tokens", pa.int64()),
        ("punct_ratio", pa.float64()),
        ("stop_ratio", pa.float64()),
        ("mean_token_len", pa.float64()),
        ("keep", pa.bool_()),
    ):
        batch = batch.append_column(name, pa.array([m[name] for m in metrics], typ))
    return batch


def quality_score(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(_quality, batch_format="pyarrow")


def _fingerprint(batch: pa.Table) -> pa.Table:
    fps = [T.document_fingerprint(t) for t in batch["text"].to_pylist()]
    return batch.append_column("fingerprint", pa.array([f & 0x7FFFFFFFFFFFFFFF for f in fps], pa.int64()))


def fingerprints(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Winnowing-style rolling-hash fingerprints (mod 2^63 to stay int64)."""
    return docs.map_batches(_fingerprint, batch_format="pyarrow")


def length_histogram(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Bucketed doc-length histogram — partial-aggregate inside map_batches
    (one row per bucket per batch), then a tiny groupby (A3 analogue)."""
    from ..functions.normalize import length_category

    def _partial(batch: pa.Table) -> pa.Table:
        cats = [length_category(len(t)) for t in batch["text"].to_pylist()]
        counts: dict[str, int] = {}
        for c in cats:
            counts[c] = counts.get(c, 0) + 1
        return pa.table(
            {"length_category": list(counts.keys()), "partial_n": list(counts.values())}
        )

    from ray.data.aggregate import Sum

    return (
        docs.map_batches(_partial, batch_format="pyarrow")
        .groupby("length_category")
        .aggregate(Sum("partial_n", alias_name="n_docs"))
    )


def tfidf_top_terms(
    docs: ray.data.Dataset,
    top_k: int = 3,
    min_df: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-document top-k keyword terms by tf-idf (tf × ln(N/df)).

    Scale shape: the document-frequency table is built combiner-first (one
    partial row per distinct token per batch, then a groupby Sum — the
    ``vocabulary`` discipline, so the shuffle is bounded by |vocab| per
    batch, never raw tokens), collected once on the driver and broadcast
    via ``ray.put``; scoring is then a single streaming map over the
    corpus. The broadcast is O(|vocab|) — bound it with ``min_df`` (rare
    tokens are the bulk of any natural vocabulary; they can't score docs
    they don't appear in once pruned).

    Float contract: ``tf * math.log(N/df)`` is bit-identical to DuckDB's
    ``tf * ln(CAST(N AS DOUBLE)/df)`` (same libm double path — verified),
    so the (tfidf DESC, token ASC) ranking agrees exactly with the oracle.
    """
    import math
    from collections import Counter

    from ray.data.aggregate import Sum

    import ray as _ray

    n_docs = docs.count()

    def _df_partial(batch: pa.Table) -> pa.Table:
        dfs: Counter = Counter()
        for t in batch[text_col].to_pylist():
            dfs.update(set(_WORD_RE.findall(t.lower())))
        toks = list(dfs)
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "df": pa.array([dfs[t] for t in toks], pa.int64()),
            }
        )

    df_tbl = (
        docs.map_batches(_df_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
    )
    df_map: dict[str, int] = {}
    for blk in df_tbl.iter_batches(batch_format="pyarrow", batch_size=None):
        for tok, df in zip(blk["token"].to_pylist(), blk["df"].to_pylist()):
            if df >= min_df:
                df_map[tok] = df
    df_ref = _ray.put(df_map)

    def _score(batch: pa.Table) -> pa.Table:
        from .broadcast import broadcast_cache

        dfm = broadcast_cache(df_ref)  # one ray.get per worker
        ids, ranks, toks, tfs, dfs, scores = [], [], [], [], [], []
        for doc_id, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            tf = Counter(_WORD_RE.findall(text.lower()))
            scored = [
                (t, c, dfm[t], c * math.log(n_docs / dfm[t]))
                for t, c in tf.items()
                if t in dfm
            ]
            scored.sort(key=lambda r: (-r[3], r[0]))
            for rank, (t, c, df, s) in enumerate(scored[:top_k], start=1):
                ids.append(doc_id)
                ranks.append(rank)
                toks.append(t)
                tfs.append(c)
                dfs.append(df)
                scores.append(s)
        return pa.table(
            {
                id_col: pa.array(ids),
                "rank": pa.array(ranks, pa.int64()),
                "token": pa.array(toks, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
                "df": pa.array(dfs, pa.int64()),
                "tfidf": pa.array(scores, pa.float64()),
            }
        )

    return docs.map_batches(_score, batch_format="pyarrow")


def repetition_stats(
    docs: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Gopher-style within-document repetition signals — pure vectorized
    map, no shuffle at any scale. Per document:

    - ``ttr``: type-token ratio (distinct words / words)
    - ``top_word_share``: most-frequent word's share of all words
    - ``dup_2gram_frac``: fraction of word-2-gram occurrences that are
      repeats (1 - distinct/total)

    All three are exact int/int double divisions, so the DuckDB oracle
    reproduces them bit-for-bit. Empty/one-word documents report 0.0 (no
    repetition evidence), matching the oracle's CASE guards.
    """
    from collections import Counter

    def _stats(batch: pa.Table) -> pa.Table:
        n_words, n_distinct, ttr, top_share, dup2 = [], [], [], [], []
        for text in batch[text_col].to_pylist():
            words = _WORD_RE.findall(text.lower())
            n = len(words)
            c = Counter(words)
            grams = [f"{words[i]} {words[i + 1]}" for i in range(n - 1)]
            n_words.append(n)
            n_distinct.append(len(c))
            ttr.append(len(c) / n if n else 0.0)
            top_share.append(max(c.values()) / n if n else 0.0)
            dup2.append(1.0 - len(set(grams)) / len(grams) if grams else 0.0)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_words": pa.array(n_words, pa.int64()),
                "n_distinct_words": pa.array(n_distinct, pa.int64()),
                "ttr": pa.array(ttr, pa.float64()),
                "top_word_share": pa.array(top_share, pa.float64()),
                "dup_2gram_frac": pa.array(dup2, pa.float64()),
            }
        )

    return docs.map_batches(_stats, batch_format="pyarrow")


def gopher_filter(
    docs: ray.data.Dataset,
    min_words: int = 30,
    max_words: int = 100_000,
    min_ttr: float = 0.35,
    max_dup_2gram: float = 0.05,
    min_word_len: float = 3.0,
    max_word_len: float = 10.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Gopher-style document quality filter (Rae et al. 2021 §A1.1, adapted
    to the signals this engine computes): per document, the repetition and
    shape signals plus a keep decision and the FIRST failed rule in a fixed
    order — the composed pre-training filter that sits between dedup and
    tokenization. Pure vectorized map, no shuffle at any scale.

    Every signal is an exact int/int double division (same IEEE result in
    Python and DuckDB), so the keep decision is bit-reproducible in SQL.
    Rule order: word count → mean word length → type-token ratio →
    duplicate-2-gram fraction.
    """
    from collections import Counter

    def _filt(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {
            "n_words": [], "mean_word_len": [], "ttr": [],
            "dup_2gram_frac": [], "keep": [], "drop_reason": [],
        }
        for text in batch[text_col].to_pylist():
            words = _WORD_RE.findall(text.lower())
            n = len(words)
            mwl = sum(map(len, words)) / n if n else 0.0
            ttr = len(Counter(words)) / n if n else 0.0
            grams = [f"{words[i]} {words[i + 1]}" for i in range(n - 1)]
            dup2 = 1.0 - len(set(grams)) / len(grams) if grams else 0.0
            if n < min_words or n > max_words:
                reason = "word_count"
            elif mwl < min_word_len or mwl > max_word_len:
                reason = "word_length"
            elif ttr < min_ttr:
                reason = "low_ttr"
            elif dup2 > max_dup_2gram:
                reason = "repetitive_2grams"
            else:
                reason = "ok"
            cols["n_words"].append(n)
            cols["mean_word_len"].append(mwl)
            cols["ttr"].append(ttr)
            cols["dup_2gram_frac"].append(dup2)
            cols["keep"].append(reason == "ok")
            cols["drop_reason"].append(reason)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_words": pa.array(cols["n_words"], pa.int64()),
                "mean_word_len": pa.array(cols["mean_word_len"], pa.float64()),
                "ttr": pa.array(cols["ttr"], pa.float64()),
                "dup_2gram_frac": pa.array(cols["dup_2gram_frac"], pa.float64()),
                "keep": pa.array(cols["keep"], pa.bool_()),
                "drop_reason": pa.array(cols["drop_reason"], pa.string()),
            }
        )

    return docs.map_batches(_filt, batch_format="pyarrow")


def event_type_histogram(events: ray.data.Dataset) -> ray.data.Dataset:
    """groupby(event_type).count() with per-batch pre-aggregation (A2/A4)."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        import collections

        c = collections.Counter(batch["event_type"].to_pylist())
        return pa.table({"event_type": list(c.keys()), "partial_n": list(c.values())})

    return (
        events.map_batches(_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("partial_n", alias_name="n_events"))
    )


def reference_table(docs: ray.data.Dataset, id_col: str = "conv_id") -> ray.data.Dataset:
    """Exploded legal-reference table: one row per (id, kind, value).

    Runs the reference's production regex extractor
    (functions/reference_extractor.py, a behavioral port of
    /root/reference/src/utils/referenceExtractorN8N.ts:59-384) over each
    document and explodes the seven output families (url_eu, url_be,
    eu_extracted, eu_verified, be_extracted, be_verified_numac,
    be_verified_file_number) to rows. A pure flat-map: streams, no shuffle;
    the per-row regex scan IS the compute (the patterns are compiled once
    at module import).
    """
    from ..functions.reference_extractor import extract_references

    def _refs(batch: pa.Table) -> pa.Table:
        ids: list = []
        kinds: list[str] = []
        values: list[str] = []
        for doc_id, text in zip(batch[id_col].to_pylist(), batch["text"].to_pylist()):
            refs = extract_references(text)
            for kind, vals in refs.items():
                for v in vals:
                    ids.append(doc_id)
                    kinds.append(kind)
                    values.append(v)
        return pa.table(
            {
                id_col: pa.array(ids, batch[id_col].type),
                "kind": pa.array(kinds, pa.string()),
                "value": pa.array(values, pa.string()),
            }
        )

    return docs.map_batches(_refs, batch_format="pyarrow")


def bm25_scores(
    docs: ray.data.Dataset,
    query_terms: list,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """BM25 (Okapi, Lucene ``+1`` idf variant) per-term relevance scores
    against a fixed query — the lexical ranking twin of the embedding ANN
    family (fuse the two downstream for hybrid search). Output: one row per
    ``(doc, term)`` with ``tf > 0`` — per-TERM contributions, deliberately
    NOT summed across terms, so every float is a single deterministic
    expression (a cross-term sum's addition order would not be
    SQL-reproducible).

    Two bounded passes, then a stream:
      1. corpus stats — per-batch partials for N and Σdl (two ints);
      2. per-term document frequencies — |terms| rows, broadcast;
      3. scoring — a pure vectorized map over the corpus.

    idf = ln((N - df + 0.5)/(df + 0.5) + 1); the expression tree is written
    identically in the DuckDB oracle, so scores are bit-exact doubles.
    """
    import math
    from ray.data.aggregate import Sum

    word_re = _WORD_RE
    terms = list(query_terms)

    def _stats(batch: pa.Table) -> pa.Table:
        rows_n, rows_dl = [], []
        dfc = {t: 0 for t in terms}
        for text in batch[text_col].to_pylist():
            words = word_re.findall(text.lower())
            rows_n.append(1)
            rows_dl.append(len(words))
            wset = set(words)
            for t in terms:
                if t in wset:
                    dfc[t] += 1
        return pa.table(
            {
                "n_docs": pa.array([len(rows_n)], pa.int64()),
                "sum_dl": pa.array([sum(rows_dl)], pa.int64()),
                **{f"df_{i}": pa.array([dfc[t]], pa.int64()) for i, t in enumerate(terms)},
            }
        )

    agg = (
        docs.map_batches(_stats, batch_format="pyarrow")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_dl", alias_name="sum_dl"),
            *[Sum(f"df_{i}", alias_name=f"df_{i}") for i in range(len(terms))],
        )
    )
    n_docs = int(agg["sum(n_docs)"] if "sum(n_docs)" in agg else agg["n_docs"])
    sum_dl = int(agg["sum(sum_dl)"] if "sum(sum_dl)" in agg else agg["sum_dl"])
    dfs = {
        t: int(agg.get(f"df_{i}", agg.get(f"sum(df_{i})", 0)))
        for i, t in enumerate(terms)
    }
    avgdl = sum_dl / n_docs
    idf = {
        t: math.log((n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0) for t in terms
    }
    stats_ref = ray.put((terms, idf, avgdl, k1, b))

    def _score(batch: pa.Table) -> pa.Table:
        q_terms, q_idf, q_avgdl, q_k1, q_b = ray.get(stats_ref)
        ids, t_out, tf_out, sc_out = [], [], [], []
        for i, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            words = word_re.findall(text.lower())
            dl = len(words)
            for t in q_terms:
                tf = words.count(t)
                if tf == 0:
                    continue
                score = (
                    q_idf[t]
                    * (tf * (q_k1 + 1))
                    / (tf + q_k1 * (1 - q_b + q_b * dl / q_avgdl))
                )
                ids.append(i)
                t_out.append(t)
                tf_out.append(tf)
                sc_out.append(score)
        return pa.table(
            {
                id_col: pa.array(ids, batch[id_col].type),
                "term": pa.array(t_out, pa.string()),
                "tf": pa.array(tf_out, pa.int64()),
                "score": pa.array(sc_out, pa.float64()),
            }
        )

    return docs.map_batches(_score, batch_format="pyarrow")


def unigram_surprisal(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Self-trained unigram-LM surprisal per document — the CCNet-style
    "perplexity" quality signal (documents whose tokens are corpus-atypical
    score high): ``avg_surprisal = -(1/n) Σ ln(count(tok)/total)`` with the
    sum taken as a LEFT FOLD in document token order, so the double is
    bit-reproducible (the DuckDB oracle replays it with
    ``list_reduce(list(lnp ORDER BY position))``).

    Scale shape: corpus token counts via the ``vocabulary`` combiner
    discipline (one partial row per distinct token per batch → groupby
    Sum), collected once and broadcast via ``ray.put`` (O(|vocab|) — same
    assumption as tfidf_top_terms); scoring streams."""
    import math
    from collections import Counter

    from ray.data.aggregate import Sum

    def _tc_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            c.update(_WORD_RE.findall(t.lower()))
        toks = list(c)
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "n": pa.array([c[t] for t in toks], pa.int64()),
            }
        )

    counts = (
        docs.map_batches(_tc_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )
    cmap: dict = {}
    for blk in counts.iter_batches(batch_format="pyarrow", batch_size=None):
        cmap.update(zip(blk["token"].to_pylist(), blk["n"].to_pylist()))
    total = sum(cmap.values())
    state_ref = ray.put((cmap, total))

    def _score(batch: pa.Table) -> pa.Table:
        from .broadcast import broadcast_cache

        cm, tot = broadcast_cache(state_ref)
        ids, ns, avgs = [], [], []
        for i, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            words = _WORD_RE.findall(text.lower())
            n = len(words)
            # sum() is a sequential left fold — the oracle's list_reduce twin
            s = sum(math.log(cm[t] / tot) for t in words)
            ids.append(i)
            ns.append(n)
            avgs.append(-(s / n) if n else 0.0)
        return pa.table(
            {
                id_col: pa.array(ids, batch[id_col].type),
                "n_tokens": pa.array(ns, pa.int64()),
                "avg_surprisal": pa.array(avgs, pa.float64()),
            }
        )

    return docs.map_batches(_score, batch_format="pyarrow")


def fuzzy_term_pairs(
    docs: ray.data.Dataset,
    min_len: int = 5,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Approximate string self-join over the corpus vocabulary: all pairs
    of distinct tokens (length ≥ ``min_len``) within Levenshtein distance 1
    — the typo/variant detector behind vocabulary normalization and fuzzy
    entity blocking.

    SymSpell-style candidate generation (Garbe's delete-neighborhood
    observation): two terms are within edit distance 1 only if they share
    a member of their {self} ∪ {delete-one-char} variant sets. So instead
    of the O(V²) all-pairs scan:

    - each distinct term emits ``len(term)+1`` (variant, term) rows —
      linear in vocabulary size;
    - a groupby(variant) co-locates candidates; each group emits its
      (a<b) pairs (groups are tiny — terms sharing a specific deletion);
    - pairs dedup via a groupby, then an exact Levenshtein DP verifies
      (the neighborhood admits distance-2 false candidates, e.g. 'ab'/'ba'
      share the deletion 'a').

    Output: ``(term_a, term_b, dist)`` with dist == 1. Every step is a
    bounded fan-out or a vocabulary-sized shuffle — never corpus-sized.
    """
    import pandas as pd
    from ray.data.aggregate import Count

    def _batch_terms(batch: pa.Table) -> pa.Table:
        terms = set()
        for t in batch[text_col].to_pylist():
            for w in _WORD_RE.findall((t or "").lower()):
                if len(w) >= min_len:
                    terms.add(w)
        return pa.table({"term": pa.array(sorted(terms), pa.string())})

    vocab = (
        docs.map_batches(_batch_terms, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Count(alias_name="__n"))
        .select_columns(["term"])
    )

    def _variants(batch: pa.Table) -> pa.Table:
        vs, ts = [], []
        for term in batch["term"].to_pylist():
            vs.append(term)
            ts.append(term)
            for i in range(len(term)):
                vs.append(term[:i] + term[i + 1 :])
                ts.append(term)
        return pa.table(
            {"variant": pa.array(vs, pa.string()), "term": pa.array(ts, pa.string())}
        )

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        ts = sorted(g["term"].unique())
        a_out, b_out = [], []
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                a_out.append(ts[i])
                b_out.append(ts[j])
        return pd.DataFrame({"term_a": a_out, "term_b": b_out})

    def _lev1(a: str, b: str) -> bool:
        # exact check specialized to threshold 1 (O(len) not O(len²))
        if a == b:
            return False
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:  # exactly one substitution
            return sum(1 for x, y in zip(a, b) if x != y) == 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        # one insertion: skip the first mismatch in the longer string
        i = 0
        while i < la and a[i] == b[i]:
            i += 1
        return a[i:] == b[i + 1 :]

    def _verify(batch: pa.Table) -> pa.Table:
        av, bv = batch["term_a"].to_pylist(), batch["term_b"].to_pylist()
        keep = pa.array([_lev1(x, y) for x, y in zip(av, bv)])
        out = batch.filter(keep)
        return out.append_column("dist", pa.array([1] * out.num_rows, pa.int64()))

    return (
        vocab.map_batches(_variants, batch_format="pyarrow")
        .groupby("variant")
        .map_groups(_pairs, batch_format="pandas")
        .groupby(["term_a", "term_b"])
        .aggregate(Count(alias_name="__nv"))
        .select_columns(["term_a", "term_b"])
        .map_batches(_verify, batch_format="pyarrow")
    )


def char_entropy(
    docs: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per-document character-distribution Shannon entropy (nats) — the
    garbage/boilerplate detector alongside the repetition and surprisal
    signals (low entropy = repeated filler; suspiciously high = random
    bytes). Pure per-batch map, zero shuffle.

    Determinism contract: the sum is a LEFT FOLD over characters in
    sorted order, each term the identical ``(k/n)·ln(k/n)`` double
    expression the SQL twin uses — bit-exact vs DuckDB's ``list_reduce``
    (the documents_surprisal discipline)."""
    import math
    from collections import Counter

    def _entropy(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        ents, lens = [], []
        for t in batch[text_col].to_pylist():
            t = t or ""
            n = len(t)
            lens.append(n)
            if n == 0:
                ents.append(0.0)
                continue
            cnt = Counter(t)
            h = 0.0
            for ch in sorted(cnt):
                p = cnt[ch] / n
                h += p * math.log(p)
            ents.append(-h)
        return pa.table(
            {
                id_col: ids,
                "n_chars_text": pa.array(lens, pa.int64()),
                "char_entropy": pa.array(ents, pa.float64()),
            }
        )

    return docs.map_batches(_entropy, batch_format="pyarrow")


def pmi_collocations(
    docs: ray.data.Dataset,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
) -> ray.data.Dataset:
    """Top-k bigram collocations by pointwise mutual information —
    ``pmi = ln(p(ab) / (p(a)p(b)))`` with ``p(ab) = c_ab/M`` over adjacent
    token pairs and ``p(x) = c_x/N`` over tokens — the classic
    phrase-mining signal (Church & Hanks 1990) a tokenizer-vocab or
    entity-dictionary builder runs corpus-wide.

    Scale shape: two combiner-first count passes (one partial row per
    distinct bigram/token per batch — the ``vocabulary`` discipline), a
    global min-count filter BEFORE scoring, and the unigram table
    broadcast once via ``ray.put`` (bounded by |vocab| — the documented
    value-CDF-family assumption). Partial-top-k per block before the
    driver pick.

    Determinism contract: the PMI double is the literal expression tree
    ``ln(((c*N)*N) / ((M*c_a)*c_b))`` with every operand widened to
    double first — the SQL twin mirrors the same tree, so the doubles
    (and therefore the top-k cutoff) match bit-exact.

    Output: ``(tok_a, tok_b, n_pair, n_a, n_b, pmi)`` ordered by
    (pmi desc, tok_a, tok_b)."""
    import math
    from collections import Counter

    import pandas as pd

    import ray as _ray
    from ray.data.aggregate import Sum

    word_re = re.compile(r"[a-z0-9]+")

    def _uni_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            c.update(word_re.findall((t or "").lower()))
        toks = list(c)
        return pa.table(
            {"token": pa.array(toks, pa.string()),
             "n": pa.array([c[t] for t in toks], pa.int64())}
        )

    def _bi_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            w = word_re.findall((t or "").lower())
            c.update(zip(w[:-1], w[1:]))
        keys = list(c)
        return pa.table(
            {"tok_a": pa.array([k[0] for k in keys], pa.string()),
             "tok_b": pa.array([k[1] for k in keys], pa.string()),
             "n": pa.array([c[k] for k in keys], pa.int64())}
        )

    unigrams = (
        docs.map_batches(_uni_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # read twice: the N scalar + the broadcast dict
    )
    bigrams = (
        docs.map_batches(_bi_partial, batch_format="pyarrow")
        .groupby(["tok_a", "tok_b"])
        .aggregate(Sum("n", alias_name="n_pair"))
        .materialize()  # read twice: the M scalar + the scoring pass
    )
    n_tokens = int(unigrams.sum("n") or 0)
    n_pairs = int(bigrams.sum("n_pair") or 0)
    if n_pairs == 0:
        return ray.data.from_arrow(
            pa.schema(
                [("tok_a", pa.string()), ("tok_b", pa.string()),
                 ("n_pair", pa.int64()), ("n_a", pa.int64()),
                 ("n_b", pa.int64()), ("pmi", pa.float64())]
            ).empty_table()
        )
    uni_ref = _ray.put({r["token"]: r["n"] for r in unigrams.take_all()})

    def _score(batch: pa.Table) -> pa.Table:
        uni = _ray.get(uni_ref)
        nd, md = float(n_tokens), float(n_pairs)
        rows = {"tok_a": [], "tok_b": [], "n_pair": [], "n_a": [], "n_b": [], "pmi": []}
        for a, b, c in zip(
            batch["tok_a"].to_pylist(), batch["tok_b"].to_pylist(),
            batch["n_pair"].to_pylist(),
        ):
            if c < min_count:
                continue
            ca, cb = uni[a], uni[b]
            pmi = math.log(((float(c) * nd) * nd) / ((md * float(ca)) * float(cb)))
            rows["tok_a"].append(a)
            rows["tok_b"].append(b)
            rows["n_pair"].append(c)
            rows["n_a"].append(ca)
            rows["n_b"].append(cb)
            rows["pmi"].append(pmi)
        return pa.table(
            {"tok_a": pa.array(rows["tok_a"], pa.string()),
             "tok_b": pa.array(rows["tok_b"], pa.string()),
             "n_pair": pa.array(rows["n_pair"], pa.int64()),
             "n_a": pa.array(rows["n_a"], pa.int64()),
             "n_b": pa.array(rows["n_b"], pa.int64()),
             "pmi": pa.array(rows["pmi"], pa.float64())}
        )

    def _topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(
            ["pmi", "tok_a", "tok_b"], ascending=[False, True, True]
        ).head(top_k)
        return pa.Table.from_pandas(df, preserve_index=False)

    scored = bigrams.map_batches(_score, batch_format="pyarrow")
    out = scored.map_batches(_topk, batch_format="pyarrow").to_pandas()
    out = out.sort_values(
        ["pmi", "tok_a", "tok_b"], ascending=[False, True, True]
    ).head(top_k)
    return ray.data.from_pandas(pd.DataFrame(out.reset_index(drop=True)))


# Minimal English stopword list for RAKE phrase delimiting. FIXED module
# constant: the DuckDB oracle splices the SAME tuple into its IN-list, so
# the two sides cannot drift.
RAKE_STOPWORDS = (
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "in", "is", "it", "of", "on", "or", "that", "the", "to", "with",
)


def rake_keyphrases(
    docs: ray.data.Dataset,
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "pd.DataFrame":
    """RAKE keyphrase extraction (Rose et al. 2010) over the corpus:
    candidate phrases are maximal runs of non-stopword tokens (lowercase
    ``[a-z0-9]+``, split at :data:`RAKE_STOPWORDS`; no length cap — the
    canonical formulation), word score = deg(w)/freq(w) where freq counts
    occurrences in phrases and deg adds each containing phrase's length,
    and a phrase scores the LEFT FOLD of its words' scores in phrase
    order — bit-reproducible doubles, the unigram_surprisal
    ``list_reduce`` discipline. Returns the corpus top-k distinct phrases
    by (score desc, phrase asc) with occurrence counts.

    Scale shape: phrase explosion is a pure map; word stats follow the
    vocabulary combiner discipline (one partial row per distinct word per
    batch → groupby Sum) and are collected + broadcast once via
    ``ray.put`` (O(|non-stop vocab|), the tfidf assumption); distinct
    phrases likewise combine per batch before ONE groupby, and the final
    pick is partial-top-k per block before the bounded driver sort."""
    import pandas as pd
    from collections import Counter

    from ray.data.aggregate import Sum

    stop = set(RAKE_STOPWORDS)

    def _phrases(text: str) -> list[list[str]]:
        out, cur = [], []
        for w in _WORD_RE.findall(text.lower()):
            if w in stop:
                if cur:
                    out.append(cur)
                cur = []
            else:
                cur.append(w)
        if cur:
            out.append(cur)
        return out

    # word stats: freq = occurrences in phrases, deg = Σ len(phrase)
    def _wstat_partial(batch: pa.Table) -> pa.Table:
        freq: Counter = Counter()
        deg: Counter = Counter()
        for t in batch[text_col].to_pylist():
            for ph in _phrases(t):
                n = len(ph)
                for w in ph:
                    freq[w] += 1
                    deg[w] += n
        words = list(freq)
        return pa.table(
            {
                "w": pa.array(words, pa.string()),
                "freq": pa.array([freq[w] for w in words], pa.int64()),
                "deg": pa.array([deg[w] for w in words], pa.int64()),
            }
        )

    wstats = (
        docs.map_batches(_wstat_partial, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("freq", alias_name="freq"), Sum("deg", alias_name="deg"))
    )
    wscore: dict = {}
    for blk in wstats.iter_batches(batch_format="pyarrow", batch_size=None):
        for w, f, d in zip(blk["w"].to_pylist(), blk["freq"].to_pylist(), blk["deg"].to_pylist()):
            wscore[w] = float(d) / float(f)
    score_ref = ray.put(wscore)

    # distinct phrases + occurrence counts (combiner → ONE groupby)
    def _phr_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            for ph in _phrases(t):
                c[" ".join(ph)] += 1
        phrases = list(c)
        return pa.table(
            {
                "phrase": pa.array(phrases, pa.string()),
                "n_occ": pa.array([c[p] for p in phrases], pa.int64()),
            }
        )

    phr = (
        docs.map_batches(_phr_partial, batch_format="pyarrow")
        .groupby("phrase")
        .aggregate(Sum("n_occ", alias_name="n_occ"))
    )

    def _score_topk(batch: pa.Table) -> pa.Table:
        from .broadcast import broadcast_cache

        sc = broadcast_cache(score_ref)
        rows = []
        for phrase, n_occ in zip(batch["phrase"].to_pylist(), batch["n_occ"].to_pylist()):
            words = phrase.split(" ")
            s = 0.0
            for w in words:  # left fold — the oracle's list_reduce twin
                s = s + sc[w]
            rows.append((phrase, len(words), n_occ, s))
        df = pd.DataFrame(rows, columns=["phrase", "n_words", "n_occ", "score"])
        df = df.sort_values(["score", "phrase"], ascending=[False, True]).head(top_k)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = phr.map_batches(_score_topk, batch_format="pyarrow").to_pandas()
    return (
        out.sort_values(["score", "phrase"], ascending=[False, True])
        .head(top_k)
        .reset_index(drop=True)
    )


def textrank_words(
    docs: ray.data.Dataset,
    window: int = 2,
    iterations: int = 10,
    text_col: str = "text",
) -> "pd.DataFrame":
    """TextRank keyword scoring (Mihalcea & Tarau 2004): an UNWEIGHTED
    undirected co-occurrence graph over non-stopword tokens (pairs within
    ``window`` positions of the stopword-FILTERED sequence, self-pairs
    dropped), scored by the engine's own fixed-iteration
    :func:`..stages.graph.pagerank` — the operator-reuse story: the same
    power-iteration primitive serving the citation graph serves keyword
    extraction. Returns ALL scored words as (node, score) ordered by
    node (the kg_pagerank discipline — no float-threshold top-k, and the
    unique string key sorts before the double).

    Scale shape: pair emission is a per-batch combiner (set-dedup before
    anything shuffles) → distinct_pairs pid-cogroup; the PageRank
    iterations are bounded hash joins + combiner-first sums over a graph
    whose node count is the corpus VOCABULARY, not the corpus."""
    import pandas as pd

    from .graph import distinct_pairs, pagerank, symmetrize

    stop = set(RAKE_STOPWORDS)

    def _pairs_partial(batch: pa.Table) -> pa.Table:
        seen: set = set()
        for t in batch[text_col].to_pylist():
            ws = [w for w in _WORD_RE.findall(t.lower()) if w not in stop]
            n = len(ws)
            for i in range(n):
                for j in range(i + 1, min(i + window, n - 1) + 1):
                    a, b = ws[i], ws[j]
                    if a == b:
                        continue
                    seen.add((a, b) if a < b else (b, a))
        src = [p[0] for p in seen]
        dst = [p[1] for p in seen]
        return pa.table(
            {"src": pa.array(src, pa.string()), "dst": pa.array(dst, pa.string())}
        )

    pairs = distinct_pairs(
        docs.map_batches(_pairs_partial, batch_format="pyarrow"), ["src", "dst"]
    )
    edges = symmetrize(pairs).materialize()  # re-read every iteration
    out = pagerank(edges, iterations=iterations).to_pandas()
    # keep the "node" column name: the oracle gate sorts rows on
    # alphabetically-ordered columns, and (node, score) puts the UNIQUE
    # string key first — (score, word) would order on ULP-noisy doubles
    return out.sort_values("node").reset_index(drop=True)


_SENT_RE = re.compile(r"[.!?]+")
_ALPHA_RE = re.compile(r"[a-z]+")
_VOWEL_RE = re.compile(r"[aeiouy]+")


def readability(
    docs: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Flesch reading-ease score (Flesch 1948) per document — the
    classic readability quality signal next to the Gopher/repetition
    filters. Deterministic sub-metrics, each a regex count so the SQL
    twin is exact:

    - sentences: runs of ``[.!?]+`` (min 1),
    - words: ``[a-z]+`` tokens of the lowercased text,
    - syllables: per word ``max(1, #vowel-groups [aeiouy]+)``, summed.

    ``flesch = 206.835 - 1.015·(words/sentences) - 84.6·(syllables/words)``
    with the exact expression tree mirrored in SQL (every constant cast
    ::DOUBLE). Documents with zero words are dropped (the score is
    undefined), matching the oracle's WHERE. Pure vectorized-regex map,
    zero shuffles; the per-word syllable lookup memoizes per worker.
    """
    syl_cache: dict[str, int] = {}

    def _syl(w: str) -> int:
        s = syl_cache.get(w)
        if s is None:
            s = max(1, len(_VOWEL_RE.findall(w)))
            if len(syl_cache) < 1_000_000:
                syl_cache[w] = s
        return s

    def _score(batch: pa.Table) -> pa.Table:
        ids, sents, words, sylls, scores = [], [], [], [], []
        for i, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            toks = _ALPHA_RE.findall(text.lower())
            if not toks:
                continue
            n_sent = max(1, len(_SENT_RE.findall(text)))
            n_words = len(toks)
            n_syll = sum(_syl(w) for w in toks)
            ids.append(i)
            sents.append(n_sent)
            words.append(n_words)
            sylls.append(n_syll)
            scores.append(
                206.835 - 1.015 * (n_words / n_sent) - 84.6 * (n_syll / n_words)
            )
        return pa.table(
            {
                id_col: pa.array(ids),
                "n_sentences": pa.array(sents, pa.int64()),
                "n_words": pa.array(words, pa.int64()),
                "n_syllables": pa.array(sylls, pa.int64()),
                "flesch": pa.array(scores, pa.float64()),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        _score, batch_format="pyarrow"
    )


def bigram_surprisal(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Self-trained bigram-LM surprisal per document — the sequence-aware
    upgrade of unigram_surprisal: ``avg_surprisal = -(1/(n-1)) Σ_{i=2..n}
    ln((c(w_{i-1} w_i) + 1) / (c(w_{i-1}) + V))`` (add-one smoothing over
    the corpus vocabulary V; history mass approximated by the corpus
    unigram count — the denominator choice is part of the contract and the
    SQL twin replays it exactly). The sum is a LEFT FOLD in document
    bigram order so the double is bit-reproducible
    (``list_reduce(list(lnp ORDER BY i))`` in the oracle).

    Scale shape: unigram AND bigram corpus counts via the vocabulary
    combiner discipline (one partial row per distinct [bi]gram per batch →
    groupby Sum), collected once and broadcast via ``ray.put`` —
    O(|bigram vocab|), the same bounded-vocabulary assumption as
    unigram_surprisal/tfidf (natural-language bigram vocabularies are
    millions, not corpus-sized; gate with a vocabulary() pre-pass if in
    doubt). Scoring streams with zero shuffles."""
    import math
    from collections import Counter

    from ray.data.aggregate import Sum

    def _uni_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            c.update(_WORD_RE.findall(t.lower()))
        toks = list(c)
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "n": pa.array([c[t] for t in toks], pa.int64()),
            }
        )

    def _bi_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            ws = _WORD_RE.findall(t.lower())
            c.update(zip(ws, ws[1:]))
        keys = list(c)
        return pa.table(
            {
                "prev": pa.array([k[0] for k in keys], pa.string()),
                "cur": pa.array([k[1] for k in keys], pa.string()),
                "n": pa.array([c[k] for k in keys], pa.int64()),
            }
        )

    uni = (
        docs.map_batches(_uni_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )
    bi = (
        docs.map_batches(_bi_partial, batch_format="pyarrow")
        .groupby(["prev", "cur"])
        .aggregate(Sum("n", alias_name="n"))
    )
    umap: dict = {}
    for blk in uni.iter_batches(batch_format="pyarrow", batch_size=None):
        umap.update(zip(blk["token"].to_pylist(), blk["n"].to_pylist()))
    bmap: dict = {}
    for blk in bi.iter_batches(batch_format="pyarrow", batch_size=None):
        bmap.update(
            zip(
                zip(blk["prev"].to_pylist(), blk["cur"].to_pylist()),
                blk["n"].to_pylist(),
            )
        )
    vsize = len(umap)
    state_ref = ray.put((umap, bmap, vsize))

    def _score(batch: pa.Table) -> pa.Table:
        from .broadcast import broadcast_cache

        um, bm, v = broadcast_cache(state_ref)
        ids, ns, avgs = [], [], []
        for i, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            ws = _WORD_RE.findall(text.lower())
            n = len(ws) - 1
            # sequential left fold — the oracle's list_reduce twin
            s = sum(
                math.log((bm[(p, c)] + 1) / (um[p] + v))
                for p, c in zip(ws, ws[1:])
            )
            ids.append(i)
            ns.append(max(n, 0))
            avgs.append(-(s / n) if n > 0 else 0.0)
        return pa.table(
            {
                id_col: pa.array(ids, batch[id_col].type),
                "n_bigrams": pa.array(ns, pa.int64()),
                "avg_surprisal": pa.array(avgs, pa.float64()),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        _score, batch_format="pyarrow"
    )


def lexical_diversity(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-document lexical-diversity profile — the vocabulary-richness
    quality features (type-token ratio, hapax ratio) a data-curation pass
    uses alongside gopher/repetition stats: ``(doc_id, n_tokens, n_types,
    n_hapax, ttr)`` where hapax counts tokens occurring exactly once IN
    THE DOCUMENT and ttr = n_types / n_tokens (exact int division → double,
    identical both sides; 0.0 for empty docs).

    Pure per-batch map — zero shuffle, zero state."""
    from collections import Counter

    def _stats(batch: pa.Table) -> pa.Table:
        ids, nt, ty, hp, ttr = [], [], [], [], []
        for i, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            c = Counter(_WORD_RE.findall(text.lower()))
            n = sum(c.values())
            ids.append(i)
            nt.append(n)
            ty.append(len(c))
            hp.append(sum(1 for v in c.values() if v == 1))
            ttr.append(len(c) / n if n else 0.0)
        return pa.table(
            {
                id_col: pa.array(ids, batch[id_col].type),
                "n_tokens": pa.array(nt, pa.int64()),
                "n_types": pa.array(ty, pa.int64()),
                "n_hapax": pa.array(hp, pa.int64()),
                "ttr": pa.array(ttr, pa.float64()),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        _stats, batch_format="pyarrow"
    )


def zipf_fit(
    docs: ray.data.Dataset,
    text_col: str = "text",
    k: int = 100,
):
    """Zipf-law fit over the top-``k`` corpus term frequencies:
    least-squares slope of ln(count) on ln(rank) — the corpus-health
    scalar (natural text ≈ −1; template spam deviates hard).

    Term counts use the vocabulary combiner discipline (one partial row
    per distinct token per batch → groupby Sum, shuffle bounded by
    |vocab| per batch); the fit runs on the driver over ``k`` points with
    SEQUENTIAL sums in rank order so a SQL twin's ordered list_reduce
    matches term for term. Returns a one-row pandas frame
    ``(k, slope, intercept)`` rounded to 6 against ln() libm ulp drift."""
    import math
    from collections import Counter

    import pandas as pd
    from ray.data.aggregate import Sum

    def _tc(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            c.update(_WORD_RE.findall(t.lower()))
        toks = list(c)
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "n": pa.array([c[t] for t in toks], pa.int64()),
            }
        )

    vc = (
        docs.select_columns([text_col])
        .map_batches(_tc, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    top = vc.sort_values(["n", "token"], ascending=[False, True]).head(k)
    kk = len(top)
    sx = sy = sxx = sxy = 0.0
    for rank, n in enumerate(top["n"], start=1):
        x = math.log(float(rank))
        y = math.log(float(n))
        sx += x
        sy += y
        sxx += x * x
        sxy += x * y
    slope = (kk * sxy - sx * sy) / (kk * sxx - sx * sx)
    intercept = (sy - slope * sx) / kk
    return pd.DataFrame(
        {
            "k": pd.array([kk], dtype="int64"),
            "slope": [round(slope, 6)],
            "intercept": [round(intercept, 6)],
        }
    )


def token_jsd_by_group(
    docs: ray.data.Dataset,
    group_col: str,
    text_col: str = "text",
    round_to: int = 6,
):
    """Jensen–Shannon divergence of each group's token distribution from
    the GLOBAL corpus distribution — the text-drift detector (per-source,
    per-language or per-shard) that catches template spam, scraper
    regressions and mixture shifts before training does.

    Counts per (group, token) via the vocabulary combiner (one partial
    row per distinct pair per batch → groupby Sum); the fold runs on the
    driver over the |groups|×|vocab|-bounded count table (the documented
    vocabulary assumption). Every p/q is an exact int/int double; the
    per-token terms accumulate SEQUENTIALLY in token sort order so a SQL
    twin's ordered list_reduce matches term for term; output rounded to
    ``round_to`` against ln() libm ulp drift.

    Returns a pandas frame ``(group, n_tokens, jsd)``."""
    import math
    from collections import Counter

    import pandas as pd
    from ray.data.aggregate import Sum

    def _tc(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for g, t in zip(batch[group_col].to_pylist(), batch[text_col].to_pylist()):
            for w in _WORD_RE.findall(t.lower()):
                c[(g, w)] += 1
        keys = list(c)
        return pa.table(
            {
                group_col: pa.array([k[0] for k in keys]),
                "token": pa.array([k[1] for k in keys], pa.string()),
                "n": pa.array([c[k] for k in keys], pa.int64()),
            }
        )

    cg = (
        docs.select_columns([group_col, text_col])
        .map_batches(_tc, batch_format="pyarrow")
        .groupby([group_col, "token"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    per_group: dict = {}
    glob: Counter = Counter()
    for g, t, n in zip(cg[group_col], cg["token"], cg["n"]):
        per_group.setdefault(g, {})[t] = int(n)
        glob[t] += int(n)
    total = sum(glob.values())
    tokens_sorted = sorted(glob)
    rows = []
    for g in sorted(per_group):
        counts = per_group[g]
        tl = sum(counts.values())
        jsd = 0.0
        for t in tokens_sorted:
            p = counts.get(t, 0) / tl
            q = glob[t] / total
            mmid = (p + q) / 2.0
            term = (p * math.log(p / mmid) if p > 0 else 0.0) * 0.5 + 0.5 * (
                q * math.log(q / mmid)
            )
            jsd += term
        rows.append(
            {group_col: g, "n_tokens": tl, "jsd": round(jsd, round_to)}
        )
    out = pd.DataFrame(rows)
    out["n_tokens"] = out["n_tokens"].astype("int64")
    return out
