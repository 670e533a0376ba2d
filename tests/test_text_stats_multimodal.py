"""Tests for text-analysis functions/stages and the multimodal stub stage."""

import pyarrow as pa
import pytest

import ray.data as rd

from decisions_knowledge_graph_data_ray.functions import text_stats as T


def test_token_counts():
    assert T.whitespace_token_count("hello  world ") == 2
    assert T.whitespace_token_count("") == 0
    assert T.word_token_count("hello world12, x") == 5  # hello, world, 12, ',', x


def test_detect_language():
    assert T.detect_language("the cat is on the mat and it is warm") == "en"
    assert T.detect_language("le chat est dans la maison et il dort") == "fr"
    assert T.detect_language("de kat zit in het huis en hij slaapt niet") == "nl"
    assert T.detect_language("xyzzy plugh") == "und"
    assert T.detect_language("") == "und"


def test_quality_metrics():
    m = T.quality_metrics("the quick brown fox jumps over the lazy dog near the river bank")
    assert m["keep"]
    assert 0 <= m["punct_ratio"] <= 1
    assert not T.quality_metrics("x")["keep"]  # too short
    assert not T.quality_metrics("!!! ??? ;;; ::: ,,,!!! ??? ;;; :::")["keep"]  # punct-heavy


def test_fingerprint_deterministic_and_shift_insensitive_tail():
    t = "some long document text " * 20
    assert T.document_fingerprint(t) == T.document_fingerprint(t)
    assert T.document_fingerprint("short") == T.fnv1a64(b"short")


def test_text_analysis_stages(ray_session):
    from decisions_knowledge_graph_data_ray.stages.text_analysis import (
        language_id,
        quality_score,
        token_counts,
    )

    docs = rd.from_arrow(
        pa.table({"doc_id": [1, 2], "text": ["the cat is on the mat and it is", "le chat est dans la maison et il"]})
    )
    tc = token_counts(docs).to_pandas()
    assert tc["n_ws_tokens"].tolist() == [9, 8]
    li = language_id(docs).to_pandas()
    assert li["lang_pred"].tolist() == ["en", "fr"]
    qs = quality_score(docs).to_pandas()
    assert set(qs.columns) >= {"n_chars", "n_tokens", "punct_ratio", "keep"}


def test_length_histogram(ray_session):
    from decisions_knowledge_graph_data_ray.stages.text_analysis import length_histogram

    docs = rd.from_arrow(pa.table({"text": ["x" * 100, "y" * 20000, "z" * 100]}))
    out = length_histogram(docs).to_pandas().set_index("length_category")["n_docs"]
    assert out["short"] == 2 and out["medium"] == 1


def test_multimodal_fake_decode(ray_session):
    from decisions_knowledge_graph_data_ray.stages.multimodal import (
        decode_media,
        make_fake_media_dataset,
    )

    media = make_fake_media_dataset(n=12)
    out = decode_media(media, fake=True, concurrency=1).to_pandas()
    assert len(out) == 12
    assert set(out.columns) == {"media_id", "media_type", "width", "height", "feature"}
    assert (out["width"] >= 64).all()
    # deterministic: re-decode matches
    again = decode_media(make_fake_media_dataset(n=12), fake=True, concurrency=1).to_pandas()
    assert out["width"].tolist() == again["width"].tolist()


def test_multimodal_real_decode_is_stubbed():
    from decisions_knowledge_graph_data_ray.stages.multimodal import DecodeImageActor

    actor = DecodeImageActor(fake=False)
    with pytest.raises(NotImplementedError):
        actor(pa.table({"media_id": [1], "media_type": ["image/jpeg"], "payload": [b"xx"]}))


def test_multimodal_pipeline_routing(ray_session):
    from decisions_knowledge_graph_data_ray.stages.multimodal import (
        make_fake_media_dataset,
        multimodal_pipeline,
    )

    media = make_fake_media_dataset(n=30)  # 10 of each modality
    res = multimodal_pipeline(media, fake=True)
    decoded = res["decoded"].to_pandas()
    resized = res["resized"].to_pandas()
    frames = res["frames"].to_pandas()
    mfcc = res["mfcc"].to_pandas()
    assert len(decoded) == 10 and len(resized) == 10 and len(mfcc) == 10
    assert (resized["width"] == 128).all() and (resized["height"] == 128).all()
    # frame explode: >= 1 frame per video, deterministic across runs
    assert frames["media_id"].nunique() == 10 and len(frames) >= 10
    frames2 = multimodal_pipeline(media, fake=True)["frames"].to_pandas()
    assert frames.sort_values(["media_id", "frame_idx"]).reset_index(drop=True).equals(
        frames2.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    )
    assert all(len(v) == 13 for v in mfcc["mfcc"])


def test_multimodal_real_paths_stub_clearly(ray_session):
    import pytest

    from decisions_knowledge_graph_data_ray.stages.multimodal import (
        FrameSampleActor,
        ResizeImageActor,
        make_fake_media_dataset,
    )

    media = make_fake_media_dataset(n=3)
    with pytest.raises(Exception, match="NotImplementedError|requires"):
        media.map_batches(
            ResizeImageActor, fn_constructor_kwargs={"fake": False},
            batch_format="pyarrow", concurrency=1,
        ).materialize()


def test_real_decode_import_guard(ray_session):
    """Without the optional libs the real path raises NotImplementedError
    (helpful message, never a bare ImportError mid-pipeline); with them
    present it decodes. These run whichever side the environment has."""
    import pytest

    from decisions_knowledge_graph_data_ray.stages import multimodal as M

    payload = b"\x00" * 64
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False

    actor = M.DecodeImageActor(fake=False)
    if not has_pil:
        with pytest.raises(NotImplementedError, match="fake=True"):
            actor._decode_real(payload)
        with pytest.raises(NotImplementedError, match="fake=True"):
            M.ResizeImageActor(fake=False)._resize_real(payload)
    else:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (40, 20), (10, 20, 30)).save(buf, format="PNG")
        meta = actor._decode_real(buf.getvalue())
        assert (meta["width"], meta["height"]) == (40, 20)
        assert len(meta["feature"]) == 8
        out = M.ResizeImageActor(target_w=8, target_h=8, fake=False)._resize_real(buf.getvalue())
        assert out[:8] == b"\x89PNG\r\n\x1a\n"

    try:
        import soundfile  # noqa: F401

        has_sf = True
    except ImportError:
        has_sf = False

    audio = M.AudioFeatureActor(fake=False)
    if not has_sf:
        with pytest.raises(NotImplementedError, match="fake=True"):
            audio._mfcc_real(payload)
    else:
        import io

        import numpy as np
        import soundfile as sf

        buf = io.BytesIO()
        sf.write(buf, np.sin(np.linspace(0, 440, 8000)), 8000, format="WAV")
        feats = audio._mfcc_real(buf.getvalue())
        assert len(feats) == M.AudioFeatureActor.N_COEFF


def test_tfidf_top_terms(ray_session):
    from decisions_knowledge_graph_data_ray.stages.text_analysis import tfidf_top_terms

    # 4 docs; "common" appears in all (idf=0 -> never ranks above anything
    # positive), "rare" only in doc 1 (max idf), "pair" in docs 1+2
    docs = rd.from_items(
        [
            {"doc_id": 1, "text": "common rare pair pair"},
            {"doc_id": 2, "text": "common pair"},
            {"doc_id": 3, "text": "common zeta"},
            {"doc_id": 4, "text": "common common"},
        ]
    )
    df = tfidf_top_terms(docs, top_k=2).to_pandas()
    d1 = df[df.doc_id == 1].sort_values("rank")
    # tf(pair)=2 * ln(4/2) = 1.386 > tf(rare)=1 * ln(4/1) = 1.386... equal!
    # 2*ln(2) == ln(4) exactly in floats? ln(4)=1.3862943611198906,
    # 2*ln(2)=1.3862943611198906 -- tie broken by token asc: "pair" < "rare"
    assert list(d1.token) == ["pair", "rare"]
    d4 = df[df.doc_id == 4]
    # doc 4 has only "common" (df=4, idf=ln(1)=0): score 0 but still ranked
    assert list(d4.token) == ["common"] and d4.tfidf.iloc[0] == 0.0
    # min_df pruning drops hapaxes entirely
    df2 = tfidf_top_terms(docs, top_k=2, min_df=2).to_pandas()
    assert "rare" not in set(df2.token) and "zeta" not in set(df2.token)


def test_repetition_stats(ray_session):
    from decisions_knowledge_graph_data_ray.stages.text_analysis import repetition_stats

    docs = rd.from_items(
        [
            {"doc_id": 1, "text": "a a a a"},           # max repetition
            {"doc_id": 2, "text": "w x y z"},           # no repetition
            {"doc_id": 3, "text": ""},                  # empty
            {"doc_id": 4, "text": "solo"},              # one word, no 2-grams
        ]
    )
    df = repetition_stats(docs).to_pandas().set_index("doc_id")
    assert df.loc[1, "ttr"] == 0.25 and df.loc[1, "top_word_share"] == 1.0
    assert df.loc[1, "dup_2gram_frac"] == 1.0 - 1.0 / 3.0
    assert df.loc[2, "ttr"] == 1.0 and df.loc[2, "dup_2gram_frac"] == 0.0
    assert df.loc[3, "n_words"] == 0 and df.loc[3, "ttr"] == 0.0
    assert df.loc[4, "dup_2gram_frac"] == 0.0


def test_gopher_filter_rules_and_order(ray_session):
    import pandas as pd

    from decisions_knowledge_graph_data_ray.stages.text_analysis import gopher_filter

    long_ok = " ".join(f"word{i}" for i in range(60))           # distinct, clean
    short = "too few words here"                                 # word_count
    repetitive = " ".join(["alpha beta"] * 40)                   # low ttr AND dup2
    rows = [
        {"doc_id": 0, "text": long_ok},
        {"doc_id": 1, "text": short},
        {"doc_id": 2, "text": repetitive},
        {"doc_id": 3, "text": ""},
    ]
    out = (
        gopher_filter(rd.from_items(rows))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "keep"] and out.loc[0, "drop_reason"] == "ok"
    assert not out.loc[1, "keep"] and out.loc[1, "drop_reason"] == "word_count"
    # rule ORDER: repetitive doc fails ttr before dup2 (fixed first-fail order)
    assert not out.loc[2, "keep"] and out.loc[2, "drop_reason"] == "low_ttr"
    assert out.loc[3, "drop_reason"] == "word_count" and out.loc[3, "n_words"] == 0
    # partition-invariant (pure map)
    out2 = (
        gopher_filter(rd.from_items(rows).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_bm25_scores_match_serial(ray_session):
    import math
    import re

    import pandas as pd

    from decisions_knowledge_graph_data_ray.stages.text_analysis import bm25_scores

    word_re = re.compile(r"[a-z0-9]+")
    rows = [
        {"doc_id": 0, "text": "join join filter scan extra words here"},
        {"doc_id": 1, "text": "filter only appears once in this longer doc " * 3},
        {"doc_id": 2, "text": "nothing relevant at all whatsoever"},
        {"doc_id": 3, "text": "scan scan scan"},
    ]
    terms = ["join", "filter", "scan"]
    out = (
        bm25_scores(rd.from_items(rows), query_terms=terms)
        .to_pandas()
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )
    # serial BM25 truth
    toks = {r["doc_id"]: word_re.findall(r["text"].lower()) for r in rows}
    n = len(rows)
    avgdl = sum(len(w) for w in toks.values()) / n
    want = []
    for d in sorted(toks):
        for t in sorted(terms):
            tf = toks[d].count(t)
            if tf == 0:
                continue
            df = sum(1 for w in toks.values() if t in w)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            want.append(
                {
                    "doc_id": d, "term": t, "tf": tf,
                    "score": idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * len(toks[d]) / avgdl)),
                }
            )
    pd.testing.assert_frame_equal(out, pd.DataFrame(want), check_exact=True)
    # doc 2 never scores; per-doc tf ordering sane
    assert 2 not in set(out["doc_id"])


def test_unigram_surprisal_matches_serial(ray_session):
    import math
    import re
    from collections import Counter

    import pandas as pd

    from decisions_knowledge_graph_data_ray.stages.text_analysis import (
        unigram_surprisal,
    )

    word_re = re.compile(r"[a-z0-9]+")
    rows = [
        {"doc_id": 0, "text": "common common common words words here"},
        {"doc_id": 1, "text": "rare singleton tokens zxqj wvmb common"},
        {"doc_id": 2, "text": "words here common"},
    ]
    out = (
        unigram_surprisal(rd.from_items(rows))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    toks = {r["doc_id"]: word_re.findall(r["text"].lower()) for r in rows}
    c: Counter = Counter()
    for w in toks.values():
        c.update(w)
    total = sum(c.values())
    for d, words in toks.items():
        want = -(sum(math.log(c[t] / total) for t in words) / len(words))
        assert out.loc[d, "avg_surprisal"] == want  # bit-exact left fold
        assert out.loc[d, "n_tokens"] == len(words)
    # rare-token doc scores strictly higher than the common-token doc
    assert out.loc[1, "avg_surprisal"] > out.loc[0, "avg_surprisal"]
    # partition-invariant
    out2 = (
        unigram_surprisal(rd.from_items(rows).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)
