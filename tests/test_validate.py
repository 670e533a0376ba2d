"""Compiled validator ≡ jsonschema on the extraction schema.

Builds real extraction records from synthetic documents, then applies a
bank of targeted mutations (missing keys, wrong types, enum violations,
pattern violations, extra keys, length/minimum violations) and checks the
compiled validator agrees with jsonschema.Draft7Validator on VALIDITY for
every case.
"""

import copy

import jsonschema
import pytest

from decisions_knowledge_graph_data_ray import schemas
from decisions_knowledge_graph_data_ray.functions.document import extract_document
from decisions_knowledge_graph_data_ray.functions.validate import (
    UnsupportedSchema,
    compile_validator,
    first_error_fn,
)
from decisions_knowledge_graph_data_ray.sources.transcripts import (
    conv_id_for,
    get_world,
    n_turns_for,
    render_turn_text,
    self_ecli_for,
)


def _records(n=40):
    world = get_world()
    recs = []
    for c in range(n):
        text = "\n".join(
            f"user: {render_turn_text(c, t, world)}" for t in range(n_turns_for(c, 1))
        )
        recs.append(
            extract_document(
                {"conv_id": conv_id_for(c), "text": text, "self_ecli": self_ecli_for(c)}
            )
        )
    return recs


def _agree(rec):
    ref = jsonschema.Draft7Validator(schemas.EXTRACTION_JSON_SCHEMA)
    fast = compile_validator(schemas.EXTRACTION_JSON_SCHEMA)
    ref_err = next(iter(ref.iter_errors(rec)), None)
    fast_err = fast(rec)
    assert (ref_err is None) == (fast_err is None), (
        f"disagreement: jsonschema={getattr(ref_err, 'message', None)!r} "
        f"compiled={fast_err!r}"
    )
    return fast_err


def test_valid_records_pass():
    for rec in _records():
        assert _agree(rec) is None


def _mutations(rec):
    muts = []

    def m(label, fn):
        r = copy.deepcopy(rec)
        fn(r)
        muts.append((label, r))

    m("missing required top key", lambda r: r.pop("keywords"))
    m("extra top key", lambda r: r.update(bogus=1))
    m("wrong type conv_id", lambda r: r.update(conv_id=7))
    m("empty conv_id (minLength)", lambda r: r.update(conv_id=""))
    m("micro_summary too long", lambda r: r.update(micro_summary="x" * 201))
    m("keywords too many", lambda r: r.update(keywords=["k"] * 11))
    m("keywords wrong item type", lambda r: r.update(keywords=[1]))
    m("references missing key", lambda r: r["references"].pop("url_eu"))
    m("references extra key", lambda r: r["references"].update(zz=[]))
    m("outcome wrong type", lambda r: r.update(outcome=None))
    m("bool where integer", lambda r: r.update(conv_id=True))

    if rec["cited_provisions"]:
        m(
            "provision bad id pattern",
            lambda r: r["cited_provisions"][0].update(internal_provision_id="NOPE"),
        )
        m(
            "provision seq below minimum",
            lambda r: r["cited_provisions"][0].update(provision_seq=0),
        )
        m(
            "provision bad date pattern",
            lambda r: r["cited_provisions"][0].update(parent_act_date="2020/01/01"),
        )
        m(
            "provision null date ok-null union exercised",
            lambda r: r["cited_provisions"][0].update(parent_act_date=None),
        )
        m(
            "provision missing key",
            lambda r: r["cited_provisions"][0].pop("act_seq"),
        )
    if rec["cited_decisions"]:
        m(
            "decision bad treatment enum",
            lambda r: r["cited_decisions"][0].update(treatment="MAYBE"),
        )
        m(
            "decision snippet too long",
            lambda r: r["cited_decisions"][0].update(snippet="s" * 1001),
        )
    if rec["legal_teachings"]:
        m(
            "teaching bad clarity enum",
            lambda r: r["legal_teachings"][0].update(clarity="FUZZY"),
        )
        m(
            "teaching binding wrong type",
            lambda r: r["legal_teachings"][0].update(binding="yes"),
        )
        m(
            "teaching refines_parent fails both anyOf branches",
            lambda r: r["legal_teachings"][0].update(refines_parent="not-an-id"),
        )
        m(
            "teaching refines_parent null (anyOf null branch valid)",
            lambda r: r["legal_teachings"][0].update(refines_parent=None),
        )
    if rec["parties"]:
        m(
            "party bad type enum",
            lambda r: r["parties"][0].update(party_type="ROBOT"),
        )
    return muts


def test_mutated_records_agree():
    recs = _records()
    n_invalid = 0
    for rec in recs:
        for label, mut in _mutations(rec):
            err = _agree(mut)
            if err is not None:
                n_invalid += 1
    assert n_invalid > 100  # the mutation bank must actually trip validation


def test_unsupported_falls_back():
    with pytest.raises(UnsupportedSchema):
        compile_validator({"type": "string", "format": "date"})
    fb = first_error_fn({"type": "string", "format": "date"})
    assert fb("2020-01-01") is None  # jsonschema path (format not asserted)
    assert fb(5) is not None
