"""Arrow schemas + JSON Schemas for stage outputs.

The reference enforces a strict draft-07 JSON Schema per job output via AJV
(/root/reference/src/utils/validators.ts:27-112, src/jobs/JobConfig.ts:141-169).
Our engine does the same: every extraction record is validated against
EXTRACTION_JSON_SCHEMA inside the extract stage; invalid rows are routed to
the failures table with the reference's reason taxonomy
(ConcurrentProcessor.ts:758-777).
"""

from __future__ import annotations

import pyarrow as pa

# failure reason taxonomy (ConcurrentProcessor.ts:758-777)
REASON_REQUEST_ERROR = "Request Error"
REASON_SCHEMA_VALIDATION = "Schema Validation"
REASON_POST_PROCESSING = "Post-Processing Error"
REASON_WRITE_ERROR = "Write Error"

TRANSCRIPTS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("text", pa.string()),
        ("n_turns", pa.int32()),
        ("text_len", pa.int64()),
        ("length_category", pa.string()),
        ("self_ecli", pa.string()),
    ]
)

PROVISION_STRUCT = pa.struct(
    [
        ("provision_seq", pa.int32()),
        ("act_seq", pa.int32()),
        ("provision_number", pa.string()),
        ("provision_number_key", pa.string()),
        ("parent_act_name", pa.string()),
        ("parent_act_type", pa.string()),
        ("parent_act_date", pa.string()),
        ("internal_provision_id", pa.string()),
        ("internal_parent_act_id", pa.string()),
    ]
)

DECISION_STRUCT = pa.struct(
    [
        ("decision_seq", pa.int32()),
        ("ecli", pa.string()),
        ("court_name", pa.string()),
        ("date", pa.string()),
        ("case_number", pa.string()),
        ("treatment", pa.string()),
        ("type", pa.string()),
        ("jurisdiction", pa.string()),
        ("confidence", pa.string()),
        ("internal_decision_id", pa.string()),
        ("snippet", pa.string()),
        ("snippet_matched_on", pa.string()),
    ]
)

REFERENCES_STRUCT = pa.struct(
    [
        ("url_eu", pa.list_(pa.string())),
        ("url_be", pa.list_(pa.string())),
        ("eu_extracted", pa.list_(pa.string())),
        ("eu_verified", pa.list_(pa.string())),
        ("be_extracted", pa.list_(pa.string())),
        ("be_verified_numac", pa.list_(pa.string())),
        ("be_verified_file_number", pa.list_(pa.string())),
    ]
)

TEACHING_STRUCT = pa.struct(
    [
        ("teaching_seq", pa.int32()),
        ("teaching_id", pa.string()),
        ("text", pa.string()),
        ("court_verbatim", pa.string()),
        ("court_verbatim_language", pa.string()),
        ("factual_trigger", pa.string()),
        ("relevant_factual_context", pa.string()),
        ("principle_type", pa.string()),
        ("legal_area", pa.string()),
        ("court_level", pa.string()),
        ("binding", pa.bool_()),
        ("clarity", pa.string()),
        ("novel_principle", pa.bool_()),
        ("refines_parent", pa.string()),
        ("refined_by", pa.list_(pa.string())),
        ("exception_to", pa.string()),
        ("excepted_by", pa.list_(pa.string())),
        ("conflicts_with", pa.list_(pa.string())),
        ("related_provision_ids", pa.list_(pa.string())),
        ("related_decision_ids", pa.list_(pa.string())),
        ("source_author", pa.string()),
    ]
)

PARTY_STRUCT = pa.struct(
    [
        ("party_seq", pa.int32()),
        ("internal_party_id", pa.string()),
        ("name", pa.string()),
        ("party_type", pa.string()),
        ("procedural_role", pa.string()),
    ]
)

EXTRACTIONS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("self_ecli", pa.string()),
        ("cited_provisions", pa.list_(PROVISION_STRUCT)),
        ("cited_decisions", pa.list_(DECISION_STRUCT)),
        ("references", REFERENCES_STRUCT),
        ("keywords", pa.list_(pa.string())),
        ("micro_summary", pa.string()),
        ("legal_teachings", pa.list_(TEACHING_STRUCT)),
        ("parties", pa.list_(PARTY_STRUCT)),
        ("outcome", pa.string()),
    ]
)

LINKS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("mention_internal_id", pa.string()),
        ("kind", pa.string()),
        ("method", pa.string()),
        ("matched_entity", pa.string()),
        ("score", pa.int32()),
    ]
)

TRIPLES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("conv_id", pa.string()),
        ("score", pa.int32()),
    ]
)

FAILURES_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("stage", pa.string()),
        ("reason", pa.string()),
        ("error", pa.string()),
    ]
)

_ID_PATTERNS = {
    "internal_provision_id": r"^ART-.+-\d{3}$",
    "internal_parent_act_id": r"^ACT-.+-\d{3}$",
    "internal_decision_id": r"^DEC-.+-\d{3}$",
    # ref extract-legal-teachings/schema.ts:37-40, extract-comprehensive/config.ts:214-218
    "teaching_id": r"^TEACH-[a-zA-Z0-9:.]+-\d{3}$",
    "internal_party_id": r"^PARTY-[a-zA-Z0-9:.]+-\d{3}$",
}

_TEACH_REF = {
    "anyOf": [{"type": "string", "pattern": _ID_PATTERNS["teaching_id"]}, {"type": "null"}]
}
_TEACH_REF_LIST = {
    "type": "array", "items": {"type": "string", "pattern": _ID_PATTERNS["teaching_id"]}
}

TEACHING_JSON_SCHEMA = {
    "type": "object",
    "additionalProperties": False,
    "required": [
        "teaching_seq", "teaching_id", "text", "court_verbatim",
        "court_verbatim_language", "factual_trigger", "relevant_factual_context",
        "principle_type", "legal_area", "court_level", "binding", "clarity",
        "novel_principle", "refines_parent", "refined_by", "exception_to",
        "excepted_by", "conflicts_with", "related_provision_ids",
        "related_decision_ids", "source_author",
    ],
    "properties": {
        "teaching_seq": {"type": "integer", "minimum": 1},
        "teaching_id": {"type": "string", "pattern": _ID_PATTERNS["teaching_id"]},
        "text": {"type": "string", "minLength": 10, "maxLength": 1000},
        "court_verbatim": {"type": "string", "minLength": 10, "maxLength": 2000},
        "court_verbatim_language": {"enum": ["FR", "NL"]},
        "factual_trigger": {"type": "string", "minLength": 5, "maxLength": 300},
        "relevant_factual_context": {"type": "string", "minLength": 5, "maxLength": 500},
        "principle_type": {
            "enum": [
                "INTERPRETATION_RULE", "APPLICATION_STANDARD", "LEGAL_TEST",
                "BURDEN_PROOF", "BALANCING_TEST", "PROCEDURAL_RULE", "REMEDIAL_PRINCIPLE",
            ]
        },
        "legal_area": {
            "enum": [
                "DISCRIMINATION_LAW", "DATA_PROTECTION", "EMPLOYMENT_LAW",
                "CONTRACT_LAW", "CIVIL_LIABILITY", "ADMINISTRATIVE_LAW",
                "PROCEDURAL_LAW", "COMPETITION_LAW", "INTELLECTUAL_PROPERTY",
                "FAMILY_LAW", "OTHER",
            ]
        },
        "court_level": {"enum": ["CASSATION", "APPEAL", "FIRST_INSTANCE"]},
        "binding": {"type": "boolean"},
        "clarity": {"enum": ["EXPLICIT", "IMPLICIT"]},
        "novel_principle": {"type": "boolean"},
        "refines_parent": _TEACH_REF,
        "refined_by": _TEACH_REF_LIST,
        "exception_to": _TEACH_REF,
        "excepted_by": _TEACH_REF_LIST,
        "conflicts_with": _TEACH_REF_LIST,
        "related_provision_ids": {
            "type": "array",
            "items": {"type": "string", "pattern": _ID_PATTERNS["internal_provision_id"]},
        },
        "related_decision_ids": {
            "type": "array",
            "items": {"type": "string", "pattern": _ID_PATTERNS["internal_decision_id"]},
        },
        "source_author": {"enum": ["RULE_BASED", "AI_GENERATED"]},
    },
}

PARTY_JSON_SCHEMA = {
    "type": "object",
    "additionalProperties": False,
    "required": ["party_seq", "internal_party_id", "name", "party_type", "procedural_role"],
    "properties": {
        "party_seq": {"type": "integer", "minimum": 1},
        "internal_party_id": {"type": "string", "pattern": _ID_PATTERNS["internal_party_id"]},
        "name": {"type": "string", "minLength": 2, "maxLength": 200},
        "party_type": {
            "enum": [
                "NATURAL_PERSON", "LEGAL_ENTITY", "PUBLIC_AUTHORITY",
                "DE_FACTO_ASSOCIATION", "OTHER", "UNCLEAR",
            ]
        },
        "procedural_role": {"type": "string", "minLength": 1},
    },
}

# strict draft-07-style schema for one extraction record (validated with
# jsonschema inside the extract stage; additionalProperties:false like AJV)
EXTRACTION_JSON_SCHEMA = {
    "type": "object",
    "additionalProperties": False,
    "required": [
        "conv_id", "self_ecli", "cited_provisions", "cited_decisions",
        "references", "keywords", "micro_summary", "legal_teachings",
        "parties", "outcome",
    ],
    "properties": {
        "conv_id": {"type": "string", "minLength": 1},
        "self_ecli": {"type": "string"},
        "cited_provisions": {
            "type": "array",
            "items": {
                "type": "object",
                "additionalProperties": False,
                "required": [
                    "provision_seq", "act_seq", "provision_number",
                    "provision_number_key", "parent_act_name", "parent_act_type",
                    "parent_act_date", "internal_provision_id", "internal_parent_act_id",
                ],
                "properties": {
                    "provision_seq": {"type": "integer", "minimum": 1},
                    "act_seq": {"type": "integer", "minimum": 1},
                    "provision_number": {"type": "string"},
                    "provision_number_key": {"type": "string"},
                    "parent_act_name": {"type": "string", "minLength": 1},
                    "parent_act_type": {"type": "string"},
                    "parent_act_date": {"type": ["string", "null"], "pattern": r"^\d{4}-\d{2}-\d{2}$"},
                    "internal_provision_id": {"type": "string", "pattern": _ID_PATTERNS["internal_provision_id"]},
                    "internal_parent_act_id": {"type": "string", "pattern": _ID_PATTERNS["internal_parent_act_id"]},
                },
            },
        },
        "cited_decisions": {
            "type": "array",
            "items": {
                "type": "object",
                "additionalProperties": False,
                "required": [
                    "decision_seq", "ecli", "court_name", "date", "case_number",
                    "treatment", "type", "jurisdiction", "confidence",
                    "internal_decision_id", "snippet", "snippet_matched_on",
                ],
                "properties": {
                    "decision_seq": {"type": "integer", "minimum": 1},
                    "ecli": {"type": ["string", "null"]},
                    "court_name": {"type": ["string", "null"]},
                    "date": {"type": ["string", "null"], "pattern": r"^\d{4}-\d{2}-\d{2}$"},
                    "case_number": {"type": ["string", "null"]},
                    "treatment": {"enum": ["FOLLOWED", "DISTINGUISHED", "OVERRULED", "CITED", "UNCERTAIN"]},
                    "type": {"type": "string"},
                    "jurisdiction": {"enum": ["BE", "EU", "INT", "UNKNOWN"]},
                    "confidence": {"enum": ["HIGH", "MEDIUM", "LOW"]},
                    "internal_decision_id": {"type": "string", "pattern": _ID_PATTERNS["internal_decision_id"]},
                    "snippet": {"type": "string", "maxLength": 1000},
                    "snippet_matched_on": {
                        "enum": ["", "ECLI", "CASE_NUMBER", "COURT_DATE", "COURT_ONLY"]
                    },
                },
            },
        },
        "references": {
            "type": "object",
            "additionalProperties": False,
            "required": [
                "url_eu", "url_be", "eu_extracted", "eu_verified",
                "be_extracted", "be_verified_numac", "be_verified_file_number",
            ],
            "properties": {
                k: {"type": "array", "items": {"type": "string"}}
                for k in (
                    "url_eu", "url_be", "eu_extracted", "eu_verified",
                    "be_extracted", "be_verified_numac", "be_verified_file_number",
                )
            },
        },
        "keywords": {"type": "array", "items": {"type": "string"}, "maxItems": 10},
        "micro_summary": {"type": "string", "maxLength": 200},
        "legal_teachings": {"type": "array", "items": TEACHING_JSON_SCHEMA},
        "parties": {"type": "array", "items": PARTY_JSON_SCHEMA},
        "outcome": {"type": "string"},
    },
}
