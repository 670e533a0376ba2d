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

EXTRACTIONS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("self_ecli", pa.string()),
        ("cited_provisions", pa.list_(PROVISION_STRUCT)),
        ("cited_decisions", pa.list_(DECISION_STRUCT)),
        ("references", REFERENCES_STRUCT),
        ("keywords", pa.list_(pa.string())),
        ("micro_summary", pa.string()),
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
}

# strict draft-07-style schema for one extraction record (validated with
# jsonschema inside the extract stage; additionalProperties:false like AJV)
EXTRACTION_JSON_SCHEMA = {
    "type": "object",
    "additionalProperties": False,
    "required": [
        "conv_id", "self_ecli", "cited_provisions", "cited_decisions",
        "references", "keywords", "micro_summary",
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
                    "internal_decision_id",
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
    },
}
