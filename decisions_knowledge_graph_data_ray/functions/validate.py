"""Compiled JSON-schema validation (draft-07 subset).

The extract stage validates EVERY record against
``schemas.EXTRACTION_JSON_SCHEMA``; ``jsonschema.Draft7Validator`` walks
its keyword protocol object-by-object and dominated the extraction actor's
CPU profile (>50%). This module compiles the bounded subset the engine's
schemas actually use — ``type`` (incl. null unions), ``enum``, ``pattern``,
``minLength``/``maxLength``, ``minimum``, ``maxItems``, ``required``,
``additionalProperties: false``, nested ``properties``/``items`` — into
plain Python closures built ONCE per actor. ``compile_validator`` raises
``UnsupportedSchema`` on any keyword outside the subset so the caller
(stages/extract.py) can fall back to full jsonschema semantics for
injected extractors with richer schemas.

Keyword semantics mirror draft-07: each keyword constrains only instances
of its applicable type (``pattern`` ignores non-strings, ``minimum``
ignores non-numbers, …), ``pattern`` uses search-anywhere matching, and
booleans are not integers.

Reference parity: the reference validates LLM output with compiled AJV
(/root/reference/src/jobs/JobConfig.ts:119-169) — compile-once closures
are exactly the AJV design point.
"""

from __future__ import annotations

import re
from typing import Any, Callable


class UnsupportedSchema(Exception):
    """Schema uses a keyword outside the compiled subset."""


_KNOWN_KEYWORDS = {
    "type", "enum", "pattern", "minLength", "maxLength", "minimum",
    "maxItems", "required", "additionalProperties", "properties", "items",
    "anyOf",
}


def _type_ok(value: Any, t: str) -> bool:
    if t == "string":
        return isinstance(value, str)
    if t == "integer":
        return isinstance(value, int) and not isinstance(value, bool)
    if t == "number":
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if t == "boolean":
        return isinstance(value, bool)
    if t == "null":
        return value is None
    if t == "array":
        return isinstance(value, list)
    if t == "object":
        return isinstance(value, dict)
    raise UnsupportedSchema(f"unknown type {t!r}")


def compile_validator(schema: dict, path: str = "$") -> Callable[[Any], str | None]:
    """schema → fn(value) -> first error message, or None when valid."""
    unknown = set(schema) - _KNOWN_KEYWORDS
    if unknown:
        raise UnsupportedSchema(f"{path}: unsupported keywords {sorted(unknown)}")

    checks: list[Callable[[Any], str | None]] = []

    if "anyOf" in schema:
        branches = tuple(
            compile_validator(s, f"{path}|anyOf[{i}]")
            for i, s in enumerate(schema["anyOf"])
        )

        def _check_any_of(v, branches=branches, path=path):
            if any(b(v) is None for b in branches):
                return None
            return f"{path}: {v!r} is not valid under any of the given schemas"

        checks.append(_check_any_of)

    types = schema.get("type")
    if types is not None:
        tlist = [types] if isinstance(types, str) else list(types)
        for t in tlist:
            _type_ok(None, t)  # raise early on unknown type names

        def _check_type(v, tlist=tuple(tlist), path=path):
            if not any(_type_ok(v, t) for t in tlist):
                return f"{path}: {v!r} is not of type {'/'.join(tlist)}"
            return None

        checks.append(_check_type)

    if "enum" in schema:
        allowed = schema["enum"]
        if any(isinstance(x, bool) or not isinstance(x, (str, int, float, type(None))) for x in allowed):
            raise UnsupportedSchema(f"{path}: non-scalar/bool enum")
        allowed_set = frozenset(allowed)

        def _check_enum(v, allowed_set=allowed_set, path=path):
            # bools are equal to 0/1 in Python but distinct in JSON Schema
            if isinstance(v, bool) or not isinstance(v, (str, int, float, type(None))) or v not in allowed_set:
                return f"{path}: {v!r} is not one of the allowed values"
            return None

        checks.append(_check_enum)

    if "pattern" in schema:
        rx = re.compile(schema["pattern"])

        def _check_pattern(v, rx=rx, path=path):
            if isinstance(v, str) and rx.search(v) is None:
                return f"{path}: {v!r} does not match {rx.pattern!r}"
            return None

        checks.append(_check_pattern)

    if "minLength" in schema:
        n = schema["minLength"]
        checks.append(
            lambda v, n=n, path=path: (
                f"{path}: {v!r} is shorter than {n}" if isinstance(v, str) and len(v) < n else None
            )
        )
    if "maxLength" in schema:
        n = schema["maxLength"]
        checks.append(
            lambda v, n=n, path=path: (
                f"{path}: string longer than {n}" if isinstance(v, str) and len(v) > n else None
            )
        )
    if "minimum" in schema:
        n = schema["minimum"]
        checks.append(
            lambda v, n=n, path=path: (
                f"{path}: {v!r} is less than the minimum of {n}"
                if isinstance(v, (int, float)) and not isinstance(v, bool) and v < n
                else None
            )
        )
    if "maxItems" in schema:
        n = schema["maxItems"]
        checks.append(
            lambda v, n=n, path=path: (
                f"{path}: array longer than {n}" if isinstance(v, list) and len(v) > n else None
            )
        )

    if "required" in schema:
        req = tuple(schema["required"])

        def _check_required(v, req=req, path=path):
            if isinstance(v, dict):
                for k in req:
                    if k not in v:
                        return f"{path}: {k!r} is a required property"
            return None

        checks.append(_check_required)

    props = schema.get("properties")
    if props is not None:
        compiled_props = {k: compile_validator(s, f"{path}.{k}") for k, s in props.items()}
        addl = schema.get("additionalProperties", True)
        if addl not in (True, False):
            raise UnsupportedSchema(f"{path}: additionalProperties must be a boolean")
        allowed_keys = frozenset(compiled_props)

        def _check_props(v, compiled_props=compiled_props, addl=addl,
                         allowed_keys=allowed_keys, path=path):
            if not isinstance(v, dict):
                return None
            if not addl:
                for k in v:
                    if k not in allowed_keys:
                        return f"{path}: additional property {k!r} is not allowed"
            for k, sub in compiled_props.items():
                if k in v:
                    err = sub(v[k])
                    if err is not None:
                        return err
            return None

        checks.append(_check_props)
    elif schema.get("additionalProperties") is False:

        def _check_no_props(v, path=path):
            if isinstance(v, dict) and v:
                return f"{path}: additional properties are not allowed"
            return None

        checks.append(_check_no_props)

    items = schema.get("items")
    if items is not None:
        if not isinstance(items, dict):
            raise UnsupportedSchema(f"{path}: tuple-form items")
        sub = compile_validator(items, f"{path}[]")

        def _check_items(v, sub=sub):
            if isinstance(v, list):
                for x in v:
                    err = sub(x)
                    if err is not None:
                        return err
            return None

        checks.append(_check_items)

    def validate(value, checks=tuple(checks)):
        for c in checks:
            err = c(value)
            if err is not None:
                return err
        return None

    return validate


def first_error_fn(schema: dict) -> Callable[[Any], str | None]:
    """Compiled validator when the schema fits the subset, else a jsonschema
    Draft7Validator wrapper with identical call semantics."""
    try:
        return compile_validator(schema)
    except UnsupportedSchema:
        import jsonschema

        v = jsonschema.Draft7Validator(schema)
        return lambda rec: next((e.message for e in v.iter_errors(rec)), None)
