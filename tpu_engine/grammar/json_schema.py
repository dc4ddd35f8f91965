"""JSON Schema -> GBNF grammar compiler.

Rebuild of the json_schema_to_grammar capability the reference uses for
OpenAI `response_format: json_object/json_schema`
(/root/reference/src/llama_engine.cc:6,794-802; SURVEY.md section 2b).
Supports: object (properties/required/additionalProperties), array
(items/minItems/maxItems), string (enum/const, minLength/maxLength),
number/integer (no range constraint), boolean, null, anyOf/oneOf,
$ref "#/definitions/..." and "#/$defs/...", and bare {} (any JSON value).
"""

from __future__ import annotations

import json
import re

_PRIMITIVES = {
    "space": r'" "?',
    "boolean": r'("true" | "false") space',
    "null": r'"null" space',
    "number": r'("-"? ([0-9] | [1-9] [0-9]*)) ("." [0-9]+)? ([eE] [-+]? [0-9]+)? space',
    "integer": r'("-"? ([0-9] | [1-9] [0-9]*)) space',
    "string": r'"\"" char* "\"" space',
    "char": r'[^"\\\x7F\x00-\x1F] | [\\] (["\\bfnrt/] | "u" [0-9a-fA-F]{4})',
    "value": r"object | array | string | number | boolean | null",
    "object": r'"{" space ( string ":" space value ("," space string ":" space value)* )? "}" space',
    "array": r'"[" space ( value ("," space value)* )? "]" space',
}


def _fmt_literal(s: str) -> str:
    out = json.dumps(s)  # JSON escaping is GBNF-compatible for strings
    return out


class _Compiler:
    def __init__(self, schema: dict):
        self.schema = schema
        self.rules: dict[str, str] = {"space": _PRIMITIVES["space"]}
        self.counter = 0

    def _use(self, prim: str) -> str:
        if prim not in self.rules:
            self.rules[prim] = _PRIMITIVES[prim]
            # pull in dependencies
            for dep in ("char", "string", "value", "object", "array", "number",
                        "boolean", "null"):
                if dep != prim and re.search(rf"\b{dep}\b", _PRIMITIVES[prim]):
                    self._use(dep)
        return prim

    def _fresh(self, hint: str) -> str:
        self.counter += 1
        name = re.sub(r"[^a-zA-Z0-9-]", "-", hint) or "r"
        return f"{name}{self.counter}"

    def _resolve_ref(self, ref: str) -> dict:
        if not ref.startswith("#/"):
            raise ValueError(f"unsupported $ref {ref}")
        node = self.schema
        for part in ref[2:].split("/"):
            node = node[part]
        return node

    def compile_node(self, schema, name: str) -> str:
        """Returns a GBNF expression (rule name or inline) for the schema."""
        if schema is True or schema == {}:
            self._use("value")
            return "value"
        if "$ref" in schema:
            return self.compile_node(self._resolve_ref(schema["$ref"]), name)
        if "const" in schema:
            return f"{_fmt_literal(json.dumps(schema['const']))} space"
        if "enum" in schema:
            alts = " | ".join(_fmt_literal(json.dumps(v)) for v in schema["enum"])
            rule = self._fresh(name)
            self.rules[rule] = f"({alts}) space"
            return rule
        for key in ("anyOf", "oneOf"):
            if key in schema:
                alts = " | ".join(
                    self.compile_node(sub, f"{name}-{i}")
                    for i, sub in enumerate(schema[key])
                )
                rule = self._fresh(name)
                self.rules[rule] = alts
                return rule
        ty = schema.get("type")
        if isinstance(ty, list):
            alts = " | ".join(
                self.compile_node({**schema, "type": t}, f"{name}-{t}") for t in ty
            )
            rule = self._fresh(name)
            self.rules[rule] = alts
            return rule
        if ty == "object" or (ty is None and "properties" in schema):
            return self._compile_object(schema, name)
        if ty == "array":
            return self._compile_array(schema, name)
        if ty == "string":
            if "minLength" in schema or "maxLength" in schema:
                self._use("char")
                lo = int(schema.get("minLength", 0))
                hi = schema.get("maxLength")
                rep = f"{{{lo},{hi}}}" if hi is not None else f"{{{lo},}}"
                rule = self._fresh(name)
                self.rules[rule] = f'"\\"" char{rep} "\\"" space'
                return rule
            return self._use("string")
        if ty in ("number", "integer", "boolean", "null"):
            return self._use(ty)
        self._use("value")
        return "value"

    def _compile_object(self, schema: dict, name: str) -> str:
        props = schema.get("properties", {})
        required = set(schema.get("required", list(props)))
        parts: list[str] = ['"{" space']
        first = True
        # required properties in declaration order; optional ones become ( ... )?
        for key, sub in props.items():
            expr = self.compile_node(sub, f"{name}-{key}")
            kv = f'{_fmt_literal(json.dumps(key))} space ":" space {expr}'
            sep = "" if first else '"," space '
            if key in required:
                parts.append(f"{sep}{kv}")
                first = False
            else:
                parts.append(f"({sep}{kv})?")
        if not props:
            if schema.get("additionalProperties", True):
                self._use("object")
                return "object"
        parts.append('"}" space')
        rule = self._fresh(name)
        self.rules[rule] = " ".join(parts)
        return rule

    def _compile_array(self, schema: dict, name: str) -> str:
        items = schema.get("items", {})
        expr = self.compile_node(items if items is not True else {}, f"{name}-item")
        lo = int(schema.get("minItems", 0))
        hi = schema.get("maxItems")
        rule = self._fresh(name)
        if lo == 0 and hi is None:
            self.rules[rule] = f'"[" space ({expr} ("," space {expr})*)? "]" space'
        else:
            n_more_lo = max(lo - 1, 0)
            if hi is None:
                tail = f'("," space {expr}){{{n_more_lo},}}'
                body = f"{expr} {tail}"
            else:
                n_more_hi = max(int(hi) - 1, 0)
                body = f'{expr} ("," space {expr}){{{n_more_lo},{n_more_hi}}}'
            if lo == 0:
                self.rules[rule] = f'"[" space ({body})? "]" space'
            else:
                self.rules[rule] = f'"[" space {body} "]" space'
        return rule


def json_schema_to_grammar(schema: dict | str) -> str:
    if isinstance(schema, str):
        schema = json.loads(schema) if schema.strip() else {}
    comp = _Compiler(schema if isinstance(schema, dict) else {})
    root_expr = comp.compile_node(comp.schema, "root")
    lines = [f"root ::= {root_expr} space" if root_expr != "value" else "root ::= value"]
    for rname, body in comp.rules.items():
        lines.append(f"{rname} ::= {body}")
    return "\n".join(lines) + "\n"
