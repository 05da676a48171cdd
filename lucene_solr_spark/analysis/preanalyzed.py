"""PreAnalyzedField (solr/core schema): documents arrive with their token
stream already analyzed, serialized in the JSON or "simple" text format.

Reference:
- JsonPreAnalyzedParser.java:55-96 — {"v":"1","str":...,"tokens":[{"t":
  term,"i":posIncr,"s":start,"e":end,"p":payload,"y":type,"f":flags}]};
  unknown VERSION raises.
- SimplePreAnalyzedParser.java:44-110 — `version (=stored=)? token(,a=v)*
  ...` with \\-escapes for space/comma/equals/backslash/n/r/t; attribute
  short names i/s/e/p/y/f.
- PreAnalyzedField.java — the index-time "analyzer" replays the parsed
  stream verbatim.

Index wiring: `build_index(tokenizer='preanalyzed')` parses the text
column with these parsers inside an Arrow UDF and feeds the inverter's
prefiltered path — position increments become the "" placeholder slots
the StopFilter convention already uses, so phrase positions are exact.
"""

from __future__ import annotations

import json

_SIMPLE_ESCAPES = {
    " ": " ", ",": ",", "=": "=", "\\": "\\", "n": "\n", "r": "\r", "t": "\t",
}


def parse_json_preanalyzed(val: str) -> dict:
    """→ {'stored': str|None, 'tokens': [(term, pos_incr)]}"""
    m = json.loads(val)
    version = m.get("v")
    if version is None:
        raise ValueError("Missing VERSION key")
    if version != "1":
        raise ValueError(f"Unknown VERSION '{version}', expected 1")
    toks = []
    for t in m.get("tokens", []):
        toks.append((str(t["t"]), int(t.get("i", 1))))
    return {"stored": m.get("str"), "tokens": toks}


def _split_simple(body: str) -> list[str]:
    """Split on unescaped spaces; keep escapes for the field splitter."""
    out, cur, i = [], [], 0
    while i < len(body):
        ch = body[i]
        if ch == "\\" and i + 1 < len(body):
            cur.append(ch)
            cur.append(body[i + 1])
            i += 2
            continue
        if ch == " ":
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        out.append("".join(cur))
    return out


def _unescape(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s):
            out.append(_SIMPLE_ESCAPES.get(s[i + 1], s[i + 1]))
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def _split_fields(tok: str) -> list[str]:
    """Split a token on unescaped commas (term, then name=value attribs)."""
    parts, cur, i = [], [], 0
    while i < len(tok):
        if tok[i] == "\\" and i + 1 < len(tok):
            cur.append(tok[i]); cur.append(tok[i + 1]); i += 2; continue
        if tok[i] == ",":
            parts.append("".join(cur)); cur = []
        else:
            cur.append(tok[i])
        i += 1
    parts.append("".join(cur))
    return parts


def parse_simple_preanalyzed(val: str) -> dict:
    """The text format (SimplePreAnalyzedParser grammar above)."""
    val = val.strip()
    sp = val.find(" ")
    version = val if sp < 0 else val[:sp]
    if version != "1":
        raise ValueError(f"Unknown VERSION '{version}', expected 1")
    body = "" if sp < 0 else val[sp + 1 :].lstrip()
    stored = None
    if body.startswith("="):
        # stored ::= "=" text "=" (inner = escaped)
        j, cur = 1, []
        while j < len(body):
            if body[j] == "\\" and j + 1 < len(body):
                cur.append(_SIMPLE_ESCAPES.get(body[j + 1], body[j + 1]))
                j += 2
                continue
            if body[j] == "=":
                break
            cur.append(body[j])
            j += 1
        if j >= len(body):
            raise ValueError("missing delimiter of the stored part")
        stored = "".join(cur)
        body = body[j + 1 :].lstrip()
    toks = []
    for raw in _split_simple(body):
        fields = _split_fields(raw)
        term = _unescape(fields[0])
        incr = 1
        for attr in fields[1:]:
            # attrib ::= name '=' value — both required, unescaped extras
            # rejected like SimplePreAnalyzedParser's state machine (a lone
            # "," — empty term, single empty attrib — is accepted there)
            if attr == "" and term == "" and len(fields) == 2:
                continue
            if "=" not in attr:
                raise ValueError(f"missing attribute value: '{attr}'")
            k, v = attr.split("=", 1)
            if not k or not v:
                raise ValueError(f"malformed attribute: '{attr}'")
            if _unescape(k) == "i":
                incr = int(_unescape(v))
        toks.append((term, incr))
    return {"stored": stored, "tokens": toks}


def parse_preanalyzed(val: str) -> dict:
    """Format sniff: JSON object vs the simple text grammar."""
    v = (val or "").lstrip()
    if v.startswith("{"):
        return parse_json_preanalyzed(v)
    return parse_simple_preanalyzed(v)


def preanalyzed_placeholder_tokens(val: str | None) -> list[str]:
    """Index-side array for the inverter's prefiltered path: one slot per
    POSITION — (posIncr−1) "" placeholders before each token, so a gap in
    increments is a consumed position exactly like a stopword slot."""
    if not val:
        return []
    out: list[str] = []
    for term, incr in parse_preanalyzed(val)["tokens"]:
        out.extend([""] * max(0, incr - 1))
        out.append(term)
    return out
