"""Solr IndexSchema: schema.xml parsing — field types with analyzer
chains, dynamic-field globs, copyField — applied to DataFrames.

Reference (solr/core/src/java/org/apache/solr/schema/IndexSchema.java):
- fieldType/field/dynamicField/copyField/uniqueKey elements (readSchema,
  java:455-600), accepted both under <fields>/<types> wrappers and flat
  (the 4.x schema evolution supports either nesting).
- Dynamic field patterns are prefix* / *suffix / exact only
  (DynamicReplacement.DynamicPattern.createPattern, java:933-941) and
  match longest-regex-first (compareTo, java:988-990; the sort at
  java:691-694 "largest to smallest so we don't get short-circuited").
- resolve order (getFieldOrNull/getField): explicit field, then the
  first (longest) matching dynamic pattern, else SolrException.
- copyField (registerCopyField, java:777-860): source may be a glob
  (matching explicit fields and dynamic patterns), dest must be an
  explicit field or match a dynamic pattern; maxChars truncates the
  copied value (CopyField.getLimitedValue); copying multiple sources
  into a non-multiValued dest logs the java:594-606 warning — here it
  raises, because the reference fails the same way later, at add time.
- Analyzer config: <analyzer type="index|query"> with <tokenizer
  class="solr.XFactory"/> + <filter class="solr.YFactory" .../> chains
  (FieldTypePluginLoader); one <analyzer> with no type serves both.

The factory registry below maps solr.*Factory class names onto this
repo's analysis implementations (the same code the vectorized build
chains call), giving a schema-driven analyze() for query parsing and
diagnostics. Corpus-scale analysis stays on the engine's JVM/Arrow build
chains (build_index tokenizer=...) — this module is the driver-side
schema surface: per-field chain resolution, ingest-time copyField as ONE
Catalyst projection (no UDFs — withColumns of concat/substring/flatten),
and the uniqueKey contract.

External resource files referenced by factories (words=, synonyms=,
protected=) are supplied via the `resources` dict (filename → list of
lines), mirroring the ResourceLoader the reference hands its factories.
"""

from __future__ import annotations

import fnmatch
import re
import xml.etree.ElementTree as ET
from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis.analyzer import (
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    _java_lower,
    _PY_TOKEN_RE,
)

__all__ = ["IndexSchema", "SchemaField", "FieldType", "SUPPORTED_FACTORIES"]

_TRUE = ("true", "1", "yes")


def _xml_guard(xml_str: str) -> None:
    # same hardening as the query XML parser: no DOCTYPE/entity tricks
    if "<!DOCTYPE" in xml_str or "<!ENTITY" in xml_str:
        raise ValueError("schema.xml must not contain a DOCTYPE declaration")


# ---------------------------------------------------------------------------
# analyzer factory registry: solr.XFactory name -> stage builder
# tokenizer stage: (args) -> Callable[[str], list[str]]
# filter stage:    (args, resources) -> Callable[[list[str]], list[str]]
# ---------------------------------------------------------------------------

def _std_tokenize(text: str) -> list[str]:
    return [m.group(0) for m in _PY_TOKEN_RE.finditer(text)]


def _res_words(args: dict, resources: dict, key: str) -> frozenset[str]:
    name = args.get(key)
    if not name:
        return frozenset()
    if name not in resources:
        raise KeyError(
            f"factory references {key}={name!r}; pass its lines in "
            f"IndexSchema.from_xml(resources={{{name!r}: [...]}})")
    return frozenset(
        w.strip() for w in resources[name]
        if w.strip() and not w.lstrip().startswith("#"))


def _tok_standard(args):
    maxlen = int(args.get("maxTokenLength", MAX_TOKEN_LENGTH))
    return lambda t: [w for w in _std_tokenize(t) if len(w) <= maxlen]


def _tok_classic(args):
    from ..analysis.classic import classic_tokenize

    return lambda t: [w for w, _ in classic_tokenize(t)]


def _tok_urlemail(args):
    from ..analysis.urlemail import uax29_url_email_tokenize

    return lambda t: [w for w, _ in uax29_url_email_tokenize(t)]


def _tok_pattern(args):
    pat = re.compile(args.get("pattern", r"\W+"))
    group = int(args.get("group", -1))
    from ..analysis.tokenizers import pattern_tokenize

    return lambda t: pattern_tokenize(t, pat.pattern, group)


def _tok_path(args):
    from ..analysis.tokenizers import path_hierarchy, reverse_path_hierarchy

    delim = args.get("delimiter", "/")
    repl = args.get("replace", delim)
    skip = int(args.get("skip", 0))
    fn = (reverse_path_hierarchy
          if args.get("reverse", "").lower() in _TRUE else path_hierarchy)
    return lambda t: [
        w for w, _ in fn(t, delimiter=delim, replacement=repl, skip=skip)]


def _tok_simple(name):
    from ..analysis import tokenizers as tk

    fn = {"whitespace": tk.whitespace_tokenize, "letter": tk.letter_tokenize,
          "keyword": tk.keyword_tokenize, "lowercase": tk.lowercase_tokenize}[name]
    return lambda args: fn


_TOKENIZERS: dict[str, Callable] = {
    "solr.StandardTokenizerFactory": _tok_standard,
    "solr.ClassicTokenizerFactory": _tok_classic,
    "solr.UAX29URLEmailTokenizerFactory": _tok_urlemail,
    "solr.WhitespaceTokenizerFactory": _tok_simple("whitespace"),
    "solr.LetterTokenizerFactory": _tok_simple("letter"),
    "solr.KeywordTokenizerFactory": _tok_simple("keyword"),
    "solr.LowerCaseTokenizerFactory": _tok_simple("lowercase"),
    "solr.PatternTokenizerFactory": _tok_pattern,
    "solr.PathHierarchyTokenizerFactory": _tok_path,
}


def _mk_filters() -> dict[str, Callable]:
    from ..analysis import phonetic2
    from ..analysis.asciifolding import fold_str
    from ..analysis.english import porter_stem, strip_possessive
    from ..analysis.kstem import kstem
    from ..analysis.miscfilters2 import (
        capitalization,
        remove_duplicates,
        scandinavian_folding,
        scandinavian_normalization,
    )
    from ..analysis.snowball_registry import snowball_stem
    from ..analysis.worddelimiter import DEFAULT_FLAGS, word_delimiter

    def per_token(fn):
        return lambda args, res: (
            lambda toks: [fn(t) for t in toks if fn(t)])

    def stop_filter(args, res):
        words = _res_words(args, res, "words") or ENGLISH_STOP_WORDS
        if args.get("ignoreCase", "").lower() in _TRUE:
            lowered = frozenset(w.lower() for w in words)
            return lambda toks: [t for t in toks if t.lower() not in lowered]
        return lambda toks: [t for t in toks if t not in words]

    def keep_word(args, res):
        words = _res_words(args, res, "words")
        if args.get("ignoreCase", "").lower() in _TRUE:
            lowered = frozenset(w.lower() for w in words)
            return lambda toks: [t for t in toks if t.lower() in lowered]
        return lambda toks: [t for t in toks if t in words]

    def protect(args, res):
        """KeywordMarkerFilter: later stem stages skip protected words —
        modeled by mapping protected tokens through unchanged (the stem
        factories below check the chain's protected set)."""
        words = _res_words(args, res, "protected")

        def stage(toks):
            return toks

        stage.protected = words  # consumed by ChainAnalyzer
        return stage

    def stemmer(fn):
        def make(args, res):
            def stage(toks, _protected=frozenset()):
                return [t if t in _protected else fn(t) for t in toks]

            stage.wants_protected = True
            return stage

        return make

    def snowball(args, res):
        lang = args.get("language", "English")

        def stage(toks, _protected=frozenset()):
            return [t if t in _protected else snowball_stem(lang, t)
                    for t in toks]

        stage.wants_protected = True
        return stage

    def length_filter(args, res):
        lo, hi = int(args.get("min", 0)), int(args.get("max", 1 << 31))
        return lambda toks: [t for t in toks if lo <= len(t) <= hi]

    def pattern_replace(args, res):
        pat = re.compile(args["pattern"])
        repl = args.get("replacement", "")
        first = args.get("replace", "all") == "first"
        fn = (lambda t: pat.sub(repl, t, count=1)) if first else \
            (lambda t: pat.sub(repl, t))
        return lambda toks: [fn(t) for t in toks]

    def word_delim(args, res):
        flags = DEFAULT_FLAGS if not args else _wd_flags(args)
        protected = _res_words(args, res, "protected")
        return lambda toks: [
            w for w, _ in word_delimiter(
                [(t, 1) for t in toks], flags=flags, protected=protected)]

    def _wd_flags(args):
        from ..analysis import worddelimiter as wd

        names = {
            "generateWordParts": wd.GENERATE_WORD_PARTS,
            "generateNumberParts": wd.GENERATE_NUMBER_PARTS,
            "catenateWords": wd.CATENATE_WORDS,
            "catenateNumbers": wd.CATENATE_NUMBERS,
            "catenateAll": wd.CATENATE_ALL,
            "preserveOriginal": wd.PRESERVE_ORIGINAL,
            "splitOnCaseChange": wd.SPLIT_ON_CASE_CHANGE,
            "splitOnNumerics": wd.SPLIT_ON_NUMERICS,
            "stemEnglishPossessive": wd.STEM_ENGLISH_POSSESSIVE,
        }
        flags = 0
        for name, bit in names.items():
            default = name in ("generateWordParts", "generateNumberParts",
                               "splitOnCaseChange", "splitOnNumerics",
                               "stemEnglishPossessive")
            val = args.get(name)
            on = default if val is None else val in ("1", "true")
            if on:
                flags |= bit
        return flags

    def edge_ngrams(args, res):
        lo = int(args.get("minGramSize", 1))
        hi = int(args.get("maxGramSize", 1))
        return lambda toks: [
            t[:n] for t in toks for n in range(lo, min(hi, len(t)) + 1)]

    def ngrams(args, res):
        lo = int(args.get("minGramSize", 1))
        hi = int(args.get("maxGramSize", 2))
        return lambda toks: [
            t[i:i + n] for t in toks
            for n in range(lo, hi + 1) for i in range(len(t) - n + 1)]

    def shingle(args, res):
        lo = int(args.get("minShingleSize", 2))
        hi = int(args.get("maxShingleSize", 2))
        unigrams = args.get("outputUnigrams", "true") in _TRUE
        sep = args.get("tokenSeparator", " ")

        def stage(toks):
            out = []
            for i in range(len(toks)):
                if unigrams:
                    out.append(toks[i])
                for n in range(lo, hi + 1):
                    if i + n <= len(toks):
                        out.append(sep.join(toks[i:i + n]))
            return out

        return stage

    def common_grams(args, res):
        words = _res_words(args, res, "words") or ENGLISH_STOP_WORDS

        def stage(toks):
            out = []
            for i, t in enumerate(toks):
                out.append(t)
                if i + 1 < len(toks) and (t in words or toks[i + 1] in words):
                    out.append(f"{t}_{toks[i + 1]}")
            return out

        return stage

    def synonym(args, res):
        from ..analysis.synonyms import parse_synonyms

        name = args.get("synonyms")
        if not name:
            raise KeyError("SynonymFilterFactory requires synonyms=")
        smap = parse_synonyms(
            resources_get(res, name),
            expand=args.get("expand", "true") in _TRUE)
        ignore_case = args.get("ignoreCase", "").lower() in _TRUE

        def stage(toks):
            probes = [t.lower() for t in toks] if ignore_case else toks
            out, i = [], 0
            while i < len(toks):
                matched = False
                for lhs, alts in smap.rules.get(probes[i], ()):
                    if tuple(probes[i:i + len(lhs)]) == lhs:
                        for alt in alts:
                            out.extend(alt)
                        i += len(lhs)
                        matched = True
                        break
                if not matched:
                    out.append(toks[i])
                    i += 1
            return out

        return stage

    def resources_get(res, name):
        if name not in res:
            raise KeyError(
                f"synonyms={name!r} not in resources; pass its lines in "
                f"IndexSchema.from_xml(resources={{{name!r}: [...]}})")
        return res[name]

    def phonetic(args, res):
        enc = args.get("encoder", "DoubleMetaphone")
        inject = args.get("inject", "true") in _TRUE
        from ..analysis.phonetic2 import (
            caverphone2,
            cologne_phonetic,
            double_metaphone,
            metaphone,
        )

        def soundex(t):
            # classic Soundex (phonetic.py holds the Column variant)
            if not t:
                return t
            codes = {**dict.fromkeys("bfpv", "1"),
                     **dict.fromkeys("cgjkqsxz", "2"),
                     **dict.fromkeys("dt", "3"), "l": "4",
                     **dict.fromkeys("mn", "5"), "r": "6"}
            s = t.lower()
            out = [s[0].upper()]
            prev = codes.get(s[0], "")
            for ch in s[1:]:
                code = codes.get(ch, "")
                if code and code != prev:
                    out.append(code)
                if ch not in "hw":
                    prev = code
                if len(out) == 4:
                    break
            return "".join(out).ljust(4, "0")

        fns = {"Soundex": soundex, "Metaphone": lambda t: metaphone(t),
               "DoubleMetaphone": lambda t: double_metaphone(t)[0],
               "Caverphone": caverphone2, "Caverphone2": caverphone2,
               "ColognePhonetic": cologne_phonetic}
        fn = fns[enc]
        if inject:
            return lambda toks: [x for t in toks
                                 for x in ((t, fn(t)) if fn(t) else (t,))]
        return lambda toks: [fn(t) or t for t in toks]

    def limit_count(args, res):
        n = int(args.get("maxTokenCount", 1 << 31))
        return lambda toks: toks[:n]

    return {
        "solr.LowerCaseFilterFactory":
            lambda a, r: (lambda toks: [_java_lower(t) for t in toks]),
        "solr.StopFilterFactory": stop_filter,
        "solr.KeepWordFilterFactory": keep_word,
        "solr.KeywordMarkerFilterFactory": protect,
        "solr.PorterStemFilterFactory": stemmer(porter_stem),
        "solr.KStemFilterFactory": stemmer(kstem),
        "solr.SnowballPorterFilterFactory": snowball,
        "solr.EnglishPossessiveFilterFactory":
            lambda a, r: (lambda toks: [strip_possessive(t) for t in toks]),
        "solr.ASCIIFoldingFilterFactory":
            lambda a, r: (lambda toks: [fold_str(t) for t in toks]),
        "solr.WordDelimiterFilterFactory": word_delim,
        "solr.SynonymFilterFactory": synonym,
        "solr.EdgeNGramFilterFactory": edge_ngrams,
        "solr.NGramFilterFactory": ngrams,
        "solr.ShingleFilterFactory": shingle,
        "solr.CommonGramsFilterFactory": common_grams,
        "solr.LengthFilterFactory": length_filter,
        "solr.TrimFilterFactory":
            lambda a, r: (lambda toks: [t.strip() for t in toks]),
        "solr.PatternReplaceFilterFactory": pattern_replace,
        "solr.ReverseStringFilterFactory":
            lambda a, r: (lambda toks: [t[::-1] for t in toks]),
        "solr.CapitalizationFilterFactory":
            lambda a, r: (lambda toks: [capitalization(t) for t in toks]),
        "solr.RemoveDuplicatesTokenFilterFactory":
            lambda a, r: (lambda toks: [
                w for w, _ in remove_duplicates([(t, 1) for t in toks])]),
        "solr.ScandinavianNormalizationFilterFactory":
            lambda a, r: (lambda toks: [
                scandinavian_normalization(t) for t in toks]),
        "solr.ScandinavianFoldingFilterFactory":
            lambda a, r: (lambda toks: [
                scandinavian_folding(t) for t in toks]),
        "solr.PhoneticFilterFactory": phonetic,
        "solr.LimitTokenCountFilterFactory": limit_count,
    }


_FILTERS = _mk_filters()
SUPPORTED_FACTORIES = tuple(sorted(_TOKENIZERS)) + tuple(sorted(_FILTERS))


class ChainAnalyzer:
    """A compiled tokenizer + filter chain; KeywordMarker protected sets
    flow into downstream stem stages exactly as the marker attribute
    does in the reference stream."""

    def __init__(self, tokenizer, stages):
        self.tokenizer = tokenizer
        protected: frozenset[str] = frozenset()
        self.stages = []
        for st in stages:
            protected = protected | getattr(st, "protected", frozenset())
            self.stages.append((st, getattr(st, "wants_protected", False)))
        self.protected = protected

    def __call__(self, text: str | None) -> list[str]:
        if not text:
            return []
        toks = self.tokenizer(text)
        for st, wants in self.stages:
            toks = st(toks, _protected=self.protected) if wants else st(toks)
        return [t for t in toks if t]


class FieldType:
    def __init__(self, name: str, class_: str, props: dict,
                 index_chain: ChainAnalyzer | None,
                 query_chain: ChainAnalyzer | None):
        self.name = name
        self.class_ = class_
        self.props = props
        self.index_chain = index_chain
        self.query_chain = query_chain

    # spark type for the schema's StructType rendering
    SPARK_TYPES = {
        "solr.StrField": "string", "solr.TextField": "string",
        "solr.BoolField": "boolean",
        "solr.TrieIntField": "int", "solr.IntField": "int",
        "solr.TrieLongField": "long", "solr.LongField": "long",
        "solr.TrieFloatField": "float", "solr.FloatField": "float",
        "solr.TrieDoubleField": "double", "solr.DoubleField": "double",
        "solr.TrieDateField": "timestamp", "solr.DateField": "timestamp",
        "solr.BinaryField": "binary", "solr.UUIDField": "string",
        "solr.RandomSortField": "string",
    }

    @property
    def spark_type(self) -> str:
        return self.SPARK_TYPES.get(self.class_, "string")


class SchemaField:
    def __init__(self, name: str, ftype: FieldType, props: dict):
        self.name = name
        self.type = ftype
        self.props = {**ftype.props, **props}

    @property
    def multi_valued(self) -> bool:
        return str(self.props.get("multiValued", "false")).lower() in _TRUE

    @property
    def indexed(self) -> bool:
        return str(self.props.get("indexed", "true")).lower() in _TRUE

    @property
    def stored(self) -> bool:
        return str(self.props.get("stored", "true")).lower() in _TRUE


class _DynamicField:
    """prefix* / *suffix / exact patterns, longest-first precedence."""

    def __init__(self, regex: str, ftype: FieldType, props: dict):
        self.regex = regex
        self.ftype = ftype
        self.props = props
        if regex.startswith("*"):
            suffix = regex[1:]
            self.matches = lambda n: n.endswith(suffix)
        elif regex.endswith("*"):
            prefix = regex[:-1]
            self.matches = lambda n: n.startswith(prefix)
        else:
            self.matches = lambda n: n == regex

    def make(self, name: str) -> SchemaField:
        return SchemaField(name, self.ftype, self.props)


_PROP_ATTRS = ("indexed", "stored", "multiValued", "required", "omitNorms",
               "termVectors", "termPositions", "termOffsets", "docValues",
               "default")


class IndexSchema:
    def __init__(self):
        self.name = ""
        self.version = "1.5"
        self.types: dict[str, FieldType] = {}
        self.fields: dict[str, SchemaField] = {}
        self.dynamic_fields: list[_DynamicField] = []
        self.copy_fields: list[tuple[str, str, int | None]] = []
        self.unique_key: str | None = None

    # -- parsing ----------------------------------------------------------
    @classmethod
    def from_xml(cls, xml_str: str,
                 resources: dict[str, Sequence[str]] | None = None
                 ) -> "IndexSchema":
        _xml_guard(xml_str)
        resources = dict(resources or {})
        root = ET.fromstring(xml_str)
        if root.tag != "schema":
            raise ValueError(f"root element must be <schema>, got {root.tag}")
        self = cls()
        self.name = root.get("name", "")
        self.version = root.get("version", "1.5")

        # both nested (<types>/<fields>) and flat layouts
        def findall(tag):
            return root.findall(f".//{tag}")

        for el in findall("fieldType") + findall("fieldtype"):
            self._add_type(el, resources)
        for el in findall("field"):
            self._add_field(el)
        for el in findall("dynamicField"):
            self._add_dynamic(el)
        # longest-regex-first, stable (IndexSchema.java:691-694)
        self.dynamic_fields.sort(key=lambda d: -len(d.regex))
        for el in findall("copyField"):
            mc = el.get("maxChars")
            self._register_copy(el.get("source"), el.get("dest"),
                                int(mc) if mc else None)
        uk = root.find(".//uniqueKey")
        if uk is not None and uk.text:
            self.unique_key = uk.text.strip()
            if self.unique_key not in self.fields:
                raise ValueError(
                    f"uniqueKey '{self.unique_key}' is not an explicit field")
        return self

    def _compile_chain(self, analyzer_el, resources) -> ChainAnalyzer:
        tok_el = analyzer_el.find("tokenizer")
        if tok_el is None:
            # <analyzer class="..."/> single-class analyzers: map the core
            # ones onto their chains
            cls_name = analyzer_el.get("class", "")
            if "StandardAnalyzer" in cls_name:
                return ChainAnalyzer(
                    _tok_standard({}),
                    [_FILTERS["solr.LowerCaseFilterFactory"]({}, {}),
                     _FILTERS["solr.StopFilterFactory"]({}, {})])
            if "WhitespaceAnalyzer" in cls_name:
                return ChainAnalyzer(_tok_simple("whitespace")({}), [])
            if "KeywordAnalyzer" in cls_name:
                return ChainAnalyzer(_tok_simple("keyword")({}), [])
            raise KeyError(f"unsupported analyzer class {cls_name!r}")
        tcls = tok_el.get("class")
        if tcls not in _TOKENIZERS:
            raise KeyError(
                f"unsupported tokenizer {tcls!r}; supported: "
                f"{[k for k in SUPPORTED_FACTORIES if 'Tokenizer' in k]}")
        tokenizer = _TOKENIZERS[tcls](dict(tok_el.attrib))
        stages = []
        for f_el in analyzer_el.findall("filter"):
            fcls = f_el.get("class")
            if fcls not in _FILTERS:
                raise KeyError(
                    f"unsupported filter {fcls!r}; supported: "
                    f"{[k for k in SUPPORTED_FACTORIES if 'Filter' in k]}")
            args = {k: v for k, v in f_el.attrib.items() if k != "class"}
            stages.append(_FILTERS[fcls](args, resources))
        return ChainAnalyzer(tokenizer, stages)

    def _add_type(self, el, resources) -> None:
        name = el.get("name")
        cls_name = el.get("class", "solr.TextField")
        props = {k: v for k, v in el.attrib.items()
                 if k in _PROP_ATTRS or k in ("positionIncrementGap",
                                              "omitTermFreqAndPositions")}
        index_chain = query_chain = None
        for an in el.findall("analyzer"):
            chain = self._compile_chain(an, resources)
            atype = an.get("type")
            if atype == "query":
                query_chain = chain
            elif atype == "index":
                index_chain = chain
            else:
                index_chain = query_chain = chain
        self.types[name] = FieldType(name, cls_name, props,
                                     index_chain, query_chain)

    def _field_props(self, el) -> dict:
        return {k: v for k, v in el.attrib.items()
                if k not in ("name", "type")}

    def _add_field(self, el) -> None:
        name, tname = el.get("name"), el.get("type")
        if tname not in self.types:
            raise ValueError(f"field {name!r}: unknown type {tname!r}")
        self.fields[name] = SchemaField(
            name, self.types[tname], self._field_props(el))

    def _add_dynamic(self, el) -> None:
        name, tname = el.get("name"), el.get("type")
        if not (name.startswith("*") or name.endswith("*")):
            raise ValueError(
                f"dynamicField {name!r} must start or end with '*'")
        if tname not in self.types:
            raise ValueError(f"dynamicField {name!r}: unknown type {tname!r}")
        self.dynamic_fields.append(
            _DynamicField(name, self.types[tname], self._field_props(el)))

    def _register_copy(self, source, dest, max_chars) -> None:
        src_is_glob = "*" in source
        if not src_is_glob and source not in self.fields and \
                not any(d.matches(source) for d in self.dynamic_fields):
            raise ValueError(
                f"copyField source :'{source}' is not a glob and doesn't "
                f"match any explicit field or dynamicField.")
        if dest not in self.fields and \
                not any(d.matches(dest) for d in self.dynamic_fields):
            raise ValueError(
                f"copyField dest :'{dest}' is not an explicit field and "
                f"doesn't match a dynamicField.")
        self.copy_fields.append((source, dest, max_chars))

    # -- resolution -------------------------------------------------------
    def resolve(self, name: str) -> SchemaField:
        """getField: explicit, else longest matching dynamic pattern."""
        if name in self.fields:
            return self.fields[name]
        for d in self.dynamic_fields:
            if d.matches(name):
                return d.make(name)
        raise KeyError(f"undefined field: \"{name}\"")

    def analyzer(self, field_name: str, mode: str = "index") -> ChainAnalyzer:
        sf = self.resolve(field_name)
        chain = (sf.type.query_chain if mode == "query"
                 else sf.type.index_chain)
        if chain is None:
            # non-text types analyze to the raw value (keyword semantics)
            return ChainAnalyzer(lambda t: [t], [])
        return chain

    def analyze(self, field_name: str, text: str,
                mode: str = "index") -> list[str]:
        return self.analyzer(field_name, mode)(text)

    # -- copyField as a Catalyst projection -------------------------------
    def apply_copy_fields(self, df: DataFrame) -> DataFrame:
        """Add every copyField dest present-able from df's columns — one
        withColumns projection, no UDFs: values truncate via substring
        (CopyField.getLimitedValue), multiValued dests collect all
        source values into an array (flattening multiValued sources)."""
        cols = set(df.columns)
        by_dest: dict[str, list[tuple[str, int | None]]] = {}
        for source, dest, mc in self.copy_fields:
            srcs = (fnmatch.filter(sorted(cols), source)
                    if "*" in source else
                    ([source] if source in cols else []))
            for s in srcs:
                by_dest.setdefault(dest, []).append((s, mc))

        new_cols = {}
        for dest, srcs in by_dest.items():
            dsf = self.resolve(dest)
            multi = {f.name for f in df.schema.fields
                     if f.dataType.typeName() == "array"}

            def val(s, mc):
                c = F.col(s)
                if s in multi:
                    c = F.transform(
                        c, lambda x: F.substring(x.cast("string"), 1, mc)
                        if mc else x.cast("string"))
                    return c
                c = c.cast("string")
                return F.array(F.substring(c, 1, mc) if mc else c)

            arrays = [val(s, mc) for s, mc in srcs]
            combined = F.flatten(F.array(*arrays)) if len(arrays) > 1 \
                else arrays[0]
            combined = F.filter(combined, lambda x: x.isNotNull())
            if dsf.multi_valued:
                new_cols[dest] = combined
            else:
                n_sources = len(srcs) + sum(1 for s, _ in srcs if s in multi)
                if len(srcs) > 1 or any(s in multi for s, _ in srcs):
                    raise ValueError(
                        f"copyField dest {dest!r} is not multiValued but "
                        f"receives {n_sources} source values — the "
                        f"reference fails this add at index time")
                new_cols[dest] = F.element_at(combined, 1)
        return df.withColumns(new_cols) if new_cols else df

    def struct_type_ddl(self) -> str:
        """The schema's explicit fields as a Spark DDL string."""
        parts = []
        for name, sf in self.fields.items():
            t = sf.type.spark_type
            if sf.multi_valued:
                t = f"array<{t}>"
            parts.append(f"`{name}` {t}")
        return ", ".join(parts)
