"""LanguageIdentifierUpdateProcessor (solr/contrib/langid) as a DataFrame
transform.

Reference: solr/contrib/langid/src/java/org/apache/solr/update/processor/
LanguageIdentifierUpdateProcessor.java — the processor semantics
(process():200-262, resolveLanguage():332-361, normalizeLangCode():368-375,
getMappedField():387-398, getFallbackLang():268-283) are reproduced exactly;
the pluggable detectLanguage() (the reference delegates to the external
Tika/LangDetect jars, which it does not ship) is provided by a stop-word /
script-range heuristic detector built from the SAME per-language stop lists
the analyzers already carry (analysis/langdata.py).

Spark-first: detection and the whole processor are pure column expressions —
script-char counts via regexp_count, per-language stop-hit counts via
array filters over one JVM-tokenized array, argmax via array_max over
(hits, lang) structs. One narrow projection: no UDF, no shuffle, no collect;
at 100 TB this is a single codegen'd map stage.

Field-language mapping (langid.map): Solr writes the value into a
per-document field named text_<lang>. The relational re-expression is one
output COLUMN per (field, candidate language) — a doc's text lands in
exactly the one whose language matched, the rest stay null (free under
parquet's columnar nulls). The candidate set must therefore be static:
whitelist if configured, else the detector registry + the fallback value.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

from ..analysis import langdata
from ..analysis.analyzer import ENGLISH_STOP_WORDS, token_array

# --- detector registry ------------------------------------------------------

# Latin-script languages decided by stop-word argmax (the same Snowball stop
# lists the analyzer chains use, langdata.py). 'br' is the reference's
# Brazilian-Portuguese list (folded, accent-free) — kept out: it shadows pt.
_LATIN_STOPS: dict[str, frozenset] = {
    "en": ENGLISH_STOP_WORDS,
    "ca": langdata.STOP_CA, "cs": langdata.STOP_CZ, "da": langdata.STOP_DA,
    "de": langdata.STOP_DE, "es": langdata.STOP_ES, "eu": langdata.STOP_EU,
    "fi": langdata.STOP_FI, "fr": langdata.STOP_FR, "ga": langdata.STOP_GA,
    "gl": langdata.STOP_GL, "hu": langdata.STOP_HU, "id": langdata.STOP_ID,
    "it": langdata.STOP_IT, "lv": langdata.STOP_LV, "nl": langdata.STOP_NL,
    "no": langdata.STOP_NO, "pt": langdata.STOP_PT,
    # the snowball list spells ş/ţ with cedillas (U+015F/U+0163); modern
    # Romanian text uses comma-below (U+0219/U+021B) — match both
    "ro": langdata.STOP_RO | frozenset(
        w.replace("ş", "ș").replace("ţ", "ț")
        for w in langdata.STOP_RO
    ),
    "sv": langdata.STOP_SV, "tr": langdata.STOP_TR,
}

# Script-decided languages: (lang, char-class). Certainty = script share of
# letters. Order matters: kana before han (Japanese text mixes both).
_SCRIPT_CLASSES = [
    ("th", "[ก-๛]"),
    ("he", "[֐-״]"),
    ("el", "[Ͱ-Ͽἀ-῿]"),
    ("hy", "[԰-֏]"),
    ("hi", "[ऀ-ॿ]"),
    ("ko", "[가-힣ᄀ-ᇿ]"),
    ("ja", "[぀-ゟ゠-ヿ]"),
    ("zh", "[一-鿿㐀-䶿]"),
]
_ARABIC_CLASS = "[؀-ۿ]"
_CYRILLIC_CLASS = "[Ѐ-ӿ]"

DETECTOR_LANGS: tuple[str, ...] = tuple(sorted(
    set(_LATIN_STOPS) | {s for s, _ in _SCRIPT_CLASSES} | {"ar", "fa", "ru", "bg"}
))

_MIN_TOKENS = 3  # below this the detector abstains (languagelist empty)
_SCRIPT_SHARE = 0.30  # a script owning ≥30% of letters decides
# Latin certainty: stop-hit ratio scaled so ordinary prose (ratio ≈ 0.25-0.5)
# clears the reference's 0.5 default threshold and near-zero-hit text doesn't
_LATIN_SCALE = 3.0


def _stop_hits(toks: Column, stops: frozenset) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*sorted(stops))))


def _argmax(pairs: list[tuple[Column, str]]) -> Column:
    """struct(hits, lang) with the max hits (ties → larger lang code)."""
    return F.array_max(F.array(*[
        F.struct(h.alias("h"), F.lit(lang).alias("l")) for h, lang in pairs
    ]))


def detect_language(text: Column) -> Column:
    """struct(lang string, certainty double), or NULL when the detector
    abstains (too little text / no signal) — the empty-languagelist case of
    the reference's detectLanguage()."""
    toks = token_array(text)
    n_tok = F.size(toks)
    n_letters = F.regexp_count(text, F.lit(r"\p{L}"))

    def scount(cls: str) -> Column:
        return F.regexp_count(text, F.lit(cls))

    # innermost: Latin stop-word argmax
    latin_best = _argmax([
        (_stop_hits(toks, s), lang) for lang, s in sorted(_LATIN_STOPS.items())
    ])
    latin = F.when(
        (latin_best["h"] > 0) & (n_tok >= _MIN_TOKENS),
        F.struct(
            latin_best["l"].alias("lang"),
            F.least(
                F.lit(1.0),
                latin_best["h"] * _LATIN_SCALE / n_tok.cast("double"),
            ).alias("certainty"),
        ),
    )  # otherwise NULL: no stop hits anywhere / too short → abstain

    # Arabic script: ar vs fa by stop hits; Cyrillic: ru vs bg
    ar_share = scount(_ARABIC_CLASS) / n_letters.cast("double")
    ar_best = _argmax([(_stop_hits(toks, langdata.STOP_AR), "ar"),
                       (_stop_hits(toks, langdata.STOP_FA), "fa")])
    cy_share = scount(_CYRILLIC_CLASS) / n_letters.cast("double")
    cy_best = _argmax([(_stop_hits(toks, langdata.STOP_RU), "ru"),
                       (_stop_hits(toks, langdata.STOP_BG), "bg")])

    expr = F.when(
        ar_share >= _SCRIPT_SHARE,
        F.struct(ar_best["l"].alias("lang"), ar_share.alias("certainty")),
    ).when(
        cy_share >= _SCRIPT_SHARE,
        F.struct(cy_best["l"].alias("lang"), cy_share.alias("certainty")),
    )
    for lang, cls in _SCRIPT_CLASSES:
        share = scount(cls) / n_letters.cast("double")
        expr = expr.when(
            share >= _SCRIPT_SHARE,
            F.struct(F.lit(lang).alias("lang"), share.alias("certainty")),
        )
    # script branches only need letters (no-space scripts may tokenize to
    # a couple of run tokens); the Latin branch carries its own min-token
    # guard above
    expr = expr.otherwise(latin)
    return F.when(n_letters > 0, expr)


# --- resolveLanguage / normalizeLangCode / getMappedField -------------------


def _norm_lang(lang: Column, lcmap: dict[str, str] | None) -> Column:
    """normalizeLangCode (LanguageIdentifierUpdateProcessor.java:368-375)."""
    if not lcmap:
        return lang
    m = F.create_map(*[F.lit(x) for kv in lcmap.items() for x in kv])
    return F.coalesce(m[lang], lang)


def _resolve(
    detected: Column,
    fallback: Column,
    threshold: float,
    whitelist: set[str] | None,
    lcmap: dict[str, str] | None,
) -> Column:
    """resolveLanguage (…:332-361): NULL detection → fallback; whitelist
    check on the NORMALIZED code; certainty under threshold → fallback;
    null/empty resolution → ''."""
    norm = _norm_lang(detected["lang"], lcmap)
    picked = F.when(
        detected.isNull(), fallback
    ).otherwise(
        F.when(
            F.lit(whitelist is None or not whitelist)
            | norm.isin(*(sorted(whitelist) if whitelist else ["\x00"])),
            F.when(detected["certainty"] >= F.lit(threshold), norm)
            .otherwise(fallback),
        ).otherwise(fallback)
    )
    return F.coalesce(picked, F.lit(""))


def get_mapped_field(
    field: str,
    lang: str,
    map_pattern: str = r"(.*)",
    map_replace: str = "$1_{lang}",
    map_lcmap: dict[str, str] | None = None,
    schema_fields: set[str] | None = None,
) -> str | None:
    """getMappedField (…:387-398): map.lcmap applied to the code, then
    map.pattern→map.replace (Java replaceFirst, $N groups) with {lang}
    substituted. enforceSchema (schema_fields given) + unknown target →
    None, which langid_transform treats as the reference does (error)."""
    lc = (map_lcmap or {}).get(lang, lang)
    replace_py = re.sub(r"\$(\d+)", r"\\\1", map_replace)
    new_name = re.sub(map_pattern, replace_py, field, count=1)
    new_name = new_name.replace("{lang}", lc, 1)
    if schema_fields is not None and new_name not in schema_fields:
        return None
    return new_name


def langid_transform(
    df: DataFrame,
    fl: list[str],
    lang_field: str | None = None,
    langs_field: str | None = None,
    fallback: str | None = None,
    fallback_fields: list[str] | None = None,
    overwrite: bool = False,
    threshold: float = 0.5,
    whitelist: set[str] | None = None,
    lcmap: dict[str, str] | None = None,
    map_enable: bool = False,
    map_fl: list[str] | None = None,
    map_keep_orig: bool = False,
    map_individual: bool = False,
    map_individual_fl: list[str] | None = None,
    map_lcmap: dict[str, str] | None = None,
    map_pattern: str = r"(.*)",
    map_replace: str = "$1_{lang}",
    schema_fields: set[str] | None = None,
    map_langs: list[str] | None = None,
) -> DataFrame:
    """The processor (process(), …:200-262) over a DataFrame. Parameters
    mirror the langid.* request params 1:1 (fl, langField, langsField,
    fallback, fallbackFields, overwrite, threshold, whitelist, lcmap, map,
    map.fl, map.keepOrig, map.individual, map.individual.fl, map.lcmap,
    map.pattern, map.replace, enforceSchema via schema_fields).

    map_langs: the static candidate set for mapped output columns
    (default: whitelist, else detector registry + fallback value)."""
    if not fl:
        raise ValueError("langid: input fields (fl) must be specified")

    def _fallback_col() -> Column:
        # getFallbackLang: first PRESENT fallback field, else the value
        cols = [F.col(f) for f in (fallback_fields or []) if f in df.columns]
        cols.append(F.lit(fallback))
        return F.coalesce(*cols) if len(cols) > 1 else cols[0]

    fb = _fallback_col()
    # concatFields joins with a trailing space separator
    all_text = F.concat_ws(" ", *[F.coalesce(F.col(f), F.lit("")) for f in fl])
    detected = detect_language(all_text)
    detected_resolved = _resolve(detected, fb, threshold, whitelist, lcmap)

    pre_existing = lang_field is not None and lang_field in df.columns and not overwrite
    if pre_existing:
        # pre-existing value sanity-checked (certainty 1.0 path) per row;
        # rows with NULL behave like docs without the field → detect. The
        # stored field keeps its ORIGINAL value (the reference's "not
        # overwriting" branch); only docLang — used for mapping and
        # langsField — is the resolved form.
        existing = F.struct(
            F.col(lang_field).alias("lang"), F.lit(1.0).alias("certainty")
        )
        doc_lang = F.when(
            F.col(lang_field).isNotNull(),
            _resolve(existing, fb, threshold, whitelist, lcmap),
        ).otherwise(detected_resolved)
    else:
        doc_lang = detected_resolved

    out = df.withColumn("__doc_lang", doc_lang)
    doc_langs = [F.col("__doc_lang")]
    drop_cols = ["__doc_lang"]

    if map_enable:
        fields = [
            f for f in (map_fl if map_fl is not None else fl)
            if f in out.columns
        ]
        indiv = set(map_individual_fl if map_individual_fl is not None else fields)
        targets = list(
            map_langs
            if map_langs is not None
            else sorted(
                (set(whitelist) if whitelist else set(DETECTOR_LANGS))
                | ({fallback} if fallback else set())
            )
        )
        # per-field languages materialize as temp columns BEFORE any field
        # is dropped, so langsField can still reference them afterwards
        field_lang_col: dict[str, Column] = {}
        for f in fields:
            if map_individual and f in indiv:
                f_det = detect_language(F.col(f))
                # individual resolution falls back to the DOC language
                tmp = f"__lang_{f}"
                out = out.withColumn(
                    tmp,
                    _resolve(f_det, F.col("__doc_lang"), threshold, whitelist, lcmap),
                )
                drop_cols.append(tmp)
                field_lang_col[f] = F.col(tmp)
                doc_langs.append(F.col(tmp))
            else:
                field_lang_col[f] = F.col("__doc_lang")
        for f in fields:
            f_lang = field_lang_col[f]
            for lang in targets:
                mapped = get_mapped_field(
                    f, lang, map_pattern, map_replace, map_lcmap, schema_fields
                )
                if mapped is None:
                    raise ValueError(
                        f"langid: invalid output field mapping for {f} "
                        f"and language: {lang}"
                    )
                val = F.when(f_lang == lang, F.col(f))
                if mapped in out.columns:
                    val = F.coalesce(val, F.col(mapped))
                out = out.withColumn(mapped, val)

    if langs_field:
        out = out.withColumn(
            langs_field, F.array_distinct(F.array(*doc_langs))
        )
    if lang_field:
        if pre_existing:
            # rows WITH a value keep it (the "not overwriting" branch);
            # rows without one get the detected language written, exactly
            # like docs lacking the field in the reference
            out = out.withColumn(
                lang_field,
                F.coalesce(F.col(lang_field), F.col("__doc_lang")),
            )
        else:
            out = out.withColumn(lang_field, F.col("__doc_lang"))
    if map_enable and not map_keep_orig:
        for f in fields:
            out = out.drop(f)
    return out.drop(*drop_cols)
