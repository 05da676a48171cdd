"""Extract the KStem lexicon into lucene_solr_spark/analysis/kstem_data.py.

The word lists are SPEC DATA: KStemData1-8.java hold the published kstem
head-word lexicon (Bob Krovetz / Sergio Guzman-Lara, UMass CIIR), and
KStemmer.java embeds the exception/conflation tables. Matching the
reference REQUIRES the identical sets; everything around them is original.

Run from the repo root:  python tools/extract_kstem_data.py
"""

from __future__ import annotations

import pathlib
import re

REF = pathlib.Path(
    "/root/reference/lucene/analysis/common/src/java/org/apache/lucene/"
    "analysis/en")
OUT = pathlib.Path(__file__).resolve().parent.parent / \
    "lucene_solr_spark" / "analysis" / "kstem_data.py"


def java_strings(text: str) -> list[str]:
    return [m.group(1) for m in re.finditer(r'"([^"]*)"', text)]


def array_block(src: str, name: str) -> str:
    m = re.search(rf'{name}\s*=\s*\{{(.*?)\}};', src, re.S)
    return m.group(1)


def main() -> None:
    stemmer = (REF / "KStemmer.java").read_text(encoding="utf-8")
    exception_words = java_strings(array_block(stemmer, "exceptionWords"))
    pairs = re.findall(r'\{"([^"]*)",\s*"([^"]*)"\}',
                       array_block(stemmer, "directConflations"))
    country = re.findall(r'\{"([^"]*)",\s*"([^"]*)"\}',
                         array_block(stemmer, "countryNationality"))
    supplement = java_strings(array_block(stemmer, "supplementDict"))
    proper = java_strings(array_block(stemmer, "properNouns"))

    lexicon: list[str] = []
    for i in range(1, 9):
        src = (REF / f"KStemData{i}.java").read_text(encoding="utf-8")
        lexicon.extend(java_strings(array_block(src, "data")))

    def lit(name, obj):
        return f"{name} = {obj!r}\n\n"

    with OUT.open("w", encoding="utf-8") as fh:
        fh.write('"""KStem lexicon (GENERATED — tools/extract_kstem_data.'
                 'py)\nfrom KStemmer.java:75-224 and KStemData1-8.java.\n'
                 '"""\n\n')
        fh.write(lit("EXCEPTION_WORDS", exception_words))
        fh.write(lit("DIRECT_CONFLATIONS", pairs))
        fh.write(lit("COUNTRY_NATIONALITY", country))
        fh.write(lit("SUPPLEMENT_DICT", supplement))
        fh.write(lit("PROPER_NOUNS", proper))
        fh.write(lit("LEXICON", lexicon))
    print(f"wrote {OUT}: {len(lexicon)} lexicon words, "
          f"{len(exception_words)} exceptions, {len(pairs)} conflations, "
          f"{len(country)} nationalities, {len(supplement)}+{len(proper)} "
          "supplement/proper")


if __name__ == "__main__":
    main()
