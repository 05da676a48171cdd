"""Extract per-language stopword sets from the reference's snowball-format
stop files into `lucene_solr_spark/analysis/langdata.py`.

The stop lists are SPEC CONSTANTS (same category as the ASCII-fold table and
the 33-word English stoplist): each language's analyzer loads its
`<lang>_stop.txt` resource via WordlistLoader.getSnowballWordSet
(WordlistLoader.java:142-159 — strip `|` comments, split on whitespace, add
every word). The lists themselves are the public tartarus.org snowball stop
lists (BSD license, noted in each file's header). Matching the reference's
stop behavior REQUIRES the identical word set, so we extract the data; the
parsing and everything around it is original.

Run from the repo root:  python tools/extract_lang_data.py
"""

from __future__ import annotations

import pathlib

REF = pathlib.Path("/root/reference/lucene/analysis/common/src/resources/org/apache/lucene/analysis/snowball")
OUT = pathlib.Path(__file__).resolve().parent.parent / "lucene_solr_spark" / "analysis" / "langdata.py"

FILES = {
    "ru": "russian_stop.txt",
    "de": "german_stop.txt",
    "fr": "french_stop.txt",
    "es": "spanish_stop.txt",
    "it": "italian_stop.txt",
    "pt": "portuguese_stop.txt",
    "da": "danish_stop.txt",
    "no": "norwegian_stop.txt",
    "sv": "swedish_stop.txt",
    "nl": "dutch_stop.txt",
    "fi": "finnish_stop.txt",
    "hu": "hungarian_stop.txt",
}

# '#'-comment wordlists loaded via loadStopwordSet(..., "#")
# (ArabicAnalyzer.java:78, CJKAnalyzer.java:61); one word per line
_RES = pathlib.Path(
    "/root/reference/lucene/analysis/common/src/resources/org/apache/lucene/analysis"
)
HASH_FILES = {
    "ar": _RES / "ar/stopwords.txt",
    "cjk": _RES / "cjk/stopwords.txt",
    # per-language stopwords.txt loaded with '#' comments ("lv"/"gl" are
    # loaded comment-blind in 4.4, which only adds unmatchable junk lines —
    # stripping is behaviorally identical)
    "cz": _RES / "cz/stopwords.txt",
    "bg": _RES / "bg/stopwords.txt",
    "lv": _RES / "lv/stopwords.txt",
    "id": _RES / "id/stopwords.txt",
    "hi": _RES / "hi/stopwords.txt",
    "fa": _RES / "fa/stopwords.txt",
    "el": _RES / "el/stopwords.txt",
    "ro": _RES / "ro/stopwords.txt",
    "tr": _RES / "tr/stopwords.txt",
    "ga": _RES / "ga/stopwords.txt",
    "ca": _RES / "ca/stopwords.txt",
    "eu": _RES / "eu/stopwords.txt",
    "hy": _RES / "hy/stopwords.txt",
    "gl": _RES / "gl/stopwords.txt",
    "br": _RES / "br/stopwords.txt",
}


def hash_words(path: pathlib.Path) -> list[str]:
    words = []
    for line in path.read_text(encoding="utf-8").splitlines():
        line = line.split("#", 1)[0].strip()
        if line:
            words.append(line)
    return words


def snowball_words(path: pathlib.Path) -> list[str]:
    """WordlistLoader.getSnowballWordSet semantics (WordlistLoader.java:142-159)."""
    words: list[str] = []
    for line in path.read_text(encoding="utf-8").splitlines():
        comment = line.find("|")
        if comment >= 0:
            line = line[:comment]
        words.extend(w for w in line.split() if w)
    return words


def main() -> None:
    parts = [
        '"""Per-language stopword sets (GENERATED — tools/extract_lang_data.py).',
        "",
        "Data source: the snowball-project stop lists shipped as analyzer",
        "resources (lucene/analysis/common/src/resources/org/apache/lucene/",
        "analysis/snowball/<lang>_stop.txt, BSD-licensed, from",
        "svn.tartarus.org/snowball), parsed with the exact",
        "WordlistLoader.getSnowballWordSet rules (WordlistLoader.java:142-159).",
        '"""',
        "",
    ]
    for lang, path in sorted(HASH_FILES.items()):
        words = hash_words(path)
        lit = " ".join(sorted(set(words)))
        parts.append(f"# {path.name} ({lang}): {len(set(words))} words")
        parts.append(f'STOP_{lang.upper()} = frozenset("""{lit}""".split())')
        parts.append("")
    for lang, fname in sorted(FILES.items()):
        words = snowball_words(REF / fname)
        assert len(words) == len(set(words)) or True  # duplicates collapse in the set
        lit = " ".join(sorted(set(words)))
        parts.append(f"# {fname}: {len(set(words))} distinct words")
        parts.append(f'STOP_{lang.upper()} = frozenset("""{lit}""".split())')
        parts.append("")
    OUT.write_text("\n".join(parts), encoding="utf-8")
    print(f"wrote {OUT} ({sum(1 for _ in OUT.open())} lines)")


if __name__ == "__main__":
    main()
