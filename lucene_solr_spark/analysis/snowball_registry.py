"""SnowballPorterFilterFactory analog: every Snowball language the
reference's factory accepts, by name (SnowballPorterFilterFactory.java:47
instantiates org.tartarus.snowball.ext.<Language>Stemmer).

All stemmers are re-derivations verified byte-identical against the
reference's own compiled classes (tools/stemmer_oracle.py fuzz + the
TestSnowballVocabData vocabularies). Kp and Lovins — obsolete academic
stemmers unused by any shipped analyzer and excluded from the reference's
own vocabulary test (TestSnowballVocab.java:52) — are not provided.
"""

from __future__ import annotations

from collections.abc import Callable

from .armenian import armenian_stem
from .basque import basque_stem
from .catalan import catalan_stem
from .dutch import dutch_stem
from .english_snowball import english_snowball_stem
from .finnish import finnish_stem
from .french_snowball import french_snowball_stem
from .german_snowball import german2_snowball_stem, german_snowball_stem
from .hungarian import hungarian_stem
from .irish import irish_stem
from .italian_snowball import italian_snowball_stem
from .porter_snowball import porter_snowball_stem
from .portuguese_snowball import portuguese_snowball_stem
from .romanian import romanian_stem
from .russian import russian_stem
from .scandinavian import danish_stem, norwegian_stem, swedish_stem
from .spanish_snowball import spanish_snowball_stem
from .turkish import turkish_stem

SNOWBALL_STEMMERS: dict[str, Callable[[str], str]] = {
    "Armenian": armenian_stem,
    "Basque": basque_stem,
    "Catalan": catalan_stem,
    "Danish": danish_stem,
    "Dutch": dutch_stem,
    "English": english_snowball_stem,
    "Finnish": finnish_stem,
    "French": french_snowball_stem,
    "German": german_snowball_stem,
    "German2": german2_snowball_stem,
    "Hungarian": hungarian_stem,
    "Irish": irish_stem,
    "Italian": italian_snowball_stem,
    "Norwegian": norwegian_stem,
    "Porter": porter_snowball_stem,
    "Portuguese": portuguese_snowball_stem,
    "Romanian": romanian_stem,
    "Russian": russian_stem,
    "Spanish": spanish_snowball_stem,
    "Swedish": swedish_stem,
    "Turkish": turkish_stem,
}


def snowball_stem(language: str, word: str) -> str:
    """Stem `word` with the named Snowball stemmer (factory semantics:
    unknown language raises, like the factory's reflective lookup)."""
    try:
        return SNOWBALL_STEMMERS[language](word)
    except KeyError:
        raise ValueError(f"unknown snowball language: {language}") from None
