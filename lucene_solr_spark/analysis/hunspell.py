"""Hunspell dictionary stemming (the analysis/common hunspell module).

Re-derives the reference's in-memory hunspell engine:

- ``HunspellDictionary`` — HunspellDictionary.java:36-507: parses a .aff
  affix grammar (SET encoding header, FLAG strategy line, AF flag aliases,
  PFX/SFX rule blocks) plus one or more .dic word lists into append-keyed
  prefix/suffix maps and a word->flags map.  Later .dic entries REPLACE
  earlier ones for the same word (words.put, HunspellDictionary.java:388)
  — the "override" semantics HunspellDictionaryTest exercises.
- ``HunspellStemmer`` — HunspellStemmer.java:33-217: recursive affix
  stripping with cross-product continuation flags and a recursion cap
  (default 2 per hunspell docs).
- ``hunspell_stem_filter`` — HunspellStemFilter.java:46-135: token-stream
  semantics (first stem replaces the token, extra stems stack at posInc 0,
  unknown words pass through unchanged, keyword-marked terms skipped,
  dedup via unique_stems by default).

Flag strategies (HunspellDictionary.java:418-502): UTF-8/default = one
char per flag; ``FLAG num`` = comma-separated integers; ``FLAG long`` =
two-ASCII-char pairs folded to one char by summing their code points
(DoubleASCIIFlagParsingStrategy.java:494 — replicated as-is, sums not
bit-packs, to stay behaviorally identical).

At build scale the stemmer runs per DISTINCT surface form through the
factorized inverter hook (analysis/english.py design), never per token.
"""

from __future__ import annotations

import re


class HunspellParseError(ValueError):
    """Affix file parse failure; ``line`` counts lines AFTER the SET header
    (LineNumberReader starts at the line following the raw-read encoding
    probe, HunspellDictionary.java:130-132,186)."""

    def __init__(self, message: str, line: int):
        super().__init__(message)
        self.message = message
        self.line = line


class HunspellAffix:
    """One PFX/SFX rule (HunspellAffix.java:25-157)."""

    __slots__ = ("append", "append_flags", "strip", "condition",
                 "_condition_re", "flag", "cross_product")

    def __init__(self) -> None:
        self.append = ""
        # None (not empty) when the rule carries no /flags: recursion under
        # a flagless affix cross-checks as "allow all" (HunspellStemmer
        # hasCrossCheckedFlag on a null array, HunspellStemmer.java:215-217)
        self.append_flags: tuple[int, ...] | None = None
        self.strip = ""
        self.condition = ""
        self._condition_re: re.Pattern[str] | None = None
        self.flag = 0
        self.cross_product = False

    def set_condition(self, condition: str, pattern: str) -> None:
        self.condition = condition
        self._condition_re = re.compile(pattern)

    def check_condition(self, text: str) -> bool:
        assert self._condition_re is not None
        return self._condition_re.fullmatch(text) is not None


# flag parsing strategies (flags are ints = Java char code points)

def _parse_flags_simple(raw: str) -> tuple[int, ...]:
    return tuple(ord(c) for c in raw)


def _parse_flags_num(raw: str) -> tuple[int, ...]:
    # NumFlagParsingStrategy: strips non-digits per part
    # (HunspellDictionary.java:468)
    return tuple(int(re.sub(r"[^0-9]", "", p)) for p in raw.strip().split(","))


def _parse_flags_long(raw: str) -> tuple[int, ...]:
    # DoubleASCIIFlagParsingStrategy: char pairs, code points SUMMED
    # (HunspellDictionary.java:494)
    if not raw:
        return ()
    return tuple(ord(raw[i]) + ord(raw[i + 1]) for i in range(0, len(raw), 2))


_FLAG_STRATEGIES = {
    "num": _parse_flags_num,
    "UTF-8": _parse_flags_simple,
    "long": _parse_flags_long,
}


def _java_lower_str(s: str) -> str:
    from .analyzer import _java_lower

    return "".join(_java_lower(c) for c in s)


class HunspellWord:
    __slots__ = ("flags",)

    def __init__(self, flags: tuple[int, ...] = ()):
        self.flags = tuple(sorted(flags))

    def has_flag(self, flag: int) -> bool:
        return flag in self.flags


_NOFLAGS = HunspellWord()


class HunspellDictionary:
    """Parsed .aff + .dic data (HunspellDictionary.java:36-507).

    ``affix_text``/``dic_texts`` are decoded strings (the SET-header
    charset decode happens when the caller reads the file; the reference
    sniffs the header bytes first — byte-level sniffing is kept in
    :func:`read_encoding` for callers holding raw bytes).
    """

    def __init__(
        self,
        affix_text: str,
        dic_texts: str | list[str],
        ignore_case: bool = False,
        strict_affix_parsing: bool = True,
    ):
        self.ignore_case = ignore_case
        self._parse_flags = _parse_flags_simple
        self._aliases: list[str] = []
        self._aliases_declared = False
        # append-string -> [HunspellAffix]; keys lowercased when ignore_case
        # (CharArrayMap ignoreCase, HunspellDictionary.java:183-184)
        self.prefixes: dict[str, list[HunspellAffix]] = {}
        self.suffixes: dict[str, list[HunspellAffix]] = {}
        self.words: dict[str, list[HunspellWord]] = {}
        self._read_affix(affix_text, strict_affix_parsing)
        if isinstance(dic_texts, str):
            dic_texts = [dic_texts]
        for dic in dic_texts:
            self._read_dic(dic)

    # -- lookups (CharArrayMap.get with ignoreCase lowercasing the probe) --

    def _key(self, s: str) -> str:
        return _java_lower_str(s) if self.ignore_case else s

    def lookup_word(self, word: str) -> list[HunspellWord] | None:
        return self.words.get(self._key(word))

    def lookup_prefix(self, append: str) -> list[HunspellAffix] | None:
        return self.prefixes.get(self._key(append))

    def lookup_suffix(self, append: str) -> list[HunspellAffix] | None:
        return self.suffixes.get(self._key(append))

    # -- affix parsing --

    @staticmethod
    def read_encoding(affix_bytes: bytes) -> str:
        """First non-blank non-# line must be ``SET <charset>``
        (HunspellDictionary.java:279-309)."""
        for raw in affix_bytes.decode("latin-1").split("\n"):
            line = raw.rstrip("\r")
            if not line.strip() or line.startswith("#"):
                continue
            if line.startswith("SET "):
                return line[4:].strip()
            raise HunspellParseError(
                "The first non-comment line in the affix file must be a "
                f"'SET charset', was: '{line}'", 0)
        raise HunspellParseError("Unexpected end of affix file.", 0)

    def _read_affix(self, text: str, strict: bool) -> None:
        lines = [ln.rstrip("\r") for ln in text.split("\n")]
        # skip through the SET header the way the raw-byte probe does:
        # everything up to and including the first non-blank non-# line
        start = 0
        for i, ln in enumerate(lines):
            if not ln.strip() or ln.startswith("#"):
                continue
            if not ln.startswith("SET "):
                raise HunspellParseError(
                    "The first non-comment line in the affix file must be a "
                    f"'SET charset', was: '{ln}'", 0)
            start = i + 1
            break
        else:
            raise HunspellParseError("Unexpected end of affix file.", 0)

        # LineNumberReader numbering: 1-based from the line after SET
        pos = start
        while pos < len(lines):
            line = lines[pos]
            pos += 1
            if line.startswith("AF"):
                self._parse_alias(line)
            elif line.startswith("PFX"):
                pos = self._parse_affix_block(
                    self.prefixes, line, lines, pos, start, "{}.*", strict)
            elif line.startswith("SFX"):
                pos = self._parse_affix_block(
                    self.suffixes, line, lines, pos, start, ".*{}", strict)
            elif line.startswith("FLAG"):
                flag_type = line[5:]
                if flag_type not in _FLAG_STRATEGIES:
                    raise ValueError(f"Unknown flag type: {flag_type}")
                self._parse_flags = _FLAG_STRATEGIES[flag_type]

    def _parse_affix_block(
        self,
        affixes: dict[str, list[HunspellAffix]],
        header: str,
        lines: list[str],
        pos: int,
        start: int,
        condition_pattern: str,
        strict: bool,
    ) -> int:
        args = re.split(r"\s+", header)
        cross_product = args[2] == "Y"
        num_lines = int(args[3])
        for _ in range(num_lines):
            line = lines[pos]
            pos += 1
            rule_args = re.split(r"\s+", line)
            if len(rule_args) < 5:
                if strict:
                    raise HunspellParseError(
                        "The affix file contains a rule with less than five "
                        "elements", pos - start)
                continue
            affix = HunspellAffix()
            affix.flag = self._parse_flags(rule_args[1])[0]
            affix.strip = "" if rule_args[2] == "0" else rule_args[2]
            affix_arg = rule_args[3]
            flag_sep = affix_arg.rfind("/")
            if flag_sep != -1:
                flag_part = affix_arg[flag_sep + 1:]
                if self._aliases:
                    flag_part = self._alias_value(int(flag_part))
                affix.append_flags = tuple(sorted(self._parse_flags(flag_part)))
                affix.append = affix_arg[:flag_sep]
            else:
                affix.append = affix_arg
            affix.set_condition(
                rule_args[4], condition_pattern.format(rule_args[4]))
            affix.cross_product = cross_product
            affixes.setdefault(self._key(affix.append), []).append(affix)
        return pos

    def _parse_alias(self, line: str) -> None:
        # first AF line declares the count; subsequent AF lines fill
        # (HunspellDictionary.java:396-405)
        rule_args = re.split(r"\s+", line)
        if not self._aliases_declared:
            self._aliases_declared = True
            int(rule_args[1])  # count, validated but list grows dynamically
            return
        self._aliases.append(rule_args[1])

    def _alias_value(self, alias_id: int) -> str:
        if not 1 <= alias_id <= len(self._aliases):
            raise ValueError(f"Bad flag alias number:{alias_id}")
        return self._aliases[alias_id - 1]

    # -- dic parsing --

    def _read_dic(self, text: str) -> None:
        lines = text.split("\n")
        # first line is the (untrusted) entry count
        for line in lines[1:]:
            line = line.rstrip("\r")
            if not line:
                continue
            flag_sep = line.rfind("/")
            if flag_sep == -1:
                word_form = _NOFLAGS
                entry = line
            else:
                # morph comments may follow the flags after a tab
                end = line.find("\t", flag_sep)
                if end == -1:
                    end = len(line)
                flag_part = line[flag_sep + 1: end]
                if self._aliases:
                    flag_part = self._alias_value(int(flag_part))
                word_form = HunspellWord(self._parse_flags(flag_part))
                entry = line[:flag_sep]
            if self.ignore_case:
                entry = entry.lower()
            # put REPLACES — later dictionaries override earlier entries
            self.words[self._key(entry)] = [word_form]


class Stem:
    """A stem plus the affixes that produced it (HunspellStemmer.Stem)."""

    __slots__ = ("stem", "prefixes", "suffixes")

    def __init__(self, stem: str):
        self.stem = stem
        self.prefixes: list[HunspellAffix] = []
        self.suffixes: list[HunspellAffix] = []


class HunspellStemmer:
    """Recursive affix stripping (HunspellStemmer.java:33-217)."""

    def __init__(self, dictionary: HunspellDictionary, recursion_cap: int = 2):
        self.dictionary = dictionary
        self.recursion_cap = recursion_cap

    def stem(self, word: str) -> list[Stem]:
        stems: list[Stem] = []
        if self.dictionary.lookup_word(word) is not None:
            stems.append(Stem(word))
        stems.extend(self._stem(word, None, 0))
        return stems

    def unique_stems(self, word: str) -> list[Stem]:
        stems: list[Stem] = []
        seen: set[str] = set()

        def key(s: str) -> str:
            return _java_lower_str(s) if self.dictionary.ignore_case else s

        if self.dictionary.lookup_word(word) is not None:
            # reference quirk replicated: uniqueStems passes the word's own
            # char[] into CharArraySet.add, and CharArrayMap.put with
            # ignoreCase lowercases that array IN PLACE — so the direct-hit
            # stem is emitted lowercased (stem() keeps the original case)
            stems.append(Stem(key(word)))
            seen.add(key(word))
        for s in self._stem(word, None, 0):
            if key(s.stem) not in seen:
                stems.append(s)
                seen.add(key(s.stem))
        return stems

    def _stem(self, word: str, flags: tuple[int, ...] | None,
              depth: int) -> list[Stem]:
        stems: list[Stem] = []
        length = len(word)

        # suffixes: every tail word[i:] probed against the append map
        for i in range(length):
            suffixes = self.dictionary.lookup_suffix(word[i:])
            if suffixes is None:
                continue
            for suffix in suffixes:
                if self._cross_checked(suffix.flag, flags):
                    de_len = length - len(suffix.append)
                    stripped = word[:de_len] + suffix.strip
                    for s in self._apply_affix(stripped, suffix, depth):
                        s.suffixes.append(suffix)
                        stems.append(s)

        # prefixes: every head word[:i] probed, longest first
        for i in range(length - 1, -1, -1):
            prefixes = self.dictionary.lookup_prefix(word[:i])
            if prefixes is None:
                continue
            for prefix in prefixes:
                if self._cross_checked(prefix.flag, flags):
                    stripped = prefix.strip + word[len(prefix.append):]
                    for s in self._apply_affix(stripped, prefix, depth):
                        s.prefixes.insert(0, prefix)
                        stems.append(s)

        return stems

    def _apply_affix(self, stripped: str, affix: HunspellAffix,
                     depth: int) -> list[Stem]:
        if self.dictionary.ignore_case:
            # charUtils.toLowerCase on the stripped buffer
            # (HunspellStemmer.java:181-183)
            stripped = _java_lower_str(stripped)
        if not affix.check_condition(stripped):
            return []
        stems: list[Stem] = []
        words = self.dictionary.lookup_word(stripped)
        if words is not None:
            for hw in words:
                if hw.has_flag(affix.flag):
                    stems.append(Stem(stripped))
        if affix.cross_product and depth < self.recursion_cap:
            stems.extend(self._stem(stripped, affix.append_flags, depth + 1))
        return stems

    @staticmethod
    def _cross_checked(flag: int, flags: tuple[int, ...] | None) -> bool:
        return flags is None or flag in flags


def hunspell_stem_filter(
    tokens: list[tuple[str, int]],
    dictionary: HunspellDictionary,
    dedup: bool = True,
    recursion_cap: int = 2,
    keywords: frozenset[str] = frozenset(),
) -> list[tuple[str, int]]:
    """HunspellStemFilter.java:102-135 over a (term, posInc) stream: first
    stem replaces the token at its posInc, extra stems stack at posInc 0;
    unknown and keyword-marked terms pass through unchanged."""
    stemmer = HunspellStemmer(dictionary, recursion_cap)
    out: list[tuple[str, int]] = []
    for term, inc in tokens:
        if term in keywords:
            out.append((term, inc))
            continue
        stems = (stemmer.unique_stems(term) if dedup
                 else stemmer.stem(term))
        if not stems:
            out.append((term, inc))
            continue
        out.append((stems[0].stem, inc))
        for s in stems[1:]:
            out.append((s.stem, 0))
    return out
