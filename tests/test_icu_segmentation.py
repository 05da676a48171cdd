"""ICUTokenizer segmentation tests: Lao in-tree goldens
(TestLaoBreakIterator.testBasicUsage + TestICUTokenizer.testLao),
grammar-derived Khmer/Myanmar cases, Hebrew quote tailorings, script
digits, mixed-script dispatch."""

from lucene_solr_spark.analysis.icu_segmentation import (
    icu_tokenize, segment_khmer, segment_lao, segment_myanmar,
)


def toks(text):
    return icu_tokenize(text)


def test_lao_in_tree_goldens():
    # TestLaoBreakIterator.java:75-80 (the .brk's own test class)
    assert toks("ກວ່າດອກ") == ["ກວ່າ", "ດອກ"]
    assert toks("ຜູ້​ເຂົ້າ") == ["ຜູ້", "ເຂົ້າ"]
    assert toks("") == []
    # the pushback case: greedy ສະບ would orphan the rest
    assert toks("ສະບາຍດີ") == ["ສະ", "ບາຍ", "ດີ"]


def test_lao_icu_tokenizer_golden():
    # TestICUTokenizer.java:119-121
    assert toks("ກວ່າດອກ") == ["ກວ່າ", "ດອກ"]


def test_khmer_syllables():
    # Khmer.rbbi:32 syllable structure: base+vowel; coeng clusters attach
    assert toks("ភាសាខ្មែរ") == ["ភា", "សា", "ខ្មែ", "រ"]
    assert toks("កម្ពុជា") == ["ក", "ម្ពុ", "ជា"]


def test_myanmar_syllables():
    # Myanmar.rbbi:40: ConsEx (Virama ConsEx)? AsatEx*
    assert toks("မြန်မာစာ") == ["မြန်", "မာ", "စာ"]


def test_hebrew_quote_tailorings():
    # Hebrew.rbbi:24,28: U+0027 extends, U+0022 mid-letter
    assert toks('מנכ"ל') == ['מנכ"ל']
    assert toks("ח' העברית") == ["ח'", "העברית"]
    # double quote NOT between Hebrew letters still breaks
    assert toks('"שלום"') == ["שלום"]


def test_script_digits():
    assert toks("ກວ່າ໑໒໓ດອກ") == ["ກວ່າ", "໑໒໓", "ດອກ"]
    assert toks("ភាសា៤៥៦") == ["ភា", "សា", "៤៥៦"]
    assert toks("မြန်မာ ၁၉၄၈ စာ") == ["မြန်", "မာ", "၁၉၄၈", "စာ"]


def test_mixed_script_dispatch():
    assert toks("Hello ກວ່າດອກ world ភាសា 123") == [
        "hello", "ກວ່າ", "ດອກ", "world", "ភា", "សា", "123"]


def test_segmenters_return_offsets():
    run = "ກວ່າດອກ"
    segs = segment_lao(run)
    assert [run[s:e] for s, e in segs] == ["ກວ່າ", "ດອກ"]
    assert segment_khmer("ភាសា") == [(0, 2), (2, 4)]
    assert segment_myanmar("မာ") == [(0, 2)]


def test_thai_icu_tokenizer_golden():
    # TestICUTokenizer.java:123-126 — Thai runs dispatch to the dictionary
    # break iterator (DefaultICUTokenizerConfig's Thai BreakIterator; this
    # repo's JDK-dictionary port), Thai digits take the {100} numeric rule
    assert toks("การที่ได้ต้องแสดงว่างานดี. แล้วเธอจะไปไหน? ๑๒๓๔") == [
        "การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี",
        "แล้ว", "เธอ", "จะ", "ไป", "ไหน", "๑๒๓๔"]


def test_tibetan_icu_tokenizer_golden():
    # TestICUTokenizer.java:128-131 — Tibetan needs no custom grammar: the
    # tsheg (U+0F0B) is a break under plain UAX#29, so the default path
    # reproduces the reference's token stream
    assert toks("སྣོན་མཛོད་དང་ལས་འདིས་བོད་ཡིག་མི་ཉམས་གོང་") == [
        "སྣོན", "མཛོད", "དང", "ལས", "འདིས", "བོད", "ཡིག", "མི", "ཉམས", "གོང"]


def test_orphan_letters_drop():
    # a bare Lao vowel sign matches no rule (ruleStatus 0 -> skipped,
    # ICUTokenizer.java:210)
    assert toks("ະ") == []
