"""Catalan Snowball stemmer.

Reference chain (CatalanAnalyzer.java:137-146): StandardTokenizer →
Elision(DEFAULT_ARTICLES d/l/m/n/s/t, ignoreCase) → LowerCase →
Stop(ca/stopwords.txt, '#') → SnowballFilter(CatalanStemmer). Tables read
as data from the generated CatalanStemmer.java:19-263. Fuzz-verified
byte-identical via tools/stemmer_oracle.py (30k words, 0 mismatches).

Standard R1/R2; attached_pronoun → standard_suffix → verb_suffix →
residual_suffix (each: unrestricted longest match + per-class region, no
fallback), then a cleaning pass folding accents (and · → .).
"""

from __future__ import annotations

from .snowball import next_region

_V = frozenset("aeiouàáèéíïòóúü")

_PRONOUN = (
    ('selas', 1), ('selos', 1), ('-les', 1), ('-nos', 1), ('sela', 1),
    ('selo', 1), ("'hi", 1), ("'ho", 1), ("'ls", 1), ("'ns", 1), ('-la',
    1), ('-li', 1), ('-ls', 1), ('-me', 1), ('-ns', 1), ('-te', 1),
    ('-us', 1), ('ens', 1), ('las', 1), ('les', 1), ('los', 1), ('nos',
    1), ('vos', 1), ("'l", 1), ("'m", 1), ("'n", 1), ("'s", 1), ("'t",
    1), ('-m', 1), ('-n', 1), ('hi', 1), ('ho', 1), ('la', 1), ('le',
    1), ('li', 1), ('lo', 1), ('me', 1), ('se', 1), ('us', 1)
)

_STANDARD = (
    ('allengües', 1), ('ativitats', 1), ('quíssimes', 5), ('ativitat',
    1), ('bilitats', 1), ('ialismes', 1), ('ialistes', 1), ('ionistes',
    1), ('lógiques', 3), ('quíssima', 5), ('quíssims', 5), ('atòries',
    1), ('bilitat', 1), ('ialisme', 1), ('ialista', 1), ('ionisme', 1),
    ('ionista', 1), ('isament', 1), ('ivitats', 1), ('quíssim', 5),
    ('íssimes', 1), ('acions', 2), ('aments', 1), ('ancies', 1),
    ('atives', 1), ('atòria', 1), ('encies', 1), ('formes', 1),
    ('idores', 1), ('ificar', 1), ('ivisme', 1), ('ivitat', 1),
    ('logies', 3), ('logíes', 3), ('lógica', 3), ('lógics', 3),
    ('ències', 1), ('íssima', 1), ('íssims', 1), ('ables', 1), ('adora',
    1), ('adors', 1), ('adura', 1), ('ament', 1), ('ancia', 1),
    ('asses', 1), ('assos', 1), ('atius', 1), ('ativa', 1), ('cions',
    1), ('doras', 1), ('dores', 1), ('dures', 1), ('encia', 1),
    ('eries', 1), ('ibles', 1), ('ictes', 1), ('idors', 1), ('inies',
    1), ('iques', 4), ('ismes', 1), ('issem', 1), ('isseu', 1),
    ('issos', 1), ('istes', 1), ('itats', 1), ('itzar', 1), ('logia',
    3), ('logis', 3), ('logía', 3), ('ments', 1), ('sfera', 1),
    ('toris', 1), ('trius', 1), ('àries', 1), ('ència', 1), ('ìssem',
    1), ('ìsseu', 1), ('ìssin', 1), ('ícies', 1), ('íinia', 1),
    ('ínies', 1), ('íssem', 1), ('ísseu', 1), ('íssim', 1), ('íssiu',
    1), ('ístic', 1), ('ívola', 1), ('ïtats', 1), ('able', 1), ('ació',
    1), ('ades', 2), ('aire', 1), ('alla', 1), ('amen', 1), ('ants', 1),
    ('aris', 1), ('assa', 1), ('atge', 1), ('atiu', 1), ('bles', 1),
    ('dora', 1), ('dors', 1), ('egar', 1), ('ejar', 1), ('ella', 1),
    ('ells', 1), ('enca', 1), ('ents', 1), ('eres', 1), ('eria', 1),
    ('eses', 1), ('esos', 1), ('essa', 1), ('ible', 1), ('icis', 1),
    ('icte', 1), ('ient', 1), ('imes', 1), ('ines', 1), ('inia', 1),
    ('ions', 1), ('isam', 1), ('isme', 1), ('issa', 1), ('ista', 1),
    ('iste', 1), ('itar', 1), ('itat', 1), ('ites', 1), ('ives', 1),
    ('logi', 3), ('ment', 1), ('nces', 1), ('ores', 1), ('oses', 1),
    ('osos', 1), ('otes', 1), ('tori', 1), ('triu', 1), ('ària', 1),
    ('ícia', 1), ('ícis', 1), ('ívol', 1), ('ïtat', 1), ('ada', 2),
    ('all', 1), ('als', 1), ('ana', 1), ('ant', 1), ('ari', 1), ('ats',
    1), ('ble', 1), ('ció', 1), ('dor', 1), ('dur', 1), ('dís', 1),
    ('ell', 1), ('enc', 1), ('ent', 1), ('era', 1), ('ers', 1), ('esa',
    1), ('esc', 1), ('eta', 1), ('ets', 1), ('fer', 1), ('ica', 4),
    ('ici', 1), ('ics', 4), ('ima', 1), ('ims', 1), ('ina', 1), ('ita',
    1), ('ius', 1), ('iva', 1), ('nça', 1), ('ora', 1), ('ors', 1),
    ('osa', 1), ('ota', 1), ('ots', 1), ('uds', 1), ('uts', 1), ('íci',
    1), ('al', 1), ('ar', 1), ('et', 1), ('ic', 4), ('il', 1), ('ió',
    1), ('ls', 1), ('or', 1), ('ot', 1), ('ud', 1), ('ès', 1), ('és',
    1), ('ís', 1), ('ós', 1), ('ó', 1)
)

_VERB = (
    ('aríamos', 1), ('eresseu', 1), ('eríamos', 1), ('iríamos', 1),
    ('iéramos', 1), ('iésemos', 1), ('adores', 1), ('aremos', 1),
    ('aríais', 1), ('asteis', 1), ('eremos', 1), ('eríais', 1),
    ('esquen', 1), ('esques', 1), ('esquin', 1), ('esquis', 1),
    ('ierais', 1), ('ieseis', 1), ('iremos', 1), ('iríais', 1),
    ('isquen', 1), ('isteis', 1), ('ábamos', 1), ('áramos', 1),
    ('ásemos', 1), ('ïsquen', 1), ('ïsques', 1), ('abais', 1), ('adora',
    1), ('adors', 1), ('arais', 1), ('arian', 1), ('arien', 1),
    ('aries', 1), ('aréis', 1), ('arían', 1), ('arías', 1), ('aríem',
    1), ('aríeu', 1), ('aseis', 1), ('assen', 1), ('asses', 1),
    ('asseu', 1), ('assim', 1), ('assin', 1), ('assis', 1), ('assiu',
    1), ('atges', 1), ('eixen', 1), ('eixer', 1), ('eixes', 1),
    ('eixin', 1), ('eixis', 1), ('erass', 1), ('eréis', 1), ('erían',
    1), ('erías', 1), ('esqui', 1), ('essen', 1), ('esses', 1),
    ('esseu', 1), ('essim', 1), ('essin', 1), ('essis', 1), ('iendo',
    1), ('ieran', 1), ('ieras', 1), ('ieron', 1), ('iesen', 1),
    ('ieses', 1), ('iguem', 1), ('igueu', 1), ('irien', 1), ('iries',
    1), ('iréis', 1), ('irìem', 1), ('irìeu', 1), ('irían', 1),
    ('irías', 1), ('iríem', 1), ('iríeu', 1), ('issen', 1), ('isses',
    1), ('issim', 1), ('issin', 1), ('issis', 1), ('issiu', 1),
    ('itzeu', 1), ('itzis', 1), ('àssem', 1), ('àsseu', 1), ('àssim',
    1), ('àssiu', 1), ('èssim', 1), ('èssiu', 1), ('éssem', 1),
    ('éssen', 1), ('ésseu', 1), ('éssim', 1), ('éssiu', 1), ('íamos',
    1), ('íssim', 1), ('íssiu', 1), ('ïguem', 1), ('ïgueu', 1),
    ('ïssen', 1), ('ïsses', 1), ('ïssin', 1), ('ïssis', 1), ('aban', 1),
    ('abas', 1), ('adas', 1), ('ades', 1), ('ador', 1), ('ados', 1),
    ('amos', 1), ('ando', 2), ('aran', 1), ('aras', 1), ('arem', 1),
    ('aren', 1), ('ares', 1), ('areu', 1), ('aria', 1), ('aron', 1),
    ('aràs', 1), ('arán', 1), ('arás', 1), ('arés', 1), ('aría', 1),
    ('asen', 1), ('ases', 1), ('aste', 1), ('avem', 1), ('aven', 1),
    ('aves', 1), ('eixi', 1), ('eixo', 1), ('ents', 1), ('erau', 1),
    ('eren', 1), ('erán', 1), ('erás', 1), ('ería', 1), ('esca', 1),
    ('idas', 1), ('ides', 1), ('idos', 1), ('iera', 1), ('iese', 1),
    ('imos', 1), ('ineu', 1), ('inin', 1), ('inis', 1), ('iran', 1),
    ('irem', 1), ('iren', 1), ('ires', 1), ('ireu', 1), ('iria', 1),
    ('iràs', 1), ('irán', 1), ('irás', 1), ('iría', 1), ('isca', 1),
    ('isin', 1), ('isis', 1), ('iste', 1), ('itza', 1), ('itzi', 1),
    ('itzo', 1), ('itzà', 1), ('ixen', 1), ('ixes', 1), ('ques', 1),
    ('tzar', 1), ('udes', 1), ('àrem', 1), ('àren', 1), ('àreu', 1),
    ('àvem', 1), ('àveu', 1), ('ávem', 1), ('áveu', 1), ('íais', 1),
    ('írem', 1), ('íreu', 1), ('ïdes', 1), ('ïren', 1), ('ïres', 1),
    ('ïsca', 1), ('ïxen', 1), ('ïxes', 1), ('aba', 1), ('ada', 1),
    ('ado', 1), ('ams', 1), ('ant', 1), ('ara', 1), ('arà', 1), ('ará',
    1), ('aré', 1), ('ase', 1), ('ass', 1), ('ats', 1), ('ava', 1),
    ('dre', 1), ('eix', 1), ('ent', 1), ('erá', 1), ('eré', 1), ('ess',
    1), ('ida', 1), ('ido', 1), ('ids', 1), ('ien', 1), ('ies', 1),
    ('ieu', 1), ('ini', 1), ('int', 1), ('ira', 1), ('irà', 1), ('irá',
    1), ('irè', 1), ('iré', 1), ('isc', 1), ('its', 1), ('itz', 1),
    ('ixa', 1), ('ixo', 1), ('iïn', 1), ('iïs', 1), ('sin', 1), ('sis',
    1), ('uda', 1), ('áis', 1), ('ìeu', 1), ('ían', 1), ('ías', 1),
    ('íem', 1), ('íeu', 1), ('ïda', 1), ('ïen', 1), ('ïes', 1), ('ïra',
    1), ('ïsc', 1), ('ïxo', 1), ('ad', 1), ('am', 1), ('an', 1), ('ar',
    1), ('as', 1), ('at', 1), ('au', 1), ('ed', 1), ('em', 1), ('en',
    1), ('er', 1), ('es', 1), ('ia', 1), ('id', 1), ('ie', 1), ('ii',
    1), ('in', 1), ('io', 1), ('ir', 1), ('it', 1), ('ix', 1), ('ià',
    1), ('iï', 1), ('ió', 1), ('re', 1), ('ut', 1), ('às', 1), ('és',
    1), ('ía', 1), ('ís', 1), ('ïa', 1), ('ïm', 1), ('ït', 1), ('ïu',
    1), ('ïx', 1), ('í', 1)
)

_RESIDUAL = (
    ('iqu', 2), ('itz', 1), ('eu', 1), ('ir', 1), ('is', 1), ('it', 1),
    ('iu', 1), ('os', 1), ('ïn', 1), ('ïs', 1), ('a', 1), ('e', 1),
    ('i', 1), ('o', 1), ('s', 1), ('à', 1), ('á', 1), ('é', 1), ('ì',
    1), ('í', 1), ('ï', 1), ('ó', 1)
)

_CLEAN = str.maketrans("àáèéìíïòóúü·", "aaeeiiioouu.")


def catalan_stem(word: str) -> str:
    s = word
    p1 = next_region(s, 0, _V)
    p2 = next_region(s, p1, _V)

    def rule(table, actions):
        """True only when the action applied (snowball rule success)."""
        nonlocal s
        for suf, cls in table:
            if s.endswith(suf):
                region, rep = actions[cls]
                if len(s) - len(suf) >= region:
                    s = s[: -len(suf)] + rep
                    return True
                return False
        return False

    rule(_PRONOUN, {1: (p1, "")})
    # do( standard_suffix OR verb_suffix ) — verb only on standard failure
    if not rule(_STANDARD, {1: (p1, ""), 2: (p2, ""), 3: (p2, "log"),
                            4: (p2, "ic"), 5: (p1, "c")}):
        rule(_VERB, {1: (p1, ""), 2: (p2, "")})
    rule(_RESIDUAL, {1: (p1, ""), 2: (p1, "ic")})
    return s.translate(_CLEAN)
