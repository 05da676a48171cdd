"""Polish stempel data (GENERATED — tools/extract_stempel.py)
from the reference's stemmer_20000.tbl (egothor MultiTrie2,
method='-0ME2', 8 tries, 121822 cells) and
pl/stopwords.txt.

The trie table itself lives in stempel_data.bin (marshal,
same tuple shape) and is loaded lazily via module
__getattr__ on first TRIES access — keeping this module's
import cost negligible for the analysis.lang dispatch that
every UDF worker pays on spawn.
"""

FORWARD = False
BY = 1

STOP_PL = frozenset(['vol', 'o.o.', 'mgr', 'godz', 'zł', 'www', 'pl', 'ul', 'tel', 'hab', 'prof', 'inż', 'dr', 'i', 'u', 'aby', 'albo', 'ale', 'ani', 'aż', 'bardzo', 'bez', 'bo', 'bowiem', 'by', 'byli', 'bym', 'był', 'była', 'było', 'były', 'być', 'będzie', 'będą', 'chce', 'choć', 'co', 'coraz', 'coś', 'czy', 'czyli', 'często', 'dla', 'do', 'gdy', 'gdyby', 'gdyż', 'gdzie', 'go', 'ich', 'im', 'inne', 'iż', 'ja', 'jak', 'jakie', 'jako', 'je', 'jednak', 'jednym', 'jedynie', 'jego', 'jej', 'jest', 'jeszcze', 'jeśli', 'jeżeli', 'już', 'ją', 'kiedy', 'kilku', 'kto', 'która', 'które', 'którego', 'której', 'który', 'których', 'którym', 'którzy', 'lat', 'lecz', 'lub', 'ma', 'mają', 'mamy', 'mi', 'miał', 'mimo', 'mnie', 'mogą', 'może', 'można', 'mu', 'musi', 'na', 'nad', 'nam', 'nas', 'nawet', 'nic', 'nich', 'nie', 'niej', 'nim', 'niż', 'no', 'nowe', 'np', 'nr', 'o', 'od', 'ok', 'on', 'one', 'oraz', 'pan', 'po', 'pod', 'ponad', 'ponieważ', 'poza', 'przed', 'przede', 'przez', 'przy', 'raz', 'razie', 'roku', 'również', 'się', 'sobie', 'sposób', 'swoje', 'są', 'ta', 'tak', 'takich', 'takie', 'także', 'tam', 'te', 'tego', 'tej', 'temu', 'ten', 'teraz', 'też', 'to', 'trzeba', 'tu', 'tych', 'tylko', 'tym', 'tys', 'tzw', 'tę', 'w', 'we', 'wie', 'więc', 'wszystko', 'wśród', 'właśnie', 'z', 'za', 'zaś', 'ze', 'że', 'żeby', 'ii', 'iii', 'iv', 'vi', 'vii', 'viii', 'ix', 'xi', 'xii', 'xiii', 'xiv', 'xv'])


def _load_tries():
    import marshal
    from importlib import resources

    # importlib.resources works both from a directory and from
    # a --py-files zip (zipimport implements ResourceReader)
    ref = resources.files(__package__).joinpath('stempel_data.bin')
    with ref.open('rb') as f:
        return marshal.load(f)


def __getattr__(name):
    # PEP 562 lazy attribute: per-trie (forward, root, cmds, rows);
    # each row is a tuple of (char, cmd_index, ref_row, skip) cells
    if name == 'TRIES':
        globals()['TRIES'] = tries = _load_tries()
        return tries
    raise AttributeError(name)
