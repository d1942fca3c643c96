"""Language pack data, wave 3 (round 3): stopword lists for the
Catalan / Basque / Irish / Armenian / Lithuanian analyzers — the
``analysis/{ca,eu,ga,hy,lt}/stopwords.txt`` resources the reference
analyzers load (published stop lists; counts pinned in
tests/test_snowball_ext.py)."""

#: ca/stopwords.txt (219 entries)
CATALAN_STOP_WORDS = frozenset((
    "a", "abans", "ací", "ah", "així", "això", "al", "als", "aleshores",
    "algun", "alguna", "algunes", "alguns", "alhora", "allà", "allí",
    "allò", "altra", "altre", "altres", "amb", "ambdós", "ambdues",
    "apa", "aquell", "aquella", "aquelles", "aquells", "aquest",
    "aquesta", "aquestes", "aquests", "aquí", "baix", "cada", "cadascú",
    "cadascuna", "cadascunes", "cadascuns", "com", "contra", "d'un",
    "d'una", "d'unes", "d'uns", "dalt", "de", "del", "dels", "des",
    "després", "dins", "dintre", "donat", "doncs", "durant", "e", "eh",
    "el", "els", "em", "en", "encara", "ens", "entre", "érem", "eren",
    "éreu", "es", "és", "esta", "està", "estàvem", "estaven", "estàveu",
    "esteu", "et", "etc", "ets", "fins", "fora", "gairebé", "ha", "han",
    "has", "havia", "he", "hem", "heu", "hi", "ho", "i", "igual",
    "iguals", "ja", "l'hi", "la", "les", "li", "li'n", "llavors",
    "m'he", "ma", "mal", "malgrat", "mateix", "mateixa", "mateixes",
    "mateixos", "me", "mentre", "més", "meu", "meus", "meva", "meves",
    "molt", "molta", "moltes", "molts", "mon", "mons", "n'he", "n'hi",
    "ne", "ni", "no", "nogensmenys", "només", "nosaltres", "nostra",
    "nostre", "nostres", "o", "oh", "oi", "on", "pas", "pel", "pels",
    "per", "però", "perquè", "poc", "poca", "pocs", "poques", "potser",
    "propi", "qual", "quals", "quan", "quant", "que", "què", "quelcom",
    "qui", "quin", "quina", "quines", "quins", "s'ha", "s'han", "sa",
    "semblant", "semblants", "ses", "seu", "seus", "seva", "seva",
    "seves", "si", "sobre", "sobretot", "sóc", "solament", "sols",
    "son", "són", "sons", "sota", "sou", "t'ha", "t'han", "t'he", "ta",
    "tal", "també", "tampoc", "tan", "tant", "tanta", "tantes", "teu",
    "teus", "teva", "teves", "ton", "tons", "tot", "tota", "totes",
    "tots", "un", "una", "unes", "uns", "us", "va", "vaig", "vam",
    "van", "vas", "veu", "vosaltres", "vostra", "vostre", "vostres",
))

#: eu/stopwords.txt (98 entries)
BASQUE_STOP_WORDS = frozenset((
    "al", "anitz", "arabera", "asko", "baina", "bat", "batean", "batek",
    "bati", "batzuei", "batzuek", "batzuetan", "batzuk", "bera",
    "beraiek", "berau", "berauek", "bere", "berori", "beroriek",
    "beste", "bezala", "da", "dago", "dira", "ditu", "du", "dute",
    "edo", "egin", "ere", "eta", "eurak", "ez", "gainera", "gu",
    "gutxi", "guzti", "haiei", "haiek", "haietan", "hainbeste", "hala",
    "han", "handik", "hango", "hara", "hari", "hark", "hartan", "hau",
    "hauei", "hauek", "hauetan", "hemen", "hemendik", "hemengo", "hi",
    "hona", "honek", "honela", "honetan", "honi", "hor", "hori",
    "horiei", "horiek", "horietan", "horko", "horra", "horrek",
    "horrela", "horretan", "horri", "hortik", "hura", "izan", "ni",
    "noiz", "nola", "non", "nondik", "nongo", "nor", "nora", "ze",
    "zein", "zen", "zenbait", "zenbat", "zer", "zergatik", "ziren",
    "zituen", "zu", "zuek", "zuen", "zuten",
))

#: ga/stopwords.txt (109 entries)
IRISH_STOP_WORDS = frozenset((
    "a", "ach", "ag", "agus", "an", "aon", "ar", "arna", "as", "b'",
    "ba", "beirt", "bhúr", "caoga", "ceathair", "ceathrar", "chomh",
    "chtó", "chuig", "chun", "cois", "céad", "cúig", "cúigear", "d'",
    "daichead", "dar", "de", "deich", "deichniúr", "den", "dhá", "do",
    "don", "dtí", "dá", "dár", "dó", "faoi", "faoin", "faoina",
    "faoinár", "fara", "fiche", "gach", "gan", "go", "gur", "haon",
    "hocht", "i", "iad", "idir", "in", "ina", "ins", "inár", "is", "le",
    "leis", "lena", "lenár", "m'", "mar", "mo", "mé", "na", "nach",
    "naoi", "naonúr", "ná", "ní", "níor", "nó", "nócha", "ocht",
    "ochtar", "os", "roimh", "sa", "seacht", "seachtar", "seachtó",
    "seasca", "seisear", "siad", "sibh", "sinn", "sna", "sé", "sí",
    "tar", "thar", "thú", "triúr", "trí", "trína", "trínár", "tríocha",
    "tú", "um", "ár", "é", "éis", "í", "ó", "ón", "óna", "ónár",
))

#: hy/stopwords.txt (45 entries)
ARMENIAN_STOP_WORDS = frozenset((
    "այդ", "այլ", "այն", "այս", "դու", "դուք", "եմ", "են", "ենք", "ես",
    "եք", "է", "էի", "էին", "էինք", "էիր", "էիք", "էր", "ըստ", "թ", "ի",
    "ին", "իսկ", "իր", "կամ", "համար", "հետ", "հետո", "մենք", "մեջ",
    "մի", "ն", "նա", "նաև", "նրա", "նրանք", "որ", "որը", "որոնք",
    "որպես", "ու", "ում", "պիտի", "վրա", "և",
))

#: lt/stopwords.txt (125 entries)
LITHUANIAN_STOP_WORDS = frozenset((
    "ant", "apie", "ar", "arba", "aš", "be", "bei", "bet", "bus",
    "būti", "būtų", "buvo", "dėl", "gali", "į", "iki", "ir", "iš", "ja",
    "ją", "jai", "jais", "jam", "jame", "jas", "jei", "ji", "jį", "jie",
    "jiedu", "jiedvi", "jiedviem", "jiedviese", "jiems", "jis", "jo",
    "jodviem", "jog", "joje", "jomis", "joms", "jos", "jose", "jų",
    "judu", "judvi", "judviejų", "jųdviejų", "judviem", "judviese",
    "jumis", "jums", "jumyse", "juo", "juodu", "juodviese", "juos",
    "juose", "jus", "jūs", "jūsų", "ką", "kad", "kai", "kaip", "kas",
    "kiek", "kol", "kur", "kurie", "kuris", "man", "mane", "manęs",
    "manimi", "mano", "manyje", "mes", "metu", "mudu", "mudvi",
    "mudviejų", "mudviem", "mudviese", "mumis", "mums", "mumyse", "mus",
    "mūsų", "nei", "nes", "net", "nors", "nuo", "o", "pat", "per", "po",
    "prie", "prieš", "sau", "save", "savęs", "savimi", "savo", "savyje",
    "su", "tačiau", "tada", "tai", "taip", "tas", "tau", "tave",
    "tavęs", "tavimi", "tavyje", "ten", "to", "todėl", "tu", "tuo",
    "už", "visi", "yra",
))

_GA_UPPER_VOWELS = frozenset("AEIOUÁÉÍÓÚ")


def irish_lower(token: str) -> str:
    """IrishLowerCaseFilter (``ga/IrishLowerCaseFilter.java:41-64``):
    n/t before an uppercase vowel gets a hyphen inserted (nAthair →
    n-athair) so the mutation prefix survives lowercasing; then a plain
    lowercase of the remainder."""
    if (len(token) > 1 and token[0] in "nt"
            and token[1] in _GA_UPPER_VOWELS):
        return token[0] + "-" + token[1:].lower()
    return token.lower()


#: pl/stopwords.txt (182 entries; the stempel module's list)
POLISH_STOP_WORDS = frozenset((
    "vol", "o.o.", "mgr", "godz", "zł", "www", "pl", "ul", "tel", "hab",
    "prof", "inż", "dr", "i", "u", "aby", "albo", "ale", "ani", "aż",
    "bardzo", "bez", "bo", "bowiem", "by", "byli", "bym", "był", "była",
    "było", "były", "być", "będzie", "będą", "chce", "choć", "co",
    "coraz", "coś", "czy", "czyli", "często", "dla", "do", "gdy",
    "gdyby", "gdyż", "gdzie", "go", "ich", "im", "inne", "iż", "ja",
    "jak", "jakie", "jako", "je", "jednak", "jednym", "jedynie", "jego",
    "jej", "jest", "jeszcze", "jeśli", "jeżeli", "już", "ją", "kiedy",
    "kilku", "kto", "która", "które", "którego", "której", "który",
    "których", "którym", "którzy", "lat", "lecz", "lub", "ma", "mają",
    "mamy", "mi", "miał", "mimo", "mnie", "mogą", "może", "można", "mu",
    "musi", "na", "nad", "nam", "nas", "nawet", "nic", "nich", "nie",
    "niej", "nim", "niż", "no", "nowe", "np", "nr", "o", "od", "ok",
    "on", "one", "oraz", "pan", "po", "pod", "ponad", "ponieważ",
    "poza", "przed", "przede", "przez", "przy", "raz", "razie", "roku",
    "również", "się", "sobie", "sposób", "swoje", "są", "ta", "tak",
    "takich", "takie", "także", "tam", "te", "tego", "tej", "temu",
    "ten", "teraz", "też", "to", "trzeba", "tu", "tych", "tylko", "tym",
    "tys", "tzw", "tę", "w", "we", "wie", "więc", "wszystko", "wśród",
    "właśnie", "z", "za", "zaś", "ze", "że", "żeby", "ii", "iii", "iv",
    "vi", "vii", "viii", "ix", "xi", "xii", "xiii", "xiv", "xv",
))
