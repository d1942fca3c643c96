"""Snowball stemmers (Danish, Dutch, Romanian) as plain-Python
transcriptions of the published Snowball algorithms
(https://snowballstem.org/algorithms/), matched bit-for-bit against the
reference's generated runtime (``lucene/analysis/common/src/java/org/
tartarus/snowball/ext/{Danish,Dutch,Romanian}Stemmer.java`` — used only
to pin this era's suffix tables) and its published ground-truth
vocabularies (``analysis/snowball/TestSnowballVocabData.zip``:
danish/dutch/romanian voc.txt → output.txt, 23,829 / 45,669 / 22,570
entries — asserted exhaustively in tests/test_snowball.py).

These back SnowballFilter (``analysis/snowball/SnowballFilter.java``) for
the analyzers whose reference chain is Snowball-based:
DanishAnalyzer / DutchAnalyzer / RomanianAnalyzer
(``analysis/common/.../{da,nl,ro}/*Analyzer.java``).
"""

from __future__ import annotations

_DA_VOWELS = frozenset("aeiouyæåø")
_DA_S_ENDING = frozenset("abcdfghjklmnoprtvyzå")

#: longest-match-wins step-1 suffixes; action 1 = delete, 2 = s-check
_DA_STEP1 = sorted(
    [
        ("hed", 1), ("ethed", 1), ("ered", 1), ("e", 1), ("erede", 1),
        ("ende", 1), ("erende", 1), ("ene", 1), ("erne", 1), ("ere", 1),
        ("en", 1), ("heden", 1), ("eren", 1), ("er", 1), ("heder", 1),
        ("erer", 1), ("s", 2), ("heds", 1), ("es", 1), ("endes", 1),
        ("erendes", 1), ("enes", 1), ("ernes", 1), ("eres", 1), ("ens", 1),
        ("hedens", 1), ("erens", 1), ("ers", 1), ("ets", 1), ("erets", 1),
        ("et", 1), ("eret", 1),
    ],
    key=lambda kv: -len(kv[0]),
)
_DA_STEP3 = sorted(
    [("ig", 1), ("lig", 1), ("elig", 1), ("els", 1), ("løst", 2)],
    key=lambda kv: -len(kv[0]),
)


def _r1_scandinavian(word: str, vowels: frozenset) -> int:
    """R1 start = after the first non-vowel following a vowel, but never
    before position 3 (the Scandinavian ``setmark x`` adjustment). Returns
    ``len(word)`` when no region exists."""
    n = len(word)
    if n < 3:
        return n
    i = 0
    while i < n and word[i] not in vowels:
        i += 1
    while i < n and word[i] in vowels:
        i += 1
    if i >= n:
        return n
    p1 = i + 1
    return max(p1, 3)


def _da_consonant_pair(word: str, p1: int) -> str:
    """Step 2: remove the final letter when the word ends gd/dt/gt/kt
    with the pair inside R1."""
    for sfx in ("gd", "dt", "gt", "kt"):
        if word.endswith(sfx) and len(word) - 2 >= p1:
            return word[:-1]
    return word


def danish_stem(word: str) -> str:
    """Snowball Danish: main suffix → consonant pair → other suffix
    (igst / ig-lig-elig-els / løst) → undouble."""
    p1 = _r1_scandinavian(word, _DA_VOWELS)
    # step 1: longest suffix wholly inside R1
    for sfx, action in _DA_STEP1:
        if word.endswith(sfx) and len(word) - len(sfx) >= p1:
            if action == 1:
                word = word[: -len(sfx)]
                break
            # action 2: 's' — preceding char (anywhere) must be a valid
            # s-ending
            if len(word) >= 2 and word[-2] in _DA_S_ENDING:
                word = word[:-1]
                break
            # a failed s-check falls through to nothing (it was the
            # longest match; Snowball's among returns that single entry)
            break
    word = _da_consonant_pair(word, p1)
    # step 3 pre-pass: ends 'igst' → drop the 'st' (no region check)
    if word.endswith("igst"):
        word = word[:-2]
    for sfx, action in _DA_STEP3:
        if word.endswith(sfx) and len(word) - len(sfx) >= p1:
            if action == 1:
                word = word[: -len(sfx)]
                word = _da_consonant_pair(word, p1)
            else:
                word = word[:-1]  # løst → løs
            break
    # step 4 undouble: final char in R1, non-vowel, equal to its
    # predecessor → drop it
    if (
        len(word) >= 2
        and len(word) - 1 >= p1
        and word[-1] not in _DA_VOWELS
        and word[-1] == word[-2]
    ):
        word = word[:-1]
    return word

# ---------------------------------------------------------------- Dutch

_NL_VOWELS = frozenset("aeiouyè")
_NL_ACCENT_MAP = str.maketrans("áäéëíïóöúü", "aaeeiioouu")


def _nl_prelude(word: str) -> str:
    """Fold umlaut/acute accents; uppercase initial y, y after a vowel,
    and i between vowels (treated as consonants until the postlude)."""
    word = word.translate(_NL_ACCENT_MAP)
    chars = list(word)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    k = 0
    n = len(chars)
    while k < n:
        if chars[k] in _NL_VOWELS:
            if k + 2 < n and chars[k + 1] == "i" and chars[k + 2] in _NL_VOWELS:
                chars[k + 1] = "I"
                k += 3
                continue
            if k + 1 < n and chars[k + 1] == "y":
                chars[k + 1] = "Y"
                k += 2
                continue
        k += 1
    return "".join(chars)


def _std_regions(word: str, vowels: frozenset, min_r1: int = 0) -> tuple[int, int]:
    """Standard snowball R1/R2 starts (len(word) when absent); R1 is
    clamped to ``min_r1`` when requested (Dutch/Scandinavian rule)."""
    n = len(word)

    def after_vowel_nonvowel(start: int) -> int:
        i = start
        while i < n and word[i] not in vowels:
            i += 1
        while i < n and word[i] in vowels:
            i += 1
        return i + 1 if i < n else n

    p1 = after_vowel_nonvowel(0)
    p2 = after_vowel_nonvowel(p1) if p1 < n else n
    if min_r1 and p1 < min_r1:
        p1 = min(min_r1, n)
    return p1, p2


def _nl_undouble(word: str) -> str:
    if word.endswith(("kk", "dd", "tt")):
        return word[:-1]
    return word


def _nl_en_ending(word: str, cut: int, p1: int) -> str | None:
    """Delete the bracketed en/ene suffix (``word[cut:]``) when it lies in
    R1, is preceded by a non-vowel, and not by 'gem'; then undouble.
    Returns None when the conditions fail."""
    if cut < p1:
        return None
    stem = word[:cut]
    if not stem or stem[-1] in _NL_VOWELS:
        return None
    if stem.endswith("gem"):
        return None
    return _nl_undouble(stem)


def dutch_stem(word: str) -> str:
    """Snowball Dutch (nl/DutchAnalyzer.java chain member)."""
    word = _nl_prelude(word)
    p1, p2 = _std_regions(word, _NL_VOWELS, min_r1=3)
    e_found = False

    # step 1: longest of heden / ene / en / se / s
    for sfx in ("heden", "ene", "en", "se", "s"):
        if not word.endswith(sfx):
            continue
        cut = len(word) - len(sfx)
        if sfx == "heden":
            if cut >= p1:
                word = word[:cut] + "heid"
        elif sfx in ("ene", "en"):
            new = _nl_en_ending(word, cut, p1)
            if new is not None:
                word = new
        else:  # se / s: preceded by a non-vowel other than j
            if cut >= p1 and cut > 0 and word[cut - 1] not in _NL_VOWELS \
                    and word[cut - 1] != "j":
                word = word[:cut]
        break

    # step 2: e-ending
    if word.endswith("e") and len(word) - 1 >= p1 and len(word) >= 2 \
            and word[-2] not in _NL_VOWELS:
        word = _nl_undouble(word[:-1])
        e_found = True

    # step 3a: heid (R2, not preceded by c), then a mandatory en-ending
    if word.endswith("heid") and len(word) - 4 >= p2 \
            and (len(word) < 5 or word[-5] != "c"):
        word = word[:-4]
        if word.endswith("en"):
            new = _nl_en_ending(word, len(word) - 2, p1)
            if new is not None:
                word = new

    # step 3b: longest of end / ing / lijk / baar / bar / ig
    for sfx in ("lijk", "baar", "end", "ing", "bar", "ig"):
        if not word.endswith(sfx):
            continue
        cut = len(word) - len(sfx)
        if sfx in ("end", "ing"):
            if cut >= p2:
                word = word[:cut]
                if word.endswith("ig") and len(word) - 2 >= p2 \
                        and (len(word) < 3 or word[-3] != "e"):
                    word = word[:-2]
                else:
                    word = _nl_undouble(word)
        elif sfx == "ig":
            if cut >= p2 and (cut == 0 or word[cut - 1] != "e"):
                word = word[:cut]
        elif sfx == "lijk":
            if cut >= p2:
                word = word[:cut]
                if word.endswith("e") and len(word) - 1 >= p1 \
                        and len(word) >= 2 and word[-2] not in _NL_VOWELS:
                    word = _nl_undouble(word[:-1])
                    e_found = True
        elif sfx == "baar":
            if cut >= p2:
                word = word[:cut]
        else:  # bar
            if cut >= p2 and e_found:
                word = word[:cut]
        break

    # step 4: undouble vowel — C + aa/ee/oo/uu + non-vowel-non-I ending
    if len(word) >= 4 and word[-1] not in _NL_VOWELS and word[-1] != "I" \
            and word[-2] == word[-3] and word[-2] in "aeou" \
            and word[-4] not in _NL_VOWELS:
        word = word[:-2] + word[-1]

    return word.replace("I", "i").replace("Y", "y")

# ------------------------------------------------------------- Romanian

_RO_VOWELS = frozenset("aeiouâîă")

#: step 0 (a_1, R1): suffix → replacement (None = delete); 'ile' carries
#: the not-preceded-by-'ab' guard inline below.
_RO_STEP0 = sorted(
    [
        ("ul", ""), ("ului", ""),
        ("aua", "a"),
        ("ea", "e"), ("ele", "e"), ("elor", "e"),
        ("ii", "i"), ("iua", "i"), ("iei", "i"), ("iile", "i"),
        ("ilor", "i"), ("iilor", "i"), ("ile", "i"),
        ("atei", "at"),
        ("aţie", "aţi"), ("aţia", "aţi"),
    ],
    key=lambda kv: -len(kv[0]),
)

#: combo suffixes (a_2, R1, repeated): suffix → replacement
_RO_COMBO = sorted(
    [
        ("abilitate", "abil"), ("abilitati", "abil"),
        ("abilităi", "abil"), ("abilităţi", "abil"),
        ("ibilitate", "ibil"),
        ("ivitate", "iv"), ("ivitati", "iv"), ("ivităi", "iv"),
        ("ivităţi", "iv"),
        ("icala", "ic"), ("icale", "ic"), ("icali", "ic"),
        ("icală", "ic"), ("ical", "ic"),
        ("iciva", "ic"), ("icive", "ic"), ("icivi", "ic"),
        ("icivă", "ic"), ("iciv", "ic"),
        ("icitate", "ic"), ("icitati", "ic"), ("icităi", "ic"),
        ("icităţi", "ic"), ("icatori", "ic"), ("icator", "ic"),
        ("ativa", "at"), ("ative", "at"), ("ativi", "at"),
        ("ativă", "at"), ("ativ", "at"),
        ("aţiune", "at"), ("atoare", "at"), ("atori", "at"),
        ("ator", "at"), ("ătoare", "at"), ("ători", "at"),
        ("ător", "at"),
        ("itiva", "it"), ("itive", "it"), ("itivi", "it"),
        ("itivă", "it"), ("itiv", "it"),
        ("iţiune", "it"), ("itoare", "it"), ("itori", "it"),
        ("itor", "it"),
    ],
    key=lambda kv: -len(kv[0]),
)

#: standard suffixes (a_3, R2): action 1 delete, 2 ţiune→t, 3 →ist
_RO_STD = sorted(
    [
        ("ica", 1), ("abila", 1), ("ibila", 1), ("oasa", 1), ("ata", 1),
        ("ita", 1), ("anta", 1), ("ista", 3), ("uta", 1), ("iva", 1),
        ("ic", 1), ("ice", 1), ("abile", 1), ("ibile", 1), ("isme", 3),
        ("iune", 2), ("oase", 1), ("ate", 1), ("itate", 1), ("ite", 1),
        ("ante", 1), ("iste", 3), ("ute", 1), ("ive", 1), ("ici", 1),
        ("abili", 1), ("ibili", 1), ("iuni", 2), ("atori", 1), ("osi", 1),
        ("ati", 1), ("itati", 1), ("iti", 1), ("anti", 1), ("isti", 3),
        ("uti", 1), ("işti", 3), ("ivi", 1), ("ităi", 1),
        ("oşi", 1), ("ităţi", 1), ("abil", 1), ("ibil", 1),
        ("ism", 3), ("ator", 1), ("os", 1), ("at", 1), ("it", 1),
        ("ant", 1), ("ist", 3), ("ut", 1), ("iv", 1), ("ică", 1),
        ("abilă", 1), ("ibilă", 1), ("oasă", 1),
        ("ată", 1), ("ită", 1), ("antă", 1),
        ("istă", 3), ("ută", 1), ("ivă", 1),
    ],
    key=lambda kv: -len(kv[0]),
)

#: verb suffixes (a_4, RV): action 1 = delete when preceded (inside RV)
#: by a non-vowel or literal 'u'; action 2 = delete unconditionally
_RO_VERB = sorted(
    [
        ("ea", 1), ("ia", 1), ("esc", 1), ("ăsc", 1), ("ind", 1),
        ("ând", 1), ("are", 1), ("ere", 1), ("ire", 1),
        ("âre", 1), ("se", 2), ("ase", 1), ("sese", 2), ("ise", 1),
        ("use", 1), ("âse", 1), ("eşte", 1), ("ăşte", 1),
        ("eze", 1), ("ai", 1), ("eai", 1), ("iai", 1), ("sei", 2),
        ("eşti", 1), ("ăşti", 1), ("ui", 1), ("ezi", 1),
        ("âi", 1), ("aşi", 1), ("seşi", 2),
        ("aseşi", 1), ("seseşi", 2), ("iseşi", 1),
        ("useşi", 1), ("âseşi", 1), ("işi", 1),
        ("uşi", 1), ("âşi", 1), ("aţi", 2),
        ("eaţi", 1), ("iaţi", 1), ("eţi", 2),
        ("iţi", 2), ("âţi", 2), ("arăţi", 1),
        ("serăţi", 2), ("aserăţi", 1),
        ("seserăţi", 2), ("iserăţi", 1),
        ("userăţi", 1), ("âserăţi", 1),
        ("irăţi", 1), ("urăţi", 1),
        ("ârăţi", 1), ("am", 1), ("eam", 1), ("iam", 1),
        ("em", 2), ("asem", 1), ("sesem", 2), ("isem", 1), ("usem", 1),
        ("âsem", 1), ("im", 2), ("âm", 2), ("ăm", 2),
        ("arăm", 1), ("serăm", 2), ("aserăm", 1),
        ("seserăm", 2), ("iserăm", 1), ("userăm", 1),
        ("âserăm", 1), ("irăm", 1), ("urăm", 1),
        ("ârăm", 1), ("au", 1), ("eau", 1), ("iau", 1),
        ("indu", 1), ("ându", 1), ("ez", 1), ("ească", 1),
        ("ară", 1), ("seră", 2), ("aseră", 1),
        ("seseră", 2), ("iseră", 1), ("useră", 1),
        ("âseră", 1), ("iră", 1), ("ură", 1),
        ("âră", 1), ("ează", 1),
    ],
    key=lambda kv: -len(kv[0]),
)

_RO_VOWEL_SFX = ("ie", "a", "e", "i", "ă")


def _ro_prelude(word: str) -> str:
    """Uppercase intervocalic u/i (treated as consonants until the
    postlude)."""
    chars = list(word)
    n = len(chars)
    for k in range(1, n - 1):
        if chars[k] in "ui" and chars[k - 1] in _RO_VOWELS \
                and chars[k + 1] in _RO_VOWELS:
            chars[k] = chars[k].upper()
    return "".join(chars)


def _ro_rv(word: str) -> int:
    """Spanish-style RV: vowel+consonant → past next vowel; vowel+vowel →
    past next consonant; consonant start → standard RV."""
    n = len(word)
    if n == 0:
        return n
    V = _RO_VOWELS
    if word[0] in V:
        if n >= 2 and word[1] not in V:
            for i in range(2, n):
                if word[i] in V:
                    return i + 1
            return n
        if n >= 2 and word[1] in V:
            for i in range(2, n):
                if word[i] not in V:
                    return i + 1
            return n
        return n
    # consonant start
    if n >= 2 and word[1] not in V:
        for i in range(2, n):
            if word[i] in V:
                return i + 1
        return n
    if n >= 2 and word[1] in V:
        return 3 if n >= 3 else n
    return n


def romanian_stem(word: str) -> str:  # noqa: C901 — transcribed branches
    """Snowball Romanian (ro/RomanianAnalyzer.java chain member)."""
    word = _ro_prelude(word)
    V = _RO_VOWELS
    pV = _ro_rv(word)
    p1, p2 = _std_regions(word, V)

    # step 0 (R1)
    for sfx, repl in _RO_STEP0:
        if word.endswith(sfx):
            cut = len(word) - len(sfx)
            if cut >= p1:
                if sfx == "ile" and word[max(0, cut - 2):cut] == "ab":
                    break
                word = word[:cut] + repl
            break

    # standard suffix: repeat combo (R1), then a_3 (R2)
    removed = False
    changed = True
    while changed:
        changed = False
        for sfx, repl in _RO_COMBO:
            if word.endswith(sfx):
                cut = len(word) - len(sfx)
                if cut >= p1:
                    word = word[:cut] + repl
                    removed = True
                    changed = True
                break
    for sfx, action in _RO_STD:
        if word.endswith(sfx):
            cut = len(word) - len(sfx)
            if cut < p2:
                break
            if action == 1:
                word = word[:cut]
            elif action == 3:
                word = word[:cut] + "ist"
            else:  # iune/iuni: must be preceded by ţ → 't'
                if cut == 0 or word[cut - 1] != "ţ":
                    break
                word = word[: cut - 1] + "t"
            removed = True
            break

    # verb suffix (RV) only when no standard suffix was removed
    if not removed:
        for sfx, action in _RO_VERB:
            if word.endswith(sfx):
                cut = len(word) - len(sfx)
                if cut < pV:
                    continue  # find_among_b falls back to shorter fits
                if action == 1:
                    # preceding char inside RV, non-vowel or literal 'u'
                    if cut - 1 < pV:
                        break
                    prev = word[cut - 1]
                    if prev in V and prev != "u":
                        break
                    word = word[:cut]
                else:
                    word = word[:cut]
                break

    # vowel suffix (RV) — longest textual match only; an RV miss does NOT
    # fall back to a shorter suffix (find_among_b here has no setlimit, so
    # 'ie' failing RV never retries 'e': "anglie" stays "anglie")
    for sfx in _RO_VOWEL_SFX:
        if word.endswith(sfx):
            if len(word) - len(sfx) >= pV:
                word = word[: -len(sfx)]
            break

    return word.replace("I", "i").replace("U", "u")

# --------------------------------------------- analyzer-chain resources

#: snowball/danish_stop.txt (Snowball project stopword list, '|' comments)
DANISH_STOP_WORDS = frozenset("""
og i jeg det at en den til er som på de med han af for ikke der var mig
sig men et har om vi min havde ham hun nu over da fra du ud sin dem os op
man hans hvor eller hvad skal selv her alle vil blev kunne ind når være
dog noget ville jo deres efter ned skulle denne end dette mit også under
have dig anden hende mine alt meget sit sine vor mod disse hvis din nogle
hos blive mange ad bliver hendes været thi jer sådan
""".split())

#: snowball/dutch_stop.txt
DUTCH_STOP_WORDS = frozenset("""
de en van ik te dat die in een hij het niet zijn is was op aan met als
voor had er maar om hem dan zou of wat mijn men dit zo door over ze zich
bij ook tot je mij uit der daar haar naar heb hoe heeft hebben deze u want
nog zal me zij nu ge geen omdat iets worden toch al waren veel meer doen
toen moet ben zonder kan hun dus alles onder ja eens hier wie werd altijd
doch wordt wezen kunnen ons zelf tegen na reeds wil kon niets uw iemand
geweest andere
""".split())

#: ro/stopwords.txt (Savoy CLEF list, BSD; '#' comments)
ROMANIAN_STOP_WORDS = frozenset("""
acea aceasta această aceea acei aceia acel acela acele acelea acest
acesta aceste acestea aceşti aceştia acolo acum ai aia aibă aici al ăla
ale alea ălea altceva altcineva am ar are aş aşadar asemenea asta ăsta
astăzi astea ăstea ăştia asupra aţi au avea avem aveţi azi bine bucur
bună ca că căci când care cărei căror cărui cât câte câţi către câtva ce
cel ceva chiar cînd cine cineva cît cîte cîţi cîtva contra cu cum cumva
curând curînd da dă dacă dar datorită de deci deja deoarece departe deşi
din dinaintea dintr dintre drept după ea ei el ele eram este eşti eu
face fără fi fie fiecare fii fim fiţi iar ieri îi îl îmi împotriva în
înainte înaintea încât încît încotro între întrucât întrucît îţi la
lângă le li lîngă lor lui mă mâine mea mei mele mereu meu mi mine mult
multă mulţi ne nicăieri nici nimeni nişte noastră noastre noi noştri
nostru nu ori oricând oricare oricât orice oricînd oricine oricît oricum
oriunde până pe pentru peste pînă poate pot prea prima primul prin
printr sa să săi sale sau său se şi sînt sîntem sînteţi spre sub sunt
suntem sunteţi ta tăi tale tău te ţi ţie tine toată toate tot toţi
totuşi tu un una unde undeva unei unele uneori unor vă vi voastră
voastre voi voştri vostru vouă vreo vreun
""".split())

#: DutchAnalyzer's default StemmerOverrideFilter table
#: (``nl/DutchAnalyzer.java:80-84``) — applied before the stemmer.
DUTCH_STEM_OVERRIDES = {
    "fiets": "fiets", "bromfiets": "bromfiets",
    "ei": "eier", "kind": "kinder",
}


def dutch_analyzer_stem(word: str) -> str:
    """DutchAnalyzer chain tail: StemmerOverrideFilter(default dict) →
    SnowballFilter(DutchStemmer) (``nl/DutchAnalyzer.java:151-160``)."""
    hit = DUTCH_STEM_OVERRIDES.get(word)
    if hit is not None:
        return hit
    return dutch_stem(word)

# -------------------------------------------------------------- Swedish

_SV_VOWELS = frozenset("aeiouyäåö")
_SV_S_ENDING = frozenset("bcdfghjklmnoprtvy")

_SV_STEP1 = sorted(
    [
        ("a", 1), ("arna", 1), ("erna", 1), ("heterna", 1), ("orna", 1),
        ("ad", 1), ("e", 1), ("ade", 1), ("ande", 1), ("arne", 1),
        ("are", 1), ("aste", 1), ("en", 1), ("anden", 1), ("aren", 1),
        ("heten", 1), ("ern", 1), ("ar", 1), ("er", 1), ("heter", 1),
        ("or", 1), ("s", 2), ("as", 1), ("arnas", 1), ("ernas", 1),
        ("ornas", 1), ("es", 1), ("ades", 1), ("andes", 1), ("ens", 1),
        ("arens", 1), ("hetens", 1), ("erns", 1), ("at", 1), ("andet", 1),
        ("het", 1), ("ast", 1),
    ],
    key=lambda kv: -len(kv[0]),
)
_SV_PAIRS = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
_SV_STEP3 = sorted(
    [("ig", None), ("lig", None), ("els", None),
     ("fullt", "full"), ("löst", "lös")],
    key=lambda kv: -len(kv[0]),
)


def swedish_stem(word: str) -> str:
    """Snowball Swedish (the reference SwedishAnalyzer's default chain
    member, ``sv/SwedishAnalyzer.java:122`` SnowballFilter(SwedishStemmer);
    suffix tables from ``tartarus/snowball/ext/SwedishStemmer.java``)."""
    p1 = _r1_scandinavian(word, _SV_VOWELS)
    # main suffix (setlimit R1: shorter trie entries fall back on misfit)
    for sfx, action in _SV_STEP1:
        if word.endswith(sfx) and len(word) - len(sfx) >= p1:
            if action == 1:
                word = word[: -len(sfx)]
            elif len(word) >= 2 and word[-2] in _SV_S_ENDING:
                word = word[:-1]
            break
    # consonant pair: both chars inside R1 → drop the last letter
    if word[-2:] in _SV_PAIRS and len(word) - 2 >= p1:
        word = word[:-1]
    # other suffix inside R1
    for sfx, repl in _SV_STEP3:
        if word.endswith(sfx) and len(word) - len(sfx) >= p1:
            word = word[: -len(sfx)] + (repl or "")
            break
    return word

# ------------------------------------------------------------ Norwegian

_NO_VOWELS = frozenset("aeiouyåæø")
_NO_S_ENDING = frozenset("bcdfghjlmnoprtvyz")  # note: no 'k'

#: action 1 delete, 2 s-check, 3 → 'er'
_NO_STEP1 = sorted(
    [
        ("a", 1), ("e", 1), ("ede", 1), ("ande", 1), ("ende", 1),
        ("ane", 1), ("ene", 1), ("hetene", 1), ("erte", 3), ("en", 1),
        ("heten", 1), ("ar", 1), ("er", 1), ("heter", 1), ("s", 2),
        ("as", 1), ("es", 1), ("edes", 1), ("endes", 1), ("enes", 1),
        ("hetenes", 1), ("ens", 1), ("hetens", 1), ("ers", 1), ("ets", 1),
        ("et", 1), ("het", 1), ("ert", 3), ("ast", 1),
    ],
    key=lambda kv: -len(kv[0]),
)
_NO_STEP3 = sorted(
    ["leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov",
     "slov", "hetslov"],
    key=len, reverse=True,
)


def norwegian_stem(word: str) -> str:
    """Snowball Norwegian (the reference NorwegianAnalyzer's default chain
    member, ``no/NorwegianAnalyzer.java:118`` SnowballFilter(
    NorwegianStemmer); tables from ``tartarus/snowball/ext/
    NorwegianStemmer.java``)."""
    p1 = _r1_scandinavian(word, _NO_VOWELS)
    for sfx, action in _NO_STEP1:
        if word.endswith(sfx) and len(word) - len(sfx) >= p1:
            if action == 1:
                word = word[: -len(sfx)]
            elif action == 3:
                word = word[: -len(sfx)] + "er"
            else:
                # 's': preceded by an s-ending char, or by 'k' itself
                # preceded by a non-vowel
                if len(word) >= 2 and word[-2] in _NO_S_ENDING:
                    word = word[:-1]
                elif len(word) >= 3 and word[-2] == "k" \
                        and word[-3] not in _NO_VOWELS:
                    word = word[:-1]
            break
    if word[-2:] in ("dt", "vt") and len(word) - 2 >= p1:
        word = word[:-1]
    for sfx in _NO_STEP3:
        if word.endswith(sfx) and len(word) - len(sfx) >= p1:
            word = word[: -len(sfx)]
            break
    return word

# -------------------------------------------------------------- Russian

_RU_VOWELS = frozenset("аеиоуыэюя")

#: action 1 = delete when preceded (inside RV) by а/я; action 2 = delete
_RU_PERF_GERUND = sorted(
    [("в", 1), ("ив", 2), ("ыв", 2), ("вши", 1), ("ивши", 2),
     ("ывши", 2), ("вшись", 1), ("ившись", 2), ("ывшись", 2)],
    key=lambda kv: -len(kv[0]),
)
_RU_ADJECTIVE = sorted(
    ["ее", "ие", "ое", "ые", "ими", "ыми", "ей", "ий", "ой", "ый",
     "ем", "им", "ом", "ым", "его", "ого", "ему", "ому", "их", "ых",
     "ею", "ою", "ую", "юю", "ая", "яя"],
    key=len, reverse=True,
)
_RU_PARTICIPLE = sorted(
    [("ем", 1), ("нн", 1), ("вш", 1), ("ивш", 2), ("ывш", 2),
     ("щ", 1), ("ющ", 1), ("ующ", 2)],
    key=lambda kv: -len(kv[0]),
)
_RU_VERB = sorted(
    [("ла", 1), ("ила", 2), ("ыла", 2), ("на", 1), ("ена", 2),
     ("ете", 1), ("ите", 2), ("йте", 1), ("ейте", 2), ("уйте", 2),
     ("ли", 1), ("или", 2), ("ыли", 2), ("й", 1), ("ей", 2), ("уй", 2),
     ("л", 1), ("ил", 2), ("ыл", 2), ("ем", 1), ("им", 2), ("ым", 2),
     ("н", 1), ("ен", 2), ("ло", 1), ("ило", 2), ("ыло", 2), ("но", 1),
     ("ено", 2), ("нно", 1), ("ет", 1), ("ует", 2), ("ит", 2),
     ("ыт", 2), ("ют", 1), ("уют", 2), ("ят", 2), ("ны", 1), ("ены", 2),
     ("ть", 1), ("ить", 2), ("ыть", 2), ("ешь", 1), ("ишь", 2),
     ("ю", 2), ("ую", 2)],
    key=lambda kv: -len(kv[0]),
)
_RU_NOUN = sorted(
    ["а", "ев", "ов", "е", "ие", "ье", "и", "еи", "ии", "ами", "ями",
     "иями", "й", "ей", "ией", "ий", "ой", "ам", "ем", "ием", "ом",
     "ям", "иям", "о", "у", "ах", "ях", "иях", "ы", "ь", "ю", "ию",
     "ью", "я", "ия", "ья"],
    key=len, reverse=True,
)


def _ru_rv_r2(word: str) -> tuple[int, int]:
    """RV start (after the first vowel) and R2 start."""
    n = len(word)
    V = _RU_VOWELS
    i = 0
    while i < n and word[i] not in V:
        i += 1
    if i >= n:
        return n, n
    pV = i + 1
    i = pV
    while i < n and word[i] in V:
        i += 1
    if i >= n:
        return pV, n
    i += 1  # past the non-vowel → p1
    while i < n and word[i] not in V:
        i += 1
    while i < n and word[i] in V:
        i += 1
    p2 = i + 1 if i < n else n
    return pV, p2


def _ru_match(word: str, table, pV: int):
    """Longest suffix fitting inside RV; returns (suffix, action) or
    None. Entries may be bare strings (action 1 = delete)."""
    for entry in table:
        sfx, action = entry if isinstance(entry, tuple) else (entry, 1)
        if word.endswith(sfx) and len(word) - len(sfx) >= pV:
            return sfx, action
    return None


def _ru_cond_delete(word: str, sfx: str, action: int, pV: int):
    """Apply a group-1 (needs preceding а/я inside RV) or group-2 delete;
    None when the condition fails."""
    cut = len(word) - len(sfx)
    if action == 1:
        if cut - 1 < pV or word[cut - 1] not in "ая":
            return None
    return word[:cut]


def russian_stem(word: str) -> str:
    """Snowball Russian (the reference RussianAnalyzer's default chain
    member, ``ru/RussianAnalyzer.java:105`` SnowballFilter(RussianStemmer);
    tables from ``tartarus/snowball/ext/RussianStemmer.java``). The whole
    backward pass runs inside RV."""
    pV, p2 = _ru_rv_r2(word)

    # step 1: perfective gerund, else [reflexive] then
    # adjectival | verb | noun
    done = False
    m = _ru_match(word, _RU_PERF_GERUND, pV)
    if m is not None:
        new = _ru_cond_delete(word, m[0], m[1], pV)
        if new is not None:
            word = new
            done = True
    if not done:
        m = _ru_match(word, [("сь", 1), ("ся", 1)], pV)
        if m is not None and m[1] == 1:
            word = word[: -len(m[0])]
        # adjectival: adjective, then optional participle
        m = _ru_match(word, _RU_ADJECTIVE, pV)
        if m is not None:
            word = word[: -len(m[0])]
            pm = _ru_match(word, _RU_PARTICIPLE, pV)
            if pm is not None:
                new = _ru_cond_delete(word, pm[0], pm[1], pV)
                if new is not None:
                    word = new
        else:
            vm = _ru_match(word, _RU_VERB, pV)
            new = (
                _ru_cond_delete(word, vm[0], vm[1], pV)
                if vm is not None else None
            )
            if new is not None:
                word = new
            else:
                nm = _ru_match(word, _RU_NOUN, pV)
                if nm is not None:
                    word = word[: -len(nm[0])]

    # step 2: final 'и' (inside RV)
    if word.endswith("и") and len(word) - 1 >= pV:
        word = word[:-1]

    # step 3: derivational ост/ость in R2
    m = _ru_match(word, ["ость", "ост"], pV)
    if m is not None and len(word) - len(m[0]) >= p2:
        word = word[: -len(m[0])]

    # step 4: tidy up — ейше(е)? then undouble нн; superlative; soft sign
    m = _ru_match(word, [("ейше", 1), ("н", 2), ("ейш", 1), ("ь", 3)], pV)
    if m is not None:
        sfx, action = m
        if action == 1:
            word = word[: -len(sfx)]
            if word.endswith("нн") and len(word) - 1 >= pV:
                word = word[:-1]
        elif action == 2:
            cut = len(word) - 1
            if cut - 1 >= pV and word[cut - 1] == "н":
                word = word[:cut]
        else:
            word = word[:-1]
    return word

# ------------------------------------------------- English (Porter2)

_EN_V = frozenset("aeiouy")
_EN_DOUBLES = ("bb","dd","ff","gg","mm","nn","pp","rr","tt")
_EN_VALID_LI = frozenset("cdeghkmnrt")
_EN_EXC1 = {"skis":"ski","skies":"sky","dying":"die","lying":"lie","tying":"tie",
         "idly":"idl","gently":"gentl","ugly":"ugli","early":"earli",
         "only":"onli","singly":"singl",
         "sky":"sky","news":"news","howe":"howe","atlas":"atlas",
         "cosmos":"cosmos","bias":"bias","andes":"andes"}
_EN_EXC2 = frozenset(["succeed","proceed","exceed","canning","inning","earring",
                   "herring","outing"])
_EN_STEP2 = sorted([
    ("tional","tion"),("enci","ence"),("anci","ance"),("abli","able"),
    ("entli","ent"),("izer","ize"),("ization","ize"),("ational","ate"),
    ("ation","ate"),("ator","ate"),("alism","al"),("aliti","al"),
    ("alli","al"),("fulness","ful"),("ousli","ous"),("ousness","ous"),
    ("iveness","ive"),("iviti","ive"),("biliti","ble"),("bli","ble"),
    ("ogi","og"),("fulli","ful"),("lessli","less"),("li",""),
], key=lambda kv: -len(kv[0]))
_EN_STEP3 = sorted([
    ("tional","tion"),("ational","ate"),("alize","al"),("icate","ic"),
    ("iciti","ic"),("ical","ic"),("ful",""),("ness",""),("ative",None),
], key=lambda kv: -len(kv[0]))
_EN_STEP4 = sorted(["ic","ance","ence","able","ible","ate","ive","ize","iti",
                 "al","ism","ion","er","ous","ant","ent","ment","ement"],
                key=len, reverse=True)

def _en_regions(word):
    n = len(word)
    for pfx in ("gener","commun","arsen"):
        if word.startswith(pfx):
            p1 = len(pfx)
            break
    else:
        i = 0
        while i < n and word[i] not in _EN_V: i += 1
        while i < n and word[i] in _EN_V: i += 1
        p1 = i+1 if i < n else n
    i = p1
    while i < n and word[i] not in _EN_V: i += 1
    while i < n and word[i] in _EN_V: i += 1
    p2 = i+1 if i < n else n
    return p1, p2

def _en_short_syllable(w, i):
    # short syllable ending at index i (inclusive)
    if i == 1:
        return w[0] in _EN_V and w[1] not in _EN_V
    return (i >= 2 and w[i] not in _EN_V and w[i] not in "wxY"
            and w[i-1] in _EN_V and w[i-2] not in _EN_V)

def _en_ends_short(w):
    return _en_short_syllable(w, len(w)-1)

def porter2_stem(word):
    """Snowball English "Porter2" (``tartarus/snowball/ext/EnglishStemmer.
    java``; Solr's SnowballPorterFilterFactory language=English default) —
    vocab-exact on all 29,417 TestSnowballVocabData english entries.
    Distinct from the classic 1980 Porter in ``analysis/porter.py``."""
    if word in _EN_EXC1:
        return _EN_EXC1[word]
    if len(word) < 3:
        return word
    # prelude
    if word.startswith("'"):
        word = word[1:]
    chars = list(word)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for k in range(1, len(chars)):
        if chars[k] == "y" and chars[k-1] in _EN_V:
            chars[k] = "Y"
    word = "".join(chars)
    p1, p2 = _en_regions(word)
    # step 0
    for sfx in ("'s'","'s","'"):
        if word.endswith(sfx):
            word = word[:-len(sfx)]
            break
    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied","ies")):
        word = word[:-2] if len(word) - 3 > 1 else word[:-1]
    elif word.endswith(("ss","us")):
        pass
    elif word.endswith("s"):
        if any(c in _EN_V for c in word[:-2]):
            word = word[:-1]
    # exception 2
    if word in _EN_EXC2:
        return word.replace("Y","y")
    # step 1b
    if word.endswith(("eed","eedly")):
        sfx = "eedly" if word.endswith("eedly") else "eed"
        if len(word) - len(sfx) >= p1:
            word = word[:-len(sfx)] + "ee"
    else:
        for sfx in ("ingly","edly","ing","ed"):
            if word.endswith(sfx):
                stem = word[:-len(sfx)]
                if any(c in _EN_V for c in stem):
                    word = stem
                    if word.endswith(("at","bl","iz")):
                        word += "e"
                    elif word.endswith(_EN_DOUBLES):
                        word = word[:-1]
                    elif p1 >= len(word) and _en_ends_short(word):
                        word += "e"
                break
    # step 1c
    if len(word) > 2 and word[-1] in "yY" and word[-2] not in _EN_V:
        word = word[:-1] + "i"
    # step 2 (R1)
    for sfx, repl in _EN_STEP2:
        if word.endswith(sfx):
            if len(word) - len(sfx) >= p1:
                if sfx == "ogi":
                    if len(word) >= 4 and word[-4] == "l":
                        word = word[:-1]
                elif sfx == "li":
                    if len(word) >= 3 and word[-3] in _EN_VALID_LI:
                        word = word[:-2]
                else:
                    word = word[:-len(sfx)] + repl
            break
    # step 3 (R1)
    for sfx, repl in _EN_STEP3:
        if word.endswith(sfx):
            if len(word) - len(sfx) >= p1:
                if repl is None:  # ative needs R2
                    if len(word) - len(sfx) >= p2:
                        word = word[:-len(sfx)]
                else:
                    word = word[:-len(sfx)] + repl
            break
    # step 4 (R2)
    for sfx in _EN_STEP4:
        if word.endswith(sfx):
            if len(word) - len(sfx) >= p2:
                if sfx == "ion":
                    if len(word) >= 4 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[:-len(sfx)]
            break
    # step 5
    if word.endswith("e"):
        if len(word) - 1 >= p2 or (
            len(word) - 1 >= p1 and not _en_short_syllable(word, len(word)-2)
        ):
            word = word[:-1]
    elif word.endswith("l"):
        if len(word) - 1 >= p2 and len(word) >= 2 and word[-2] == "l":
            word = word[:-1]
    return word.replace("Y","y")


# -------------------------------------------------------------- Finnish

_FI_V1 = frozenset("aeiouyäö")
_FI_V2 = frozenset("aeiouäö")
_FI_AEI = frozenset("aeiä")
_FI_PARTICLE_END = frozenset("aeinotuyäö")
_FI_LONG = ("aa","ee","ii","oo","uu","ää","öö")

_FI_PARTICLES = sorted(
    [("pa",1),("sti",2),("kaan",1),("han",1),("kin",1),("hän",1),
     ("kään",1),("ko",1),("pä",1),("kö",1)], key=lambda kv:-len(kv[0]))
_FI_POSS = sorted(
    [("nsa",3),("mme",3),("nne",3),("ni",2),("si",1),("an",4),("en",6),
     ("än",5),("nsä",3)], key=lambda kv:-len(kv[0]))
_FI_AN_PRE = ("lla","na","ssa","ta","lta","sta")
_FI_AEN_PRE = ("llä","nä","ssä","tä","ltä","stä")
_FI_EN_PRE = ("lle","ine")
#: case endings: (suffix, action); -1 plain delete
_FI_CASE = sorted(
    [("a",8),("lla",-1),("na",-1),("ssa",-1),("ta",-1),("lta",-1),
     ("sta",-1),("tta",9),("lle",-1),("ine",-1),("ksi",-1),("n",7),
     ("han",1),("den",-2),("seen",-3),("hen",2),("tten",-2),("hin",3),
     ("siin",-2),("hon",4),("hän",5),("hön",6),("ä",8),("llä",-1),
     ("nä",-1),("ssä",-1),("tä",-1),("ltä",-1),("stä",-1),("ttä",9)],
    key=lambda kv:-len(kv[0]))
_FI_HARMONY = {1:"a",2:"e",3:"i",4:"o",5:"ä",6:"ö"}
_FI_OTHER = sorted(
    [("eja",-1),("mma",1),("imma",-1),("mpa",1),("impa",-1),("mmi",1),
     ("immi",-1),("mpi",1),("impi",-1),("ejä",-1),("mmä",1),("immä",-1),
     ("mpä",1),("impä",-1)], key=lambda kv:-len(kv[0]))


def _fi_regions(word):
    n = len(word); V = _FI_V1
    i = 0
    while i < n and word[i] not in V: i += 1
    while i < n and word[i] in V: i += 1
    p1 = i+1 if i < n else n
    i = p1
    while i < n and word[i] not in V: i += 1
    while i < n and word[i] in V: i += 1
    p2 = i+1 if i < n else n
    return p1, p2


def _fi_ends_long(w, upto=None):
    s = w if upto is None else w[:upto]
    return s.endswith(_FI_LONG)


def finnish_snowball_stem(word):
    """Snowball Finnish (the reference FinnishAnalyzer's default chain
    member, ``fi/FinnishAnalyzer.java:119`` SnowballFilter(FinnishStemmer);
    tables from ``tartarus/snowball/ext/FinnishStemmer.java``) —
    vocab-exact on all 50,000 finnish entries."""
    p1, p2 = _fi_regions(word)
    ending_removed = False

    # particle etc (suffix inside R1; conditions unbounded)
    for sfx, action in _FI_PARTICLES:
        if word.endswith(sfx) and len(word)-len(sfx) >= p1:
            cut = len(word)-len(sfx)
            if action == 1:
                if cut >= 1 and word[cut-1] in _FI_PARTICLE_END:
                    word = word[:cut]
            else:  # sti needs R2
                if cut >= p2:
                    word = word[:cut]
            break

    # possessive (suffix inside R1)
    for sfx, action in _FI_POSS:
        if word.endswith(sfx) and len(word)-len(sfx) >= p1:
            cut = len(word)-len(sfx)
            if action == 1:  # si, not preceded by k
                if not (cut >= 1 and word[cut-1] == "k"):
                    word = word[:cut]
            elif action == 2:  # ni; then kse -> ksi
                word = word[:cut]
                if word.endswith("kse"):
                    word = word[:-3] + "ksi"
            elif action == 3:
                word = word[:cut]
            elif action == 4:
                if word[:cut].endswith(_FI_AN_PRE):
                    word = word[:cut]
            elif action == 5:
                if word[:cut].endswith(_FI_AEN_PRE):
                    word = word[:cut]
            else:  # 6
                if word[:cut].endswith(_FI_EN_PRE):
                    word = word[:cut]
            break

    # case ending (suffix inside R1)
    for sfx, action in _FI_CASE:
        if word.endswith(sfx) and len(word)-len(sfx) >= p1:
            cut = len(word)-len(sfx)
            # among-CONTEXT conditions (VI / LONG) are part of trie
            # matching: on failure the search falls back to a shorter
            # entry (continue); switch conditions do not (break)
            if action == -2 and not (
                cut >= 2 and word[cut-1] == "i" and word[cut-2] in _FI_V2
            ):
                continue
            if action == -3 and not _fi_ends_long(word, cut):
                continue
            ok = False
            extra = 0
            if action in (-1, -2, -3):
                ok = True
            elif action in _FI_HARMONY:
                ok = cut >= 1 and word[cut-1] == _FI_HARMONY[action]
            elif action == 7:  # n; maybe eat one more char
                ok = True
                if _fi_ends_long(word, cut) or word[:cut].endswith("ie"):
                    if cut >= 1:
                        extra = 1
            elif action == 8:  # a/ä preceded by V1 preceded by non-V1
                ok = (cut >= 2 and word[cut-1] in _FI_V1
                      and word[cut-2] not in _FI_V1)
            elif action == 9:  # tta/ttä preceded by e
                ok = cut >= 1 and word[cut-1] == "e"
            if ok:
                word = word[:cut-extra] if extra else word[:cut]
                ending_removed = True
            break

    # other endings (suffix inside R2)
    for sfx, action in _FI_OTHER:
        if word.endswith(sfx) and len(word)-len(sfx) >= p2:
            cut = len(word)-len(sfx)
            if action == 1 and word[:cut].endswith("po"):
                break
            word = word[:cut]
            break

    if ending_removed:
        # i_plural (inside R1)
        if word and word[-1] in "ij" and len(word)-1 >= p1:
            word = word[:-1]
    else:
        # t_plural: final t preceded by V1 (t inside R1)
        if word.endswith("t") and len(word)-1 >= p1 \
                and len(word) >= 2 and word[-2] in _FI_V1:
            word = word[:-1]
            # then mma/imma inside R2
            if word.endswith("imma") and len(word)-4 >= p2:
                word = word[:-4]
            elif word.endswith("mma") and len(word)-3 >= p2 \
                    and not word[:-3].endswith("po"):
                word = word[:-3]

    # tidy (each sub-step inside R1)
    if _fi_ends_long(word) and len(word)-2 >= p1 and len(word)-1 >= p1:
        word = word[:-1]
    if word and word[-1] in _FI_AEI and len(word)-2 >= p1 \
            and len(word) >= 2 and word[-2] not in _FI_V1:
        word = word[:-1]
    if word.endswith(("oj","uj")) and len(word)-2 >= p1:
        word = word[:-1]
    if word.endswith("jo") and len(word)-2 >= p1:
        word = word[:-1]
    # final undouble of the last consonant (unbounded scan)
    i = len(word)-1
    while i >= 0 and word[i] in _FI_V1:
        i -= 1
    if i >= 1 and word[i-1] == word[i]:
        word = word[:i] + word[i+1:]
    return word


# ------------------------------------------------------------ Hungarian

_HU_V = frozenset("aeiouáéíóõöúûü")
_HU_DIGRAPHS = ("dzs","cs","gy","ly","ny","sz","ty","zs")
_HU_DOUBLES = ("ccs","zzs","ggy","lly","nny","tty","ssz","bb","cc","dd",
               "ff","gg","jj","kk","ll","mm","nn","pp","rr","ss","tt",
               "vv","zz")
_HU_CASE = sorted(
    ["ba","ra","be","re","ig","nak","nek","val","vel","ul","nál","nél",
     "ból","ról","tól","bõl","rõl","tõl","ül","n","an","ban","en","ben",
     "képpen","on","ön","képp","kor","t","at","et","ként","anként",
     "enként","onként","ot","ért","öt","hez","hoz","höz","vá","vé"],
    key=len, reverse=True)
_HU_CASE_SPECIAL = sorted([("án","a"),("én","e"),("ánként","a")],
                          key=lambda kv:-len(kv[0]))
_HU_CASE_OTHER = sorted([("astul",None),("estül",None),("stul",None),
                         ("stül",None),("ástul","a"),("éstül","e")],
                        key=lambda kv:-len(kv[0]))
_HU_OWNED = sorted([("éi",None),("áéi","a"),("ééi","e"),("é",None),
                    ("ké",None),("aké",None),("eké",None),("oké",None),
                    ("öké",None),("áké","a"),("éké","e"),("éé","e")],
                   key=lambda kv:-len(kv[0]))
_HU_SING_OWNER = sorted(
    [("a",None),("ja",None),("d",None),("ad",None),("ed",None),
     ("od",None),("ád","a"),("éd","e"),("öd",None),("e",None),
     ("je",None),("nk",None),("unk",None),("ánk","a"),("énk","e"),
     ("ünk",None),("uk",None),("juk",None),("ájuk","a"),("ük",None),
     ("jük",None),("éjük","e"),("m",None),("am",None),("em",None),
     ("om",None),("ám","a"),("ém","e"),("o",None),("á","a"),("é","e")],
    key=lambda kv:-len(kv[0]))
_HU_PLUR_OWNER = sorted(
    [("id",None),("aid",None),("jaid",None),("eid",None),("jeid",None),
     ("áid","a"),("éid","e"),("i",None),("ai",None),("jai",None),
     ("ei",None),("jei",None),("ái","a"),("éi","e"),("itek",None),
     ("eitek",None),("jeitek",None),("éitek","e"),("ik",None),
     ("aik",None),("jaik",None),("eik",None),("jeik",None),("áik","a"),
     ("éik","e"),("ink",None),("aink",None),("jaink",None),("eink",None),
     ("jeink",None),("áink","a"),("éink","e"),("aitok",None),
     ("jaitok",None),("áitok","a"),("im",None),("aim",None),
     ("jaim",None),("eim",None),("jeim",None),("áim","a"),("éim","e")],
    key=lambda kv:-len(kv[0]))
_HU_PLURAL = sorted([("k",None),("ak",None),("ek",None),("ok",None),
                     ("ák","a"),("ék","e"),("ök",None)],
                    key=lambda kv:-len(kv[0]))


def _hu_p1(word):
    n = len(word)
    if not word:
        return 0
    if word[0] in _HU_V:
        i = 0
        while i < n and word[i] in _HU_V:
            i += 1
        if i >= n:
            return n
        for d in _HU_DIGRAPHS:
            if word.startswith(d, i):
                return i + len(d)
        return i + 1
    i = 0
    while i < n and word[i] not in _HU_V:
        i += 1
    if i >= n:
        return n
    return i + 1


def _hu_v_ending(word, p1):
    if word and word[-1] in "áé" and len(word) - 1 >= p1:
        return word[:-1] + ("a" if word[-1] == "á" else "e")
    return word


def _hu_undouble(word):
    # deletes the second-to-last char (one of the final double pair)
    return word[:-2] + word[-1]


def hungarian_snowball_stem(word):
    """Snowball Hungarian (the reference HungarianAnalyzer's default chain
    member, ``hu/HungarianAnalyzer.java:118`` SnowballFilter(
    HungarianStemmer); this 7.7-era table spells o/u double-acute as
    õ/û — kept verbatim to match the vocab ground truth) — vocab-exact
    on all 30,000 hungarian entries."""
    p1 = _hu_p1(word)

    # instrum: al/el in R1 preceded by a double consonant
    for sfx in ("al", "el"):
        if word.endswith(sfx):
            cut = len(word) - 2
            if cut >= p1 and word[:cut].endswith(_HU_DOUBLES):
                word = _hu_undouble(word[:cut])
            break

    # case ending → delete, then v_ending
    for sfx in _HU_CASE:
        if word.endswith(sfx):
            if len(word) - len(sfx) >= p1:
                word = word[: -len(sfx)]
                word = _hu_v_ending(word, p1)
            break

    # case_special: án→a, én→e, ánként→a
    for sfx, repl in _HU_CASE_SPECIAL:
        if word.endswith(sfx):
            if len(word) - len(sfx) >= p1:
                word = word[: -len(sfx)] + repl
            break

    # case_other
    for sfx, repl in _HU_CASE_OTHER:
        if word.endswith(sfx):
            if len(word) - len(sfx) >= p1:
                word = word[: -len(sfx)] + (repl or "")
            break

    # factive: á/é in R1 preceded by a double consonant
    if word and word[-1] in "áé":
        cut = len(word) - 1
        if cut >= p1 and word[:cut].endswith(_HU_DOUBLES):
            word = _hu_undouble(word[:cut])

    # owned
    for sfx, repl in _HU_OWNED:
        if word.endswith(sfx):
            if len(word) - len(sfx) >= p1:
                word = word[: -len(sfx)] + (repl or "")
            break

    # sing_owner
    for sfx, repl in _HU_SING_OWNER:
        if word.endswith(sfx):
            if len(word) - len(sfx) >= p1:
                word = word[: -len(sfx)] + (repl or "")
            break

    # plur_owner
    for sfx, repl in _HU_PLUR_OWNER:
        if word.endswith(sfx):
            if len(word) - len(sfx) >= p1:
                word = word[: -len(sfx)] + (repl or "")
            break

    # plural
    for sfx, repl in _HU_PLURAL:
        if word.endswith(sfx):
            if len(word) - len(sfx) >= p1:
                word = word[: -len(sfx)] + (repl or "")
            break

    return word



# ---------------------------------------------------------------------------
# German / German2 (org/tartarus/snowball/ext/German{,2}Stemmer.java;
# published algorithm https://snowballstem.org/algorithms/german/)
# ---------------------------------------------------------------------------

_DE_V = frozenset("aeiouyäöü")
_DE_S_END = frozenset("bdfghklmnrt")
_DE_ST_END = frozenset("bdfghklmnt")
_DE_POST = str.maketrans({"Y": "y", "U": "u", "ä": "a", "ö": "o", "ü": "u"})


def _de_prelude(word: str) -> str:
    # ß→ss, then protect intervocalic u/y from being treated as vowels
    word = word.replace("ß", "ss")
    chars = list(word)
    n = len(chars)
    for k in range(1, n - 1):
        if chars[k] in "uy" and chars[k - 1] in _DE_V and chars[k + 1] in _DE_V:
            chars[k] = chars[k].upper()
    return "".join(chars)


def _de_regions(word: str) -> tuple[int, int]:
    n = len(word)
    V = _DE_V
    i = 0
    while i < n and word[i] not in V:
        i += 1
    while i < n and word[i] in V:
        i += 1
    p1 = i + 1 if i < n else n
    i = p1  # p2 continues from the UNclamped p1
    while i < n and word[i] not in V:
        i += 1
    while i < n and word[i] in V:
        i += 1
    p2 = i + 1 if i < n else n
    if p1 < 3:
        p1 = min(3, n)  # German: R1 starts no earlier than position 3
    return p1, p2


def _de_body(word: str) -> str:
    p1, p2 = _de_regions(word)

    # step 1 (R1)
    for sfx in ("ern", "em", "en", "er", "es", "e", "s"):
        if word.endswith(sfx) and len(word) - len(sfx) >= p1:
            if sfx == "s":
                if len(word) >= 2 and word[-2] in _DE_S_END:
                    word = word[:-1]
            else:
                word = word[: -len(sfx)]
            break

    # step 2 (R1)
    for sfx in ("est", "en", "er", "st"):
        if word.endswith(sfx) and len(word) - len(sfx) >= p1:
            if sfx == "st":
                cut = len(word) - 2
                if cut >= 1 and word[cut - 1] in _DE_ST_END and cut - 1 >= 3:
                    word = word[:-2]
            else:
                word = word[: -len(sfx)]
            break

    # step 3: d-suffixes (R2)
    for sfx in ("lich", "isch", "heit", "keit", "end", "ung", "ig", "ik"):
        if word.endswith(sfx) and len(word) - len(sfx) >= p2:
            if sfx in ("end", "ung"):
                word = word[: -len(sfx)]
                if (word.endswith("ig") and not word[:-2].endswith("e")
                        and len(word) - 2 >= p2):
                    word = word[:-2]
            elif sfx in ("ig", "isch", "ik"):
                if not word[: -len(sfx)].endswith("e"):
                    word = word[: -len(sfx)]
            elif sfx in ("lich", "heit"):
                word = word[: -len(sfx)]
                for s2 in ("er", "en"):
                    if word.endswith(s2) and len(word) - 2 >= p1:
                        word = word[:-2]
                        break
            else:  # keit
                word = word[:-4]
                for s2 in ("lich", "ig"):
                    if word.endswith(s2) and len(word) - len(s2) >= p2:
                        word = word[: -len(s2)]
                        break
            break

    return word.translate(_DE_POST)


def german_snowball_stem(word: str) -> str:
    """Snowball German (GermanStemmer.java; vocab-exact, 35,033 entries)."""
    return _de_body(_de_prelude(word))


def _de2_prelude(word: str) -> str:
    # pass 1: intervocalic u/y → U/Y (before the digraph folding)
    chars = list(word)
    n = len(chars)
    for k in range(1, n - 1):
        if chars[k] in "uy" and chars[k - 1] in _DE_V and chars[k + 1] in _DE_V:
            chars[k] = chars[k].upper()
    word = "".join(chars)
    # pass 2: fold ae/oe/ue → umlauts, ß → ss; 'qu' protects the next two
    out = []
    i = 0
    n = len(word)
    while i < n:
        c = word[i]
        if c == "q" and i + 1 < n and word[i + 1] == "u":
            out.append(word[i:i + 4])
            i += 4
        elif c == "a" and i + 1 < n and word[i + 1] == "e":
            out.append("ä")
            i += 2
        elif c == "o" and i + 1 < n and word[i + 1] == "e":
            out.append("ö")
            i += 2
        elif c == "u" and i + 1 < n and word[i + 1] == "e":
            out.append("ü")
            i += 2
        elif c == "ß":
            out.append("ss")
            i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def german2_stem(word: str) -> str:
    """Snowball German2 variant (German2Stemmer.java: folds ae/oe/ue
    digraphs in the prelude; vocab-exact, 35,033 entries)."""
    return _de_body(_de2_prelude(word))


# ---------------------------------------------------------------------------
# Spanish (org/tartarus/snowball/ext/SpanishStemmer.java;
# https://snowballstem.org/algorithms/spanish/)
# ---------------------------------------------------------------------------

_ES_V = frozenset("aeiouáéíóúü")
_ES_POST = str.maketrans("áéíóú", "aeiou")
_ES_PRONOUNS = sorted(
    ["la", "sela", "le", "me", "se", "lo", "selo", "las", "selas", "les",
     "los", "selos", "nos"], key=len, reverse=True)
#: gerund/infinitive heads before a pronoun: replacement or plain delete
_ES_PRE_PRON = sorted(
    [("iéndo", "iendo"), ("ándo", "ando"), ("ár", "ar"), ("ér", "er"),
     ("ír", "ir"), ("ando", None), ("iendo", None), ("ar", None),
     ("er", None), ("ir", None), ("yendo", "Y")], key=lambda kv: -len(kv[0]))
_ES_STD = sorted(
    [("ica", 1), ("ancia", 2), ("encia", 5), ("adora", 2), ("osa", 1),
     ("ista", 1), ("iva", 9), ("anza", 1), ("logía", 3), ("idad", 8),
     ("able", 1), ("ible", 1), ("ante", 2), ("mente", 7), ("amente", 6),
     ("ación", 2), ("ución", 4), ("ico", 1), ("ismo", 1), ("oso", 1),
     ("amiento", 1), ("imiento", 1), ("ivo", 9), ("ador", 2), ("icas", 1),
     ("ancias", 2), ("encias", 5), ("adoras", 2), ("osas", 1), ("istas", 1),
     ("ivas", 9), ("anzas", 1), ("logías", 3), ("idades", 8), ("ables", 1),
     ("ibles", 1), ("aciones", 2), ("uciones", 4), ("adores", 2),
     ("antes", 2), ("icos", 1), ("ismos", 1), ("osos", 1), ("amientos", 1),
     ("imientos", 1), ("ivos", 9)],
    key=lambda kv: -len(kv[0]))
_ES_Y_VERB = sorted(
    ["ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yas", "yes",
     "yais", "yamos", "yó"], key=len, reverse=True)
_ES_VERB = sorted(
    [("aba", 2), ("ada", 2), ("ida", 2), ("ara", 2), ("iera", 2), ("ía", 2),
     ("aría", 2), ("ería", 2), ("iría", 2), ("ad", 2), ("ed", 2), ("id", 2),
     ("ase", 2), ("iese", 2), ("aste", 2), ("iste", 2), ("an", 2),
     ("aban", 2), ("aran", 2), ("ieran", 2), ("ían", 2), ("arían", 2),
     ("erían", 2), ("irían", 2), ("en", 1), ("asen", 2), ("iesen", 2),
     ("aron", 2), ("ieron", 2), ("arán", 2), ("erán", 2), ("irán", 2),
     ("ado", 2), ("ido", 2), ("ando", 2), ("iendo", 2), ("ar", 2),
     ("er", 2), ("ir", 2), ("as", 2), ("abas", 2), ("adas", 2), ("idas", 2),
     ("aras", 2), ("ieras", 2), ("ías", 2), ("arías", 2), ("erías", 2),
     ("irías", 2), ("es", 1), ("ases", 2), ("ieses", 2), ("abais", 2),
     ("arais", 2), ("ierais", 2), ("íais", 2), ("aríais", 2),
     ("eríais", 2), ("iríais", 2), ("aseis", 2), ("ieseis", 2),
     ("asteis", 2), ("isteis", 2), ("áis", 2), ("éis", 1), ("aréis", 2),
     ("eréis", 2), ("iréis", 2), ("ados", 2), ("idos", 2), ("amos", 2),
     ("ábamos", 2), ("áramos", 2), ("iéramos", 2), ("íamos", 2),
     ("aríamos", 2), ("eríamos", 2), ("iríamos", 2), ("emos", 1),
     ("aremos", 2), ("eremos", 2), ("iremos", 2), ("ásemos", 2),
     ("iésemos", 2), ("imos", 2), ("arás", 2), ("erás", 2), ("irás", 2),
     ("ís", 2), ("ará", 2), ("erá", 2), ("irá", 2), ("aré", 2), ("eré", 2),
     ("iré", 2), ("ió", 2)],
    key=lambda kv: -len(kv[0]))
_ES_RESIDUAL = sorted(
    [("a", 1), ("e", 2), ("o", 1), ("os", 1), ("á", 1), ("é", 2),
     ("í", 1), ("ó", 1)],
    key=lambda kv: -len(kv[0]))


def _rv_std(word: str, V: frozenset) -> int:
    """Published Spanish-family RV definition (shared by es/pt/it)."""
    n = len(word)
    if n == 0:
        return n
    if word[0] in V:
        if n >= 2 and word[1] not in V:
            for i in range(2, n):
                if word[i] in V:
                    return i + 1
            return n
        for i in range(2, n):
            if word[i] not in V:
                return i + 1
        return n
    if n >= 2 and word[1] not in V:
        for i in range(2, n):
            if word[i] in V:
                return i + 1
        return n
    return 3 if n >= 3 else n


def _r12_std(word: str, V: frozenset) -> tuple[int, int]:
    n = len(word)
    i = 0
    while i < n and word[i] not in V:
        i += 1
    while i < n and word[i] in V:
        i += 1
    p1 = i + 1 if i < n else n
    i = p1
    while i < n and word[i] not in V:
        i += 1
    while i < n and word[i] in V:
        i += 1
    p2 = i + 1 if i < n else n
    return p1, p2


def spanish_snowball_stem(word: str) -> str:
    """Snowball Spanish (SpanishStemmer.java; vocab-exact, 28,377)."""
    pV = _rv_std(word, _ES_V)
    p1, p2 = _r12_std(word, _ES_V)

    # step 0: attached pronoun
    for pron in _ES_PRONOUNS:
        if word.endswith(pron):
            base = word[: -len(pron)]
            for head, repl in _ES_PRE_PRON:
                if base.endswith(head):
                    if len(base) - len(head) >= pV:
                        if repl == "Y":  # yendo: needs preceding 'u'
                            if base[: -len(head)].endswith("u"):
                                word = base
                        elif repl is None:
                            word = base
                        else:
                            word = base[: -len(head)] + repl
                    break
            break

    changed = False
    # step 1: standard suffix
    for sfx, action in _ES_STD:
        if word.endswith(sfx):
            cut = len(word) - len(sfx)
            if action == 6:  # amente: R1
                if cut < p1:
                    break
                word = word[:cut]
                changed = True
                for s2 in ("ic", "ad", "os", "iv"):
                    if word.endswith(s2) and len(word) - 2 >= p2:
                        word = word[:-2]
                        if (s2 == "iv" and word.endswith("at")
                                and len(word) - 2 >= p2):
                            word = word[:-2]
                        break
                break
            if cut < p2:
                break
            changed = True
            if action == 1:
                word = word[:cut]
            elif action == 2:
                word = word[:cut]
                if word.endswith("ic") and len(word) - 2 >= p2:
                    word = word[:-2]
            elif action == 3:
                word = word[:cut] + "log"
            elif action == 4:
                word = word[:cut] + "u"
            elif action == 5:
                word = word[:cut] + "ente"
            elif action == 7:  # mente
                word = word[:cut]
                for s2 in ("able", "ible", "ante"):
                    if word.endswith(s2) and len(word) - len(s2) >= p2:
                        word = word[: -len(s2)]
                        break
            elif action == 8:  # idad(es)
                word = word[:cut]
                for s2 in ("abil", "ic", "iv"):
                    if word.endswith(s2) and len(word) - len(s2) >= p2:
                        word = word[: -len(s2)]
                        break
            else:  # 9: iva(s)/ivo(s)
                word = word[:cut]
                if word.endswith("at") and len(word) - 2 >= p2:
                    word = word[:-2]
            break

    # step 2: verb suffixes (only when step 1 did nothing)
    if not changed:
        done = False
        for sfx in _ES_Y_VERB:
            if word.endswith(sfx):
                cut = len(word) - len(sfx)
                if cut < pV:
                    continue
                if cut >= 1 and word[cut - 1] == "u":
                    word = word[:cut]
                    done = True
                break
        if not done:
            for sfx, action in _ES_VERB:
                if word.endswith(sfx):
                    cut = len(word) - len(sfx)
                    if cut < pV:
                        continue
                    if action == 1 and word[:cut].endswith("gu"):
                        word = word[:cut - 1]
                    else:
                        word = word[:cut]
                    break

    # step 3: residual suffix (RV)
    for sfx, action in _ES_RESIDUAL:
        if word.endswith(sfx):
            cut = len(word) - len(sfx)
            if cut < pV:
                break
            word = word[:cut]
            if (action == 2 and word.endswith("u") and len(word) >= 2
                    and word[-2] == "g" and len(word) - 1 >= pV):
                word = word[:-1]
            break

    return word.translate(_ES_POST)


# ---------------------------------------------------------------------------
# Portuguese (org/tartarus/snowball/ext/PortugueseStemmer.java;
# https://snowballstem.org/algorithms/portuguese/)
# ---------------------------------------------------------------------------

_PT_V = frozenset("aeiouáâéêíóôú")

_PT_STD = sorted(
    [("ica", 1), ("ância", 1), ("ência", 4), ("ira", 9), ("adora", 1),
     ("osa", 1), ("ista", 1), ("iva", 8), ("eza", 1), ("logía", 2),
     ("idade", 7), ("ante", 1), ("mente", 6), ("amente", 5), ("ável", 1),
     ("ível", 1), ("ución", 3), ("ico", 1), ("ismo", 1), ("oso", 1),
     ("amento", 1), ("imento", 1), ("ivo", 8), ("aça~o", 1), ("ador", 1),
     ("icas", 1), ("ências", 4), ("iras", 9), ("adoras", 1), ("osas", 1),
     ("istas", 1), ("ivas", 8), ("ezas", 1), ("logías", 2), ("idades", 7),
     ("uciones", 3), ("adores", 1), ("antes", 1), ("aço~es", 1),
     ("icos", 1), ("ismos", 1), ("osos", 1), ("amentos", 1),
     ("imentos", 1), ("ivos", 8)],
    key=lambda kv: -len(kv[0]))
_PT_VERB = sorted(
    ["aríamos", "eríamos", "iríamos", "ássemos", "êssemos", "íssemos",
     "ásseis", "ésseis", "ísseis", "aríeis", "eríeis", "iríeis", "áramos",
     "éramos", "íramos", "ávamos", "aremos", "eremos", "iremos", "ariam",
     "eriam", "iriam", "assem", "essem", "issem", "ara~o", "era~o",
     "ira~o", "arias", "erias", "irias", "ardes", "erdes", "irdes",
     "asses", "esses", "isses", "astes", "estes", "istes", "areis",
     "ereis", "ireis", "áreis", "éreis", "íreis", "áveis", "íamos",
     "armos", "ermos", "irmos", "aria", "eria", "iria", "asse", "esse",
     "isse", "aste", "este", "iste", "arei", "erei", "irei", "aram",
     "eram", "iram", "avam", "arem", "erem", "irem", "ando", "endo",
     "indo", "adas", "idas", "aras", "eras", "iras", "avas", "ares",
     "eres", "ires", "íeis", "ados", "idos", "amos", "emos", "imos",
     "ámos", "arás", "erás", "irás", "ada", "ida", "ara", "era", "ira",
     "ava", "iam", "ado", "ido", "ias", "ais", "eis", "ará", "erá",
     "irá", "ia", "ei", "am", "em", "ar", "er", "ir", "as", "es", "is",
     "eu", "iu", "ou"],
    key=len, reverse=True)
_PT_RESIDUAL = sorted(["a", "i", "o", "os", "á", "í", "ó"],
                      key=len, reverse=True)


def _pt_prelude(word: str) -> str:
    return word.replace("ã", "a~").replace("õ", "o~")


def _pt_postlude(word: str) -> str:
    return word.replace("a~", "ã").replace("o~", "õ")


def portuguese_snowball_stem(word: str) -> str:
    """Snowball Portuguese (PortugueseStemmer.java; vocab-exact, 32,016).
    Distinct from the RSLP / light / minimal Portuguese stemmers."""
    word = _pt_prelude(word)
    pV = _rv_std(word, _PT_V)
    p1, p2 = _r12_std(word, _PT_V)

    changed = False
    # step 1: standard suffix
    for sfx, action in _PT_STD:
        if word.endswith(sfx):
            cut = len(word) - len(sfx)
            if action == 5:  # amente: R1
                if cut < p1:
                    break
                word = word[:cut]
                changed = True
                for s2 in ("ic", "ad", "os", "iv"):
                    if word.endswith(s2) and len(word) - 2 >= p2:
                        word = word[:-2]
                        if (s2 == "iv" and word.endswith("at")
                                and len(word) - 2 >= p2):
                            word = word[:-2]
                        break
                break
            if action == 9:  # (e)ira(s) → ir: RV and preceded by 'e'
                if cut >= pV and cut >= 1 and word[cut - 1] == "e":
                    word = word[:cut] + "ir"
                    changed = True
                break
            if cut < p2:
                break
            changed = True
            if action == 1:
                word = word[:cut]
            elif action == 2:
                word = word[:cut] + "log"
            elif action == 3:
                word = word[:cut] + "u"
            elif action == 4:
                word = word[:cut] + "ente"
            elif action == 6:  # mente
                word = word[:cut]
                for s2 in ("ante", "avel", "ível"):
                    if word.endswith(s2) and len(word) - len(s2) >= p2:
                        word = word[: -len(s2)]
                        break
            elif action == 7:  # idade(s)
                word = word[:cut]
                for s2 in ("abil", "ic", "iv"):
                    if word.endswith(s2) and len(word) - len(s2) >= p2:
                        word = word[: -len(s2)]
                        break
            else:  # 8: iva(s)/ivo(s)
                word = word[:cut]
                if word.endswith("at") and len(word) - 2 >= p2:
                    word = word[:-2]
            break

    # step 2: verb suffix (only when step 1 did not change the word)
    if not changed:
        for sfx in _PT_VERB:
            if word.endswith(sfx):
                cut = len(word) - len(sfx)
                if cut < pV:
                    continue
                word = word[:cut]
                changed = True
                break

    if changed:
        # step 3: final i preceded by c (RV)
        if (word.endswith("i") and len(word) >= 2 and word[-2] == "c"
                and len(word) - 1 >= pV):
            word = word[:-1]
    else:
        # step 4: residual suffix (RV)
        for sfx in _PT_RESIDUAL:
            if word.endswith(sfx) and len(word) - len(sfx) >= pV:
                word = word[: -len(sfx)]
                break

    # step 5: residual form
    if word and word[-1] in "eéê":
        if len(word) - 1 >= pV:
            word = word[:-1]
            if ((word.endswith("gu") or word.endswith("ci"))
                    and len(word) - 1 >= pV):
                word = word[:-1]
    elif word.endswith("ç"):
        word = word[:-1] + "c"

    return _pt_postlude(word)


# ---------------------------------------------------------------------------
# Italian (org/tartarus/snowball/ext/ItalianStemmer.java;
# https://snowballstem.org/algorithms/italian/)
# ---------------------------------------------------------------------------

_IT_V = frozenset("aeiouàèìòù")
_IT_AEIO = frozenset("aeioàèìò")
_IT_ACCENT = str.maketrans("áéíóú", "àèìòù")
_IT_PRONOUNS = sorted(
    ["la", "cela", "gliela", "mela", "tela", "vela", "le", "cele",
     "gliele", "mele", "tele", "vele", "ne", "cene", "gliene", "mene",
     "sene", "tene", "vene", "ci", "li", "celi", "glieli", "meli",
     "teli", "veli", "gli", "mi", "si", "ti", "vi", "lo", "celo",
     "glielo", "melo", "telo", "velo"],
    key=len, reverse=True)
_IT_STD = sorted(
    [("ica", 1), ("logia", 3), ("osa", 1), ("ista", 1), ("iva", 9),
     ("anza", 1), ("enza", 5), ("ice", 1), ("atrice", 1), ("iche", 1),
     ("logie", 3), ("abile", 1), ("ibile", 1), ("usione", 4),
     ("azione", 2), ("uzione", 4), ("atore", 2), ("ose", 1), ("ante", 1),
     ("mente", 1), ("amente", 7), ("iste", 1), ("ive", 9), ("anze", 1),
     ("enze", 5), ("ici", 1), ("atrici", 1), ("ichi", 1), ("abili", 1),
     ("ibili", 1), ("ismi", 1), ("usioni", 4), ("azioni", 2),
     ("uzioni", 4), ("atori", 2), ("osi", 1), ("anti", 1), ("amenti", 6),
     ("imenti", 6), ("isti", 1), ("ivi", 9), ("ico", 1), ("ismo", 1),
     ("oso", 1), ("amento", 6), ("imento", 6), ("ivo", 9), ("ità", 8),
     ("istà", 1), ("istè", 1), ("istì", 1)],
    key=lambda kv: -len(kv[0]))
_IT_VERB = sorted(
    ["isca", "enda", "ata", "ita", "uta", "ava", "eva", "iva", "erebbe",
     "irebbe", "isce", "ende", "are", "ere", "ire", "asse", "ate",
     "avate", "evate", "ivate", "ete", "erete", "irete", "ite",
     "ereste", "ireste", "ute", "erai", "irai", "isci", "endi", "erei",
     "irei", "assi", "ati", "iti", "eresti", "iresti", "uti", "avi",
     "evi", "ivi", "isco", "ando", "endo", "Yamo", "iamo", "avamo",
     "evamo", "ivamo", "eremo", "iremo", "assimo", "ammo", "emmo",
     "eremmo", "iremmo", "immo", "ano", "iscano", "avano", "evano",
     "ivano", "eranno", "iranno", "ono", "iscono", "arono", "erono",
     "irono", "erebbero", "irebbero", "assero", "essero", "issero",
     "ato", "ito", "uto", "avo", "evo", "ivo", "ar", "ir", "erà",
     "irà", "erò", "irò"],
    key=len, reverse=True)


def _it_prelude(word: str) -> str:
    word = word.translate(_IT_ACCENT)
    out = []
    i, n = 0, len(word)
    while i < n:
        if word[i] == "q" and i + 1 < n and word[i + 1] == "u":
            out.append("qU")
            i += 2
        else:
            out.append(word[i])
            i += 1
    word = "".join(out)
    chars = list(word)
    n = len(chars)
    for k in range(1, n - 1):
        if chars[k] in "ui" and chars[k - 1] in _IT_V and chars[k + 1] in _IT_V:
            chars[k] = chars[k].upper()
    return "".join(chars)


def italian_snowball_stem(word: str) -> str:
    """Snowball Italian (ItalianStemmer.java; vocab-exact, 35,494)."""
    word = _it_prelude(word)
    pV = _rv_std(word, _IT_V)
    p1, p2 = _r12_std(word, _IT_V)

    # step 0: attached pronoun
    for pron in _IT_PRONOUNS:
        if word.endswith(pron):
            base = word[: -len(pron)]
            for head in ("ando", "endo", "ar", "er", "ir"):
                if base.endswith(head):
                    if len(base) - len(head) >= pV:
                        if head in ("ando", "endo"):
                            word = base
                        else:
                            word = base + "e"
                    break
            break

    changed = False
    # step 1: standard suffix
    for sfx, action in _IT_STD:
        if word.endswith(sfx):
            cut = len(word) - len(sfx)
            if action == 6:  # amento/amenti/imento/imenti: RV
                if cut >= pV:
                    word = word[:cut]
                    changed = True
                break
            if action == 7:  # amente: R1
                if cut < p1:
                    break
                word = word[:cut]
                changed = True
                for s2 in ("abil", "ic", "os", "iv"):
                    if word.endswith(s2) and len(word) - len(s2) >= p2:
                        word = word[: -len(s2)]
                        if (s2 == "iv" and word.endswith("at")
                                and len(word) - 2 >= p2):
                            word = word[:-2]
                        break
                break
            if cut < p2:
                break
            changed = True
            if action == 1:
                word = word[:cut]
            elif action == 2:
                word = word[:cut]
                if word.endswith("ic") and len(word) - 2 >= p2:
                    word = word[:-2]
            elif action == 3:
                word = word[:cut] + "log"
            elif action == 4:
                word = word[:cut] + "u"
            elif action == 5:
                word = word[:cut] + "ente"
            elif action == 8:  # ità
                word = word[:cut]
                for s2 in ("abil", "ic", "iv"):
                    if word.endswith(s2) and len(word) - len(s2) >= p2:
                        word = word[: -len(s2)]
                        break
            else:  # 9: iva/ive/ivi/ivo
                word = word[:cut]
                if word.endswith("at") and len(word) - 2 >= p2:
                    word = word[:-2]
                    if word.endswith("ic") and len(word) - 2 >= p2:
                        word = word[:-2]
            break

    # step 2: verb suffix (RV) when step 1 did nothing
    if not changed:
        for sfx in _IT_VERB:
            if word.endswith(sfx):
                cut = len(word) - len(sfx)
                if cut < pV:
                    continue
                word = word[:cut]
                break

    # step 3a: vowel suffix (RV), then a following i (RV)
    if word and word[-1] in _IT_AEIO and len(word) - 1 >= pV:
        word = word[:-1]
        if word.endswith("i") and len(word) - 1 >= pV:
            word = word[:-1]
    # step 3b: final h after c/g (RV measured before the c/g)
    if word.endswith(("ch", "gh")) and len(word) - 2 >= pV:
        word = word[:-1]

    return word.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# French (org/tartarus/snowball/ext/FrenchStemmer.java;
# https://snowballstem.org/algorithms/french/)
# ---------------------------------------------------------------------------

_FR_V = frozenset("aeiouyâàëéêèïîôûù")
# g_keep_with_s (FrenchStemmer.java:196): trailing s survives after these
_FR_KEEP_S = frozenset("aiouès")
_FR_POST = str.maketrans({"I": "i", "U": "u", "Y": "y"})

_FR_STD = sorted(
    [("iqUe", 1), ("atrice", 2), ("ance", 1), ("ence", 5), ("logie", 3),
     ("able", 1), ("isme", 1), ("euse", 11), ("iste", 1), ("ive", 8),
     ("if", 8), ("usion", 4), ("ation", 2), ("ution", 4), ("ateur", 2),
     ("iqUes", 1), ("atrices", 2), ("ances", 1), ("ences", 5),
     ("logies", 3), ("ables", 1), ("ismes", 1), ("euses", 11),
     ("istes", 1), ("ives", 8), ("ifs", 8), ("usions", 4), ("ations", 2),
     ("utions", 4), ("ateurs", 2), ("ments", 15), ("ements", 6),
     ("issements", 12), ("ités", 7), ("ment", 15), ("ement", 6),
     ("issement", 12), ("amment", 13), ("emment", 14), ("aux", 10),
     ("eaux", 9), ("eux", 1), ("ité", 7)],
    key=lambda kv: -len(kv[0]))

_FR_IVERB = sorted(
    ["îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai",
     "iraIent", "irais", "irait", "iras", "irent", "irez", "iriez",
     "irions", "irons", "iront", "is", "issaIent", "issais", "issait",
     "issant", "issante", "issantes", "issants", "isse", "issent",
     "isses", "issez", "issiez", "issions", "issons", "it"],
    key=len, reverse=True)

_FR_VERB = sorted(
    [("a", 3), ("era", 2), ("asse", 3), ("ante", 3), ("ée", 2), ("ai", 3),
     ("erai", 2), ("er", 2), ("as", 3), ("eras", 2), ("âmes", 3),
     ("asses", 3), ("antes", 3), ("âtes", 3), ("ées", 2), ("ais", 3),
     ("erais", 2), ("ions", 1), ("erions", 2), ("assions", 3),
     ("erons", 2), ("ants", 3), ("és", 2), ("ait", 3), ("erait", 2),
     ("ant", 3), ("aIent", 3), ("eraIent", 2), ("èrent", 2),
     ("assent", 3), ("eront", 2), ("ât", 3), ("ez", 2), ("iez", 2),
     ("eriez", 2), ("assiez", 3), ("erez", 2), ("é", 2)],
    key=lambda kv: -len(kv[0]))

_FR_RESIDUAL = (("Ière", 2), ("ière", 2), ("Ier", 2), ("ier", 2),
                ("ion", 1), ("e", 3), ("ë", 4))


def _fr_prelude(word: str) -> str:
    """Mark non-vowel u/i/y (and u-after-q) uppercase so the region and
    suffix logic treats them as consonants (FrenchStemmer.java r_prelude)."""
    w = list(word)
    n = len(w)
    i = 0
    while i < n:
        c = w[i]
        matched = False
        if c in _FR_V and i + 1 < n:
            nx = w[i + 1]
            if nx == "u" and i + 2 < n and w[i + 2] in _FR_V:
                w[i + 1] = "U"
                matched = True
            elif nx == "i" and i + 2 < n and w[i + 2] in _FR_V:
                w[i + 1] = "I"
                matched = True
            elif nx == "y":
                w[i + 1] = "Y"
                matched = True
        if not matched and c == "y" and i + 1 < n and w[i + 1] in _FR_V:
            w[i] = "Y"
        elif not matched and c == "q" and i + 1 < n and w[i + 1] == "u":
            w[i + 1] = "U"
        i += 1
    return "".join(w)


def _fr_rv(word: str) -> int:
    """RV: after an initial two-vowel cluster or the prefixes col/par/tap,
    position 3; else after the first vowel past position 0; else end."""
    n = len(word)
    if n >= 3 and word[0] in _FR_V and word[1] in _FR_V:
        return 3
    if word[:3] in ("col", "par", "tap"):
        return 3
    for i in range(1, n):
        if word[i] in _FR_V:
            return i + 1
    return n


def _fr_standard(word: str, pV: int, p1: int, p2: int) -> tuple[str, bool]:
    """Step 1. The bool is the Snowball routine's success flag; the amment/
    emment/ment cases (13-15) modify the word but *fail* so stem() chains
    into the verb steps (the generated code's `fail` command)."""
    for sfx, action in _FR_STD:
        if not word.endswith(sfx):
            continue
        cut = len(word) - len(sfx)
        if action in (1, 3, 4, 5):
            if cut < p2:
                return word, False
            repl = {1: "", 3: "log", 4: "u", 5: "ent"}[action]
            return word[:cut] + repl, True
        if action == 2:  # ation/ateur/atrice(+s): R2, then ic → del | iqU
            if cut < p2:
                return word, False
            word = word[:cut]
            if word.endswith("ic"):
                if len(word) - 2 >= p2:
                    word = word[:-2]
                else:
                    word = word[:-2] + "iqU"
            return word, True
        if action == 6:  # ement(s): RV, then the a_2 secondary suffixes
            if cut < pV:
                return word, False
            word = word[:cut]
            for s2, a2 in (("iqU", 3), ("abl", 3), ("Ièr", 4), ("ièr", 4),
                           ("eus", 2), ("iv", 1)):
                if not word.endswith(s2):
                    continue
                c2 = len(word) - len(s2)
                if a2 == 1:  # iv: R2, then at in R2
                    if c2 >= p2:
                        word = word[:c2]
                        if word.endswith("at") and len(word) - 2 >= p2:
                            word = word[:-2]
                elif a2 == 2:  # eus: R2 del | R1 → eux
                    if c2 >= p2:
                        word = word[:c2]
                    elif c2 >= p1:
                        word = word[:c2] + "eux"
                elif a2 == 3:  # abl / iqU: R2 del
                    if c2 >= p2:
                        word = word[:c2]
                else:  # Ièr / ièr: RV → i
                    if c2 >= pV:
                        word = word[:c2] + "i"
                break
            return word, True
        if action == 7:  # ité(s): R2, then abil/ic/iv
            if cut < p2:
                return word, False
            word = word[:cut]
            for s2, a2 in (("abil", 1), ("ic", 2), ("iv", 3)):
                if not word.endswith(s2):
                    continue
                c2 = len(word) - len(s2)
                if a2 == 1:
                    word = word[:c2] if c2 >= p2 else word[:c2] + "abl"
                elif a2 == 2:
                    word = word[:c2] if c2 >= p2 else word[:c2] + "iqU"
                elif c2 >= p2:
                    word = word[:c2]
                break
            return word, True
        if action == 8:  # if/ive(s): R2, then at (R2), then ic → del | iqU
            if cut < p2:
                return word, False
            word = word[:cut]
            if word.endswith("at") and len(word) - 2 >= p2:
                word = word[:-2]
                if word.endswith("ic"):
                    if len(word) - 2 >= p2:
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
            return word, True
        if action == 9:  # eaux → eau, unconditional
            return word[:cut] + "eau", True
        if action == 10:  # aux: R1 → al
            if cut < p1:
                return word, False
            return word[:cut] + "al", True
        if action == 11:  # euse(s): R2 del | R1 → eux
            if cut >= p2:
                return word[:cut], True
            if cut >= p1:
                return word[:cut] + "eux", True
            return word, False
        if action == 12:  # issement(s): R1 and non-vowel before
            if cut < p1 or cut < 1 or word[cut - 1] in _FR_V:
                return word, False
            return word[:cut], True
        if action in (13, 14):  # amment/emment: RV → ant/ent, then fail
            if cut < pV:
                return word, False
            return word[:cut] + ("ant" if action == 13 else "ent"), False
        # action 15: ment(s): preceding vowel in RV, delete, then fail
        if cut < 1 or word[cut - 1] not in _FR_V or cut - 1 < pV:
            return word, False
        return word[:cut], False
    return word, False


def _fr_i_verb(word: str, pV: int) -> tuple[str, bool]:
    """Step 2a: i-verb suffixes, whole suffix plus the preceding non-vowel
    confined to RV (the generated code's setlimit)."""
    for sfx in _FR_IVERB:
        if word.endswith(sfx):
            cut = len(word) - len(sfx)
            if cut < pV:
                continue  # setlimit: try the longest suffix inside RV
            if cut - 1 < pV or word[cut - 1] in _FR_V:
                return word, False
            return word[:cut], True
    return word, False


def _fr_verb(word: str, pV: int, p2: int) -> tuple[str, bool]:
    """Step 2b: other verb suffixes within RV."""
    for sfx, action in _FR_VERB:
        if word.endswith(sfx):
            cut = len(word) - len(sfx)
            if cut < pV:
                continue
            if action == 1:  # ions: R2
                if cut < p2:
                    return word, False
                return word[:cut], True
            if action == 2:
                return word[:cut], True
            word = word[:cut]  # action 3, then optional preceding e in RV
            if word.endswith("e") and len(word) - 1 >= pV:
                word = word[:-1]
            return word, True
    return word, False


def _fr_residual(word: str, pV: int, p2: int) -> str:
    """Step 4: residual s (whole word), then ion/ier/ière/e/ë within RV."""
    if (word.endswith("s") and len(word) >= 2
            and word[-2] not in _FR_KEEP_S):
        word = word[:-1]
    for sfx, action in _FR_RESIDUAL:
        if word.endswith(sfx):
            cut = len(word) - len(sfx)
            if cut < pV:
                continue
            if action == 1:  # ion: R2 and preceded by s/t (in RV)
                if (cut < p2 or cut - 1 < pV
                        or word[cut - 1] not in ("s", "t")):
                    return word
                return word[:cut]
            if action == 2:  # ier/ière (and marked I variants) → i
                return word[:cut] + "i"
            if action == 3:  # e
                return word[:cut]
            # action 4: ë when preceded by gu
            if cut - 2 >= pV and word[cut - 2:cut] == "gu":
                return word[:cut]
            return word
    return word


def french_snowball_stem(word: str) -> str:
    """Snowball French (FrenchStemmer.java; vocab-exact, 20,403)."""
    word = _fr_prelude(word)
    pV = _fr_rv(word)
    p1, p2 = _r12_std(word, _FR_V)

    word, did = _fr_standard(word, pV, p1, p2)
    if not did:
        word, did = _fr_i_verb(word, pV)
        if not did:
            word, did = _fr_verb(word, pV, p2)
    if did:
        if word.endswith("Y"):
            word = word[:-1] + "i"
        elif word.endswith("ç"):
            word = word[:-1] + "c"
    else:
        word = _fr_residual(word, pV, p2)

    # un_double: enn/onn/ett/ell/eill lose the last letter
    if word.endswith(("ell", "eill", "enn", "onn", "ett")):
        word = word[:-1]
    # un_accent: é/è before a trailing run of non-vowels → e
    n = len(word)
    j = n
    while j > 0 and word[j - 1] not in _FR_V:
        j -= 1
    if j < n and j > 0 and word[j - 1] in "éè":
        word = word[:j - 1] + "e" + word[j:]
    return word.translate(_FR_POST)


# -------------------------------------------------------------- Porter (classic)

_P_V = frozenset("aeiouy")
_P_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_P_STEP2 = sorted(
    [("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
     ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
     ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
     ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
     ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
     ("iviti", "ive"), ("biliti", "ble")], key=lambda kv: -len(kv[0]))
_P_STEP3 = sorted(
    [("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
     ("ical", "ic"), ("ful", ""), ("ness", "")], key=lambda kv: -len(kv[0]))
_P_STEP4 = sorted(
    ["al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
     "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize"],
    key=len, reverse=True)


def _p_regions(word):
    n = len(word)
    i = 0
    while i < n and word[i] not in _P_V: i += 1
    while i < n and word[i] in _P_V: i += 1
    p1 = i + 1 if i < n else n
    i = p1
    while i < n and word[i] not in _P_V: i += 1
    while i < n and word[i] in _P_V: i += 1
    p2 = i + 1 if i < n else n
    return p1, p2


def _p_shortv(w, i):
    # backward ( non-v_WXY v non-v ) ending at index i
    return (i >= 2 and w[i] not in _P_V and w[i] not in "wxY"
            and w[i - 1] in _P_V and w[i - 2] not in _P_V)


def snowball_porter_stem(word):
    """Snowball *classic* Porter (``tartarus/snowball/ext/PorterStemmer.
    java``; SnowballPorterFilterFactory language=Porter) — the 1980
    algorithm with the Snowball y/Y consonant marking, vocab-exact on all
    30,428 TestSnowballVocabData porter entries.  Distinct from both
    Porter2 (:func:`porter2_stem`) and Lucene's departures variant
    (``analysis/porter.py``)."""
    # prelude: mark consonant-y as Y (initial y, or y after a vowel)
    y_found = False
    chars = list(word)
    if chars and chars[0] == "y":
        chars[0] = "Y"
        y_found = True
    for k in range(1, len(chars)):
        if chars[k] == "y" and chars[k - 1] in _P_V:
            chars[k] = "Y"
            y_found = True
    word = "".join(chars)
    p1, p2 = _p_regions(word)
    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ies"):
        word = word[:-2]
    elif word.endswith("ss"):
        pass
    elif word.endswith("s"):
        word = word[:-1]
    # step 1b
    if word.endswith("eed"):
        if len(word) - 3 >= p1:
            word = word[:-1]
    else:
        for sfx in ("ing", "ed"):
            if word.endswith(sfx):
                stem = word[:-len(sfx)]
                if any(c in _P_V for c in stem):
                    word = stem
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_P_DOUBLES):
                        word = word[:-1]
                    elif len(word) == p1 and _p_shortv(word, len(word) - 1):
                        word += "e"
                break
    # step 1c
    if word and word[-1] in "yY" and any(c in _P_V for c in word[:-1]):
        word = word[:-1] + "i"
    # step 2 (R1)
    for sfx, repl in _P_STEP2:
        if word.endswith(sfx):
            if len(word) - len(sfx) >= p1:
                word = word[:-len(sfx)] + repl
            break
    # step 3 (R1)
    for sfx, repl in _P_STEP3:
        if word.endswith(sfx):
            if len(word) - len(sfx) >= p1:
                word = word[:-len(sfx)] + repl
            break
    # step 4 (R2)
    for sfx in _P_STEP4:
        if word.endswith(sfx):
            if len(word) - len(sfx) >= p2:
                if sfx == "ion":
                    if len(word) >= 4 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[:-len(sfx)]
            break
    # step 5a
    if word.endswith("e"):
        j = len(word) - 1
        if j >= p2 or (j >= p1 and not _p_shortv(word, j - 1)):
            word = word[:-1]
    # step 5b
    if (word.endswith("ll") and len(word) - 1 >= p2):
        word = word[:-1]
    if y_found:
        word = word.replace("Y", "y")
    return word


# -------------------------------------------------------------- Turkish

_TR_VOWEL = frozenset("aeıioöuü")
_TR_U = frozenset("ıiuü")
#: vowel-harmony groups (turkish.sbl vowel1..vowel6): last vowel → the set a
#: preceding vowel must belong to
_TR_HARM = {"a": frozenset("aıou"), "e": frozenset("eiöü"),
            "ı": frozenset("aı"), "i": frozenset("ei"),
            "o": frozenset("ou"), "ö": frozenset("öü"),
            "u": frozenset("ou"), "ü": frozenset("öü")}

_TR_A0 = ("miz", "niz", "muz", "nuz", "müz", "nüz", "mız", "nız", "m", "n")
_TR_YDU = ("dik", "tik", "duk", "tuk", "dük", "tük", "dık", "tık",
           "dim", "tim", "dum", "tum", "düm", "tüm", "dım", "tım",
           "din", "tin", "dun", "tun", "dün", "tün", "dın", "tın",
           "di", "ti", "du", "tu", "dü", "tü", "dı", "tı")
_TR_YSA = ("sak", "sek", "sam", "sem", "san", "sen", "sa", "se")


class _TrCtx:
    """Backward-mode Snowball cursor over a mutable word (cursor counts
    chars from the left; matching consumes rightward-to-leftward).
    Cursor save/restore is distance-from-end, exactly like the generated
    ``TurkishStemmer.java`` (``v = limit - cursor``) — deletions persist
    across failed alternatives, only the cursor is restored."""
    __slots__ = ("s", "c", "ket", "bra", "cont")

    def __init__(self, s):
        self.s = s
        self.c = len(s)
        self.ket = len(s)
        self.bra = len(s)
        self.cont = False


def _tr_sv(t):
    return len(t.s) - t.c


def _tr_rs(t, v):
    t.c = len(t.s) - v


def _tr_eqb(t, lit):
    n = len(lit)
    if t.c >= n and t.s[t.c - n:t.c] == lit:
        t.c -= n
        return True
    return False


def _tr_among(t, sfxs):
    for x in sfxs:
        if _tr_eqb(t, x):
            return True
    return False


def _tr_del(t):
    # slice_del: cursor is at bra when "]" fired; ket >= bra
    t.s = t.s[:t.bra] + t.s[t.ket:]
    t.ket = t.bra


def _tr_in_b(t, grp):
    if t.c > 0 and t.s[t.c - 1] in grp:
        t.c -= 1
        return True
    return False


def _tr_or(t, *fns):
    v = _tr_sv(t)
    for fn in fns:
        _tr_rs(t, v)
        if fn(t):
            return True
    _tr_rs(t, v)
    return False


def _tr_harmony(t):
    # check_vowel_harmony (turkish.sbl:111-124): inside test — no movement
    s, c = t.s, t.c
    j = c
    while j > 0 and s[j - 1] not in _TR_VOWEL:
        j -= 1
    if j == 0:
        return False
    grp = _TR_HARM[s[j - 1]]
    k = j - 1
    while k > 0 and s[k - 1] not in grp:
        k -= 1
    return k > 0


def _tr_opt_cons(t, letter):
    # mark_suffix_with_optional_{n,s,y}_consonant: either consume the
    # consonant (vowel before it), or stand pat (non-letter + vowel at c-2)
    s, c = t.s, t.c
    if c >= 2 and s[c - 1] == letter and s[c - 2] in _TR_VOWEL:
        t.c = c - 1
        return True
    if c >= 2 and s[c - 1] != letter and s[c - 2] in _TR_VOWEL:
        return True
    return False


def _tr_opt_U(t):
    # mark_suffix_with_optional_U_vowel (non-vowel must precede)
    s, c = t.s, t.c
    if c >= 2 and s[c - 1] in _TR_U and s[c - 2] not in _TR_VOWEL:
        t.c = c - 1
        return True
    if c >= 2 and s[c - 1] not in _TR_U and s[c - 2] not in _TR_VOWEL:
        return True
    return False


def _m_poss(t):
    return _tr_among(t, _TR_A0) and _tr_opt_U(t)


def _m_sU(t):
    return _tr_harmony(t) and _tr_in_b(t, _TR_U) and _tr_opt_cons(t, "s")


def _m_lArI(t):
    return _tr_among(t, ("leri", "ları"))


def _m_yU(t):
    return _tr_harmony(t) and _tr_in_b(t, _TR_U) and _tr_opt_cons(t, "y")


def _m_nU(t):
    return _tr_harmony(t) and _tr_among(t, ("ni", "nu", "nü", "nı"))


def _m_nUn(t):
    return (_tr_harmony(t) and _tr_among(t, ("in", "un", "ün", "ın"))
            and _tr_opt_cons(t, "n"))


def _m_yA(t):
    return (_tr_harmony(t) and _tr_among(t, ("a", "e"))
            and _tr_opt_cons(t, "y"))


def _m_nA(t):
    return _tr_harmony(t) and _tr_among(t, ("na", "ne"))


def _m_DA(t):
    return _tr_harmony(t) and _tr_among(t, ("da", "ta", "de", "te"))


def _m_ndA(t):
    return _tr_harmony(t) and _tr_among(t, ("nda", "nde"))


def _m_DAn(t):
    return _tr_harmony(t) and _tr_among(t, ("dan", "tan", "den", "ten"))


def _m_ndAn(t):
    return _tr_harmony(t) and _tr_among(t, ("ndan", "nden"))


def _m_ylA(t):
    return (_tr_harmony(t) and _tr_among(t, ("la", "le"))
            and _tr_opt_cons(t, "y"))


def _m_ki(t):
    return _tr_eqb(t, "ki")


def _m_ncA(t):
    return (_tr_harmony(t) and _tr_among(t, ("ca", "ce"))
            and _tr_opt_cons(t, "n"))


def _m_yUm(t):
    return (_tr_harmony(t) and _tr_among(t, ("im", "um", "üm", "ım"))
            and _tr_opt_cons(t, "y"))


def _m_sUn(t):
    return _tr_harmony(t) and _tr_among(t, ("sin", "sun", "sün", "sın"))


def _m_yUz(t):
    return (_tr_harmony(t) and _tr_among(t, ("iz", "uz", "üz", "ız"))
            and _tr_opt_cons(t, "y"))


def _m_sUnUz(t):
    return _tr_among(t, ("siniz", "sunuz", "sünüz", "sınız"))


def _m_lAr(t):
    return _tr_harmony(t) and _tr_among(t, ("lar", "ler"))


def _m_nUz(t):
    return _tr_harmony(t) and _tr_among(t, ("niz", "nuz", "nüz", "nız"))


def _m_DUr(t):
    return _tr_harmony(t) and _tr_among(
        t, ("dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır"))


def _m_cAsInA(t):
    return _tr_among(t, ("casına", "cesine"))


def _m_yDU(t):
    return (_tr_harmony(t) and _tr_among(t, _TR_YDU)
            and _tr_opt_cons(t, "y"))


def _m_ysA(t):
    return _tr_among(t, _TR_YSA) and _tr_opt_cons(t, "y")


def _m_ymUs(t):
    return (_tr_harmony(t) and _tr_among(t, ("miş", "muş", "müş", "mış"))
            and _tr_opt_cons(t, "y"))


def _m_yken(t):
    return _tr_eqb(t, "ken") and _tr_opt_cons(t, "y")


def _tr_nominal(t):
    # stem_nominal_verb_suffixes (turkish.sbl:311-328 / TurkishStemmer.java:1277)
    t.ket = t.c
    t.cont = True
    v1 = _tr_sv(t)
    ok = _tr_or(t, _m_ymUs, _m_yDU, _m_ysA, _m_yken)
    if not ok:
        _tr_rs(t, v1)
        if _m_cAsInA(t):
            _tr_or(t, _m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz)  # optional
            if _m_ymUs(t):
                ok = True
    if not ok:
        _tr_rs(t, v1)
        if _m_lAr(t):
            t.bra = t.c
            _tr_del(t)
            v4 = _tr_sv(t)
            t.ket = t.c
            if not _tr_or(t, _m_DUr, _m_yDU, _m_ysA, _m_ymUs):
                _tr_rs(t, v4)
            t.cont = False
            ok = True
    if not ok:
        _tr_rs(t, v1)
        if _m_nUz(t) and _tr_or(t, _m_yDU, _m_ysA):
            ok = True
    if not ok:
        _tr_rs(t, v1)
        if _tr_or(t, _m_sUnUz, _m_yUz, _m_sUn, _m_yUm):
            t.bra = t.c
            _tr_del(t)
            v8 = _tr_sv(t)
            t.ket = t.c
            if not _m_ymUs(t):
                _tr_rs(t, v8)
            ok = True
    if not ok:
        _tr_rs(t, v1)
        if not _m_DUr(t):
            return False
        t.bra = t.c
        _tr_del(t)
        v9 = _tr_sv(t)
        t.ket = t.c
        _tr_or(t, _m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz)  # optional
        if not _m_ymUs(t):
            _tr_rs(t, v9)
    t.bra = t.c
    _tr_del(t)
    return True


def _tr_chain_ki(t):
    # stem_suffix_chain_before_ki (turkish.sbl:332-357): fails only without
    # side effects (every post-match path returns True)
    t.ket = t.c
    if not _m_ki(t):
        return False
    v1 = _tr_sv(t)
    if _m_DA(t):
        t.bra = t.c
        _tr_del(t)
        v2 = _tr_sv(t)
        t.ket = t.c
        v3 = _tr_sv(t)
        if _m_lAr(t):
            t.bra = t.c
            _tr_del(t)
            v4 = _tr_sv(t)
            if not _tr_chain_ki(t):
                _tr_rs(t, v4)
        else:
            _tr_rs(t, v3)
            if _m_poss(t):
                t.bra = t.c
                _tr_del(t)
                v5 = _tr_sv(t)
                t.ket = t.c
                sub = False
                if _m_lAr(t):
                    t.bra = t.c
                    _tr_del(t)
                    if _tr_chain_ki(t):
                        sub = True
                if not sub:
                    _tr_rs(t, v5)
            else:
                _tr_rs(t, v2)
        return True
    _tr_rs(t, v1)
    if _m_nUn(t):
        t.bra = t.c
        _tr_del(t)
        v6 = _tr_sv(t)
        t.ket = t.c
        v7 = _tr_sv(t)
        if _m_lArI(t):
            t.bra = t.c
            _tr_del(t)
        else:
            _tr_rs(t, v7)
            t.ket = t.c
            if _tr_or(t, _m_poss, _m_sU):
                t.bra = t.c
                _tr_del(t)
                v9 = _tr_sv(t)
                t.ket = t.c
                sub = False
                if _m_lAr(t):
                    t.bra = t.c
                    _tr_del(t)
                    if _tr_chain_ki(t):
                        sub = True
                if not sub:
                    _tr_rs(t, v9)
            else:
                _tr_rs(t, v7)
                if not _tr_chain_ki(t):
                    _tr_rs(t, v6)
        return True
    _tr_rs(t, v1)
    if not _m_ndA(t):
        return False
    v10 = _tr_sv(t)
    if _m_lArI(t):
        t.bra = t.c
        _tr_del(t)
        return True
    _tr_rs(t, v10)
    if _m_sU(t):
        t.bra = t.c
        _tr_del(t)
        v11 = _tr_sv(t)
        t.ket = t.c
        sub = False
        if _m_lAr(t):
            t.bra = t.c
            _tr_del(t)
            if _tr_chain_ki(t):
                sub = True
        if not sub:
            _tr_rs(t, v11)
        return True
    _tr_rs(t, v10)
    return _tr_chain_ki(t)


def _tr_noun(t):
    # stem_noun_suffixes (turkish.sbl:361-413 / TurkishStemmer.java:1911)
    v1 = _tr_sv(t)
    t.ket = t.c
    if _m_lAr(t):                                      # branch 1
        t.bra = t.c
        _tr_del(t)
        v2 = _tr_sv(t)
        if not _tr_chain_ki(t):
            _tr_rs(t, v2)
        return True
    _tr_rs(t, v1)
    t.ket = t.c
    if _m_ncA(t):                                      # branch 2
        t.bra = t.c
        _tr_del(t)
        v3 = _tr_sv(t)
        v4 = _tr_sv(t)
        matched = False
        t.ket = t.c
        if _m_lArI(t):
            t.bra = t.c
            _tr_del(t)
            matched = True
        if not matched:
            _tr_rs(t, v4)
            t.ket = t.c
            if _tr_or(t, _m_poss, _m_sU):
                t.bra = t.c
                _tr_del(t)
                v6 = _tr_sv(t)
                t.ket = t.c
                sub = False
                if _m_lAr(t):
                    t.bra = t.c
                    _tr_del(t)
                    if _tr_chain_ki(t):
                        sub = True
                if not sub:
                    _tr_rs(t, v6)
                matched = True
        if not matched:
            _tr_rs(t, v4)
            t.ket = t.c
            if _m_lAr(t):
                t.bra = t.c
                _tr_del(t)
                if not _tr_chain_ki(t):
                    _tr_rs(t, v3)
            else:
                _tr_rs(t, v3)
        return True
    _tr_rs(t, v1)
    t.ket = t.c
    if _tr_or(t, _m_ndA, _m_nA):                       # branch 3
        v8 = _tr_sv(t)
        if _m_lArI(t):
            t.bra = t.c
            _tr_del(t)
            return True
        _tr_rs(t, v8)
        if _m_sU(t):
            t.bra = t.c
            _tr_del(t)
            v9 = _tr_sv(t)
            t.ket = t.c
            sub = False
            if _m_lAr(t):
                t.bra = t.c
                _tr_del(t)
                if _tr_chain_ki(t):
                    sub = True
            if not sub:
                _tr_rs(t, v9)
            return True
        _tr_rs(t, v8)
        if _tr_chain_ki(t):
            return True
        # all three inner alternatives failed: fall through to branch 4
    _tr_rs(t, v1)
    t.ket = t.c
    if _tr_or(t, _m_ndAn, _m_nU):                      # branch 4
        v11 = _tr_sv(t)
        done = False
        if _m_sU(t):
            t.bra = t.c
            _tr_del(t)
            v12 = _tr_sv(t)
            t.ket = t.c
            sub = False
            if _m_lAr(t):
                t.bra = t.c
                _tr_del(t)
                if _tr_chain_ki(t):
                    sub = True
            if not sub:
                _tr_rs(t, v12)
            done = True
        if not done:
            _tr_rs(t, v11)
            if _m_lArI(t):      # note: no delete on this path (sbl quirk)
                done = True
        if done:
            return True
    _tr_rs(t, v1)
    t.ket = t.c
    if _m_DAn(t):                                      # branch 5
        t.bra = t.c
        _tr_del(t)
        v13 = _tr_sv(t)
        t.ket = t.c
        v14 = _tr_sv(t)
        handled = False
        if _m_poss(t):
            t.bra = t.c
            _tr_del(t)
            v15 = _tr_sv(t)
            t.ket = t.c
            sub = False
            if _m_lAr(t):
                t.bra = t.c
                _tr_del(t)
                if _tr_chain_ki(t):
                    sub = True
            if not sub:
                _tr_rs(t, v15)
            handled = True
        if not handled:
            _tr_rs(t, v14)
            if _m_lAr(t):
                t.bra = t.c
                _tr_del(t)
                v16 = _tr_sv(t)
                if not _tr_chain_ki(t):
                    _tr_rs(t, v16)
                handled = True
        if not handled:
            _tr_rs(t, v14)
            if not _tr_chain_ki(t):
                _tr_rs(t, v13)
        return True
    _tr_rs(t, v1)
    t.ket = t.c
    if _tr_or(t, _m_nUn, _m_ylA):                      # branch 6
        t.bra = t.c
        _tr_del(t)
        v18 = _tr_sv(t)
        v19 = _tr_sv(t)
        handled = False
        t.ket = t.c
        if _m_lAr(t):
            t.bra = t.c
            _tr_del(t)
            if _tr_chain_ki(t):
                handled = True
            # chain failure: the lAr delete persists; cursor restored below
        if not handled:
            _tr_rs(t, v19)
            t.ket = t.c
            if _tr_or(t, _m_poss, _m_sU):
                t.bra = t.c
                _tr_del(t)
                v21 = _tr_sv(t)
                t.ket = t.c
                sub = False
                if _m_lAr(t):
                    t.bra = t.c
                    _tr_del(t)
                    if _tr_chain_ki(t):
                        sub = True
                if not sub:
                    _tr_rs(t, v21)
                handled = True
        if not handled:
            _tr_rs(t, v19)
            if not _tr_chain_ki(t):
                _tr_rs(t, v18)
        return True
    _tr_rs(t, v1)
    t.ket = t.c
    if _m_lArI(t):                                     # branch 7
        t.bra = t.c
        _tr_del(t)
        return True
    _tr_rs(t, v1)
    if _tr_chain_ki(t):                                # branch 8
        return True
    _tr_rs(t, v1)
    t.ket = t.c
    if _tr_or(t, _m_DA, _m_yU, _m_yA):                 # branch 9
        t.bra = t.c
        _tr_del(t)
        v23 = _tr_sv(t)
        t.ket = t.c
        v24 = _tr_sv(t)
        got = False
        if _m_poss(t):
            t.bra = t.c
            _tr_del(t)
            v25 = _tr_sv(t)
            t.ket = t.c
            if not _m_lAr(t):
                _tr_rs(t, v25)
            got = True
        if not got:
            _tr_rs(t, v24)
            if _m_lAr(t):
                got = True
        if got:
            t.bra = t.c
            _tr_del(t)
            t.ket = t.c
            if not _tr_chain_ki(t):
                _tr_rs(t, v23)
        else:
            _tr_rs(t, v23)
        return True
    _tr_rs(t, v1)
    t.ket = t.c
    if not _tr_or(t, _m_poss, _m_sU):                  # branch 10
        return False
    t.bra = t.c
    _tr_del(t)
    v27 = _tr_sv(t)
    t.ket = t.c
    sub = False
    if _m_lAr(t):
        t.bra = t.c
        _tr_del(t)
        if _tr_chain_ki(t):
            sub = True
    if not sub:
        _tr_rs(t, v27)
    return True


def _tr_append_U(t):
    # append_U_to_stems_ending_with_d_or_g (turkish.sbl:430-439)
    s = t.s
    if not s or s[-1] not in "dg":
        return False
    j = len(s) - 1
    while j > 0 and s[j - 1] not in _TR_VOWEL:
        j -= 1
    if j == 0:
        return False
    v = s[j - 1]
    if v in "aı":
        t.s = s + "ı"
    elif v in "ei":
        t.s = s + "i"
    elif v in "ou":
        t.s = s + "u"
    else:  # ö / ü
        t.s = s + "ü"
    return True


def turkish_snowball_stem(word):
    """Snowball Turkish (``tartarus/snowball/ext/TurkishStemmer.java``;
    TurkishAnalyzer's stemmer, ``tr/TurkishAnalyzer.java:118-126``) —
    vocab-exact on all 96,325 TestSnowballVocabData turkish entries.
    Returns the modified buffer (stemwords semantics) even when the
    algorithm's stem() flag would be false."""
    if sum(1 for ch in word if ch in _TR_VOWEL) < 2:
        return word          # more_than_one_syllable_word fails
    t = _TrCtx(word)
    v1 = _tr_sv(t)
    _tr_nominal(t)
    _tr_rs(t, v1)
    if not t.cont:
        return t.s           # continue_stemming_noun_suffixes unset
    v2 = _tr_sv(t)
    _tr_noun(t)
    _tr_rs(t, v2)
    # postlude
    if t.s in ("ad", "soyad"):   # is_reserved_word
        return t.s
    v3 = _tr_sv(t)
    _tr_append_U(t)
    _tr_rs(t, v3)
    if t.s.endswith("b"):        # post_process_last_consonants
        t.s = t.s[:-1] + "p"
    elif t.s.endswith("c"):
        t.s = t.s[:-1] + "ç"
    elif t.s.endswith("d"):
        t.s = t.s[:-1] + "t"
    elif t.s.endswith("ğ"):
        t.s = t.s[:-1] + "k"
    return t.s


# -------------------------------------------------------------- Arabic

#: Normalize_pre (arabic.sbl:251-318): strip harakat/tatweel, map
#: Arabic-Indic digits to ASCII, fold presentation forms FE80-FEFC to
#: canonical letters (lam-alef ligatures expand to two chars)
_AR_PRE_MAP = {"ـ": ""}
for _c in range(0x064B, 0x0653):
    _AR_PRE_MAP[chr(_c)] = ""
for _i in range(10):
    _AR_PRE_MAP[chr(0x0660 + _i)] = str(_i)
for _forms, _canon in (
    ("ﺀ", "ء"), ("ﺁﺂ", "آ"),
    ("ﺃﺄ", "أ"), ("ﺅﺆ", "ؤ"),
    ("ﺇﺈ", "إ"), ("ﺉﺊﺋﺌ", "ئ"),
    ("ﺍﺎ", "ا"), ("ﺏﺐﺑﺒ", "ب"),
    ("ﺓﺔ", "ة"), ("ﺕﺖﺗﺘ", "ت"),
    ("ﺙﺚﺛﺜ", "ث"),
    ("ﺝﺞﺟﺠ", "ج"),
    ("ﺡﺢﺣﺤ", "ح"),
    ("ﺥﺦﺧﺨ", "خ"),
    ("ﺩﺪ", "د"), ("ﺫﺬ", "ذ"),
    ("ﺭﺮ", "ر"), ("ﺯﺰ", "ز"),
    ("ﺱﺲﺳﺴ", "س"),
    ("ﺵﺶﺷﺸ", "ش"),
    ("ﺹﺺﺻﺼ", "ص"),
    ("ﺽﺾﺿﻀ", "ض"),
    ("ﻁﻂﻃﻄ", "ط"),
    ("ﻅﻆﻇﻈ", "ظ"),
    ("ﻉﻊﻋﻌ", "ع"),
    ("ﻍﻎﻏﻐ", "غ"),
    ("ﻑﻒﻓﻔ", "ف"),
    ("ﻕﻖﻗﻘ", "ق"),
    ("ﻙﻚﻛﻜ", "ك"),
    ("ﻝﻞﻟﻠ", "ل"),
    ("ﻡﻢﻣﻤ", "م"),
    ("ﻥﻦﻧﻨ", "ن"),
    ("ﻩﻪﻫﻬ", "ه"),
    ("ﻭﻮ", "و"), ("ﻯﻰ", "ى"),
    ("ﻱﻲﻳﻴ", "ي"),
    ("ﻵﻶ", "لآ"), ("ﻷﻸ", "لأ"),
    ("ﻹﻺ", "لإ"), ("ﻻﻼ", "لا"),
):
    for _f in _forms:
        _AR_PRE_MAP[_f] = _canon
del _c, _i, _forms, _canon, _f

#: suffix tables: (suffix, case) — longest match wins, as find_among_b
_AR_N1A = (("كما", 3), ("هما", 3),
           ("نا", 2), ("ها", 2), ("ك", 1),
           ("كم", 2), ("هم", 2), ("هن", 2),
           ("ه", 1), ("ي", 1))
_AR_V1 = (("كما", 3), ("هما", 3),
          ("نا", 2), ("ها", 2), ("ك", 1),
          ("كم", 2), ("هم", 2), ("كن", 2),
          ("هن", 2), ("ه", 1),
          ("كمو", 3), ("ني", 2))
_AR_V2A = (("ا", 2), ("تا", 3), ("تما", 5),
           ("نا", 3), ("ت", 1), ("ن", 2),
           ("ان", 4), ("تن", 3), ("ون", 4),
           ("ين", 4), ("ي", 2))


def _ar_sfx(t, table):
    """find_among_b: longest suffix at the cursor; on a match the cursor
    moves left past it and bra/ket bracket it. Returns the case (0 = none).
    Length conditions are checked by the caller AFTER the move (failures
    leave the cursor moved — callers restore, as the generated Java does)."""
    best, blen = 0, 0
    s, c = t.s, t.c
    for sfx, case in table:
        n = len(sfx)
        if n > blen and c >= n and s[c - n:c] == sfx:
            best, blen = case, n
    if best:
        t.ket = c
        t.c = c - blen
        t.bra = t.c
    return best


def _ar_del_if(t, case, conds):
    # conds: {case: min_len_inclusive}; delete on pass
    if case and len(t.s) >= conds[case]:
        _tr_del(t)
        return True
    return False


def _ar_vstep1(t):
    return _ar_del_if(t, _ar_sfx(t, _AR_V1), {1: 4, 2: 5, 3: 6})


def _ar_vstep2a(t):
    return _ar_del_if(t, _ar_sfx(t, _AR_V2A), {1: 4, 2: 4, 3: 5, 4: 6, 5: 6})


def _ar_vstep2b(t):
    case = _ar_sfx(t, (("وا", 1), ("تم", 1)))
    return _ar_del_if(t, case, {1: 5})


def _ar_vstep2c(t):
    case = _ar_sfx(t, (("و", 1), ("تمو", 2)))
    return _ar_del_if(t, case, {1: 4, 2: 6})


def _ar_nstep1a(t):
    return _ar_del_if(t, _ar_sfx(t, _AR_N1A), {1: 4, 2: 5, 3: 6})


def _ar_nstep1b(t):
    case = _ar_sfx(t, (("ن", 1),))
    return _ar_del_if(t, case, {1: 6})   # I_word_len > 5


def _ar_nstep2a(t):
    case = _ar_sfx(t, (("ا", 1), ("و", 1), ("ي", 1)))
    return _ar_del_if(t, case, {1: 5})   # I_word_len > 4


def _ar_nstep2b(t):
    case = _ar_sfx(t, (("ات", 1),))
    return _ar_del_if(t, case, {1: 5})


def _ar_nstep2c1(t):
    case = _ar_sfx(t, (("ت", 1),))
    return _ar_del_if(t, case, {1: 4})


def _ar_nstep2c2(t):
    case = _ar_sfx(t, (("ة", 1),))
    return _ar_del_if(t, case, {1: 4})


def _ar_nstep3(t):
    case = _ar_sfx(t, (("ي", 1),))
    return _ar_del_if(t, case, {1: 3})


def _ar_alef_maqsura(t):
    if _ar_sfx(t, (("ى", 1),)):
        t.s = t.s[:t.bra] + "ي" + t.s[t.ket:]
        t.ket = t.bra + 1
        return True
    return False


def _ar_try(t, fn):
    v = _tr_sv(t)
    if fn(t):
        return True
    _tr_rs(t, v)
    return False


def _ar_pfx(w, p, table):
    """Forward find_among at position p: (matched_len, case) or (0, 0)."""
    best, blen = 0, 0
    for pfx, case in table:
        n = len(pfx)
        if n > blen and w[p:p + n] == pfx:
            best, blen = case, n
    return blen, best


def _ar_prefixes(w, is_noun, is_verb):
    # stem() prefix section (arabic.sbl:573-580): try Step1, try Step2,
    # then (Step3a_Noun or is_noun Step3b_Noun or is_verb (try Step3_Verb
    # Step4_Verb)) — a `do`, so failures just end the phase
    p = 0
    n, case = _ar_pfx(w, p, (
        ("أآ", 2), ("أأ", 1),
        ("أؤ", 3), ("أإ", 5),
        ("أا", 4)))
    if case and len(w) > 3:                               # Prefix_Step1
        repl = {1: "أ", 2: "آ", 3: "أ",
                4: "ا", 5: "إ"}[case]
        w = w[:p] + repl + w[p + n:]
        p += len(repl)
    if (w[p:p + 2] not in ("فا", "وا")
            and w[p:p + 1] in ("ف", "و")
            and len(w) > 3):                              # Prefix_Step2
        w = w[:p] + w[p + 1:]
    n, case = _ar_pfx(w, p, (
        ("ال", 2), ("بال", 1),
        ("كال", 1), ("لل", 2)))
    if case and len(w) > (5 if case == 1 else 4):         # Prefix_Step3a_Noun
        w = w[:p] + w[p + n:]
        return w
    if is_noun and w[p:p + 2] != "با":                   # Prefix_Step3b_Noun
        n, case = _ar_pfx(w, p, (("ب", 1), ("بب", 2),
                                 ("كك", 3)))
        if case and len(w) > 3:
            repl = {1: "", 2: "ب", 3: "ك"}[case]
            w = w[:p] + repl + w[p + n:]
            return w
    if is_verb:
        n, case = _ar_pfx(w, p, (
            ("سأ", 4), ("ست", 2),
            ("سن", 3), ("سي", 1)))
        if case and len(w) > 4:                           # Prefix_Step3_Verb
            repl = {1: "ي", 2: "ت", 3: "ن", 4: "أ"}[case]
            w = w[:p] + repl + w[p + n:]
            p += len(repl)
        n, case = _ar_pfx(w, p, (("تست", 1), ("نست", 1),
                                 ("يست", 1)))
        if case and len(w) > 4:                           # Prefix_Step4_Verb
            w = w[:p] + "است" + w[p + n:]
    return w


def _ar_suffixes(t, is_verb, is_noun, is_defined):
    # stem() backward section (arabic.sbl:528-569)
    v4 = _tr_sv(t)
    if is_verb:
        v5 = _tr_sv(t)
        n_del = 0
        while _ar_try(t, _ar_vstep1):
            n_del += 1
        if n_del >= 1:
            if _ar_try(t, _ar_vstep2a) or _ar_try(t, _ar_vstep2c):
                return
            if t.c > 0:
                t.c -= 1
                return
        _tr_rs(t, v5)
        if _ar_try(t, _ar_vstep2b):
            return
        if _ar_try(t, _ar_vstep2a):
            return
        _tr_rs(t, v4)
    if is_noun:
        v9 = _tr_sv(t)
        v10 = _tr_sv(t)
        done = _ar_try(t, _ar_nstep2c2)
        if not done and not is_defined and _ar_try(t, _ar_nstep1a):
            if (_ar_try(t, _ar_nstep2a) or _ar_try(t, _ar_nstep2b)
                    or _ar_try(t, _ar_nstep2c1)):
                done = True
            elif t.c > 0:
                t.c -= 1
                done = True
            else:
                _tr_rs(t, v10)   # alternative fails; Step1a delete persists
        if not done and _ar_try(t, _ar_nstep1b):
            if (_ar_try(t, _ar_nstep2a) or _ar_try(t, _ar_nstep2b)
                    or _ar_try(t, _ar_nstep2c1)):
                done = True
            else:
                _tr_rs(t, v10)   # alternative fails; Step1b delete persists
        if not done and not is_defined and _ar_try(t, _ar_nstep2a):
            done = True
        if not done and not _ar_try(t, _ar_nstep2b):
            _tr_rs(t, v9)        # whole try skipped
        if _ar_try(t, _ar_nstep3):
            return               # noun branch succeeded
        _tr_rs(t, v4)            # noun branch failed: Step3 required
    _ar_try(t, _ar_alef_maqsura)


def arabic_snowball_stem(word):
    """Snowball Arabic (``tartarus/snowball/ext/ArabicStemmer.java``;
    arabic.sbl by Assem Chelli) — vocab-exact on all 1,165
    TestSnowballVocabData arabic entries. Distinct from the Light-10
    stemmer in :func:`lucene_solr_ray.analysis.lang.arabic_stem`."""
    is_noun, is_verb, is_defined = True, True, False
    # Checks1 runs on the raw word (before Normalize_pre)
    n, case = _ar_pfx(word, 0, (
        ("ال", 2), ("بال", 1),
        ("كال", 1), ("لل", 2)))
    if case == 1 and len(word) > 4:
        is_noun, is_verb, is_defined = True, False, True
    elif case == 2 and len(word) > 3:
        is_noun, is_verb, is_defined = True, False, True
    word = "".join(_AR_PRE_MAP.get(ch, ch) for ch in word)  # Normalize_pre
    t = _TrCtx(word)
    _ar_suffixes(t, is_verb, is_noun, is_defined)
    w = _ar_prefixes(t.s, is_noun, is_verb)
    # Normalize_post: final hamza carrier -> bare hamza, then fold
    if w and w[-1] in "آأؤإئ":
        w = w[:-1] + "ء"
    return (w.replace("آ", "ا").replace("أ", "ا")
            .replace("إ", "ا").replace("ؤ", "و")
            .replace("ئ", "ي"))


# -------------------------------------------------------------- Lovins

#: Lovins (1968) ending table as shipped in ``tartarus/snowball/ext/
#: LovinsStemmer.java`` (lovins.sbl): (ending, condition letter), matched
#: longest-first with fall-back to the next-longest matching ending when a
#: condition fails (Snowball among semantics).
_LOV_ENDINGS = (
    ("alistically","B"), ("arizability","A"), ("izationally","B"), ("antialness","A"),
    ("arisations","A"), ("arizations","A"), ("entialness","A"), ("allically","C"),
    ("antaneous","A"), ("antiality","A"), ("arisation","A"), ("arization","A"),
    ("ationally","B"), ("ativeness","A"), ("eableness","E"), ("entations","A"),
    ("entiality","A"), ("entialize","A"), ("entiation","A"), ("ionalness","A"),
    ("istically","A"), ("itousness","A"), ("izability","A"), ("izational","A"),
    ("ableness","A"), ("arizable","A"), ("entation","A"), ("entially","A"),
    ("eousness","A"), ("ibleness","A"), ("icalness","A"), ("ionalism","A"),
    ("ionality","A"), ("ionalize","A"), ("iousness","A"), ("izations","A"),
    ("lessness","A"), ("ability","A"), ("aically","A"), ("alistic","B"),
    ("alities","A"), ("ariness","E"), ("aristic","A"), ("arizing","A"),
    ("ateness","A"), ("atingly","A"), ("ational","B"), ("atively","A"),
    ("ativism","A"), ("elihood","E"), ("encible","A"), ("entally","A"),
    ("entials","A"), ("entiate","A"), ("entness","A"), ("fulness","A"),
    ("ibility","A"), ("icalism","A"), ("icalist","A"), ("icality","A"),
    ("icalize","A"), ("ication","G"), ("icianry","A"), ("ination","A"),
    ("ingness","A"), ("ionally","A"), ("isation","A"), ("ishness","A"),
    ("istical","A"), ("iteness","A"), ("iveness","A"), ("ivistic","A"),
    ("ivities","A"), ("ization","F"), ("izement","A"), ("oidally","A"),
    ("ousness","A"), ("aceous","A"), ("acious","B"), ("action","G"),
    ("alness","A"), ("ancial","A"), ("ancies","A"), ("ancing","B"),
    ("ariser","A"), ("arized","A"), ("arizer","A"), ("atable","A"),
    ("ations","B"), ("atives","A"), ("eature","Z"), ("efully","A"),
    ("encies","A"), ("encing","A"), ("ential","A"), ("enting","C"),
    ("entist","A"), ("eously","A"), ("ialist","A"), ("iality","A"),
    ("ialize","A"), ("ically","A"), ("icance","A"), ("icians","A"),
    ("icists","A"), ("ifully","A"), ("ionals","A"), ("ionate","D"),
    ("ioning","A"), ("ionist","A"), ("iously","A"), ("istics","A"),
    ("izable","E"), ("lessly","A"), ("nesses","A"), ("oidism","A"),
    ("acies","A"), ("acity","A"), ("aging","B"), ("aical","A"),
    ("alism","B"), ("alist","A"), ("ality","A"), ("alize","A"),
    ("allic","BB"), ("anced","B"), ("ances","B"), ("antic","C"),
    ("arial","A"), ("aries","A"), ("arily","A"), ("arity","B"),
    ("arize","A"), ("aroid","A"), ("ately","A"), ("ating","I"),
    ("ation","B"), ("ative","A"), ("ators","A"), ("atory","A"),
    ("ature","E"), ("early","Y"), ("ehood","A"), ("eless","A"),
    ("elity","A"), ("ement","A"), ("enced","A"), ("ences","A"),
    ("eness","E"), ("ening","E"), ("ental","A"), ("ented","C"),
    ("ently","A"), ("fully","A"), ("ially","A"), ("icant","A"),
    ("ician","A"), ("icide","A"), ("icism","A"), ("icist","A"),
    ("icity","A"), ("idine","I"), ("iedly","A"), ("ihood","A"),
    ("inate","A"), ("iness","A"), ("ingly","B"), ("inism","J"),
    ("inity","CC"), ("ional","A"), ("ioned","A"), ("ished","A"),
    ("istic","A"), ("ities","A"), ("itous","A"), ("ively","A"),
    ("ivity","A"), ("izers","F"), ("izing","F"), ("oidal","A"),
    ("oides","A"), ("otide","A"), ("ously","A"), ("able","A"),
    ("ably","A"), ("ages","B"), ("ally","B"), ("ance","B"),
    ("ancy","B"), ("ants","B"), ("aric","A"), ("arly","K"),
    ("ated","I"), ("ates","A"), ("atic","B"), ("ator","A"),
    ("ealy","Y"), ("edly","E"), ("eful","A"), ("eity","A"),
    ("ence","A"), ("ency","A"), ("ened","E"), ("enly","E"),
    ("eous","A"), ("hood","A"), ("ials","A"), ("ians","A"),
    ("ible","A"), ("ibly","A"), ("ical","A"), ("ides","L"),
    ("iers","A"), ("iful","A"), ("ines","M"), ("ings","N"),
    ("ions","B"), ("ious","A"), ("isms","B"), ("ists","A"),
    ("itic","H"), ("ized","F"), ("izer","F"), ("less","A"),
    ("lily","A"), ("ness","A"), ("ogen","A"), ("ward","A"),
    ("wise","A"), ("ying","B"), ("yish","A"), ("acy","A"),
    ("age","B"), ("aic","A"), ("als","BB"), ("ant","B"),
    ("ars","O"), ("ary","F"), ("ata","A"), ("ate","A"),
    ("eal","Y"), ("ear","Y"), ("ely","E"), ("ene","E"),
    ("ent","C"), ("ery","E"), ("ese","A"), ("ful","A"),
    ("ial","A"), ("ian","A"), ("ics","A"), ("ide","L"),
    ("ied","A"), ("ier","A"), ("ies","P"), ("ily","A"),
    ("ine","M"), ("ing","N"), ("ion","Q"), ("ish","C"),
    ("ism","B"), ("ist","A"), ("ite","AA"), ("ity","A"),
    ("ium","A"), ("ive","A"), ("ize","F"), ("oid","A"),
    ("one","R"), ("ous","A"), ("'s","A"), ("ae","A"),
    ("al","BB"), ("ar","X"), ("as","B"), ("ed","E"),
    ("en","F"), ("es","E"), ("ia","A"), ("ic","A"),
    ("is","A"), ("ly","B"), ("on","S"), ("or","T"),
    ("s'","A"), ("um","U"), ("us","V"), ("yl","R"),
    ("a","A"), ("e","A"), ("i","A"), ("o","A"),
    ("s","W"), ("y","B"),
)

_LOV_AA = ("ph", "th", "er", "or", "es", "d", "f", "l", "t")
_LOV_DOUBLES = ("bb", "dd", "gg", "ll", "mm", "nn", "pp", "rr", "ss", "tt")

#: respell rules: (suffix, replacement, forbidden chars immediately before)
_LOV_RESPELL = (
    ("erid", "eris", ""), ("pand", "pans", ""), ("istr", "ister", ""),
    ("metr", "meter", ""), ("umpt", "um", ""),
    ("uad", "uas", ""), ("vad", "vas", ""), ("cid", "cis", ""),
    ("lid", "lis", ""), ("end", "ens", "s"), ("ond", "ons", ""),
    ("lud", "lus", ""), ("rud", "rus", ""), ("her", "hes", "pt"),
    ("urs", "ur", ""), ("uct", "uc", ""), ("mit", "mis", ""),
    ("ent", "ens", "m"), ("rpt", "rb", ""), ("ert", "ers", ""),
    ("iev", "ief", ""), ("olv", "olut", ""), ("bex", "bic", ""),
    ("dex", "dic", ""), ("pex", "pic", ""), ("tex", "tic", ""),
    ("lux", "luc", ""),
    ("ul", "l", "aio"), ("et", "es", "n"), ("yt", "ys", ""),
    ("ax", "ac", ""), ("ex", "ec", ""), ("ix", "ic", ""),
    ("yz", "ys", ""),
)


def _lov_cond(cond, s):
    """Lovins context conditions A..CC over the candidate stem ``s``
    (lovins.sbl:21-50; hop N = minimum stem length N)."""
    n = len(s)
    if cond == "A": return n >= 2
    if cond == "B": return n >= 3
    if cond == "C": return n >= 4
    if cond == "D": return n >= 5
    if cond == "E": return n >= 2 and s[-1] != "e"
    if cond == "F": return n >= 3 and s[-1] != "e"
    if cond == "G": return n >= 3 and s[-1] == "f"
    if cond == "H": return n >= 2 and (s[-1] == "t" or s[-2:] == "ll")
    if cond == "I": return n >= 2 and s[-1] not in "oe"
    if cond == "J": return n >= 2 and s[-1] not in "ae"
    if cond == "K":
        return n >= 3 and (s[-1] in "li" or (s[-1] == "e" and s[-3] == "u"))
    if cond == "L":
        return (n >= 2 and s[-1] not in "ux"
                and (s[-1] != "s" or s[-2] == "o"))
    if cond == "M": return n >= 2 and s[-1] not in "acem"
    if cond == "N": return n >= 3 and (n >= 4 or s[-3] != "s")
    if cond == "O": return n >= 2 and s[-1] in "li"
    if cond == "P": return n >= 2 and s[-1] != "c"
    if cond == "Q": return n >= 3 and s[-1] not in "ln"
    if cond == "R": return n >= 2 and s[-1] in "nr"
    if cond == "S":
        return n >= 2 and (s[-2:] == "dr" or (s[-1] == "t" and s[-2] != "t"))
    if cond == "T":
        return n >= 2 and (s[-1] == "s" or (s[-1] == "t" and s[-2] != "o"))
    if cond == "U": return n >= 2 and s[-1] in "lmnr"
    if cond == "V": return n >= 2 and s[-1] == "c"
    if cond == "W": return n >= 2 and s[-1] not in "su"
    if cond == "X":
        return n >= 2 and (s[-1] in "li"
                           or (n >= 3 and s[-1] == "e" and s[-3] == "u"))
    if cond == "Y": return n >= 2 and s[-2:] == "in"
    if cond == "Z": return n >= 2 and s[-1] != "f"
    if cond == "AA": return n >= 2 and s.endswith(_LOV_AA)
    if cond == "BB":
        return (n >= 3 and not s.endswith("met")
                and not s.endswith("ryst"))
    return n >= 2 and s[-1] == "l"   # CC


def lovins_stem(word):
    """Lovins (1968) stemmer, Snowball edition (``tartarus/snowball/ext/
    LovinsStemmer.java``; SnowballPorterFilterFactory language=Lovins) —
    vocab-exact on all 29,417 TestSnowballVocabData lovins entries."""
    # endings: longest matching ending whose condition passes
    for sfx, cond in _LOV_ENDINGS:
        if word.endswith(sfx):
            stem = word[: len(word) - len(sfx)]
            if _lov_cond(cond, stem):
                word = stem
                break
    # undouble
    if word.endswith(_LOV_DOUBLES):
        word = word[:-1]
    # respell (longest match; a failed guard aborts without fall-back)
    best = None
    for sfx, repl, forbid in _LOV_RESPELL:
        if word.endswith(sfx) and (best is None or len(sfx) > len(best[0])):
            best = (sfx, repl, forbid)
    if best is not None:
        sfx, repl, forbid = best
        pre = word[: len(word) - len(sfx)]
        if not (pre and pre[-1] in forbid):
            word = pre + repl
    return word


# ------------------------------------------------- Kraaij-Pohlmann (Dutch)

_KP_V = frozenset("aeiouy")
_KP_V_WX = frozenset("aeiouywx")
_KP_AOU = frozenset("aou")
_KP_AIOU = frozenset("aiou")


class _KpCtx(_TrCtx):
    """Adds measure marks p1/p2 and the GE/stemmed flags to the backward
    cursor context (kp.sbl: R1/R2 are position >= mark, not region)."""
    __slots__ = ("p1", "p2", "ge_removed", "stemmed")

    def __init__(self, s):
        super().__init__(s)
        self.p1 = len(s)
        self.p2 = len(s)
        self.ge_removed = False
        self.stemmed = False


def _kp_measure(t):
    # kp.sbl measure: p1 after [cons* (ij|v)+ cons], p2 after that again
    s = t.s
    n = len(s)
    t.p1 = t.p2 = n
    i = 0
    for attr in ("p1", "p2"):
        while i < n and s[i] not in _KP_V:
            i += 1
        cnt = 0
        while i < n:
            if s[i:i + 2] == "ij":
                i += 2
            elif s[i] in _KP_V:
                i += 1
            else:
                break
            cnt += 1
        if cnt < 1 or i >= n or s[i] in _KP_V:
            return
        i += 1
        setattr(t, attr, i)


def _kp_R1(t):
    return t.c >= t.p1


def _kp_R2(t):
    return t.c >= t.p2


def _kp_V(t):
    # test: vowel or 'ij' before the cursor
    s, c = t.s, t.c
    return c >= 1 and (s[c - 1] in _KP_V or s[c - 2:c] == "ij")


def _kp_VX(t):
    # test: next, then vowel or 'ij'
    s, c = t.s, t.c
    return c >= 2 and (s[c - 2] in _KP_V or s[c - 3:c - 1] == "ij")


def _kp_C(t):
    # test: not 'ij', and a consonant before the cursor
    s, c = t.s, t.c
    return c >= 1 and s[c - 2:c] != "ij" and s[c - 1] not in _KP_V


def _kp_lengthen_V(t):
    # kp.sbl lengthen_V: double a short vowel before a final consonant
    # (not w/x); the 'e' case has extra guards. Pure side effect (do-style:
    # always "succeeds"; cursor is net unmoved relative to the end).
    s, c = t.s, t.c
    if c < 1 or s[c - 1] in _KP_V_WX:
        return True
    p = c - 2
    if p < 0:
        return True
    ch = s[p]
    if ch in _KP_AOU:
        if p == 0 or s[p - 1] not in _KP_V:
            t.s = s[:p] + ch + s[p:]
            t.c = c + 1
    elif ch == "e":
        if p == 0:
            ok = True
        elif s[p - 1] not in _KP_V:
            ok = True
            if p >= 2 and s[p - 2] in _KP_AIOU:
                ok = False
            elif p >= 4 and s[p - 3] in _KP_AIOU and s[p - 4] not in _KP_V:
                ok = False
        else:
            ok = False
        if ok:
            t.s = s[:p] + "e" + s[p:]
            t.c = c + 1
    return True


def _kp_step1(t):
    t.ket = t.c
    m = _ar_sfx(t, (("nde", 7), ("en", 6), ("'s", 1), ("s", 2),
                    ("ies", 3), ("es", 4), ("aus", 5)))
    if not m:
        return False
    if m == 7:
        t.s = t.s[:t.bra] + "nd" + t.s[t.ket:]
        return True
    if m == 1:
        _tr_del(t)
        return True
    if m == 2:
        if not _kp_R1(t):
            return False
        v = _tr_sv(t)
        if _tr_eqb(t, "t") and _kp_R1(t):
            return False
        _tr_rs(t, v)
        if not _kp_C(t):
            return False
        _tr_del(t)
        return True
    if m == 3:
        if not _kp_R1(t):
            return False
        t.s = t.s[:t.bra] + "ie" + t.s[t.ket:]
        return True
    if m == 4:  # es
        v = _tr_sv(t)
        if _tr_eqb(t, "ar") and _kp_R1(t) and _kp_C(t):
            t.bra = t.c
            _tr_del(t)
            _kp_lengthen_V(t)
            return True
        _tr_rs(t, v)
        if _tr_eqb(t, "er") and _kp_R1(t) and _kp_C(t):
            t.bra = t.c
            _tr_del(t)
            return True
        _tr_rs(t, v)
        if not (_kp_R1(t) and _kp_C(t)):
            return False
        t.s = t.s[:t.bra] + "e" + t.s[t.ket:]
        return True
    if m == 5:  # aus
        if not (_kp_R1(t) and _kp_V(t)):
            return False
        t.s = t.s[:t.bra] + "au" + t.s[t.ket:]
        return True
    # m == 6: en
    v = _tr_sv(t)
    if _tr_eqb(t, "hed") and _kp_R1(t):
        t.bra = t.c
        t.s = t.s[:t.bra] + "heid" + t.s[t.ket:]
        return True
    _tr_rs(t, v)
    if _tr_eqb(t, "nd"):
        _tr_rs(t, v)
        _tr_del(t)
        return True
    _tr_rs(t, v)
    if _tr_eqb(t, "d") and _kp_R1(t) and _kp_C(t):
        t.bra = t.c
        _tr_del(t)
        return True
    _tr_rs(t, v)
    if (_tr_eqb(t, "i") or _tr_eqb(t, "j")) and _kp_V(t):
        _tr_rs(t, v)
        _tr_del(t)
        return True
    _tr_rs(t, v)
    if not (_kp_R1(t) and _kp_C(t)):
        return False
    _tr_del(t)
    _kp_lengthen_V(t)
    return True


def _kp_step2(t):
    t.ket = t.c
    m = _ar_sfx(t, (("de", 5), ("ge", 2), ("ische", 4), ("je", 1),
                    ("lijke", 3), ("le", 9), ("ene", 10), ("re", 8),
                    ("se", 7), ("te", 6), ("ieve", 11)))
    if not m:
        return False
    if m == 1:  # je
        v = _tr_sv(t)
        if _tr_eqb(t, "'t"):
            t.bra = t.c
            _tr_del(t)
            return True
        _tr_rs(t, v)
        if _tr_eqb(t, "et"):
            t.bra = t.c
            if _kp_R1(t) and _kp_C(t):
                _tr_del(t)
                return True
            _tr_rs(t, v)
        else:
            _tr_rs(t, v)
        if _tr_eqb(t, "rnt"):
            t.bra = t.c
            t.s = t.s[:t.bra] + "rn" + t.s[t.ket:]
            return True
        _tr_rs(t, v)
        if _tr_eqb(t, "t"):
            t.bra = t.c
            if _kp_R1(t) and _kp_VX(t):
                _tr_del(t)
                return True
            _tr_rs(t, v)
        else:
            _tr_rs(t, v)
        if _tr_eqb(t, "ink"):
            t.bra = t.c
            t.s = t.s[:t.bra] + "ing" + t.s[t.ket:]
            return True
        _tr_rs(t, v)
        if _tr_eqb(t, "mp"):
            t.bra = t.c
            t.s = t.s[:t.bra] + "m" + t.s[t.ket:]
            return True
        _tr_rs(t, v)
        if _tr_eqb(t, "'"):
            t.bra = t.c
            if _kp_R1(t):
                _tr_del(t)
                return True
            _tr_rs(t, v)
        else:
            _tr_rs(t, v)
        t.bra = t.c
        if not (_kp_R1(t) and _kp_C(t)):
            return False
        _tr_del(t)
        return True
    if m == 2:
        if not _kp_R1(t):
            return False
        t.s = t.s[:t.bra] + "g" + t.s[t.ket:]
        return True
    if m == 3:
        if not _kp_R1(t):
            return False
        t.s = t.s[:t.bra] + "lijk" + t.s[t.ket:]
        return True
    if m == 4:
        if not _kp_R1(t):
            return False
        t.s = t.s[:t.bra] + "isch" + t.s[t.ket:]
        return True
    if m == 5:
        if not (_kp_R1(t) and _kp_C(t)):
            return False
        _tr_del(t)
        return True
    if m == 6:
        if not _kp_R1(t):
            return False
        t.s = t.s[:t.bra] + "t" + t.s[t.ket:]
        return True
    if m == 7:
        if not _kp_R1(t):
            return False
        t.s = t.s[:t.bra] + "s" + t.s[t.ket:]
        return True
    if m == 8:
        if not _kp_R1(t):
            return False
        t.s = t.s[:t.bra] + "r" + t.s[t.ket:]
        return True
    if m == 9:
        if not _kp_R1(t):
            return False
        _tr_del(t)
        t.s = t.s[:t.c] + "l" + t.s[t.c:]
        t.c += 1
        _kp_lengthen_V(t)
        return True
    if m == 10:
        if not (_kp_R1(t) and _kp_C(t)):
            return False
        _tr_del(t)
        t.s = t.s[:t.c] + "en" + t.s[t.c:]
        t.c += 2
        _kp_lengthen_V(t)
        return True
    # m == 11: ieve
    if not (_kp_R1(t) and _kp_C(t)):
        return False
    t.s = t.s[:t.bra] + "ief" + t.s[t.ket:]
    return True


def _kp_step3(t):
    t.ket = t.c
    m = _ar_sfx(t, (("heid", 3), ("fie", 7), ("gie", 8), ("atie", 1),
                    ("isme", 5), ("ing", 5), ("arij", 6), ("erij", 5),
                    ("sel", 3), ("rder", 4), ("ster", 3), ("iteit", 2),
                    ("dst", 10), ("tst", 9)))
    if not m:
        return False
    if m == 1:
        if not _kp_R1(t):
            return False
        t.s = t.s[:t.bra] + "eer" + t.s[t.ket:]
        return True
    if m == 2:
        if not _kp_R1(t):
            return False
        _tr_del(t)
        _kp_lengthen_V(t)
        return True
    if m == 3:
        if not _kp_R1(t):
            return False
        _tr_del(t)
        return True
    if m == 4:
        t.s = t.s[:t.bra] + "r" + t.s[t.ket:]
        return True
    if m == 5:
        if not _kp_R1(t):
            return False
        _tr_del(t)
        _kp_lengthen_V(t)
        return True
    if m == 6:
        if not (_kp_R1(t) and _kp_C(t)):
            return False
        t.s = t.s[:t.bra] + "aar" + t.s[t.ket:]
        return True
    if m == 7:
        if not _kp_R2(t):
            return False
        _tr_del(t)
        t.s = t.s[:t.c] + "f" + t.s[t.c:]
        t.c += 1
        _kp_lengthen_V(t)
        return True
    if m == 8:
        if not _kp_R2(t):
            return False
        _tr_del(t)
        t.s = t.s[:t.c] + "g" + t.s[t.c:]
        t.c += 1
        _kp_lengthen_V(t)
        return True
    if m == 9:
        if not (_kp_R1(t) and _kp_C(t)):
            return False
        t.s = t.s[:t.bra] + "t" + t.s[t.ket:]
        return True
    # m == 10
    if not (_kp_R1(t) and _kp_C(t)):
        return False
    t.s = t.s[:t.bra] + "d" + t.s[t.ket:]
    return True


def _kp_step4(t):
    v0 = _tr_sv(t)
    t.ket = t.c
    m = _ar_sfx(t, (("end", 10), ("atief", 2), ("erig", 10), ("achtig", 9),
                    ("ioneel", 1), ("baar", 3), ("laar", 5), ("naar", 4),
                    ("raar", 6), ("eriger", 10), ("achtiger", 9),
                    ("lijker", 8), ("tant", 7), ("erigst", 10),
                    ("achtigst", 9), ("lijkst", 8)))
    ok = False
    if m:
        if m == 1 and _kp_R1(t):
            t.s = t.s[:t.bra] + "ie" + t.s[t.ket:]
            ok = True
        elif m == 2 and _kp_R1(t):
            t.s = t.s[:t.bra] + "eer" + t.s[t.ket:]
            ok = True
        elif m == 3 and _kp_R1(t):
            _tr_del(t)
            ok = True
        elif m == 4 and _kp_R1(t) and _kp_V(t):
            t.s = t.s[:t.bra] + "n" + t.s[t.ket:]
            ok = True
        elif m == 5 and _kp_R1(t) and _kp_V(t):
            t.s = t.s[:t.bra] + "l" + t.s[t.ket:]
            ok = True
        elif m == 6 and _kp_R1(t) and _kp_V(t):
            t.s = t.s[:t.bra] + "r" + t.s[t.ket:]
            ok = True
        elif m == 7 and _kp_R1(t):
            t.s = t.s[:t.bra] + "teer" + t.s[t.ket:]
            ok = True
        elif m == 8 and _kp_R1(t):
            t.s = t.s[:t.bra] + "lijk" + t.s[t.ket:]
            ok = True
        elif m == 9 and _kp_R1(t):
            _tr_del(t)
            ok = True
        elif m == 10 and _kp_R1(t) and _kp_C(t):
            _tr_del(t)
            _kp_lengthen_V(t)
            ok = True
    if ok:
        return True
    _tr_rs(t, v0)
    t.ket = t.c
    m = _ar_sfx(t, (("ig", 1), ("iger", 1), ("igst", 1)))
    if not m or not (_kp_R1(t) and _kp_C(t)):
        return False
    _tr_del(t)
    _kp_lengthen_V(t)
    return True


def _kp_step7(t):
    t.ket = t.c
    m = _ar_sfx(t, (("ft", 2), ("kt", 1), ("pt", 3)))
    if not m:
        return False
    t.s = t.s[:t.bra] + {1: "k", 2: "f", 3: "p"}[m] + t.s[t.ket:]
    return True


def _kp_step6(t):
    t.ket = t.c
    s = t.s
    if s[-2:] in ("bb", "cc", "dd", "ff", "gg", "hh", "jj", "kk", "ll",
                  "mm", "nn", "pp", "qq", "rr", "ss", "tt", "vv", "ww",
                  "xx", "zz"):
        t.s = s[:-1]
        t.c = min(t.c, len(t.s))
        return True
    if s.endswith("v"):
        t.s = s[:-1] + "f"
        return True
    if s.endswith("z"):
        t.s = s[:-1] + "s"
        return True
    return False


def _kp_step1c(t):
    t.ket = t.c
    m = _ar_sfx(t, (("d", 1), ("t", 2)))
    if not m:
        return False
    if not (_kp_R1(t) and _kp_C(t)):
        return False
    v = _tr_sv(t)
    if m == 1:
        if _tr_eqb(t, "n") and _kp_R1(t):
            return False
        _tr_rs(t, v)
    else:
        if _tr_eqb(t, "h") and _kp_R1(t):
            return False
        _tr_rs(t, v)
    _tr_del(t)
    return True


def _kp_lose_prefix(t):
    s = t.s
    if not s.startswith("ge") or len(s) < 5:
        return False
    iv = 2
    n = len(s)
    while iv < n and s[iv] not in _KP_V:
        iv += 1
    if iv >= n:
        return False
    ic = iv
    while ic < n and s[ic] in _KP_V:
        ic += 1
    if ic >= n:
        return False
    t.s = s[2:]
    t.ge_removed = True
    return True


def _kp_lose_infix(t):
    s = t.s
    g = s.find("ge", 1)
    if g < 0:
        return False
    if g + 2 + 3 > len(s):
        return False
    iv = g + 2
    n = len(s)
    while iv < n and s[iv] not in _KP_V:
        iv += 1
    if iv >= n:
        return False
    ic = iv
    while ic < n and s[ic] in _KP_V:
        ic += 1
    if ic >= n:
        return False
    t.s = s[:g] + s[g + 2:]
    t.ge_removed = True
    return True


def kraaij_pohlmann_stem(word):
    """Kraaij-Pohlmann Dutch stemmer (``tartarus/snowball/ext/KpStemmer.
    java``; kp.sbl by Wessel Kraaij & Renee Pohlmann) — vocab-exact on all
    45,669 TestSnowballVocabData kraaij_pohlmann entries. Distinct from
    the standard Snowball Dutch stemmer (:func:`dutch_stem`)."""
    # prelude: mark consonant-y as Y (initial y, and y after a vowel)
    y_found = False
    chars = list(word)
    if chars and chars[0] == "y":
        chars[0] = "Y"
        y_found = True
    for k in range(1, len(chars)):
        if chars[k] == "y" and chars[k - 1] in _KP_V:
            chars[k] = "Y"
            y_found = True
    t = _KpCtx("".join(chars))
    _kp_measure(t)

    def run(step):
        t.c = len(t.s)
        if step(t):
            t.stemmed = True

    run(_kp_step1)
    run(_kp_step2)
    run(_kp_step3)
    run(_kp_step4)
    t.ge_removed = False
    if _kp_lose_prefix(t):
        _kp_measure(t)
    if t.ge_removed:
        t.c = len(t.s)
        _kp_step1c(t)
    t.ge_removed = False
    if _kp_lose_infix(t):
        _kp_measure(t)
    if t.ge_removed:
        t.c = len(t.s)
        _kp_step1c(t)
    run(_kp_step7)
    ge = t.ge_removed
    if t.stemmed or ge:
        t.c = len(t.s)
        _kp_step6(t)
    if y_found:
        t.s = t.s.replace("Y", "y")
    return t.s


# -------------------------------------------------------------- Lithuanian

#: Snowball Lithuanian (``tartarus/snowball/ext/LithuanianStemmer.java``):
#: noun/adjective case endings (step1, R1-limited) and connective endings
#: (step2, repeated), plus the č/dž/gd spelling fixes
_LT_STEP1 = (
    "tumeisi", "tumėmės", "tumėtės", "enimis", "iuosna", "siuosi",
    "telėti", "terėti", "tumeis", "tumėme", "tumėte", "čiausi",
    "enims", "eniui", "enyje", "enyse", "eriai", "erimi",
    "erims", "eryje", "eryse", "iamės", "iatės", "iauti",
    "inėti", "iomis", "iosna", "iuose", "iuosi", "iuoti",
    "kimės", "omÄs", "otÄs", "siesi", "simės", "sitės",
    "tumei", "tumėm", "tumėt", "uosna", "ėjosi", "aisi",
    "amės", "asis", "atės", "ausi", "auti", "eisi",
    "enie", "enio", "enis", "eniu", "enti", "enys",
    "eria", "erie", "erys", "iais", "iame", "iams",
    "iasi", "iate", "iaus", "iems", "iesi", "imis",
    "imės", "inti", "ioje", "ioms", "iose", "ioti",
    "iuje", "iumi", "iuos", "kite", "omis", "omės",
    "osna", "otės", "sime", "site", "tute", "tųsi",
    "uisi", "umis", "uose", "uosi", "uoti", "ysis",
    "ysna", "čiau", "ėmis", "ėmės", "ėsna", "ėtės",
    "ais", "ame", "ams", "asi", "ate", "aus",
    "ens", "enį", "ers", "erį", "erų", "esi",
    "iai", "iam", "ias", "iat", "iau", "iem",
    "ies", "imi", "ims", "ion", "ios", "isi",
    "ite", "iui", "iun", "ius", "iąs", "oje",
    "ome", "oms", "ose", "osi", "ote", "oti",
    "sim", "sit", "siu", "tum", "tųs", "uje",
    "umi", "ums", "uos", "usi", "yje", "yse",
    "yti", "ąsi", "ėje", "ėjo", "ėme", "ėms",
    "ėse", "ėsi", "ėte", "ėti", "ųsi", "ai",
    "am", "an", "as", "at", "au", "ei",
    "es", "ia", "ie", "im", "io", "is",
    "it", "iu", "ią", "ių", "ki", "oj",
    "om", "on", "os", "ot", "si", "ti",
    "ui", "un", "uo", "us", "ys", "ąs",
    "ėj", "ėm", "ėn", "ės", "ėt", "įs",
    "ūs", "a", "e", "i", "k", "o",
    "s", "u", "y", "ą", "ė", "ę",
    "į", "ų",
)

_LT_STEP2 = (
    "utėait", "siant", "uliuk", "učiuk", "iais", "iant",
    "iaus", "iuoj", "iuos", "iuot", "ykšt", "ykšč",
    "zgan", "ain", "ais", "ant", "auj", "aus",
    "dam", "dav", "esn", "iaj", "ias", "iau",
    "iej", "ies", "ing", "int", "ioj", "iok",
    "iop", "ios", "iuk", "iul", "iąj", "iąs",
    "išk", "iųj", "jam", "uoj", "uos", "uot",
    "ėję", "aj", "am", "oj", "ok", "op",
    "os", "ot", "sv", "yl", "yt", "ąj",
    "ąs", "ėj", "ėl", "ėt", "ęs", "šv",
    "ųj", "ę",
)

_LT_V = frozenset("aeiouyąėęįūų")
_LT_FIX = (
    ("ojime", "ojimas"), ("ėjime", "ėjimas"), ("avime", "avimas"),
    ("okate", "okatė"), ("aite", "aitė"), ("uote", "uotė"),
    ("asius", "asys"), ("okatės", "okatė"), ("aitės", "aitė"),
    ("uotės", "uotė"), ("esiu", "esys"),
)


def _lt_regions(word):
    n = len(word)
    i = 1 if n > 6 and word.startswith("a") else 0
    p1 = n
    while i < n and word[i] not in _LT_V:
        i += 1
    while i < n and word[i] in _LT_V:
        i += 1
    if i >= n:
        return n
    p1 = i + 1
    return p1


def lithuanian_stem(word):
    """Snowball Lithuanian (``ext/LithuanianStemmer.java``; lithuanian.sbl
    by Dainius Jocas) — matches the reference's TestLithuanianStemming
    goldens (372 word/stem pairs, tests/test_snowball.py)."""
    p1 = _lt_regions(word)
    # fix_conflicts
    for sfx, repl in _LT_FIX:
        if word.endswith(sfx):
            word = word[: len(word) - len(sfx)] + repl
            break
    # step1: longest case ending fitting within [p1:], delete
    if len(word) >= p1:
        for sfx in _LT_STEP1:
            if word.endswith(sfx) and len(word) - len(sfx) >= p1:
                word = word[: len(word) - len(sfx)]
                break
    # fix_chdz
    if word.endswith("č"):
        word = word[:-1] + "t"
    elif word.endswith("dž"):
        word = word[:-2] + "d"
    # step2: repeat removing connective endings within [p1:]
    while len(word) >= p1:
        for sfx in _LT_STEP2:
            if word.endswith(sfx) and len(word) - len(sfx) >= p1:
                word = word[: len(word) - len(sfx)]
                break
        else:
            break
    # fix_chdz again
    if word.endswith("č"):
        word = word[:-1] + "t"
    elif word.endswith("dž"):
        word = word[:-2] + "d"
    # fix_gd
    if word.endswith("gd"):
        word = word[:-2] + "g"
    return word


# -------------------------------------------------------------- Armenian

#: Snowball Armenian (``tartarus/snowball/ext/ArmenianStemmer.java``;
#: armenian.sbl by Astghik Mkrtchyan): delete-only suffix classes, all
#: matches limited to [pV:]; endings additionally require R2
_HY_ADJ = (
    "երորդ", "ական", "ավետ", "արան", "եկեն", "երեն",
    "լայն", "ովին", "որակ", "որէն", "վուն", "րորդ",
    "ալի", "ակի", "բար", "գին", "կոտ", "պես",
    "ատ", "եղ", "են", "ին", "իվ",
)
_HY_VERB = (
    "ացրինք", "վեցինք", "ալուց", "ացանք", "ացինք", "ացնալ",
    "ացվել", "ացրեց", "ացրին", "ացրիր", "ացրիք", "ելուց",
    "եցինք", "եցնել", "եցվել", "կոտել", "վեցին", "վեցիր",
    "վեցիք", "ալիս", "ալով", "ալու", "անալ", "ատել",
    "ացան", "ացավ", "ացար", "ացաք", "ացին", "ացիր",
    "ացիք", "ացրի", "ելիս", "ելով", "ելու", "ենալ",
    "եցավ", "եցար", "եցին", "եցիր", "եցիք", "ոտել",
    "վեցի", "վում", "ցանք", "ցնել", "անք", "ացա",
    "ացի", "եցա", "եցի", "ըալ", "ըել", "նել",
    "ում", "չել", "ված", "վել", "տել", "ցան",
    "ցաք", "ալ", "ան", "ավ", "ար", "աց",
    "աք", "ել", "եց", "վե", "ա",
)
_HY_NOUN = (
    "ություն", "մունք", "ալիք", "անակ", "անիք", "անօց",
    "ավոր", "արան", "եղէն", "յուն", "ուհի", "ույթ",
    "ույք", "ունք", "ուստ", "ստան", "վածք", "ածո",
    "արք", "գար", "ենք", "իչք", "յակ", "ոնք",
    "որդ", "ուկ", "ուս", "չեք", "պան", "վոր",
    "ակ", "ան", "իլ", "իկ", "իչ", "իք",
    "ոց", "ու", "ցի", "ք",
)
_HY_ENDING = (
    "ությանդ", "ությանը", "ությանն", "ությանս", "ներում", "ության",
    "անում", "երում", "ներին", "ներից", "ներով", "վանից",
    "անով", "երին", "երից", "երով", "ներդ", "ները",
    "ների", "ներն", "ոջից", "վանդ", "վանը", "վանս",
    "ամբ", "անդ", "անը", "երդ", "երը", "երի",
    "երն", "ներ", "ոջդ", "ոջը", "ոջս", "ուդ",
    "ուն", "ուց", "վան", "վից", "վով", "ցից",
    "ան", "եր", "ին", "ից", "ոջ", "ով",
    "ոց", "սա", "վա", "վի", "դ", "ը",
    "ի", "ն", "ց",
)
_HY_V = frozenset("\u0561\u0565\u0567\u0568\u056b\u0578\u0582\u0585")


def _hy_regions(word):
    n = len(word)
    pV = p2 = n
    i = 0
    while i < n and word[i] not in _HY_V:
        i += 1
    if i >= n:
        return pV, p2
    i += 1
    pV = i
    while i < n and word[i] in _HY_V:
        i += 1
    if i >= n:
        return pV, p2
    i += 1
    while i < n and word[i] not in _HY_V:
        i += 1
    if i >= n:
        return pV, p2
    i += 1
    while i < n and word[i] in _HY_V:
        i += 1
    if i >= n:
        return pV, p2
    i += 1
    return pV, i


def _hy_strip(word, table, lo):
    for sfx in table:
        if word.endswith(sfx) and len(word) - len(sfx) >= lo:
            return word[: len(word) - len(sfx)]
    return word


def armenian_stem(word):
    """Snowball Armenian (``ext/ArmenianStemmer.java``) — reference
    TestArmenianAnalyzer goldens pinned in tests/test_snowball.py."""
    pV, p2 = _hy_regions(word)
    if len(word) < pV:
        return word
    word = _hy_strip(word, _HY_ENDING, max(pV, p2))
    word = _hy_strip(word, _HY_VERB, pV)
    word = _hy_strip(word, _HY_ADJ, pV)
    word = _hy_strip(word, _HY_NOUN, pV)
    return word


# -------------------------------------------------------------- Catalan

#: Snowball Catalan (``tartarus/snowball/ext/CatalanStemmer.java``;
#: catalan.sbl by Israel Olalla): (suffix, case) tables — longest match,
#: then the case condition (no among fall-back; conditions live outside)
_CA_PRONOUN = (
    ("selas", 1), ("selos", 1), ("-les", 1), ("-nos", 1), ("sela", 1),
    ("selo", 1), ("'hi", 1), ("'ho", 1), ("'ls", 1), ("'ns", 1),
    ("-la", 1), ("-li", 1), ("-ls", 1), ("-me", 1), ("-ns", 1),
    ("-te", 1), ("-us", 1), ("ens", 1), ("las", 1), ("les", 1),
    ("los", 1), ("nos", 1), ("vos", 1), ("'l", 1), ("'m", 1),
    ("'n", 1), ("'s", 1), ("'t", 1), ("-m", 1), ("-n", 1),
    ("hi", 1), ("ho", 1), ("la", 1), ("le", 1), ("li", 1),
    ("lo", 1), ("me", 1), ("se", 1), ("us", 1),
)
_CA_STANDARD = (
    ("allengües", 1), ("ativitats", 1), ("quíssimes", 5), ("ativitat", 1), ("bilitats", 1),
    ("ialismes", 1), ("ialistes", 1), ("ionistes", 1), ("lógiques", 3), ("quíssima", 5),
    ("quíssims", 5), ("atòries", 1), ("bilitat", 1), ("ialisme", 1), ("ialista", 1),
    ("ionisme", 1), ("ionista", 1), ("isament", 1), ("ivitats", 1), ("quíssim", 5),
    ("íssimes", 1), ("acions", 2), ("aments", 1), ("ancies", 1), ("atives", 1),
    ("atòria", 1), ("encies", 1), ("formes", 1), ("idores", 1), ("ificar", 1),
    ("ivisme", 1), ("ivitat", 1), ("logies", 3), ("logíes", 3), ("lógica", 3),
    ("lógics", 3), ("ències", 1), ("íssima", 1), ("íssims", 1), ("ables", 1),
    ("adora", 1), ("adors", 1), ("adura", 1), ("ament", 1), ("ancia", 1),
    ("asses", 1), ("assos", 1), ("atius", 1), ("ativa", 1), ("cions", 1),
    ("doras", 1), ("dores", 1), ("dures", 1), ("encia", 1), ("eries", 1),
    ("ibles", 1), ("ictes", 1), ("idors", 1), ("inies", 1), ("iques", 4),
    ("ismes", 1), ("issem", 1), ("isseu", 1), ("issos", 1), ("istes", 1),
    ("itats", 1), ("itzar", 1), ("logia", 3), ("logis", 3), ("logía", 3),
    ("ments", 1), ("sfera", 1), ("toris", 1), ("trius", 1), ("àries", 1),
    ("ència", 1), ("ìssem", 1), ("ìsseu", 1), ("ìssin", 1), ("ícies", 1),
    ("íinia", 1), ("ínies", 1), ("íssem", 1), ("ísseu", 1), ("íssim", 1),
    ("íssiu", 1), ("ístic", 1), ("ívola", 1), ("ïtats", 1), ("able", 1),
    ("ació", 1), ("ades", 2), ("aire", 1), ("alla", 1), ("amen", 1),
    ("ants", 1), ("aris", 1), ("assa", 1), ("atge", 1), ("atiu", 1),
    ("bles", 1), ("dora", 1), ("dors", 1), ("egar", 1), ("ejar", 1),
    ("ella", 1), ("ells", 1), ("enca", 1), ("ents", 1), ("eres", 1),
    ("eria", 1), ("eses", 1), ("esos", 1), ("essa", 1), ("ible", 1),
    ("icis", 1), ("icte", 1), ("ient", 1), ("imes", 1), ("ines", 1),
    ("inia", 1), ("ions", 1), ("isam", 1), ("isme", 1), ("issa", 1),
    ("ista", 1), ("iste", 1), ("itar", 1), ("itat", 1), ("ites", 1),
    ("ives", 1), ("logi", 3), ("ment", 1), ("nces", 1), ("ores", 1),
    ("oses", 1), ("osos", 1), ("otes", 1), ("tori", 1), ("triu", 1),
    ("ària", 1), ("ícia", 1), ("ícis", 1), ("ívol", 1), ("ïtat", 1),
    ("ada", 2), ("all", 1), ("als", 1), ("ana", 1), ("ant", 1),
    ("ari", 1), ("ats", 1), ("ble", 1), ("ció", 1), ("dor", 1),
    ("dur", 1), ("dís", 1), ("ell", 1), ("enc", 1), ("ent", 1),
    ("era", 1), ("ers", 1), ("esa", 1), ("esc", 1), ("eta", 1),
    ("ets", 1), ("fer", 1), ("ica", 4), ("ici", 1), ("ics", 4),
    ("ima", 1), ("ims", 1), ("ina", 1), ("ita", 1), ("ius", 1),
    ("iva", 1), ("nça", 1), ("ora", 1), ("ors", 1), ("osa", 1),
    ("ota", 1), ("ots", 1), ("uds", 1), ("uts", 1), ("íci", 1),
    ("al", 1), ("ar", 1), ("et", 1), ("ic", 4), ("il", 1),
    ("ió", 1), ("ls", 1), ("or", 1), ("ot", 1), ("ud", 1),
    ("ès", 1), ("és", 1), ("ís", 1), ("ós", 1), ("ó", 1),
)
_CA_VERB = (
    ("aríamos", 1), ("eresseu", 1), ("eríamos", 1), ("iríamos", 1), ("iéramos", 1),
    ("iésemos", 1), ("adores", 1), ("aremos", 1), ("aríais", 1), ("asteis", 1),
    ("eremos", 1), ("eríais", 1), ("esquen", 1), ("esques", 1), ("esquin", 1),
    ("esquis", 1), ("ierais", 1), ("ieseis", 1), ("iremos", 1), ("iríais", 1),
    ("isquen", 1), ("isteis", 1), ("ábamos", 1), ("áramos", 1), ("ásemos", 1),
    ("ïsquen", 1), ("ïsques", 1), ("abais", 1), ("adora", 1), ("adors", 1),
    ("arais", 1), ("arian", 1), ("arien", 1), ("aries", 1), ("aréis", 1),
    ("arían", 1), ("arías", 1), ("aríem", 1), ("aríeu", 1), ("aseis", 1),
    ("assen", 1), ("asses", 1), ("asseu", 1), ("assim", 1), ("assin", 1),
    ("assis", 1), ("assiu", 1), ("atges", 1), ("eixen", 1), ("eixer", 1),
    ("eixes", 1), ("eixin", 1), ("eixis", 1), ("erass", 1), ("eréis", 1),
    ("erían", 1), ("erías", 1), ("esqui", 1), ("essen", 1), ("esses", 1),
    ("esseu", 1), ("essim", 1), ("essin", 1), ("essis", 1), ("iendo", 1),
    ("ieran", 1), ("ieras", 1), ("ieron", 1), ("iesen", 1), ("ieses", 1),
    ("iguem", 1), ("igueu", 1), ("irien", 1), ("iries", 1), ("iréis", 1),
    ("irìem", 1), ("irìeu", 1), ("irían", 1), ("irías", 1), ("iríem", 1),
    ("iríeu", 1), ("issen", 1), ("isses", 1), ("issim", 1), ("issin", 1),
    ("issis", 1), ("issiu", 1), ("itzeu", 1), ("itzis", 1), ("àssem", 1),
    ("àsseu", 1), ("àssim", 1), ("àssiu", 1), ("èssim", 1), ("èssiu", 1),
    ("éssem", 1), ("éssen", 1), ("ésseu", 1), ("éssim", 1), ("éssiu", 1),
    ("íamos", 1), ("íssim", 1), ("íssiu", 1), ("ïguem", 1), ("ïgueu", 1),
    ("ïssen", 1), ("ïsses", 1), ("ïssin", 1), ("ïssis", 1), ("aban", 1),
    ("abas", 1), ("adas", 1), ("ades", 1), ("ador", 1), ("ados", 1),
    ("amos", 1), ("ando", 2), ("aran", 1), ("aras", 1), ("arem", 1),
    ("aren", 1), ("ares", 1), ("areu", 1), ("aria", 1), ("aron", 1),
    ("aràs", 1), ("arán", 1), ("arás", 1), ("arés", 1), ("aría", 1),
    ("asen", 1), ("ases", 1), ("aste", 1), ("avem", 1), ("aven", 1),
    ("aves", 1), ("eixi", 1), ("eixo", 1), ("ents", 1), ("erau", 1),
    ("eren", 1), ("erán", 1), ("erás", 1), ("ería", 1), ("esca", 1),
    ("idas", 1), ("ides", 1), ("idos", 1), ("iera", 1), ("iese", 1),
    ("imos", 1), ("ineu", 1), ("inin", 1), ("inis", 1), ("iran", 1),
    ("irem", 1), ("iren", 1), ("ires", 1), ("ireu", 1), ("iria", 1),
    ("iràs", 1), ("irán", 1), ("irás", 1), ("iría", 1), ("isca", 1),
    ("isin", 1), ("isis", 1), ("iste", 1), ("itza", 1), ("itzi", 1),
    ("itzo", 1), ("itzà", 1), ("ixen", 1), ("ixes", 1), ("ques", 1),
    ("tzar", 1), ("udes", 1), ("àrem", 1), ("àren", 1), ("àreu", 1),
    ("àvem", 1), ("àveu", 1), ("ávem", 1), ("áveu", 1), ("íais", 1),
    ("írem", 1), ("íreu", 1), ("ïdes", 1), ("ïren", 1), ("ïres", 1),
    ("ïsca", 1), ("ïxen", 1), ("ïxes", 1), ("aba", 1), ("ada", 1),
    ("ado", 1), ("ams", 1), ("ant", 1), ("ara", 1), ("arà", 1),
    ("ará", 1), ("aré", 1), ("ase", 1), ("ass", 1), ("ats", 1),
    ("ava", 1), ("dre", 1), ("eix", 1), ("ent", 1), ("erá", 1),
    ("eré", 1), ("ess", 1), ("ida", 1), ("ido", 1), ("ids", 1),
    ("ien", 1), ("ies", 1), ("ieu", 1), ("ini", 1), ("int", 1),
    ("ira", 1), ("irà", 1), ("irá", 1), ("irè", 1), ("iré", 1),
    ("isc", 1), ("its", 1), ("itz", 1), ("ixa", 1), ("ixo", 1),
    ("iïn", 1), ("iïs", 1), ("sin", 1), ("sis", 1), ("uda", 1),
    ("áis", 1), ("ìeu", 1), ("ían", 1), ("ías", 1), ("íem", 1),
    ("íeu", 1), ("ïda", 1), ("ïen", 1), ("ïes", 1), ("ïra", 1),
    ("ïsc", 1), ("ïxo", 1), ("ad", 1), ("am", 1), ("an", 1),
    ("ar", 1), ("as", 1), ("at", 1), ("au", 1), ("ed", 1),
    ("em", 1), ("en", 1), ("er", 1), ("es", 1), ("ia", 1),
    ("id", 1), ("ie", 1), ("ii", 1), ("in", 1), ("io", 1),
    ("ir", 1), ("it", 1), ("ix", 1), ("ià", 1), ("iï", 1),
    ("ió", 1), ("re", 1), ("ut", 1), ("às", 1), ("és", 1),
    ("ía", 1), ("ís", 1), ("ïa", 1), ("ïm", 1), ("ït", 1),
    ("ïu", 1), ("ïx", 1), ("í", 1),
)
_CA_RESIDUAL = (
    ("iqu", 2), ("itz", 1), ("eu", 1), ("ir", 1), ("is", 1),
    ("it", 1), ("iu", 1), ("os", 1), ("ïn", 1), ("ïs", 1),
    ("a", 1), ("e", 1), ("i", 1), ("o", 1), ("s", 1),
    ("à", 1), ("á", 1), ("é", 1), ("ì", 1), ("í", 1),
    ("ï", 1), ("ó", 1),
)
_CA_V = frozenset("aeiou\u00e0\u00e1\u00e8\u00e9\u00ed\u00ef\u00f2\u00f3\u00fa\u00fc")
_CA_CLEAN = str.maketrans({
    "\u00e0": "a", "\u00e1": "a", "\u00e8": "e", "\u00e9": "e",
    "\u00ec": "i", "\u00ed": "i", "\u00ef": "i", "\u00f2": "o",
    "\u00f3": "o", "\u00fa": "u", "\u00fc": "u", "\u00b7": ".",
})


def _ca_match(word, table, p1, p2):
    """Longest suffix + case condition; returns (new_word, matched)."""
    best, blen = 0, 0
    for sfx, case in table:
        n = len(sfx)
        if n > blen and word.endswith(sfx):
            best, blen = case, n
    if not best:
        return word, False
    cut = len(word) - blen
    if best in (1, 5):          # R1 conditions
        if cut < p1:
            return word, False
    else:                       # R2 conditions (cases 2, 3, 4)
        if cut < p2:
            return word, False
    repl = {1: "", 2: "", 3: "log", 4: "ic", 5: "c"}[best]
    return word[:cut] + repl, True


def catalan_stem(word):
    """Snowball Catalan (``ext/CatalanStemmer.java``) — reference
    TestCatalanAnalyzer goldens pinned in tests/test_snowball.py."""
    p1, p2 = _r12_std(word, _CA_V)
    # attached_pronoun: case 1 = R1 delete
    best = 0
    for sfx, _c in _CA_PRONOUN:
        if len(sfx) > best and word.endswith(sfx):
            best = len(sfx)
    if best and len(word) - best >= p1:
        word = word[: len(word) - best]
    # standard_suffix or verb_suffix
    new, ok = _ca_match(word, _CA_STANDARD, p1, p2)
    if ok:
        word = new
    else:
        # verb: case 1 = R1 delete, case 2 = R2 delete
        vbest, vlen = 0, 0
        for sfx, case in _CA_VERB:
            n = len(sfx)
            if n > vlen and word.endswith(sfx):
                vbest, vlen = case, n
        if vbest:
            cut = len(word) - vlen
            if (vbest == 1 and cut >= p1) or (vbest == 2 and cut >= p2):
                word = word[:cut]
    # residual: case 1 = R1 delete, case 2 = R1 -> "ic"
    rbest, rlen = 0, 0
    for sfx, case in _CA_RESIDUAL:
        n = len(sfx)
        if n > rlen and word.endswith(sfx):
            rbest, rlen = case, n
    if rbest and len(word) - rlen >= p1:
        word = word[: len(word) - rlen] + ("ic" if rbest == 2 else "")
    return word.translate(_CA_CLEAN)


# -------------------------------------------------------------- Basque

#: Snowball Basque (``tartarus/snowball/ext/BasqueStemmer.java``;
#: basque.sbl by Olatz Perez de Vinaspre & Mans Hulden): repeat(aditzak);
#: repeat(izenak); do(adjetiboak) — (suffix, case) longest-match tables
_EU_ADITZAK = (
    ("arabera", 4), ("atseden", 3), ("tzailea", 1), ("aldatu", 1), ("baditu", 5),
    ("erreza", 1), ("gailua", 1), ("gaitza", 1), ("garria", 2), ("kaitza", 1),
    ("karria", 1), ("kizuna", 1), ("kundea", 1), ("kuntza", 1), ("tailea", 1),
    ("taldia", 1), ("tarazi", 1), ("tezina", 1), ("tzaile", 1), ("aldia", 1),
    ("arazi", 1), ("bidea", 1), ("errez", 1), ("etari", 1), ("ezina", 1),
    ("gailu", 1), ("gaitz", 1), ("galea", 1), ("garri", 2), ("gunea", 1),
    ("kaitz", 1), ("karia", 1), ("karri", 1), ("kidea", 1), ("kizun", 1),
    ("korra", 1), ("kunde", 1), ("kunea", 1), ("pidea", 1), ("rekin", 1),
    ("taile", 1), ("taldi", 1), ("tezin", 1), ("tzaga", 1), ("tzaka", 1),
    ("tzake", 1), ("tzeke", 1), ("aldi", 1), ("atze", 1), ("bera", 1),
    ("bide", 1), ("dako", 1), ("dura", 1), ("etan", 1), ("ezin", 1),
    ("gaia", 1), ("gale", 1), ("gune", 1), ("gura", 1), ("idea", 1),
    ("kari", 1), ("kera", 1), ("keta", 1), ("kide", 1), ("kina", 1),
    ("kuna", 1), ("kune", 1), ("kura", 1), ("lari", 1), ("mena", 1),
    ("orra", 1), ("pena", 1), ("pera", 1), ("pide", 1), ("rean", 1),
    ("tari", 1), ("tatu", 1), ("tuna", 1), ("tura", 1), ("tzat", 1),
    ("tzez", 1), ("ago", 1), ("ari", 1), ("atu", 1), ("ean", 1),
    ("era", 1), ("eta", 1), ("eza", 1), ("gai", 1), ("ide", 1),
    ("kan", 1), ("kin", 1), ("kor", 1), ("men", 1), ("pen", 1),
    ("tio", 1), ("tun", 1), ("tza", 2), ("tze", 1), ("an", 1),
    ("du", 1), ("ez", 1), ("go", 1), ("ka", 1), ("ki", 1),
    ("la", 1), ("le", 1), ("or", 1), ("tu", 1),
)
_EU_IZENAK = (
    ("minutuko", 6), ("garrena", 1), ("gerrena", 1), ("aurrea", 1), ("garren", 1),
    ("garria", 2), ("gerren", 1), ("gibela", 1), ("gintza", 1), ("gintzo", 1),
    ("gintzu", 1), ("handia", 1), ("kaldea", 1), ("kintza", 1), ("kirria", 1),
    ("koitza", 1), ("kondoa", 1), ("kuntza", 1), ("larria", 1), ("mendia", 1),
    ("mendua", 1), ("mentua", 1), ("ontzia", 1), ("taldea", 1), ("taldia", 1),
    ("tariko", 1), ("tasuna", 1), ("tzaina", 1), ("tzalea", 1), ("tzarra", 1),
    ("urrena", 1), ("zionea", 1), ("aizun", 1), ("aldea", 1), ("aldia", 1),
    ("antza", 1), ("artea", 1), ("asuna", 1), ("aurka", 10), ("aurre", 1),
    ("behar", 1), ("bizia", 1), ("burua", 1), ("degia", 1), ("denda", 1),
    ("duria", 1), ("durua", 1), ("eroza", 1), ("estua", 1), ("etako", 1),
    ("etara", 1), ("etxea", 1), ("gabea", 1), ("garna", 1), ("garri", 2),
    ("geldi", 8), ("gibel", 1), ("gilea", 1), ("gunea", 1), ("handi", 1),
    ("igaro", 9), ("kabea", 1), ("kaila", 1), ("kalde", 1), ("karia", 1),
    ("keria", 1), ("kirri", 1), ("koitz", 1), ("kondo", 1), ("korra", 1),
    ("kotea", 1), ("kumea", 1), ("laria", 1), ("larri", 1), ("lekua", 1),
    ("liara", 1), ("mendi", 1), ("mendu", 1), ("mentu", 1), ("nahia", 1),
    ("ondoa", 1), ("ontzi", 1), ("ordea", 1), ("ordua", 1), ("ostea", 1),
    ("skila", 1), ("takoa", 1), ("talde", 1), ("taldi", 1), ("taria", 1),
    ("tarik", 1), ("taroa", 1), ("tasun", 1), ("tegia", 1), ("teria", 1),
    ("tiara", 1), ("tokia", 1), ("trako", 5), ("tzain", 1), ("tzale", 1),
    ("tzara", 1), ("urren", 1), ("zaina", 1), ("zalea", 1), ("zaroa", 1),
    ("zehar", 7), ("zinoa", 1), ("zione", 1), ("alde", 1), ("aldi", 1),
    ("anda", 1), ("anga", 1), ("aria", 1), ("aroa", 1), ("arte", 1),
    ("asia", 1), ("asun", 1), ("bera", 1), ("buru", 2), ("dara", 1),
    ("degi", 1), ("duna", 1), ("duri", 1), ("duru", 1), ("egia", 1),
    ("emea", 1), ("enea", 1), ("eria", 1), ("eroa", 1), ("eroz", 1),
    ("estu", 1), ("etan", 1), ("etxe", 1), ("ezia", 1), ("gabe", 1),
    ("gaia", 1), ("geia", 1), ("gela", 1), ("gile", 1), ("giro", 1),
    ("gune", 1), ("joka", 3), ("kabe", 1), ("kada", 1), ("kail", 1),
    ("kana", 1), ("kari", 1), ("kera", 1), ("keta", 1), ("kide", 1),
    ("kina", 1), ("koia", 1), ("kote", 1), ("kume", 1), ("lari", 1),
    ("leku", 1), ("liar", 1), ("mina", 1), ("nahi", 1), ("ngoa", 1),
    ("ohia", 1), ("ondo", 1), ("orde", 1), ("ordu", 1), ("oroa", 1),
    ("osoa", 1), ("oste", 1), ("pera", 1), ("tako", 1), ("tara", 1),
    ("tari", 1), ("taro", 1), ("tatu", 4), ("tegi", 1), ("tiar", 1),
    ("tila", 1), ("toki", 1), ("tsua", 1), ("ttoa", 1), ("tuko", 1),
    ("txoa", 1), ("txua", 1), ("tzar", 1), ("tzen", 4), ("tzoa", 1),
    ("tzua", 1), ("unea", 1), ("zain", 1), ("zale", 1), ("zaro", 1),
    ("zino", 1), ("zioa", 1), ("zkoa", 1), ("ztoa", 1), ("ada", 1),
    ("ail", 1), ("ara", 1), ("ari", 1), ("aro", 1), ("asi", 1),
    ("dar", 1), ("dua", 1), ("dun", 1), ("egi", 1), ("eko", 1),
    ("eme", 1), ("ena", 1), ("ero", 1), ("eta", 1), ("eza", 1),
    ("gai", 1), ("gei", 1), ("goi", 1), ("kan", 1), ("ket", 1),
    ("kia", 1), ("kin", 1), ("koa", 1), ("koi", 1), ("kor", 1),
    ("min", 1), ("nea", 1), ("ngo", 1), ("noa", 1), ("ohi", 1),
    ("oia", 1), ("ola", 1), ("ora", 2), ("oro", 1), ("osa", 1),
    ("oso", 1), ("pea", 1), ("ren", 2), ("ska", 1), ("sko", 1),
    ("sta", 1), ("tan", 1), ("tar", 1), ("tea", 1), ("ten", 4),
    ("tia", 1), ("toa", 1), ("tra", 1), ("tsu", 1), ("tto", 1),
    ("tua", 1), ("txo", 1), ("txu", 1), ("tza", 2), ("tzo", 1),
    ("tzu", 1), ("una", 1), ("une", 1), ("xka", 1), ("zio", 1),
    ("zka", 1), ("zko", 1), ("zto", 1), ("zua", 1), ("ñoa", 1),
    ("ak", 1), ("ar", 1), ("di", 1), ("du", 1), ("ek", 1),
    ("en", 4), ("ez", 1), ("ga", 1), ("ge", 1), ("go", 1),
    ("ka", 1), ("ki", 1), ("ko", 1), ("na", 1), ("ne", 1),
    ("no", 1), ("oi", 1), ("or", 2), ("os", 1), ("pe", 1),
    ("ra", 1), ("ro", 1), ("sa", 1), ("ta", 1), ("te", 1),
    ("ti", 1), ("to", 1), ("tu", 1), ("tz", 1), ("za", 1),
    ("zp", 1), ("zu", 1), ("ñi", 1), ("ño", 1), ("z", 1),
)
_EU_ADJ = (
    ("keria", 1), ("lanik", 1), ("larik", 1), ("dade", 1), ("date", 1),
    ("tade", 1), ("tate", 1), ("zlea", 2), ("ztik", 1), ("era", 1),
    ("ero", 1), ("rik", 1), ("gi", 1), ("go", 1), ("ik", 1),
    ("ki", 1), ("la", 1), ("ro", 1), ("to", 1),
)
_EU_V = frozenset("aeiou")
_EU_ADITZAK_REPL = {3: "atseden", 4: "arabera", 5: "baditu"}
_EU_IZENAK_REPL = {3: "jok", 5: "tra", 6: "minutu", 7: "zehar",
                   8: "geldi", 9: "igaro", 10: "aurka"}


def _eu_match(word, table, pV, p1, p2, repls):
    """Longest suffix, then case: 1=RV delete, 2=R2 delete, 4=R1 delete,
    others=unconditional replacement. Returns (word, matched)."""
    best, blen = 0, 0
    for sfx, case in table:
        n = len(sfx)
        if n > blen and word.endswith(sfx):
            best, blen = case, n
    if not best:
        return word, False
    cut = len(word) - blen
    if best == 1:
        if cut < pV:
            return word, False
        return word[:cut], True
    if best == 2:
        if cut < p2:
            return word, False
        return word[:cut], True
    if best == 4:
        if cut < p1:
            return word, False
        return word[:cut], True
    return word[:cut] + repls[best], True


def basque_stem(word):
    """Snowball Basque (``ext/BasqueStemmer.java``) — reference
    TestBasqueAnalyzer goldens pinned in tests/test_snowball.py."""
    pV = _rv_std(word, _EU_V)
    p1, p2 = _r12_std(word, _EU_V)
    while True:
        word, ok = _eu_match(word, _EU_ADITZAK, pV, p1, p2,
                             _EU_ADITZAK_REPL)
        if not ok:
            break
    while True:
        word, ok = _eu_match(word, _EU_IZENAK, pV, p1, p2,
                             _EU_IZENAK_REPL)
        if not ok:
            break
    word, _ok = _eu_match(word, _EU_ADJ, pV, p1, p2, {2: "z"})
    return word


# -------------------------------------------------------------- Irish

#: Snowball Irish (``tartarus/snowball/ext/IrishStemmer.java``; irish.sbl
#: by Jim O'Regan): forward prefix de-mutation, then noun / deriv / verb
#: suffix passes
_GA_PREFIX = (
    ("d'fh", "f"), ("bhf", "b"), ("b'", ""), ("d'", ""), ("m'", ""),
    ("h-", ""), ("n-", ""), ("t-", ""),
    ("bh", "b"), ("bp", "p"), ("ch", "c"), ("dh", "d"), ("dt", "t"),
    ("fh", "f"), ("gc", "c"), ("gh", "g"), ("mb", "b"), ("mh", "m"),
    ("nd", "d"), ("ng", "g"), ("ph", "p"), ("sh", "s"), ("th", "t"),
    ("ts", "s"),
)
_GA_NOUN = (
    ("aíochta", 1), ("íochta", 1), ("aíocht", 1), ("íocht", 1),
    ("eabh", 1), ("aibh", 1), ("eamh", 1), ("aimh", 1), ("aire", 2),
    ("airí", 2), ("abh", 1), ("ibh", 1), ("amh", 1), ("imh", 1),
    ("ire", 2), ("irí", 2),
)
_GA_DERIV = (
    ("grafaíochtaí", 4), ("grafaíochta", 4), ("grafaíocht", 4),
    ("grafaíoch", 4), ("óideacha", 6), ("arcachtaí", 2), ("arcachta", 2),
    ("patacha", 5), ("óideach", 6), ("gineach", 3), ("achtúil", 1),
    ("eachtúil", 1), ("arcacht", 2), ("pataigh", 5), ("achta", 1),
    ("eachta", 1), ("paite", 5), ("patach", 5), ("óidigh", 6),
    ("gineas", 3), ("eacht", 1), ("ginis", 3), ("acht", 1), ("each", 1),
    ("ach", 1),
)
_GA_DERIV_REPL = {2: "arc", 3: "gin", 4: "graf", 5: "paite", 6: "óid"}
_GA_VERB = (
    ("aimid", 1), ("aímid", 1), ("faidh", 1), ("imid", 1), ("ímid", 1),
    ("eadh", 2), ("fidh", 1), ("tear", 2), ("adh", 2), ("áil", 2),
    ("ain", 2), ("tar", 2),
)
_GA_V = frozenset("aeiouáéíóú")


def irish_stem(word):
    """Snowball Irish (``ext/IrishStemmer.java``) — reference
    TestIrishAnalyzer goldens pinned in tests/test_snowball.py."""
    for pfx, repl in _GA_PREFIX:
        if word.startswith(pfx):
            word = repl + word[len(pfx):]
            break
    n = len(word)
    i = 0
    while i < n and word[i] not in _GA_V:
        i += 1
    pV = i + 1 if i < n else n
    p1, p2 = _r12_std(word, _GA_V)
    # noun_sfx: 1 = R1 delete, 2 = R2 delete
    best, blen = 0, 0
    for sfx, case in _GA_NOUN:
        m = len(sfx)
        if m > blen and word.endswith(sfx):
            best, blen = case, m
    if best:
        cut = len(word) - blen
        if (best == 1 and cut >= p1) or (best == 2 and cut >= p2):
            word = word[:cut]
    # deriv: 1 = R2 delete, others unconditional replacement
    best, blen = 0, 0
    for sfx, case in _GA_DERIV:
        m = len(sfx)
        if m > blen and word.endswith(sfx):
            best, blen = case, m
    if best:
        cut = len(word) - blen
        if best == 1:
            if cut >= p2:
                word = word[:cut]
        else:
            word = word[:cut] + _GA_DERIV_REPL[best]
    # verb_sfx: 1 = RV delete, 2 = R1 delete
    best, blen = 0, 0
    for sfx, case in _GA_VERB:
        m = len(sfx)
        if m > blen and word.endswith(sfx):
            best, blen = case, m
    if best:
        cut = len(word) - blen
        if (best == 1 and cut >= pV) or (best == 2 and cut >= p1):
            word = word[:cut]
    return word
