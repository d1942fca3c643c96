"""Language analysis packs: German and French analyzer chains.

Mirrors the reference analyzers' semantics (NOT their token-filter
plumbing):

- German (``analysis/common/.../de/GermanAnalyzer.java:133-139``):
  tokenize → lowercase → stop(German) → [keyword marker] →
  GermanNormalizationFilter → GermanLightStemFilter.
  * :func:`german_normalize` — the 3-state FSM of
    ``de/GermanNormalizationFilter.java:41-105`` (ß→ss, umlaut folding,
    ae/oe→a/o always, ue→u when not preceded by a vowel or q).
  * :func:`german_light_stem` — the UniNE light stemmer of
    ``de/GermanLightStemmer.java:65-140`` (Savoy 2006: accent fold +
    two plural/case-suffix strip steps with valid s/st endings).

- French (``analysis/common/.../fr/FrenchAnalyzer.java:137-144``):
  tokenize → elision(articles) → lowercase → stop(French) →
  [keyword marker] → FrenchLightStemFilter.
  * :func:`french_elide` — ``util/ElisionFilter.java`` with
    ``FrenchAnalyzer.DEFAULT_ARTICLES`` (l, m, t, qu, n, s, j, d, c,
    jusqu, quoiqu, lorsqu, puisqu; case-insensitive). NOTE: the engine's
    tokenizers split at apostrophes (``l'avion`` → ``l``, ``avion``), so
    elision only fires on tokens that still carry an apostrophe; the
    article fragments it would strip are covered by the French stopword
    list instead (positions differ from Lucene's single-token treatment
    by one hole — documented divergence).
  * :func:`french_light_stem` — the UniNE light stemmer of
    ``fr/FrenchLightStemmer.java:66-265`` transcribed branch-for-branch
    (including the fall-through ``trice``/``ète``/``ique`` steps and the
    ``norm()`` tail: accent fold, adjacent-duplicate collapse, ie/r/e/e
    strip, final double-letter strip).

Stopword lists are the snowball data lists the reference loads
(``analysis/snowball/{german,french}_stop.txt``).
"""

from __future__ import annotations

GERMAN_STOP_WORDS = frozenset("""
aber alle allem allen aller alles als also am an ander andere anderem anderen
anderer anderes anderm andern anderr anders auch auf aus bei bin bis bist da
damit dann der den des dem die das daß derselbe derselben denselben desselben
demselben dieselbe dieselben dasselbe dazu dein deine deinem deinen deiner
deines denn derer dessen dich dir du dies diese diesem diesen dieser dieses
doch dort durch ein eine einem einen einer eines einig einige einigem einigen
einiger einiges einmal er ihn ihm es etwas euer eure eurem euren eurer eures
für gegen gewesen hab habe haben hat hatte hatten hier hin hinter ich mich mir
ihr ihre ihrem ihren ihrer ihres euch im in indem ins ist jede jedem jeden
jeder jedes jene jenem jenen jener jenes jetzt kann kein keine keinem keinen
keiner keines können könnte machen man manche manchem manchen mancher manches
mein meine meinem meinen meiner meines mit muss musste nach nicht nichts noch
nun nur ob oder ohne sehr sein seine seinem seinen seiner seines selbst sich
sie ihnen sind so solche solchem solchen solcher solches soll sollte sondern
sonst über um und uns unse unsem unsen unser unses unter viel vom von vor
während war waren warst was weg weil weiter welche welchem welchen welcher
welches wenn werde werden wie wieder will wir wird wirst wo wollen wollte
würde würden zu zum zur zwar zwischen
""".split())

FRENCH_STOP_WORDS = frozenset("""
au aux avec ce ces dans de des du elle en et eux il je la le leur lui ma mais
me même mes moi mon ne nos notre nous on ou par pas pour qu que qui sa se ses
son sur ta te tes toi ton tu un une vos votre vous c d j l à m n s t y été
étée étées étés étant suis es est sommes êtes sont serai seras sera serons
serez seront serais serait serions seriez seraient étais était étions étiez
étaient fus fut fûmes fûtes furent sois soit soyons soyez soient fusse fusses
fût fussions fussiez fussent ayant eu eue eues eus ai as avons avez ont aurai
auras aura aurons aurez auront aurais aurait aurions auriez auraient avais
avait avions aviez avaient eut eûmes eûtes eurent aie aies ait ayons ayez
aient eusse eusses eût eussions eussiez eussent ceci cela celà cet cette ici
ils les leurs quel quels quelle quelles sans soi
""".split())

SPANISH_STOP_WORDS = frozenset("""
de la que el en y a los del se las por un para con no una su al lo como más
pero sus le ya o este sí porque esta entre cuando muy sin sobre también me
hasta hay donde quien desde todo nos durante todos uno les ni contra otros
ese eso ante ellos e esto mí antes algunos qué unos yo otro otras otra él
tanto esa estos mucho quienes nada muchos cual poco ella estar estas algunas
algo nosotros mi mis tú te ti tu tus ellas nosotras vosotros vosotras os mío
mía míos mías tuyo tuya tuyos tuyas suyo suya suyos suyas nuestro nuestra
nuestros nuestras vuestro vuestra vuestros vuestras esos esas estoy estás
está estamos estáis están esté estés estemos estéis estén estaré estarás
estará estaremos estaréis estarán estaría estarías estaríamos estaríais
estarían estaba estabas estábamos estabais estaban estuve estuviste estuvo
estuvimos estuvisteis estuvieron estuviera estuvieras estuviéramos
estuvierais estuvieran estuviese estuvieses estuviésemos estuvieseis
estuviesen estando estado estada estados estadas estad he has ha hemos
habéis han haya hayas hayamos hayáis hayan habré habrás habrá habremos
habréis habrán habría habrías habríamos habríais habrían había habías
habíamos habíais habían hube hubiste hubo hubimos hubisteis hubieron
hubiera hubieras hubiéramos hubierais hubieran hubiese hubieses hubiésemos
hubieseis hubiesen habiendo habido habida habidos habidas soy eres es somos
sois son sea seas seamos seáis sean seré serás será seremos seréis serán
sería serías seríamos seríais serían era eras éramos erais eran fui fuiste
fue fuimos fuisteis fueron fuera fueras fuéramos fuerais fueran fuese
fueses fuésemos fueseis fuesen siendo sido tengo tienes tiene tenemos
tenéis tienen tenga tengas tengamos tengáis tengan tendré tendrás tendrá
tendremos tendréis tendrán tendría tendrías tendríamos tendríais tendrían
tenía tenías teníamos teníais tenían tuve tuviste tuvo tuvimos tuvisteis
tuvieron tuviera tuvieras tuviéramos tuvierais tuvieran tuviese tuvieses
tuviésemos tuvieseis tuviesen teniendo tenido tenida tenidos tenidas tened
""".split())

ITALIAN_STOP_WORDS = frozenset("""
ad al allo ai agli all agl alla alle con col coi da dal dallo dai dagli dall
dagl dalla dalle di del dello dei degli dell degl della delle in nel nello
nei negli nell negl nella nelle su sul sullo sui sugli sull sugl sulla sulle
per tra contro io tu lui lei noi voi loro mio mia miei mie tuo tua tuoi tue
suo sua suoi sue nostro nostra nostri nostre vostro vostra vostri vostre mi
ti ci vi lo la li le gli ne il un uno una ma ed se perché anche come dov
dove che chi cui non più quale quanto quanti quanta quante quello quelli
quella quelle questo questi questa queste si tutto tutti a c e i l o ho hai
ha abbiamo avete hanno abbia abbiate abbiano avrò avrai avrà avremo avrete
avranno avrei avresti avrebbe avremmo avreste avrebbero avevo avevi aveva
avevamo avevate avevano ebbi avesti ebbe avemmo aveste ebbero avessi avesse
avessimo avessero avendo avuto avuta avuti avute sono sei è siamo siete sia
siate siano sarò sarai sarà saremo sarete saranno sarei saresti sarebbe
saremmo sareste sarebbero ero eri era eravamo eravate erano fui fosti fu
fummo foste furono fossi fosse fossimo fossero essendo faccio fai facciamo
fanno faccia facciate facciano farò farai farà faremo farete faranno farei
faresti farebbe faremmo fareste farebbero facevo facevi faceva facevamo
facevate facevano feci facesti fece facemmo faceste fecero facessi facesse
facessimo facessero facendo sto stai sta stiamo stanno stia stiate stiano
starò starai starà staremo starete staranno starei staresti starebbe
staremmo stareste starebbero stavo stavi stava stavamo stavate stavano
stetti stesti stette stemmo steste stettero stessi stesse stessimo stessero
stando
""".split())

PORTUGUESE_STOP_WORDS = frozenset("""
de a o que e do da em um para com não uma os no se na por mais as dos como
mas ao ele das à seu sua ou quando muito nos já eu também só pelo pela até
isso ela entre depois sem mesmo aos seus quem nas me esse eles você essa num
nem suas meu às minha numa pelos elas qual nós lhe deles essas esses pelas
este dele tu te vocês vos lhes meus minhas teu tua teus tuas nosso nossa
nossos nossas dela delas esta estes estas aquele aquela aqueles aquelas isto
aquilo estou está estamos estão estive esteve estivemos estiveram estava
estávamos estavam estivera estivéramos esteja estejamos estejam estivesse
estivéssemos estivessem estiver estivermos estiverem hei há havemos hão
houve houvemos houveram houvera houvéramos haja hajamos hajam houvesse
houvéssemos houvessem houver houvermos houverem houverei houverá houveremos
houverão houveria houveríamos houveriam sou somos são era éramos eram fui
foi fomos foram fora fôramos seja sejamos sejam fosse fôssemos fossem for
formos forem serei será seremos serão seria seríamos seriam tenho tem temos
tém tinha tínhamos tinham tive teve tivemos tiveram tivera tivéramos tenha
tenhamos tenham tivesse tivéssemos tivessem tiver tivermos tiverem terei
terá teremos terão teria teríamos teriam
""".split())

ITALIAN_ARTICLES = frozenset(
    ("c", "l", "all", "dall", "dell", "nell", "sull", "coll", "pell",
     "gl", "agl", "dagl", "degl", "negl", "sugl", "un", "m", "t", "s",
     "v", "d")
)

FRENCH_ARTICLES = frozenset(
    ("l", "m", "t", "qu", "n", "s", "j", "d", "c",
     "jusqu", "quoiqu", "lorsqu", "puisqu")
)

_APOSTROPHES = ("'", "’")


def elide(token: str, articles: frozenset[str]) -> str:
    """ElisionFilter: strip a leading elided article (``l'avion`` →
    ``avion``); case-insensitive, accepts the typographic apostrophe.
    Non-matching tokens pass through."""
    for ap in _APOSTROPHES:
        i = token.find(ap)
        if i > 0 and token[:i].lower() in articles and i + 1 < len(token):
            return token[i + 1:]
    return token


def french_elide(token: str) -> str:
    return elide(token, FRENCH_ARTICLES)


def german_normalize(term: str) -> str:
    """GermanNormalizationFilter FSM (``de/GermanNormalizationFilter.java``):
    N = ordinary, V = stops u from entering umlaut state, U = umlaut state
    (allows deletion of a following e)."""
    N, V, U = 0, 1, 2
    state = N
    out: list[str] = []
    for c in term:
        if c in ("a", "o"):
            out.append(c)
            state = U
        elif c == "u":
            out.append(c)
            state = U if state == N else V
        elif c == "e":
            if state == U:
                state = V
                continue  # delete the e of ae/oe/ue
            out.append(c)
            state = V
        elif c in ("i", "q", "y"):
            out.append(c)
            state = V
        elif c == "ä":
            out.append("a")
            state = V
        elif c == "ö":
            out.append("o")
            state = V
        elif c == "ü":
            out.append("u")
            state = V
        elif c == "ß":
            out.append("ss")
            state = N
        else:
            out.append(c)
            state = N
    return "".join(out)


_DE_FOLD = str.maketrans({
    "ä": "a", "à": "a", "á": "a", "â": "a",
    "ö": "o", "ò": "o", "ó": "o", "ô": "o",
    "ï": "i", "ì": "i", "í": "i", "î": "i",
    "ü": "u", "ù": "u", "ú": "u", "û": "u",
})

_DE_S_END = frozenset("bdfghklmnt")


def german_light_stem(term: str) -> str:
    """UniNE German light stemmer (``de/GermanLightStemmer.java``)."""
    s = term.translate(_DE_FOLD)
    ln = len(s)
    # step 1 (first matching branch wins — Java returns)
    if ln > 5 and s.endswith("ern"):
        ln -= 3
    elif ln > 4 and s[ln - 2] == "e" and s[ln - 1] in "mnrs":
        ln -= 2
    elif ln > 3 and s[ln - 1] == "e":
        ln -= 1
    elif ln > 3 and s[ln - 1] == "s" and s[ln - 2] in _DE_S_END:
        ln -= 1
    s = s[:ln]
    # step 2
    if ln > 5 and s.endswith("est"):
        ln -= 3
    elif ln > 4 and s[ln - 2] == "e" and s[ln - 1] in "rn":
        ln -= 2
    elif ln > 4 and s.endswith("st") and s[ln - 3] in _DE_S_END:
        ln -= 2
    return s[:ln]


_ES_FOLD = str.maketrans({
    "à": "a", "á": "a", "â": "a", "ä": "a",
    "ò": "o", "ó": "o", "ô": "o", "ö": "o",
    "è": "e", "é": "e", "ê": "e", "ë": "e",
    "ù": "u", "ú": "u", "û": "u", "ü": "u",
    "ì": "i", "í": "i", "î": "i", "ï": "i",
})


def spanish_light_stem(term: str) -> str:
    """UniNE Spanish light stemmer (``es/SpanishLightStemmer.java``):
    accent fold, then strip a final o/a/e, or plural -s forms (eses→ese,
    ces→z, os/as/es→singular). Words under 5 chars pass through."""
    if len(term) < 5:
        return term
    s = term.translate(_ES_FOLD)
    last = s[-1]
    if last in ("o", "a", "e"):
        return s[:-1]
    if last == "s":
        if s[-2] == "e" and s[-3] == "s" and s[-4] == "e":
            return s[:-2]
        if s[-2] == "e" and s[-3] == "c":
            return s[:-3] + "z"
        if s[-2] in ("o", "a", "e"):
            return s[:-2]
    return s


_IT_FOLD = str.maketrans({
    "à": "a", "á": "a", "â": "a", "ä": "a",
    "ò": "o", "ó": "o", "ô": "o", "ö": "o",
    "è": "e", "é": "e", "ê": "e", "ë": "e",
    "ù": "u", "ú": "u", "û": "u", "ü": "u",
    "ì": "i", "í": "i", "î": "i", "ï": "i",
})


def italian_light_stem(term: str) -> str:
    """Savoy (CLEF-2001) Italian light stemmer
    (``it/ItalianLightStemmer.java``): accent fold, then strip a final
    vowel — two chars when preceded by i/h per the plural/elision rules.
    Words under 6 chars pass through."""
    if len(term) < 6:
        return term
    s = term.translate(_IT_FOLD)
    last, prev = s[-1], s[-2]
    if last == "e":
        return s[:-2] if prev in ("i", "h") else s[:-1]
    if last == "i":
        return s[:-2] if prev in ("h", "i") else s[:-1]
    if last in ("a", "o"):
        return s[:-2] if prev == "i" else s[:-1]
    return s


_PT_FOLD = str.maketrans({
    "à": "a", "á": "a", "â": "a", "ä": "a", "ã": "a",
    "ò": "o", "ó": "o", "ô": "o", "ö": "o", "õ": "o",
    "è": "e", "é": "e", "ê": "e", "ë": "e",
    "ù": "u", "ú": "u", "û": "u", "ü": "u",
    "ì": "i", "í": "i", "î": "i", "ï": "i",
    "ç": "c",
})


def _pt_remove_suffix(s: str) -> str:
    """``PortugueseLightStemmer.removeSuffix`` branch-for-branch."""
    n = len(s)
    if n > 4 and s.endswith("es") and s[n - 3] in "rslz":
        return s[:-2]
    if n > 3 and s.endswith("ns"):
        return s[:-2] + "m"
    if n > 4 and (s.endswith("eis") or s.endswith("éis")):
        return s[:-3] + "el"
    if n > 4 and s.endswith("ais"):
        return s[:-2] + "l"
    if n > 4 and s.endswith("óis"):
        return s[:-3] + "ol"
    if n > 4 and s.endswith("is"):
        return s[:-1] + "l"
    if n > 3 and (s.endswith("ões") or s.endswith("ães")):
        return s[:-3] + "ão"
    if n > 6 and s.endswith("mente"):
        return s[:-5]
    if n > 3 and s[-1] == "s":
        return s[:-1]
    return s


def _pt_norm_feminine(s: str) -> str:
    """``PortugueseLightStemmer.normFeminine`` branch-for-branch (callers
    guarantee the trailing 'a')."""
    n = len(s)
    if n > 7 and (s.endswith("inha") or s.endswith("iaca") or s.endswith("eira")):
        return s[:-1] + "o"
    if n > 6:
        if (s.endswith("osa") or s.endswith("ica") or s.endswith("ida")
                or s.endswith("ada") or s.endswith("iva") or s.endswith("ama")):
            return s[:-1] + "o"
        if s.endswith("ona"):
            return s[:-3] + "ão"
        if s.endswith("ora"):
            return s[:-1]
        if s.endswith("esa"):
            return s[:-3] + "ês"
        if s.endswith("na"):
            return s[:-1] + "o"
    return s


def portuguese_light_stem(term: str) -> str:
    """UniNE Portuguese light stemmer (``pt/PortugueseLightStemmer.java``):
    plural/adverb suffix removal → feminine normalization → final-vowel
    strip → accent fold (fold runs LAST in the reference, so intermediate
    accented rewrites like ões→ão fold to plain vowels at the end)."""
    if len(term) < 4:
        return term
    s = _pt_remove_suffix(term)
    if len(s) > 3 and s[-1] == "a":
        s = _pt_norm_feminine(s)
    if len(s) > 4 and s[-1] in ("e", "a", "o"):
        s = s[:-1]
    return s.translate(_PT_FOLD)


_FR_FOLD = str.maketrans({
    "à": "a", "á": "a", "â": "a", "ô": "o",
    "è": "e", "é": "e", "ê": "e",
    "ù": "u", "û": "u", "î": "i", "ç": "c",
})


def _fr_norm(s: str) -> str:
    """``FrenchLightStemmer.norm()``: accent fold + adjacent-duplicate
    collapse (len>4), ie-strip, then sequential r/e/e/double-letter strip."""
    if len(s) > 4:
        s = s.translate(_FR_FOLD)
        out = [s[0]]
        for c in s[1:]:
            if c == out[-1] and c.isalpha():
                continue
            out.append(c)
        s = "".join(out)
    if len(s) > 4 and s.endswith("ie"):
        s = s[:-2]
    if len(s) > 4:
        # Java strips inside one len>4 guard without re-checking: r, e, e,
        # then a trailing double letter
        if s.endswith("r"):
            s = s[:-1]
        if s.endswith("e"):
            s = s[:-1]
        if s.endswith("e"):
            s = s[:-1]
        if len(s) >= 2 and s[-1] == s[-2] and s[-1].isalpha():
            s = s[:-1]
    return s


def french_light_stem(term: str) -> str:  # noqa: C901 — transcribed branches
    """UniNE French light stemmer (``fr/FrenchLightStemmer.java``),
    branch-for-branch."""
    s = term
    if len(s) > 5 and s[-1] == "x":
        if s[-3] == "a" and s[-2] == "u" and s[-4] != "e":
            s = s[:-2] + "l" + s[-1]
        s = s[:-1]
    if len(s) > 3 and s[-1] == "x":
        s = s[:-1]
    if len(s) > 3 and s[-1] == "s":
        s = s[:-1]
    if len(s) > 9 and s.endswith("issement"):
        return _fr_norm(s[:-7] + "r")
    if len(s) > 8 and s.endswith("issant"):
        return _fr_norm(s[:-5] + "r")
    if len(s) > 6 and s.endswith("ement"):
        s = s[:-4]
        if len(s) > 3 and s.endswith("ive"):
            s = s[:-2] + "f"
        return _fr_norm(s)
    if len(s) > 11 and s.endswith("ficatrice"):
        return _fr_norm(s[:-7] + "er")
    if len(s) > 10 and s.endswith("ficateur"):
        return _fr_norm(s[:-6] + "er")
    if len(s) > 9 and s.endswith("catrice"):
        return _fr_norm(s[:-7] + "quer")
    if len(s) > 8 and s.endswith("cateur"):
        return _fr_norm(s[:-6] + "quer")
    if len(s) > 8 and s.endswith("atrice"):
        return _fr_norm(s[:-6] + "er")
    if len(s) > 7 and s.endswith("ateur"):
        return _fr_norm(s[:-5] + "er")
    if len(s) > 6 and s.endswith("trice"):
        s = s[:-4] + "eur"  # falls through (no return in the Java source)
    if len(s) > 5 and s.endswith("ième"):
        return _fr_norm(s[:-4])
    if len(s) > 7 and s.endswith("teuse"):
        return _fr_norm(s[:-3] + "r")
    if len(s) > 6 and s.endswith("teur"):
        return _fr_norm(s[:-2] + "r")
    if len(s) > 5 and s.endswith("euse"):
        return _fr_norm(s[:-2])
    if len(s) > 8 and s.endswith("ère"):
        return _fr_norm(s[:-3] + "er")
    if len(s) > 7 and s.endswith("ive"):
        return _fr_norm(s[:-2] + "f")
    if len(s) > 4 and (s.endswith("folle") or s.endswith("molle")):
        return _fr_norm(s[:-3] + "u")
    if len(s) > 9 and s.endswith("nnelle"):
        return _fr_norm(s[:-5])
    if len(s) > 9 and s.endswith("nnel"):
        return _fr_norm(s[:-3])
    if len(s) > 4 and s.endswith("ète"):
        s = s[:-3] + "et"  # falls through
    if len(s) > 8 and s.endswith("ique"):
        s = s[:-4]  # falls through
    if len(s) > 8 and s.endswith("esse"):
        return _fr_norm(s[:-3])
    if len(s) > 7 and s.endswith("inage"):
        return _fr_norm(s[:-3])
    if len(s) > 9 and s.endswith("isation"):
        s = s[:-7]
        if len(s) > 5 and s.endswith("ual"):
            s = s[:-2] + "el"
        return _fr_norm(s)
    if len(s) > 9 and s.endswith("isateur"):
        return _fr_norm(s[:-7])
    if len(s) > 8 and s.endswith("ation"):
        return _fr_norm(s[:-5])
    if len(s) > 8 and s.endswith("ition"):
        return _fr_norm(s[:-5])
    return _fr_norm(s)


# ---------------------------------------------------------------------------
# Swedish / Finnish / Hungarian / Russian light stemmers (Savoy CLEF)
# ---------------------------------------------------------------------------

SWEDISH_STOP_WORDS = frozenset("""
och det att i en jag hon som han på den med var sig för så till är men
ett om hade de av icke mig du henne då sin nu har inte hans honom skulle
hennes där min man ej vid kunde något från ut när efter upp vi dem vara
vad över än dig kan sina här ha mot alla under någon eller allt mycket
sedan ju denna själv detta åt utan varit hur ingen mitt ni bli blev oss
din dessa några deras blir mina samma vilken er sådan vår blivit dess
inom mellan sådant varför varje vilka ditt vem vilket sitta sådana vart
dina vars vårt våra ert era vilkas
""".split())

HUNGARIAN_STOP_WORDS = frozenset("""
a ahogy ahol aki akik akkor alatt által általában amely amelyek
amelyekben amelyeket amelyet amelynek ami amit amolyan amíg amikor át
abban ahhoz annak arra arról az azok azon azt azzal azért aztán azután
azonban bár be belül benne cikk cikkek cikkeket csak de e eddig egész
egy egyes egyetlen egyéb egyik egyre ekkor el elég ellen elő először
előtt első én éppen ebben ehhez emilyen ennek erre ez ezt ezek ezen
ezzel ezért és fel felé hanem hiszen hogy hogyan igen így illetve ill.
ill ilyen ilyenkor ison ismét itt jó jól jobban kell kellett keresztül
keressünk ki kívül között közül legalább lehet lehetett legyen
lenne lenni lesz lett maga magát majd már más másik meg még
mellett mert mely melyek mi mit míg miért milyen mikor minden mindent
mindenki mindig mint mintha mivel most nagy nagyobb nagyon ne néha nekem
neki nem néhány nélkül nincs olyan ott össze ő ők őket pedig persze
rá s saját sem semmi sok sokat sokkal számára szemben szerint szinte
talán tehát teljes tovább továbbá több úgy ugyanis új újabb újra
után utána utolsó vagy vagyis valaki valami valamint való vagyok van
vannak volt voltam voltak voltunk vissza vele viszont volna
""".split())

FINNISH_STOP_WORDS = frozenset("""
olla olen olet on olemme olette ovat ole oli olisi olisit olisin olisimme
olisitte olisivat olit olin olimme olitte olivat ollut olleet en et ei emme
ette eivät minä minun minut minua minussa minusta minuun minulla minulta
minulle sinä sinun sinut sinua sinussa sinusta sinuun sinulla sinulta
sinulle hän hänen hänet häntä hänessä hänestä häneen hänellä
häneltä hänelle me meidän meidät meitä meissä meistä meihin meillä
meiltä meille te teidän teidät teitä teissä teistä teihin teillä
teiltä teille he heidän heidät heitä heissä heistä heihin heillä
heiltä heille tämä tämän tätä tässä tästä tähän tallä tältä
tälle tänä täksi tuo tuon tuotä tuossa tuosta tuohon tuolla tuolta
tuolle tuona tuoksi se sen sitä siinä siitä siihen sillä siltä sille
sinä siksi nämä näiden näitä näissä näistä näihin näillä
näiltä näille näinä näiksi nuo noiden noita noissa noista noihin
noilla noilta noille noina noiksi ne niiden niitä niissä niistä niihin
niillä niiltä niille niinä niiksi kuka kenen kenet ketä kenessä
kenestä keneen kenellä keneltä kenelle kenenä keneksi ketkä keiden
ketkä keitä keissä keistä keihin keillä keiltä keille keinä keiksi
mikä minkä mitä missä mistä mihin millä miltä mille miksi mitkä
joka jonka jota jossa josta johon jolla jolta jolle jona joksi
jotka joiden joita joissa joista joihin joilla joilta joille joina joiksi
että ja jos koska kuin mutta niin sekä tai vaan vai vaikka kanssa
mukaan noin poikki yli kun nyt itse
""".split())

RUSSIAN_STOP_WORDS = frozenset("""
и в во не что он на я с со как а то все она так его но да ты к у же вы
за бы по только ее мне было вот от меня еще нет о из ему теперь когда
даже ну вдруг ли если уже или ни быть был него до вас нибудь опять уж
вам сказал ведь там потом себя ничего ей может они тут где есть надо
ней для мы тебя их чем была сам чтоб без будто человек чего раз тоже
себе под жизнь будет ж тогда кто этот говорил того потому этого какой
совсем ним здесь этом один почти мой тем чтобы нее кажется сейчас были
куда зачем сказать всех никогда сегодня можно при наконец два об другой
хоть после над больше тот через эти нас про всего них какая много разве
сказала три эту моя впрочем хорошо свою этой перед иногда лучше чуть
том нельзя такой им более всегда конечно всю между
""".split())


def swedish_light_stem(term: str) -> str:
    """Savoy (CLEF-2003) Swedish light stemmer
    (``sv/SwedishLightStemmer.java:66-110``): optional final -s, then one
    suffix strip by descending length. No accent folding (å/ä/ö kept)."""
    s = term
    if len(s) > 4 and s[-1] == "s":
        s = s[:-1]
    n = len(s)
    if n > 7 and (s.endswith("elser") or s.endswith("heten")):
        return s[:-5]
    if n > 6 and s.endswith(("arne", "erna", "ande", "else", "aste",
                             "orna", "aren")):
        return s[:-4]
    if n > 5 and s.endswith(("are", "ast", "het")):
        return s[:-3]
    if n > 4 and s.endswith(("ar", "er", "or", "en", "at", "te", "et")):
        return s[:-2]
    if n > 3 and s[-1] in "taen":
        return s[:-1]
    return s


_HU_FOLD = str.maketrans({
    "á": "a", "ë": "e", "é": "e", "í": "i",
    "ó": "o", "ő": "o", "õ": "o", "ö": "o",
    "ú": "u", "ű": "u", "ũ": "u", "û": "u", "ü": "u",
})
_VOWELS_Y = frozenset("aeiouy")


def _hu_remove_case(s: str) -> str:
    n = len(s)
    if n > 6 and s.endswith("kent"):
        return s[:-4]
    if n > 5:
        if s.endswith(("nak", "nek", "val", "vel", "ert", "rol", "ban",
                       "ben", "bol", "nal", "nel", "hoz", "hez", "tol")):
            return s[:-3]
        if s.endswith(("al", "el")) and s[-3] not in _VOWELS_Y \
                and s[-3] == s[-4]:
            return s[:-3]
    if n > 4:
        if s.endswith(("at", "et", "ot", "va", "ve", "ra", "re", "ba",
                       "be", "ul", "ig")):
            return s[:-2]
        if s.endswith(("on", "en")) and s[-3] not in _VOWELS_Y:
            return s[:-2]
        c = s[-1]
        if c in "tn":
            return s[:-1]
        if c in "ae" and s[-2] == s[-3] and s[-2] not in _VOWELS_Y:
            return s[:-2]
    return s


def _hu_remove_possessive(s: str) -> str:
    n = len(s)
    if n > 6:
        if s[-5] not in _VOWELS_Y and s.endswith(("atok", "otok", "etek")):
            return s[:-4]
        if s.endswith(("itek", "itok")):
            return s[:-4]
    if n > 5:
        if s[-4] not in _VOWELS_Y and s.endswith(("unk", "tok", "tek")):
            return s[:-3]
        if s[-4] in _VOWELS_Y and s.endswith("juk"):
            return s[:-3]
        if s.endswith("ink"):
            return s[:-3]
    if n > 4:
        if s[-3] not in _VOWELS_Y and s.endswith(("am", "em", "om", "ad",
                                                  "ed", "od", "uk")):
            return s[:-2]
        if s[-3] in _VOWELS_Y and s.endswith(("nk", "ja", "je")):
            return s[:-2]
        if s.endswith(("im", "id", "ik")):
            return s[:-2]
    if n > 3:
        c = s[-1]
        if c in "ae":
            if s[-2] not in _VOWELS_Y:
                return s[:-1]
        elif c in "md":
            if s[-2] in _VOWELS_Y:
                return s[:-1]
        elif c == "i":
            return s[:-1]
    return s


def _hu_remove_plural(s: str) -> str:
    # Java switch fallthrough: -Vk strips two only when len > 4, else one
    if len(s) > 3 and s[-1] == "k":
        if s[-2] in "aoe" and len(s) > 4:
            return s[:-2]
        return s[:-1]
    return s


def hungarian_light_stem(term: str) -> str:
    """UniNE Hungarian light stemmer (``hu/HungarianLightStemmer.java:
    65-226``; Savoy 2006): accent fold → case-suffix strip → possessive
    strip → plural strip → final-vowel normalize."""
    s = term.translate(_HU_FOLD)
    s = _hu_remove_case(s)
    s = _hu_remove_possessive(s)
    s = _hu_remove_plural(s)
    if len(s) > 3 and s[-1] in "aeio":
        return s[:-1]
    return s


_FI_FOLD = str.maketrans({"ä": "a", "å": "a", "ö": "o"})


def _fi_step1(s: str) -> str:
    if len(s) > 8:
        if s.endswith("kin"):
            return _fi_step1(s[:-3])
        if s.endswith("ko"):
            return _fi_step1(s[:-2])
    if len(s) > 11:
        if s.endswith("dellinen"):
            return s[:-8]
        if s.endswith("dellisuus"):
            return s[:-9]
    return s


def _fi_step2(s: str) -> str:
    if len(s) > 5:
        if s.endswith(("lla", "tse", "sti")):
            return s[:-3]
        if s.endswith("ni"):
            return s[:-2]
        if s.endswith("aa"):
            return s[:-1]
    return s


def _fi_step3(s: str) -> str:
    n = len(s)
    if n > 8:
        if s.endswith("nnen"):
            return s[:-4] + "s"
        if s.endswith("ntena"):
            return s[:-5] + "s"
        if s.endswith("tten"):
            return s[:-4]
        if s.endswith("eiden"):
            return s[:-5]
    if n > 6:
        if s.endswith(("neen", "niin", "seen", "teen", "inen")):
            return s[:-4]
        if s[-3] == "h" and s[-2] in _VOWELS_Y and s[-1] == "n":
            return s[:-3]
        if s.endswith("den"):
            return s[:-3] + "s"
        if s.endswith("ksen"):
            return s[:-4] + "s"
        if s.endswith(("ssa", "sta", "lla", "lta", "tta", "ksi", "lle")):
            return s[:-3]
    if n > 5:
        if s.endswith(("na", "ne")):
            return s[:-2]
        if s.endswith("nei"):
            return s[:-3]
    if n > 4:
        if s.endswith(("ja", "ta")):
            return s[:-2]
        if s[-1] == "a":
            return s[:-1]
        if s[-1] == "n" and s[-2] in _VOWELS_Y:
            return s[:-2]
        if s[-1] == "n":
            return s[:-1]
    return s


def _fi_norm1(s: str) -> str:
    if len(s) > 5 and s.endswith("hde"):
        s = s[:-3] + "ksi"  # in-place rewrite, then fall through
    if len(s) > 4 and s.endswith(("ei", "at")):
        return s[:-2]
    if len(s) > 3 and s[-1] in "tsjeai":
        return s[:-1]
    return s


def _fi_norm2(s: str) -> str:
    if len(s) > 8 and s[-1] in "eou":
        s = s[:-1]
    if len(s) > 4:
        if s[-1] == "i":
            s = s[:-1]
        if len(s) > 4:
            # collapse adjacent duplicate runs of k/p/t (delete-with-i--)
            out = [s[0]]
            for c in s[1:]:
                if c == out[-1] and c in "kpt":
                    continue
                out.append(c)
            s = "".join(out)
    return s


def finnish_light_stem(term: str) -> str:
    """Savoy (CLEF-2003) Finnish light stemmer
    (``fi/FinnishLightStemmer.java:66-246``): ä/å/ö fold, recursive
    -kin/-ko strip, case/possessive suffix steps with s-rewrites
    (nnen→s…, hde→ksi), final-letter normalize, adjacent k/p/t collapse.
    Words under 4 chars pass through."""
    if len(term) < 4:
        return term
    s = term.translate(_FI_FOLD)
    s = _fi_step1(s)
    s = _fi_step2(s)
    s = _fi_step3(s)
    s = _fi_norm1(s)
    s = _fi_norm2(s)
    return s


def _ru_remove_case(s: str) -> str:
    n = len(s)
    if n > 6 and s.endswith(("иями", "оями")):
        return s[:-4]
    if n > 5 and s.endswith(("иям", "иях", "оях", "ями", "оям", "оьв",
                             "ами", "его", "ему", "ери", "ими", "ого",
                             "ому", "ыми", "оев")):
        return s[:-3]
    if n > 4 and s.endswith(("ая", "яя", "ях", "юю", "ах", "ею", "их",
                             "ия", "ию", "ьв", "ою", "ую", "ям", "ых",
                             "ея", "ам", "ем", "ей", "ём", "ев", "ий",
                             "им", "ое", "ой", "ом", "ов", "ые", "ый",
                             "ым", "ми")):
        return s[:-2]
    if n > 3 and s[-1] in "аеиоуйыяь":
        return s[:-1]
    return s


def russian_light_stem(term: str) -> str:
    """Dolamic & Savoy Russian light stemmer
    (``ru/RussianLightStemmer.java:66-152``): Cyrillic case-suffix strip +
    final ь/и/нн normalize. A no-op on ASCII tokens — the reference's
    default RussianAnalyzer uses the Snowball stemmer, but Solr's
    RussianLightStemFilterFactory ships this light variant, which is the
    family implemented across this module."""
    s = _ru_remove_case(term)
    n = len(s)
    if n > 3:
        c = s[-1]
        if c in ("ь", "и"):
            return s[:-1]
        if c == "н" and s[-2] == "н":
            return s[:-1]
    return s


# ---------------------------------------------------------------------------
# German / French MINIMAL stemmers and the Sorani (Kurdish) pack
# ---------------------------------------------------------------------------

_DE_MIN_FOLD = str.maketrans({"ä": "a", "ö": "o", "ü": "u"})


def german_minimal_stem(term: str) -> str:
    """GermanMinimalStemFilter (``de/GermanMinimalStemmer.java:57-89``):
    umlaut fold, then one plural/case suffix strip (-nen, -en/-se/-es/-er,
    single n/e/s/r). Words under 5 chars pass through."""
    if len(term) < 5:
        return term
    s = term.translate(_DE_MIN_FOLD)
    n = len(s)
    if n > 6 and s.endswith("nen"):
        return s[:-3]
    if n > 5 and s.endswith(("en", "se", "es", "er")):
        return s[:-2]
    if s[-1] in "nesr":
        return s[:-1]
    return s


def french_minimal_stem(term: str) -> str:
    """FrenchMinimalStemFilter (``fr/FrenchMinimalStemmer.java:57-72``;
    Savoy CLEF-2001 minimal): -aux→al / -x strip, then sequential
    s/r/e/é strips and a final adjacent-duplicate collapse. Words under
    6 chars pass through."""
    if len(term) < 6:
        return term
    s = term
    if s[-1] == "x":
        if s[-3] == "a" and s[-2] == "u":
            return s[:-2] + "l"
        return s[:-1]
    if s[-1] == "s":
        s = s[:-1]
    if s[-1] == "r":
        s = s[:-1]
    if s[-1] == "e":
        s = s[:-1]
    if s[-1] == "é":
        s = s[:-1]
    if s[-1] == s[-2]:
        s = s[:-1]
    return s


#: analysis/ckb/stopwords.txt resource list
SORANI_STOP_WORDS = frozenset("""
و کە ی کرد ئەوەی سەر دوو هەروەها لەو دەکات چەند هەر ئەو ئەم من ئێمە تۆ
ئێوە ئەوان بە پێ بەبێ بەدەم بەلای بەپێی بەرلە بەرەوی بەرەوە بەردەم بێ
بێجگە بۆ دە تێ دەگەڵ دوای جگە لە لێ لەبەر لەبەینی لەبابەت لەبارەی لەباتی
لەبن لەبرێتی لەدەم لەگەڵ لەلایەن لەناو لەنێو لەپێناوی لەرەوی لەرێ لەرێگا
لەسەر لەژێر ناو نێوان پاش پێش وەک
""".split())

_CKB_FARSI_YEH = "ی"
_CKB_KEHEH = "ک"
_CKB_HEH = "ه"
_CKB_AE = "ە"
_CKB_RREH = "ڕ"
_CKB_DELETED = frozenset(
    "ـًٌٍَُِّْ"
)  # tatweel + harakat


def sorani_normalize(term: str) -> str:
    """SoraniNormalizationFilter (``ckb/SoraniNormalizer.java:43-119``):
    yeh/kaf unification, ZWNJ handling (heh+ZWNJ → ae), final heh → ae,
    teh marbuta → ae, heh doachashmee → heh, initial reh → rreh,
    rreh-above → rreh, strip tatweel/harakat and Unicode FORMAT chars."""
    import unicodedata

    out: list[str] = []
    last = len(term) - 1
    for i, ch in enumerate(term):
        if ch in ("ي", "ى"):
            out.append(_CKB_FARSI_YEH)
        elif ch == "ك":
            out.append(_CKB_KEHEH)
        elif ch == "‌":  # ZWNJ: delete; preceding heh becomes ae
            if out and out[-1] == _CKB_HEH:
                out[-1] = _CKB_AE
        elif ch == _CKB_HEH:
            out.append(_CKB_AE if i == last else _CKB_HEH)
        elif ch == "ة":  # teh marbuta
            out.append(_CKB_AE)
        elif ch == "ھ":  # heh doachashmee
            out.append(_CKB_HEH)
        elif ch == "ر":  # reh: rreh when word-initial
            out.append(_CKB_RREH if not out else ch)
        elif ch == "ڒ":  # rreh above
            out.append(_CKB_RREH)
        elif ch in _CKB_DELETED or unicodedata.category(ch) == "Cf":
            pass
        else:
            out.append(ch)
    return "".join(out)


def sorani_stem(term: str) -> str:
    """SoraniStemFilter (``ckb/SoraniStemmer.java:32-105``): postposition
    → possessive pronoun → one definiteness/ezafe/plural suffix strip,
    transcribed branch-for-branch (the first two blocks mutate and fall
    through; the suffix chain returns)."""
    s = term
    n = len(s)
    # postposition
    if n > 5 and s.endswith("دا"):
        s = s[:-2]
    elif n > 4 and s.endswith("نا"):
        s = s[:-1]
    elif n > 6 and s.endswith("ەوە"):
        s = s[:-3]
    # possessive pronoun
    n = len(s)
    if n > 6 and (s.endswith("مان") or s.endswith("یان") or s.endswith("تان")):
        s = s[:-3]
    n = len(s)
    # indefinite singular ezafe (its own chain)
    if n > 6 and s.endswith("ێکی"):
        return s[:-3]
    elif n > 7 and s.endswith("یەکی"):
        return s[:-4]
    # the single suffix chain
    if n > 5 and s.endswith("ێک"):
        return s[:-2]
    elif n > 6 and s.endswith("یەک"):
        return s[:-3]
    elif n > 6 and s.endswith("ەکە"):
        return s[:-3]
    elif n > 5 and s.endswith("کە"):
        return s[:-2]
    elif n > 7 and s.endswith("ەکان"):
        return s[:-4]
    elif n > 6 and s.endswith("کان"):
        return s[:-3]
    elif n > 7 and s.endswith("یانی"):
        return s[:-4]
    elif n > 6 and s.endswith("انی"):
        return s[:-3]
    elif n > 6 and s.endswith("یان"):
        return s[:-3]
    elif n > 5 and s.endswith("ان"):
        return s[:-2]
    elif n > 7 and s.endswith("یانە"):
        return s[:-4]
    elif n > 6 and s.endswith("انە"):
        return s[:-3]
    elif n > 5 and (s.endswith("ایە") or s.endswith("ەیە")):
        return s[:-2]
    elif n > 4 and s.endswith("ە"):
        return s[:-1]
    elif n > 4 and s.endswith("ی"):
        return s[:-1]
    return s


# ---------------------------------------------------------------------------
# Arabic pack (light10 stemmer, Larkey/Ballesteros/Connell 2002)
# ---------------------------------------------------------------------------

#: analysis/ar/stopwords.txt resource list (NOT normalized — the reference
#: applies the stop filter before ArabicNormalizationFilter on purpose)
ARABIC_STOP_WORDS = frozenset("""
من ومن منها منه في وفي فيها فيه و ف ثم او أو ب بها به ا أ اى اي أي أى لا
ولا الا ألا إلا لكن ما وما كما فما عن مع اذا إذا ان أن إن انها أنها إنها
انه أنه إنه بان بأن فان فأن وان وأن وإن التى التي الذى الذي الذين الى الي
إلى إلي على عليها عليه اما أما إما ايضا أيضا كل وكل لم ولم لن ولن هى هي هو
وهى وهي وهو فهى فهي فهو انت أنت لك لها له هذه هذا تلك ذلك هناك كانت كان
يكون تكون وكانت وكان غير بعض قد نحو بين بينما منذ ضمن حيث الان الآن خلال
بعد قبل حتى عند عندما لدى جميع
""".split())

_AR_MAP = str.maketrans({
    "آ": "ا", "أ": "ا", "إ": "ا",  # alef variants fold
    "ى": "ي",                        # dotless yeh → yeh
    "ة": "ه",                        # teh marbuta → heh
})
_AR_DELETED = frozenset("ـًٌٍَُِّْ")  # tatweel + harakat

_AR_PREFIXES = ("ال", "وال", "بال", "كال", "فال", "لل", "و")
_AR_SUFFIXES = ("ها", "ان", "ات", "ون", "ين", "يه", "ية", "ه", "ة", "ي")


def arabic_normalize(term: str) -> str:
    """ArabicNormalizer (``ar/ArabicNormalizer.java:67-100``): fold alef
    madda/hamza variants to bare alef, dotless yeh → yeh, teh marbuta →
    heh, strip tatweel and the harakat diacritics."""
    return "".join(
        ch for ch in term.translate(_AR_MAP) if ch not in _AR_DELETED
    )


def arabic_stem(term: str) -> str:
    """ArabicStemmer light10 (``ar/ArabicStemmer.java:78-149``): ONE
    definite-article/conjunction prefix strip (wa- needs ≥ 3 remaining
    chars, others ≥ 2), then EVERY matching suffix strips in list order
    while ≥ 2 chars would remain."""
    s = term
    for p in _AR_PREFIXES:
        if s.startswith(p):
            if len(p) == 1 and len(s) < 4:
                continue  # wa- prefix requires at least 3 remaining chars
            if len(s) < len(p) + 2:
                continue
            s = s[len(p):]
            break
    for suf in _AR_SUFFIXES:
        if s.endswith(suf) and len(s) >= len(suf) + 2:
            s = s[: -len(suf)]
    return s


# --- Norwegian (no/) ---

#: snowball norwegian_stop.txt (NorwegianAnalyzer's default set)
NORWEGIAN_STOP_WORDS = frozenset("""
og i jeg det at en et den til er som på de med han av ikke ikkje der så
var meg seg men ett har om vi min mitt ha hadde hun nå over da ved fra du
ut sin dem oss opp man kan hans hvor eller hva skal selv sjøl her alle vil
bli ble blei blitt kunne inn når være kom noen noe ville dere som deres
kun ja etter ned skulle denne for deg si sine sitt mot å meget hvorfor
dette disse uten hvordan ingen din ditt blir samme hvilken hvilke sånn
inni mellom vår hver hvem vors hvis både bare enn fordi før mange også
slik vært være båe begge siden dykk dykkar dei deira deires deim di då eg
ein eit eitt elles honom hjå ho hoe henne hennar hennes hoss hossen ikkje
ingi inkje korleis korso kva kvar kvarhelst kven kvi kvifor me medan mi
mine mykje no nokon noka nokor noko nokre si sia sidan so somt somme um
upp vere vore verte vort varte vart
""".split())


def norwegian_light_stem(term: str, *, bokmaal: bool = True,
                         nynorsk: bool = False) -> str:
    """NorwegianLightStemmer (``no/NorwegianLightStemmer.java:86-174``),
    default flags=BOKMAAL (the filter's one-arg constructor,
    ``no/NorwegianLightStemFilter.java:46-48``): strip genitive -s, then
    ONE suffix rule by descending specificity."""
    s = term
    if len(s) > 4 and s.endswith("s"):
        s = s[:-1]
    n = len(s)
    if n > 7 and ((bokmaal and (s.endswith("heter") or s.endswith("heten")))
                  or (nynorsk and s.endswith("heita"))):
        return s[:-5]
    if n > 8 and nynorsk and s[-6:] in ("heiter", "leiken", "leikar"):
        return s[:-6]
    if n > 5 and (s.endswith("dom") or (bokmaal and s.endswith("het"))):
        return s[:-3]
    if n > 6 and nynorsk and s[-4:] in ("heit", "semd", "leik"):
        return s[:-4]
    if n > 7 and s[-5:] in ("elser", "elsen"):
        return s[:-5]
    if n > 6 and ((bokmaal and s[-4:] in ("ende", "este", "eren"))
                  or (nynorsk and s[-4:] in ("ande", "aste", "aren"))
                  or s.endswith("else")):
        return s[:-4]
    if n > 5 and ((bokmaal and s[-3:] in ("ere", "est"))
                  or (nynorsk and s[-3:] in ("are", "ast", "ane"))
                  or s.endswith("ene")):
        return s[:-3]
    if n > 4 and (s[-2:] in ("er", "en", "et", "te")
                  or (nynorsk and s.endswith("ar"))
                  or (bokmaal and s.endswith("st"))):
        return s[:-2]
    if n > 3 and s[-1] in "aen":
        return s[:-1]
    return s


def norwegian_minimal_stem(term: str, *, bokmaal: bool = True,
                           nynorsk: bool = False) -> str:
    """NorwegianMinimalStemmer (``no/NorwegianMinimalStemmer.java:81-110``),
    default flags=BOKMAAL: known noun plurals + genitive -s only."""
    s = term
    if len(s) > 4 and s.endswith("s"):
        s = s[:-1]
    n = len(s)
    if n > 5 and (s.endswith("ene") or (nynorsk and s.endswith("ane"))):
        return s[:-3]
    if n > 4 and (s[-2:] in ("er", "en", "et")
                  or (nynorsk and s.endswith("ar"))):
        return s[:-2]
    if n > 3 and s[-1] in "ae":
        return s[:-1]
    return s


# --- Czech (cz/) ---

#: cz/stopwords.txt (CzechAnalyzer's default set)
CZECH_STOP_WORDS = frozenset("""
a s k o i u v z dnes cz tímto budeš budem byli jseš můj svým ta tomto
tohle tuto tyto jej zda proč máte tato kam tohoto kdo kteří mi nám tom
tomuto mít nic proto kterou byla toho protože asi ho naši napište re což
tím takže svých její svými jste aj tu tedy teto bylo kde ke pravé ji nad
nejsou či pod téma mezi přes ty pak vám ani když však neg jsem tento
článku články aby jsme před pta jejich byl ještě až bez také pouze první
vaše která nás nový tipy pokud může strana jeho své jiné zprávy nové není
vás jen podle zde už být více bude již než který by které co nebo ten tak
má při od po jsou jak další ale si se ve to jako za zpět ze do pro je na
atd atp jakmile přičemž já on ona ono oni ony my vy jí ji mě mne jemu tomu
těm těmu němu němuž jehož jíž jelikož jež jakož načež
""".split())

_CZ_CASE_5 = frozenset((
    "ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete", "ěti",
    "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata", "aty", "ých",
    "ama", "ami", "ové", "ovi", "ými",
))
_CZ_CASE_4 = frozenset((
    "em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým", "mi", "ou",
))


def _cz_remove_case(s: str) -> str:
    n = len(s)
    if n > 7 and s.endswith("atech"):
        return s[:-5]
    if n > 6 and s[-4:] in ("ětem", "etem", "atům"):
        return s[:-4]
    if n > 5 and s[-3:] in _CZ_CASE_5:
        return s[:-3]
    if n > 4 and s[-2:] in _CZ_CASE_4:
        return s[:-2]
    if n > 3 and s[-1] in "aeiouůyáéíýě":
        return s[:-1]
    return s


def czech_stem(term: str) -> str:
    """CzechStemmer (``cz/CzechStemmer.java:44-160``, the Savoy light
    stemmer): remove case endings, possessive -ov/-in/-ův, then normalize
    the palatalized stem ending."""
    s = _cz_remove_case(term)
    if len(s) > 5 and s[-2:] in ("ov", "in", "ův"):
        s = s[:-2]
    if not s:
        return s
    if s.endswith("čt"):
        return s[:-2] + "ck"
    if s.endswith("št"):
        return s[:-2] + "sk"
    if s[-1] in "cč":
        return s[:-1] + "k"
    if s[-1] in "zž":
        return s[:-1] + "h"
    if len(s) > 1 and s[-2] == "e":
        return s[:-2] + s[-1]
    if len(s) > 2 and s[-2] == "ů":
        return s[:-2] + "o" + s[-1]
    return s


# --- Indonesian (id/) ---

#: id/stopwords.txt (IndonesianAnalyzer's default set)
INDONESIAN_STOP_WORDS = frozenset("""
ada adanya adalah adapun agak agaknya agar akan akankah akhirnya aku
akulah amat amatlah anda andalah antar diantaranya antara antaranya
diantara apa apaan mengapa apabila apakah apalagi apatah atau ataukah
ataupun bagai bagaikan sebagai sebagainya bagaimana bagaimanapun
sebagaimana bagaimanakah bagi bahkan bahwa bahwasanya sebaliknya banyak
sebanyak beberapa seberapa begini beginian beginikah beginilah sebegini
begitu begitukah begitulah begitupun sebegitu belum belumlah sebelum
sebelumnya sebenarnya berapa berapakah berapalah berapapun betulkah
sebetulnya biasa biasanya bila bilakah bisa bisakah sebisanya boleh
bolehkah bolehlah buat bukan bukankah bukanlah bukannya cuma percuma
dahulu dalam dan dapat dari daripada dekat demi demikian demikianlah
sedemikian dengan depan di dia dialah dini diri dirinya terdiri dong dulu
enggak enggaknya entah entahlah terhadap terhadapnya hal hampir hanya
hanyalah harus haruslah harusnya seharusnya hendak hendaklah hendaknya
hingga sehingga ia ialah ibarat ingin inginkah inginkan ini inikah inilah
itu itukah itulah jangan jangankan janganlah jika jikalau juga justru kala
kalau kalaulah kalaupun kalian kami kamilah kamu kamulah kan kapan
kapankah kapanpun dikarenakan karena karenanya ke kecil kemudian kenapa
kepada kepadanya ketika seketika khususnya kini kinilah kiranya sekiranya
kita kitalah kok lagi lagian selagi lah lain lainnya melainkan selaku lalu
melalui terlalu lama lamanya selama selama selamanya lebih terlebih
bermacam macam semacam maka makanya makin malah malahan mampu mampukah
mana manakala manalagi masih masihkah semasih masing mau maupun semaunya
memang mereka merekalah meski meskipun semula mungkin mungkinkah nah namun
nanti nantinya nyaris oleh olehnya seorang seseorang pada padanya padahal
paling sepanjang pantas sepantasnya sepantasnyalah para pasti pastilah per
pernah pula pun merupakan rupanya serupa saat saatnya sesaat saja sajalah
saling bersama sama sesama sambil sampai sana sangat sangatlah saya
sayalah se sebab sebabnya sebuah tersebut tersebutlah sedang sedangkan
sedikit sedikitnya segala segalanya segera sesegera sejak sejenak sekali
sekalian sekalipun sesekali sekaligus sekarang sekarang sekitar sekitarnya
sela selain selalu seluruh seluruhnya semakin sementara sempat semua
semuanya sendiri sendirinya seolah seperti sepertinya sering seringnya
serta siapa siapakah siapapun disini disinilah sini sinilah sesuatu
sesuatunya suatu sesudah sesudahnya sudah sudahkah sudahlah supaya tadi
tadinya tak tanpa setelah telah tentang tentu tentulah tentunya tertentu
seterusnya tapi tetapi setiap tiap setidaknya tidak tidakkah tidaklah toh
waduh wah wahai sewaktu walau walaupun wong yaitu yakni yang
""".split())

_ID_VOWELS = frozenset("aeiou")


def indonesian_stem(term: str, stem_derivational: bool = True) -> str:
    """IndonesianStemmer (``id/IndonesianStemmer.java:47-270``, Asian &
    Williams): inflectional particle/possessive suffixes, then derivational
    prefix/suffix rules gated by a live syllable (vowel) count and by which
    prefix class fired."""
    s = term
    ns = sum(1 for ch in s if ch in _ID_VOWELS)
    removed = set()

    def particle(s):
        nonlocal ns
        if s[-3:] in ("kah", "lah", "pun"):
            ns -= 1
            return s[:-3]
        return s

    def possessive(s):
        nonlocal ns
        if s[-2:] in ("ku", "mu"):
            ns -= 1
            return s[:-2]
        if s.endswith("nya"):
            ns -= 1
            return s[:-3]
        return s

    def first_prefix(s):
        nonlocal ns
        if s.startswith("meng"):
            removed.add("meng"); ns -= 1; return s[4:]
        if s.startswith("meny") and len(s) > 4 and s[4] in _ID_VOWELS:
            removed.add("meng"); ns -= 1; return "s" + s[4:]
        if s.startswith("men"):
            removed.add("meng"); ns -= 1; return s[3:]
        if s.startswith("mem"):
            removed.add("meng"); ns -= 1; return s[3:]
        if s.startswith("me"):
            removed.add("meng"); ns -= 1; return s[2:]
        if s.startswith("peng"):
            removed.add("peng"); ns -= 1; return s[4:]
        if s.startswith("peny") and len(s) > 4 and s[4] in _ID_VOWELS:
            removed.add("peng"); ns -= 1; return "s" + s[4:]
        if s.startswith("peny"):
            removed.add("peng"); ns -= 1; return s[4:]
        if s.startswith("pen") and len(s) > 3 and s[3] in _ID_VOWELS:
            removed.add("peng"); ns -= 1; return "t" + s[3:]
        if s.startswith("pen"):
            removed.add("peng"); ns -= 1; return s[3:]
        if s.startswith("pem"):
            removed.add("peng"); ns -= 1; return s[3:]
        if s.startswith("di"):
            removed.add("di"); ns -= 1; return s[2:]
        if s.startswith("ter"):
            removed.add("ter"); ns -= 1; return s[3:]
        if s.startswith("ke"):
            removed.add("ke"); ns -= 1; return s[2:]
        return s

    def second_prefix(s):
        nonlocal ns
        if s.startswith("ber"):
            removed.add("ber"); ns -= 1; return s[3:]
        if s == "belajar":
            removed.add("ber"); ns -= 1; return s[3:]
        if (s.startswith("be") and len(s) > 4 and s[2] not in _ID_VOWELS
                and s[3] == "e" and s[4] == "r"):
            removed.add("ber"); ns -= 1; return s[2:]
        if s.startswith("per"):
            ns -= 1; return s[3:]
        if s == "pelajar":
            ns -= 1; return s[3:]
        if s.startswith("pe"):
            removed.add("pe"); ns -= 1; return s[2:]
        return s

    def suffix(s):
        nonlocal ns
        if (s.endswith("kan") and "ke" not in removed
                and "peng" not in removed and "pe" not in removed):
            ns -= 1; return s[:-3]
        if (s.endswith("an") and "di" not in removed
                and "meng" not in removed and "ter" not in removed):
            ns -= 1; return s[:-2]
        if (s.endswith("i") and not s.endswith("si")
                and "ber" not in removed and "ke" not in removed
                and "peng" not in removed):
            ns -= 1; return s[:-1]
        return s

    if ns > 2:
        s = particle(s)
    if ns > 2:
        s = possessive(s)
    if stem_derivational:
        old = s
        if ns > 2:
            s = first_prefix(s)
        if s != old:
            old = s
            if ns > 2:
                s = suffix(s)
            if s != old and ns > 2:
                s = second_prefix(s)
        else:
            if ns > 2:
                s = second_prefix(s)
            if ns > 2:
                s = suffix(s)
    return s


# --- English minimal (en/EnglishMinimalStemmer.java, Harman s-stemmer) ---


def english_minimal_stem(term: str) -> str:
    """EnglishMinimalStemFilter (``en/EnglishMinimalStemmer.java:28-48``):
    the Harman S-stemmer — plural -s only, with -ies → -y and the
    us/ss/*es guards."""
    s = term
    if len(s) < 3 or s[-1] != "s":
        return s
    c = s[-2]
    if c in ("u", "s"):
        return s
    if c == "e":
        if len(s) > 3 and s[-3] == "i" and s[-4] not in ("a", "e"):
            return s[:-3] + "y"
        if s[-3] in ("i", "a", "o", "e"):
            return s
        return s[:-1]
    return s[:-1]
