"""Language packs, wave 3: Hindi, Bulgarian, Persian, Turkish, Latvian,
Bengali (``analysis/common/src/java/org/apache/lucene/analysis/{hi,bg,fa,
tr,lv,bn}/``). Suffix tables and stopword lists are the reference's own
published data; algorithms are transcribed from the cited files and
golden-tested against the reference's unit-test pairs
(tests/test_lang_packs3.py).
"""
from __future__ import annotations


def _strip_groups(term: str, groups) -> str:
    """Shared shape of the Hindi/Bengali light stemmers: ONE suffix strip,
    longest group first, each gated on a minimum surviving length."""
    n = len(term)
    for minlen, strip, sufs in groups:
        if n > minlen and term.endswith(sufs):
            return term[:-strip]
    return term


# --- Hindi (hi/) ---

#: hi/stopwords.txt (HindiAnalyzer default set)
HINDI_STOP_WORDS = frozenset("""
अंदर अत अपना अपनी अपने अभी आदि आप इत्यादि इन इनका इन्हीं इन्हें इन्हों इस
इसका इसकी इसके इसमें इसी इसे उन उनका उनकी उनके उनको उन्हीं उन्हें उन्हों
उस उसके उसी उसे एक एवं एस ऐसे और कई कर करता करते करना करने करें कहते कहा
का काफ़ी कि कितना किन्हें किन्हों किया किर किस किसी किसे की कुछ कुल के को
कोई कौन कौनसा गया घर जब जहाँ जा जितना जिन जिन्हें जिन्हों जिस जिसे जीधर
जैसा जैसे जो तक तब तरह तिन तिन्हें तिन्हों तिस तिसे तो था थी थे दबारा दिया
दुसरा दूसरे दो द्वारा न नहीं ना निहायत नीचे ने पर पर पहले पूरा पे फिर बनी
बही बहुत बाद बाला बिलकुल भी भीतर मगर मानो मे में यदि यह यहाँ यही या यिह ये
रखें रहा रहे ऱ्वासा लिए लिये लेकिन व वर्ग वह वह वहाँ वहीं वाले वुह वे
वग़ैरह संग सकता सकते सबसे सभी साथ साबुत साभ सारा से सो ही हुआ हुई हुए है
हैं हो होता होती होते होना होने अपनि जेसे होति सभि तिंहों इंहों दवारा इसि
किंहें थि उंहों ओर जिंहें वहिं अभि बनि हि उंहिं उंहें हें वगेरह एसे रवासा
कोन निचे काफि उसि पुरा भितर हे बहि वहां कोइ यहां जिंहों तिंहें किसि कइ यहि
इंहिं जिधर इंहें अदि इतयादि हुइ कोनसा इसकि दुसरे जहां अप किंहों उनकि भि
वरग हुअ जेसा नहिं
""".split())

#: HindiStemmer.java:33-119 suffix groups (min_len, strip, suffixes)
_HI_GROUPS = (
    (6, 5, (
        "ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां",
    )),
    (5, 4, (
        "ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
        "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
        "ियों", "ियां",
    )),
    (4, 3, (
        "ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
        "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
        "ुआं",
    )),
    (3, 2, (
        "कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं", "ती",
        "ता", "ाँ", "ां", "ों", "ें",
    )),
    (2, 1, (
        "ो", "े", "ू", "ु", "ी", "ि", "ा",
    )),
)


def hindi_stem(term: str) -> str:
    """HindiStemmer (``hi/HindiStemmer.java:32-119``, the Ramanathan &
    Rao light stemmer): one majority-suffix strip."""
    return _strip_groups(term, _HI_GROUPS)


#: HindiNormalizer.java:51-178 single-char folds (applied in one pass)
_HI_MAP = {
    "\u0901": "\u0902",  # candrabindu -> bindu
    "\u0929": "\u0928", "\u0931": "\u0930", "\u0934": "\u0933",
    "\u0958": "\u0915", "\u0959": "\u0916", "\u095a": "\u0917",
    "\u095b": "\u091c", "\u095c": "\u0921", "\u095d": "\u0922",
    "\u095e": "\u092b", "\u095f": "\u092f",
    "\u0945": "\u0947", "\u0946": "\u0947",
    "\u0949": "\u094b", "\u094a": "\u094b",
    "\u090d": "\u090f", "\u090e": "\u090f",
    "\u0911": "\u0913", "\u0912": "\u0913",
    "\u0972": "\u0905",
    "\u0906": "\u0905", "\u0908": "\u0907", "\u090a": "\u0909",
    "\u0960": "\u090b", "\u0961": "\u090c",
    "\u0910": "\u090f", "\u0914": "\u0913",
    "\u0940": "\u093f", "\u0942": "\u0941", "\u0944": "\u0943",
    "\u0963": "\u0962", "\u0948": "\u0947", "\u094c": "\u094b",
}
_HI_DELETE = frozenset("\u093c\u200d\u200c\u094d")


def hindi_normalize(term: str) -> str:
    """HindiNormalizer (``hi/HindiNormalizer.java:51-178``): dead-n →
    bindu, nukta-form folds, zwj/zwnj/virama deletion, chandra/long →
    short vowel folds. Single left-to-right pass like the reference."""
    out = []
    i, n = 0, len(term)
    while i < n:
        ch = term[i]
        if ch == "\u0928" and i + 1 < n and term[i + 1] == "\u094d":
            out.append("\u0902")  # dead n -> bindu (consumes the virama)
            i += 2
            continue
        if ch in _HI_DELETE:
            i += 1
            continue
        out.append(_HI_MAP.get(ch, ch))
        i += 1
    return "".join(out)


# --- Bulgarian (bg/) ---

#: bg/stopwords.txt (BulgarianAnalyzer default set)
BULGARIAN_STOP_WORDS = frozenset("""
а аз ако ала бе без беше би бил била били било близо бъдат бъде бяха в вас
ваш ваша вероятно вече взема ви вие винаги все всеки всички всичко всяка
във въпреки върху г ги главно го д да дали до докато докога дори досега
доста е едва един ето за зад заедно заради засега затова защо защото и из
или им има имат иска й каза как каква какво както какъв като кога когато
което които кой който колко която къде където към ли м ме между мен ми
мнозина мога могат може моля момента му н на над назад най направи напред
например нас не него нея ни ние никой нито но някои някой няма обаче около
освен особено от отгоре отново още пак по повече повечето под поне поради
после почти прави пред преди през при пък първо с са само се сега си скоро
след сме според сред срещу сте съм със също т тази така такива такъв там
твой те тези ти тн то това тогава този той толкова точно трябва тук тъй тя
тях у харесва ч че често чрез ще щом я
""".split())


def bulgarian_stem(term: str) -> str:
    """BulgarianStemmer (``bg/BulgarianStemmer.java:40-143``, the Savoy
    light stemmer): article removal → plural removal → final-vowel strips
    → ен→н and ъN→N rewrites."""
    s = term
    if len(s) < 4:
        return s
    if len(s) > 5 and s.endswith("ища"):
        return s[:-3]
    # remove article
    n = len(s)
    if n > 6 and s.endswith("ият"):
        s = s[:-3]
    elif n > 5 and s[-2:] in ("ът", "то", "те", "та", "ия"):
        s = s[:-2]
    elif n > 4 and s.endswith("ят"):
        s = s[:-2]
    # remove plural
    n = len(s)
    if n > 6 and s.endswith("овци"):
        s = s[:-3]
    elif n > 6 and s.endswith("ове"):
        s = s[:-3]
    elif n > 6 and s.endswith("еве"):
        s = s[:-3] + "й"
    elif n > 5 and s.endswith("ища"):
        s = s[:-3]
    elif n > 5 and s.endswith("та"):
        s = s[:-2]
    elif n > 5 and s.endswith("ци"):
        s = s[:-2] + "к"
    elif n > 5 and s.endswith("зи"):
        s = s[:-2] + "г"
    elif n > 5 and s[-3] == "е" and s[-1] == "и":
        s = s[:-3] + "я" + s[-2]
    elif n > 4 and s.endswith("си"):
        s = s[:-2] + "х"
    elif n > 4 and s.endswith("и"):
        s = s[:-1]
    if len(s) > 3:
        if s.endswith("я"):
            s = s[:-1]
        if s and s[-1] in "аое":
            s = s[:-1]
    if len(s) > 4 and s.endswith("ен"):
        s = s[:-2] + "н"
    if len(s) > 5 and s[-2] == "ъ":
        s = s[:-2] + s[-1]
    return s


# --- Persian (fa/) ---

#: fa/stopwords.txt (PersianAnalyzer default set, ships normalized)
PERSIAN_STOP_WORDS = frozenset("""
انان نداشته سراسر خياه ايشان وي تاكنون بيشتري دوم پس ناشي وگو يا داشتند
سپس هنگام هرگز پنج نشان امسال ديگر گروهي شدند چطور ده و دو نخستين ولي چرا
چه وسط ه كدام قابل يك رفت هفت همچنين در هزار بله بلي شايد اما شناسي گرفته
دهد داشته دانست داشتن خواهيم ميليارد وقتيكه امد خواهد جز اورده شده بلكه
خدمات شدن برخي نبود بسياري جلوگيري حق كردند نوعي بعري نكرده نظير نبايد
بوده بودن داد اورد هست جايي شود دنبال داده بايد سابق هيچ همان انجا كمتر
كجاست گردد كسي تر مردم تان دادن بودند سري جدا ندارند مگر يكديگر دارد دهند
بنابراين هنگامي سمت جا انچه خود دادند زياد دارند اثر بدون بهترين بيشتر
البته به براساس بيرون كرد بعضي گرفت توي اي ميليون او جريان تول بر مانند
برابر باشيم مدتي گويند اكنون تا تنها جديد چند بي نشده كردن كردم گويد كرده
كنيم نمي نزد روي قصد فقط بالاي ديگران اين ديروز توسط سوم ايم دانند سوي
استفاده شما كنار داريم ساخته طور امده رفته نخست بيست نزديك طي كنيد از انها
تمامي داشت يكي طريق اش چيست روب نمايد گفت چندين چيزي تواند ام ايا با ان
ايد ترين اينكه ديگري راه هايي بروز همچنان پاعين كس حدود مختلف مقابل چيز
گيرد ندارد ضد همچون سازي شان مورد باره مرسي خويش برخوردار چون خارج شش هنوز
تحت ضمن هستيم گفته فكر بسيار پيش براي روزهاي انكه نخواهد بالا كل وقتي كي
چنين كه گيري نيست است كجا كند نيز يابد بندي حتي توانند عقب خواست كنند بين
تمام همه ما باشند مثل شد اري باشد اره طبق بعد اگر صورت غير جاي بيش ريزي
اند زيرا چگونه بار لطفا مي درباره من ديده همين گذاري برداري علت گذاشته هم
فوق نه ها شوند اباد همواره هر اول خواهند چهار نام امروز مان هاي قبل كنم
سعي تازه را هستند زير جلوي عنوان بود
""".split())

_FA_MAP = {
    "\u06cc": "\u064a",  # FARSI YEH -> YEH
    "\u06d2": "\u064a",  # YEH BARREE -> YEH
    "\u06a9": "\u0643",  # KEHEH -> KAF
    "\u06c0": "\u0647",  # HEH+YEH -> HEH
    "\u06c1": "\u0647",  # HEH GOAL -> HEH
}


def persian_normalize(term: str) -> str:
    """PersianNormalizer (``fa/PersianNormalizer.java:61-86``): yeh/kaf/heh
    variant folds + HAMZA ABOVE deletion. PersianAnalyzer runs
    ArabicNormalizationFilter first (``fa/PersianAnalyzer.java:117-131``);
    compose with :func:`lucene_solr_ray.analysis.lang.arabic_normalize`."""
    return "".join(
        _FA_MAP.get(ch, ch) for ch in term if ch != "\u0654"
    )


# --- Turkish (tr/) ---

#: tr/stopwords.txt (TurkishAnalyzer default set)
TURKISH_STOP_WORDS = frozenset("""
acaba altmış altı ama ancak arada aslında ayrıca bana bazı belki ben
benden beni benim beri beş bile bin bir birçok biri birkaç birkez birşey
birşeyi biz bize bizden bizi bizim böyle böylece bu buna bunda bundan
bunlar bunları bunların bunu bunun burada çok çünkü da daha dahi de defa
değil diğer diye doksan dokuz dolayı dolayısıyla dört edecek eden ederek
edilecek ediliyor edilmesi ediyor eğer elli en etmesi etti ettiği ettiğini
gibi göre halen hangi hatta hem henüz hep hepsi her herhangi herkesin hiç
hiçbir için iki ile ilgili ise işte itibaren itibariyle kadar karşın
katrilyon kendi kendilerine kendini kendisi kendisine kendisini kez ki kim
kimden kime kimi kimse kırk milyar milyon mu mü mı nasıl ne neden nedenle
nerde nerede nereye niye niçin o olan olarak oldu olduğu olduğunu
olduklarını olmadı olmadığı olmak olması olmayan olmaz olsa olsun olup
olur olursa oluyor on ona ondan onlar onlardan onları onların onu onun
otuz oysa öyle pek rağmen sadece sanki sekiz seksen sen senden seni senin
siz sizden sizi sizin şey şeyden şeyi şeyler şöyle şu şuna şunda şundan
şunları şunu tarafından trilyon tüm üç üzere var vardı ve veya ya yani
yapacak yapılan yapılması yapıyor yapmak yaptı yaptığı yaptığını
yaptıkları yedi yerine yetmiş yine yirmi yoksa yüz zaten
""".split())


def turkish_apostrophe(term: str) -> str:
    """ApostropheFilter (``tr/ApostropheFilter.java:44-58``): truncate the
    token at the first apostrophe (Zafer Celebi et al.: drop proper-name
    suffixes)."""
    for i, ch in enumerate(term):
        if ch in ("'", "\u2019"):
            return term[:i]
    return term


def turkish_lower(text: str) -> str:
    """TurkishLowerCaseFilter (``tr/TurkishLowerCaseFilter.java:53-108``):
    I → ı (dotless) unless followed by COMBINING DOT ABOVE (I+0307 → i),
    İ lowers to i (Python str.lower gives i + 0307; the reference's
    composed form), everything else standard lowercase."""
    import unicodedata

    out = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "I":
            j = i + 1
            before_dot = False
            while j < n and unicodedata.category(text[j]) == "Mn":
                if text[j] == "\u0307":
                    before_dot = True
                    break
                j += 1
            if before_dot:
                out.append("i")
                out.append(text[i + 1:j])  # keep in-between combining marks
                i = j + 1  # consume only the combining dot (composed form)
                continue
            out.append("\u0131")
            i += 1
            continue
        if ch == "\u0130":  # LATIN CAPITAL LETTER I WITH DOT ABOVE
            out.append("i")
            i += 1
            continue
        out.append(ch.lower())
        i += 1
    return "".join(out)


# --- Latvian (lv/) ---

#: lv/stopwords.txt (LatvianAnalyzer default set)
LATVIAN_STOP_WORDS = frozenset("""
aiz ap ar apakš ārpus augšpus bez caur dēļ gar iekš iz kopš labad lejpus
līdz no otrpus pa par pār pēc pie pirms pret priekš starp šaipus uz viņpus
virs virspus zem apakšpus un bet jo ja ka lai tomēr tikko turpretī arī
kaut gan tādēļ tā ne tikvien vien kā ir te vai kamēr ar diezin droši
diemžēl nebūt ik it taču nu pat tiklab iekšpus nedz tik nevis turpretim
jeb iekam iekām iekāms kolīdz līdzko tiklīdz jebšu tālab tāpēc nekā itin
jā jau jel nē nezin tad tikai vis tak iekams vien būt biju biji bija bijām
bijāt esmu esi esam esat būšu būsi būs būsim būsiet tikt tiku tiki tika
tikām tikāt tieku tiec tiek tiekam tiekat tikšu tiks tiksim tiksiet tapt
tapi tapāt topat tapšu tapsi taps tapsim tapsiet kļūt kļuvu kļuvi kļuva
kļuvām kļuvāt kļūstu kļūsti kļūst kļūstam kļūstat kļūšu kļūsi kļūs kļūsim
kļūsiet varēt varēju varējām varēšu varēsim var varēji varējāt varēsi
varēsiet varat varēja varēs
""".split())

#: LatvianStemmer.java affixes: (suffix, vowel_count, palatalizes)
_LV_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False),
    ("ai", 2, False), ("ei", 2, False), ("ām", 1, False),
    ("am", 1, False), ("ēm", 1, False), ("īm", 1, False),
    ("im", 1, False), ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False), ("es", 1, False),
    ("os", 1, True), ("ij", 1, False), ("īs", 1, False),
    ("ēs", 1, False), ("is", 1, False), ("ie", 1, False),
    ("u", 1, True), ("a", 1, True), ("i", 1, True),
    ("e", 1, False), ("ā", 1, False), ("ē", 1, False),
    ("ī", 1, False), ("ū", 1, False), ("o", 1, False),
    ("s", 0, False), ("š", 0, False),
)
_LV_VOWELS = frozenset("aeiouāīēū")


def _lv_unpalatalize(s: str, removed: str) -> str:
    if removed == "u":
        if s.endswith("kš"):
            return s[:-2] + "kst"
        if s.endswith("ņņ"):
            return s[:-2] + "nn"
    if s[-2:] in ("pj", "bj", "mj", "vj"):
        return s[:-1]
    for pal, plain in (("šņ", "sn"), ("žņ", "zn"), ("šļ", "sl"),
                       ("žļ", "zl"), ("ļņ", "ln"), ("ļļ", "ll")):
        if s.endswith(pal):
            return s[:-2] + plain
    if s.endswith("č"):
        return s[:-1] + "c"
    if s.endswith("ļ"):
        return s[:-1] + "l"
    if s.endswith("ņ"):
        return s[:-1] + "n"
    return s


def latvian_stem(term: str) -> str:
    """LatvianStemmer (``lv/LatvianStemmer.java:35-173``, light stemmer
    per Karlis Kreslins): ONE primary inflectional suffix strip, with
    palatalization reversal for declension II/V/VI noun suffixes; the
    remaining stem must keep more vowels than the suffix had."""
    nv = sum(1 for ch in term if ch in _LV_VOWELS)
    for suf, vc, pal in _LV_AFFIXES:
        if nv > vc and len(term) >= len(suf) + 3 and term.endswith(suf):
            s = term[: -len(suf)]
            return _lv_unpalatalize(s, suf[0]) if pal else s
    return term


# --- Bengali (bn/) ---

#: bn/stopwords.txt (BengaliAnalyzer default set)
BENGALI_STOP_WORDS = frozenset("""
এই ও থেকে করে এ না ওই এক্ নিয়ে করা বলেন সঙ্গে যে এব তা আর কোনো বলে সেই দিন
হয় কি দু পরে সব দেওয়া মধ্যে এর সি শুরু কাজ কিছু কাছে সে তবে বা বন আগে
জ্নজন পি পর তো ছিল এখন আমরা প্রায় দুই আমাদের তাই অন্য গিয়ে প্রযন্ত মনে
নতুন মতো কেখা প্রথম আজ টি ধামার অনেক বিভিন্ন র হাজার জানা নয় অবশ্য বেশি এস
করে কে হতে বি কয়েক সহ বেশ এমন এমনি কেন কেউ নেওয়া চেষ্টা লক্ষ বলা কারণ আছে
শুধু তখন যা এসে চার ছিল যদি আবার কোটি উত্তর সামনে উপর বক্তব্য এত প্রাথমিক
উপরে আছে প্রতি কাজে যখন খুব বহু গেল পেয়্র্ চালু ই নাগাদ থাকা পাচ যাওয়া রকম
সাধারণ কমনে
""".split())

#: BengaliStemmer.java:37-182 suffix groups (min_len, strip, suffixes)
_BN_GROUPS = (
    (9, 8, (
        "িয়াছিলাম", "িতেছিলাম", "িতেছিলেন", "ইতেছিলেন", "িয়াছিলেন",
        "ইয়াছিলেন",
    )),
    (8, 7, (
        "িতেছিলি", "িতেছিলে", "িয়াছিলা", "িয়াছিলে", "িতেছিলা", "িয়াছিলি",
        "য়েদেরকে",
    )),
    (7, 6, (
        "িতেছিস", "িতেছেন", "িয়াছিস", "িয়াছেন", "েছিলাম", "েছিলেন",
        "েদেরকে",
    )),
    (6, 5, (
        "িতেছি", "িতেছা", "িতেছে", "ছিলাম", "ছিলেন", "িয়াছি", "িয়াছা",
        "িয়াছে", "েছিলে", "েছিলা", "য়েদের", "দেরকে",
    )),
    (5, 4, (
        "িলাম", "িলেন", "িতাম", "িতেন", "িবেন", "ছিলি", "ছিলে", "ছিলা",
        "তেছে", "িতেছ", "খানা", "খানি", "গুলো", "গুলি", "য়েরা", "েদের",
    )),
    (4, 3, (
        "লাম", "িলি", "ইলি", "িলে", "ইলে", "লেন", "িলা", "ইলা", "তাম",
        "িতি", "ইতি", "িতে", "ইতে", "তেন", "িতা", "িবা", "ইবা", "িবি",
        "ইবি", "বেন", "িবে", "ইবে", "ছেন", "য়োন", "য়ের", "েরা", "দের",
    )),
    (3, 2, (
        "িস", "েন", "লি", "লে", "লা", "তি", "তে", "তা", "বি", "বে", "বা",
        "ছি", "ছা", "ছে", "ুন", "ুক", "টা", "টি", "নি", "ের", "তে", "রা",
        "কে",
    )),
    (2, 1, (
        "ি", "ী", "া", "ো", "ে", "ব", "ত",
    )),
)


def bengali_stem(term: str) -> str:
    """BengaliStemmer (``bn/BengaliStemmer.java:35-182``, criteria from
    Savoy's BengaliStemmerLight): one majority-suffix strip."""
    return _strip_groups(term, _BN_GROUPS)


def bengali_normalize(term: str) -> str:
    """BengaliNormalizer (``bn/BengaliNormalizer.java:39-154``):
    chandrabindu deletion, long→short kar folds, khio/nga/ja-phala/
    ba-phalaa rewrites, visarga handling, sh/na/ra folds. Single
    left-to-right pass over a mutable buffer like the reference."""
    s = list(term)
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "\u0981":
            del s[i]
            continue
        if ch == "\u09c0":
            s[i] = "\u09bf"
        elif ch == "\u09c2":
            s[i] = "\u09c1"
        elif ch == "\u0995":
            if i + 2 < len(s) and s[i + 1] == "\u09cd" and s[i + 2] == "\u09bf":
                if i == 0:
                    s[i] = "\u0996"
                    del s[i + 2]
                    del s[i + 1]
                else:
                    s[i + 1] = "\u0996"
                    del s[i + 2]
        elif ch == "\u0999":
            s[i] = "\u0982"
        elif ch == "\u09af":
            if i - 2 == 0 and s[i - 1] == "\u09cd":
                s[i - 1] = "\u09c7"
                if i + 1 < len(s) and s[i + 1] == "\u09be":
                    del s[i + 1]
                del s[i]
                continue
            elif i - 1 >= 0 and s[i - 1] == "\u09cd":
                del s[i]
                del s[i - 1]
                i -= 1
                continue
        elif ch == "\u09ac":
            if i == 0 or s[i - 1] != "\u09cd":
                pass
            elif i - 2 == 0:
                del s[i]
                del s[i - 1]
                i -= 1
                continue
            elif i - 5 >= 0 and s[i - 3] == "\u09cd":
                del s[i]
                del s[i - 1]
                i -= 1
                continue
            elif i - 2 >= 0:
                s[i - 1] = s[i - 2]
                del s[i]
                continue
        elif ch == "\u0983":
            if i == len(s) - 1:
                if len(s) <= 3:
                    s[i] = "\u09b9"
                else:
                    del s[i]
                    continue
            else:
                s[i] = s[i + 1]
        elif ch in ("\u09b6", "\u09b7"):
            s[i] = "\u09b8"
        elif ch == "\u09a3":
            s[i] = "\u09a8"
        elif ch in ("\u09dc", "\u09dd"):
            s[i] = "\u09b0"
        elif ch == "\u09ce":
            s[i] = "\u09a4"
        i += 1
    return "".join(s)


def decimal_digits(term: str) -> str:
    """DecimalDigitFilter (``analysis/core/DecimalDigitFilter.java``): fold
    any Unicode decimal digit to its 0-9 Latin form."""
    if term.isascii():
        return term
    import unicodedata

    return "".join(
        chr(0x30 + unicodedata.decimal(ch)) if ch.isdecimal() else ch
        for ch in term
    )


# --- Greek (el/) ---

#: el/stopwords.txt (GreekAnalyzer default set, ships lowercase-folded)
GREEK_STOP_WORDS = frozenset("""
ο η το οι τα του τησ των τον την και κι κ ειμαι εισαι ειναι ειμαστε ειστε
στο στον στη στην μα αλλα απο για προσ με σε ωσ παρα αντι κατα μετα θα να
δε δεν μη μην επι ενω εαν αν τοτε που πωσ ποιοσ ποια ποιο ποιοι ποιεσ
ποιων ποιουσ αυτοσ αυτη αυτο αυτοι αυτων αυτουσ αυτεσ αυτα εκεινοσ εκεινη
εκεινο εκεινοι εκεινεσ εκεινα εκεινων εκεινουσ οπωσ ομωσ ισωσ οσο οτι
""".split())


# --- Galician (gl/) ---

#: gl/stopwords.txt (GalicianAnalyzer default set)
GALICIAN_STOP_WORDS = frozenset("""
a aínda alí aquel aquela aquelas aqueles aquilo aquí ao aos as así á ben
cando che co coa comigo con connosco contigo convosco coas cos cun cuns
cunha cunhas da dalgunha dalgunhas dalgún dalgúns das de del dela delas
deles desde deste do dos dun duns dunha dunhas e el ela elas eles en era
eran esa esas ese eses esta estar estaba está están este estes estiven
estou eu é facer foi foron fun había hai iso isto la las lle lles lo los
mais me meu meus min miña miñas moi na nas neste nin no non nos nosa nosas
noso nosos nós nun nunha nuns nunhas o os ou ó ós para pero pode pois pola
polas polo polos por que se senón ser seu seus sexa sido sobre súa súas
tamén tan te ten teñen teño ter teu teus ti tido tiña tiven túa túas un
unha unhas uns vos vosa vosas voso vosos vós
""".split())


# --- Serbian (sr/) ---

#: SerbianNormalizationFilter (sr/SerbianNormalizationFilter.java:44-177):
#: Cyrillic -> bald Latin, Latin diacritics folded; ђ/đ→dj љ→lj њ→nj џ→dz
_SR_MAP = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "ђ": "dj", "đ": "dj",
    "е": "e", "ж": "z", "з": "z", "ž": "z", "и": "i", "ј": "j", "к": "k",
    "л": "l", "љ": "lj", "м": "m", "н": "n", "њ": "nj", "о": "o", "п": "p",
    "р": "r", "с": "s", "т": "t", "ћ": "c", "ц": "c", "ч": "c", "č": "c",
    "ć": "c", "у": "u", "ф": "f", "х": "h", "џ": "dz", "ш": "s", "š": "s",
}

#: SerbianNormalizationRegularFilter (sr/SerbianNormalizationRegularFilter
#: .java): Cyrillic -> Latin KEEPING the diacritic forms
_SR_REGULAR_MAP = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "ђ": "đ", "е": "e",
    "ж": "ž", "з": "z", "и": "i", "ј": "j", "к": "k", "л": "l", "љ": "lj",
    "м": "m", "н": "n", "њ": "nj", "о": "o", "п": "p", "р": "r", "с": "s",
    "т": "t", "ћ": "ć", "у": "u", "ф": "f", "х": "h", "ц": "c", "ч": "č",
    "џ": "dž", "ш": "š",
}


def serbian_normalize(term: str) -> str:
    """Serbian dual-alphabet fold to bald Latin (expects lowercase)."""
    return "".join(_SR_MAP.get(ch, ch) for ch in term)


def serbian_normalize_regular(term: str) -> str:
    """Serbian Cyrillic -> Latin keeping diacritics (expects lowercase)."""
    return "".join(_SR_REGULAR_MAP.get(ch, ch) for ch in term)
