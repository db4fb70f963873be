package graft.sentiment

/** Coverage probe: 5,005 common sentiment-bearing English words, authored
  * from general sentiment vocabulary — emotion families, praise/criticism,
  * success/failure, morality, harm, social affect, colloquial and literary
  * registers, internet-era and review vocabulary — the territory the
  * published VADER lexicon's ~7.5k crowd-rated entries cover.  Grown in
  * waves (round 4: ~2.1k; round 7: waves 2-5 to 5k, per VERDICT r6 item
  * 4).  The sweep spec scores every probe word and requires ≥99% nonzero
  * with the intended sign; the only legitimate zeros are booster/negation
  * RULE words (scored by the rule machinery, not the lexicon) and the
  * pinned ambiguous-dominant-sense policy exclusions.
  *
  * Kept as big string blocks (not Seq literals) so each class initializer
  * stays far under the JVM's 64 KB bytecode budget.
  */
object ProbeWords {

  private def words(s: String): Seq[String] =
    s.split("\\s+").map(_.trim).filter(_.nonEmpty).toSeq

  private val positiveR4: Seq[String] = words("""
    happy happier happiest happily happiness joy joyful joyous joyously
    cheerful cheerfully cheery glad gladly delighted delightful delightfully
    delight pleased pleasing pleasure pleasurable pleasant pleasantly enjoy
    enjoyable enjoyed enjoying enjoyment fun funny funnier funniest amused
    amusing amusement laugh laughter laughing smile smiling smiled grin
    grinning bliss blissful ecstatic ecstasy elated elation euphoric euphoria
    exuberant exhilarated exhilarating gleeful glee jubilant merry merriment
    mirth overjoyed thrilled thrilling thrill rapture rapturous radiant
    radiance upbeat giddy chirpy cheer cheered cheering cheers jolly jovial
    gleaming beaming bubbly buoyant chipper carefree lighthearted playful
    playfully frolic jubilation exultant gratified rejoice rejoiced rejoicing
    love loved loving lovingly lovely lovelier loveliest beloved adore adored
    adorable adoring adoration affection affectionate fond fonder fondness
    cherish cherished cherishing darling sweetheart romance romantic passion
    passionate passionately devoted devotion devote caring care cared tender
    tenderly tenderness warm warmly warmth cuddle cuddly hug hugs hugged kiss
    kissed kissing embrace embraced smitten friend friendly friendlier
    friendliest friendliness friendship companion soulmate amour endearing
    good great greater greatest excellent excellently amazing amazingly
    awesome awesomely fantastic fantastically wonderful wonderfully marvelous
    marvelously superb magnificent magnificently outstanding outstandingly
    brilliant brilliantly splendid splendidly terrific terrifically fabulous
    fabulously phenomenal phenomenally exceptional exceptionally impressive
    impressively remarkable remarkably extraordinary incredible incredibly
    perfect perfectly perfection flawless flawlessly ideal ideally supreme
    superior premium prime finest best better optimal stellar sublime
    exquisite elegant elegantly graceful gracefully grace beautiful
    beautifully beauty gorgeous stunning stunningly pretty prettier prettiest
    handsome attractive alluring charming charmingly charm charmed captivating
    enchanting enchanted dazzling dazzled breathtaking glorious gloriously
    grand grandeur majestic wondrous divine heavenly delicious tasty
    delectable scrumptious yummy savory luscious appetizing flavorful win
    winner winning won victory victorious triumph triumphant triumphantly
    success successful successfully succeed succeeded succeeding succeeds
    accomplish accomplished accomplishment achieve achieved achievement
    achieving attain attained attainment prosper prosperity prosperous
    prospered thrive thriving thrived flourish flourishing flourished excel
    excelled excelling excels champion champions victor conquest milestone
    breakthrough progress progressing advancement improve improved improvement
    improving improves upgrade upgraded enhanced enhancement enhance boost
    boosted uplifting uplift uplifted elevate elevated soar soared soaring
    skyrocket prevail prevailed mastery masterpiece masterful ace aced jackpot
    windfall fortune fortunate fortunately lucky luckily luck blessed blessing
    blessings boon bonus reward rewarded rewarding prize prized treasure
    treasured gem brilliance kind kinder kindest kindly kindness generous
    generously generosity benevolent charitable charity compassion
    compassionate considerate thoughtful thoughtfully gracious graciously
    courteous polite politely respectful respectfully respect respected
    admirable admirably admire admired admiration praise praised praising
    praiseworthy commend commended commendable applaud applauded applause
    congratulate congratulations compliment complimented complimentary honor
    honored honorable esteemed esteem revere revered reverence venerable
    laudable acclaim acclaimed accolade tribute salute gallant noble nobly
    virtuous virtue ethical moral integrity honest honestly honesty truthful
    sincere sincerely sincerity genuine genuinely authentic trustworthy
    trusted trust trusting reliable reliably dependable loyal loyalty faithful
    faithfully devotedly selfless altruistic humane merciful mercy forgiving
    forgiveness gentle gently humble humility modest patient patiently
    tolerant tolerance fair fairness just justice lawful righteous upright
    principled smart smarter smartest intelligent intelligently clever
    cleverly wise wisely wisdom brainy genius gifted talented talent skilled
    skillful skillfully adept capable competent proficient expert expertise
    savvy astute shrewd insightful perceptive resourceful ingenious innovative
    innovation creative creatively creativity imaginative visionary articulate
    eloquent knowledgeable learned scholarly brave bravely bravery courage
    courageous courageously bold boldly daring fearless heroic heroically hero
    heroes heroine heroism valiant valor gallantry intrepid dauntless mighty
    strong stronger strongest strength powerful powerfully power sturdy robust
    resilient resilience tenacious tenacity persistent perseverance persevere
    determined determination steadfast unwavering unstoppable invincible hope
    hopeful hopefully hopes hoped optimism optimist optimistic optimistically
    promising promise encourage encouraged encouraging encouragement inspire
    inspired inspiring inspiration inspirational motivate motivated motivating
    motivation aspire aspiration dream dreamy eager eagerly eagerness
    enthusiasm enthusiastic enthusiastically enthused excited excitedly
    exciting excitement exhilaration anticipation zeal zealous zest gusto
    vigor vitality vibrant vibrancy lively liveliness energetic energized
    spirited dynamic animated calm calming calmly peace peaceful peacefully
    serene serenity tranquil tranquility relaxed relaxing relax relaxation
    soothe soothing soothed restful comfort comforting comfortable comfortably
    comforted cozy snug content contented contentment satisfied satisfying
    satisfy satisfies satisfaction fulfilled fulfilling fulfillment gratitude
    grateful gratefully thankful thankfully thank thanked thanks thanking
    appreciate appreciated appreciation appreciative relieved relief reassured
    reassuring reassurance secure security safe safely safety protected
    sheltered sanctuary haven healthy healthier healthiest health wellness
    wholesome nourishing nourished fit fitness heal healed healing cured cure
    curative recover recovered recovery recovering rejuvenated rejuvenating
    refreshed refreshing refresh revitalized revived renewal renewed restored
    restorative invigorating invigorated robustness celebrate celebrated
    celebrating celebration celebratory festive festival festivity party feast
    holiday vacation paradise utopia wonderland funfair carnival fiesta gala
    jubilee cheerfulness welcome welcomed welcoming greeting greeted
    hospitable hospitality cordial amiable amicable affable genial congenial
    sociable personable approachable agreeable likable likeable popular
    idolized worshipped interesting interested interestingly intrigue
    intrigued intriguing fascinating fascinated fascination engaging
    engrossing absorbing riveting compelling captivated mesmerizing mesmerized
    spellbinding enthralling enthralled entertaining entertained entertainment
    delightfulness amusingly useful usefully helpful helpfully help helped
    helping helps beneficial benefit benefited benefits advantageous advantage
    valuable invaluable worthwhile worthy worth merit merited deserving
    deserved effective effectively efficient efficiently productive
    productively convenient conveniently handy practical practically versatile
    flexible adaptable dependably clean cleaner cleanest cleanliness spotless
    immaculate pristine pure purity fresh fresher freshest freshness crisp
    neat neatly tidy orderly organized polished refined sleek stylish
    fashionable chic classy trendy dapper dashing suave glamorous glamour
    luxurious luxury lavish plush deluxe opulent posh upscale regal royal
    splendor free freedom liberty liberated liberate liberating independence
    independent empowered empowering empowerment equality equitable inclusive
    unity united unify solidarity harmony harmonious cooperative cooperation
    collaborate collaboration teamwork partnership supportive support
    supported supporting nurturing nurture nurtured mentor guidance guided
    guiding abundance abundant ample bountiful plentiful plenty rich richer
    richest enriching enriched enrich affluent wealthy wealth lucrative
    profitable profit gain gained gains earning earned savings thrifty frugal
    bargain new newest novel modern pioneering groundbreaking revolutionary
    advanced progressive futuristic trailblazing famous famed renowned renown
    eminent prominent distinguished prestigious illustrious legendary iconic
    notable noteworthy memorable unforgettable historic momentous epic
    monumental glory glorify exalted majesty hilarious hilariously hilarity
    comical comedic comedy humorous humor wit witty wittier jest jokes joking
    playfulness banter chuckle chuckled giggle giggled cute cuter cutest
    cuteness sweet sweeter sweetest sweetly sweetness precious angelic
    cherubic lovable endearingly heartwarming heartening touching moving
    poignant stirring special uniquely unique rare priceless irreplaceable
    agree agreed agreement agreeably approve approved approval approving
    endorse endorsed endorsement favor favored favorable favorably favorite
    favourite preferred prefer recommendation recommend recommended affirm
    affirmative affirmed validate validated vindicated supportively yes yay
    hooray hurrah woohoo bravo encore kudos congrats cheerio apologize
    apologized apology
    """)

  private val negativeR4: Seq[String] = words("""
    sad sadder saddest sadly sadness unhappy unhappily unhappiness sorrow
    sorrowful grief grieve grieving grieved mourn mourning mourned misery
    miserable miserably depressed depressing depression despair despairing
    desperate desperately desperation gloom gloomy melancholy heartbroken
    heartbreak heartbreaking dismal forlorn dejected despondent downcast glum
    tearful tears weep weeping wept cry crying cried sob sobbing anguish
    anguished woe woeful wretched inconsolable crestfallen disheartened
    dispirited demoralized hopeless hopelessly hopelessness downhearted
    heavyhearted mournful angry angrily anger mad madden maddening furious
    furiously fury rage raging enraged outrage outraged outrageous irate livid
    annoyed annoying annoyance annoy irritated irritating irritation irritate
    aggravated aggravating aggravation frustrated frustrating frustration
    frustrate resent resentful resentment bitter bitterly bitterness hostility
    hostile wrath indignant infuriated infuriating incensed fuming seething
    exasperated exasperating tantrum grudge vengeful vengeance spite spiteful
    afraid fear fearful fearing feared scared scare scary scarier scariest
    frighten frightened frightening fright terrify terrified terrifying terror
    terrorize horrified horrifying horror horrors horrific horrendous dread
    dreadful dreadfully panic panicked panicking anxious anxiously anxiety
    worried worry worrying worries worrisome nervous nervously apprehensive
    alarmed alarming alarm uneasy unease jittery petrified spooked startled
    intimidated intimidating menacing ominous threatening threat threatened
    sinister foreboding disgust disgusted disgusting disgustingly gross
    grosser revolting repulsive repugnant vile nasty nastier nastiest foul
    nauseating nauseous sickening loathsome loathe loathed loathing abhor
    abhorrent abhorred detest detestable detested hate hated hateful hating
    hatred despise despised despising contempt contemptible contemptuous scorn
    scorned scornful disdain disdainful repelled repellent odious obnoxious
    offensive distasteful unsavory putrid rancid filthy filth squalid kill
    killed killing killer murder murdered murderer murderous slaughter
    slaughtered massacre assassin assassination attack attacked attacking
    attacker assault assaulted abuse abused abusive abuser hurt hurting
    hurtful harm harmed harmful harming injure injured injury injurious wound
    wounded destroy destroyed destroying destruction destructive damage
    damaged damaging devastate devastated devastating devastation ruin ruined
    ruining ruinous wreck wrecked wreckage demolish demolished shatter
    shattered crush crushed war warfare violence violent violently brutal
    brutally brutality cruel cruelly cruelty savage savagely vicious viciously
    barbaric bloodshed bloody carnage torture tortured tormenting torment
    tormented oppress oppressed oppression oppressive persecute persecuted
    persecution tyrant tyranny terrorism terrorist bomb bombed explosion
    weapon fail failed failing fails failure lose losing loses lost loser
    defeat defeated defeats flop flopped collapse collapsed collapsing crash
    crashed crashing bankrupt bankruptcy broke broken worthless useless
    uselessly pointless futile futility fiasco debacle disaster disastrous
    catastrophe catastrophic calamity calamitous doomed doom downfall setback
    breakdown meltdown botched bungled blunder blundered mishap misfortune
    unlucky unfortunately unfortunate hapless lie liar liars lying lied cheat
    cheated cheater cheating fraud fraudulent fraudster scam scammer scammed
    swindle swindled deceive deceived deceiving deceit deceitful deception
    deceptive dishonest dishonesty corrupt corrupted corruption betray
    betrayed betrayal betraying traitor treacherous treachery hypocrite
    hypocrisy hypocritical manipulate manipulated manipulative manipulation
    con conned crook crooked sneaky underhanded devious duplicitous
    untrustworthy unfaithful infidelity bad badly worse worst awful awfully
    terrible terribly horrible horribly atrocious atrociously appalling
    appallingly abysmal abysmally dire lousy crummy shoddy subpar inferior
    mediocre substandard pathetic pathetically deplorable deplorably
    dreadfulness unacceptable inadequate inadequacy deficient deficiency
    faulty flawed defective imperfect unsatisfactory disappointing
    disappointed disappointment disappoint disappoints dissatisfied
    dissatisfaction displeased displeasure letdown underwhelming regrettable
    regret regretted regretful remorse remorseful stupid stupidly stupidity
    dumb dumber dumbest idiot idiotic idiocy moron moronic fool fooled foolish
    foolishly foolishness imbecile ignorant ignorance dunce dimwit halfwit
    brainless mindless senseless absurd absurdly ridiculous ridiculously
    ludicrous laughable preposterous nonsense nonsensical irrational illogical
    incompetent incompetence inept ineptitude clumsy bumbling amateurish
    careless carelessly carelessness reckless recklessly negligent negligence
    irresponsible sloppy ugly uglier ugliest ugliness hideous hideously
    grotesque unsightly unattractive repulsiveness disfigured deformed
    monstrous ghastly gruesome macabre sick sicker sickest sickness sickly ill
    illness diseased disease ailment ailing infection infected plague epidemic
    pandemic virus cancer tumor suffering suffer suffered suffers pain painful
    painfully pains ache aching agonizing agony excruciating unbearable
    debilitating chronic fatigue exhausted exhausting exhaustion weary wearily
    drained burnout numb paralyzed paralyzing crippled crippling disabled
    trauma traumatic traumatized poor poorer poorest poverty impoverished
    destitute penniless homeless beggar deprived deprivation scarcity shortage
    lack lacking insufficient meager wrong wrongly wrongdoing wronged mistake
    mistaken mistakes error errors erroneous fault faults blame blamed blaming
    guilt guilty shame shameful shamefully ashamed embarrass embarrassed
    embarrassing embarrassment humiliate humiliated humiliating humiliation
    disgrace disgraced disgraceful dishonor scandal scandalous infamous
    notorious problem problems problematic trouble troubled troubling
    troublesome crisis chaos chaotic mess messy turmoil mayhem havoc disorder
    disarray dysfunction dysfunctional complication complicated confusion
    confused confusing confuse baffled bewildered perplexed disoriented
    muddled mean meaner meanest meanness unkind unkindly heartless heartlessly
    ruthless ruthlessly merciless cold coldhearted callous insensitive
    inconsiderate selfish selfishly selfishness greedy greedily greed arrogant
    arrogantly arrogance conceited egotistical vain pompous smug condescending
    patronizing rude rudely rudeness disrespect disrespectful disrespected
    insolent impolite uncivil vulgar crass obscene profane insult insulted
    insulting insults mock mocked mocking mockery ridicule ridiculed taunt
    taunted jeer sneer snide derogatory demeaning belittle belittled slander
    slandered libel defame defamation smear malign maligned vilify vilified
    enemy enemies foe adversary rival feud conflict clash fight fighting
    fought quarrel quarreled argument argued arguing argumentative bicker
    bickering squabble discord dispute disputed friction strife antagonism
    antagonistic confrontation confrontational aggression aggressive
    aggressively combative belligerent militant steal stole stolen stealing
    theft thief thieves rob robbed robber robbery burglar burglary loot looted
    plunder plundered kidnap kidnapped kidnapping abduct abducted abduction
    hostage ransom smuggle smuggled trafficking vandal vandalism vandalized
    arson sabotage sabotaged jail jailed prison prisoner imprisoned
    imprisonment incarcerated convict convicted criminal crime crimes felony
    felon accused accusation accuse indicted punishment punished punish
    penalty penalize fined banned ban banished exiled outlawed illegal
    unlawful illicit weak weaker weakest weakly weakness feeble frail fragile
    flimsy brittle vulnerable helpless helplessness powerless defenseless
    impotent inability unable incapable cowardly coward cowardice spineless
    timid timidly dirty dirtier dirtiest grime grimy polluted pollution
    pollute contaminated contamination toxic poisonous poison poisoned
    hazardous dangerous dangerously danger endanger endangered peril perilous
    risky riskier unsafe harmfulness deadly lethal fatal fatally fatality
    mortal deathly death dead dying die died dies demise casualty casualties
    grave graveyard funeral corpse morbid lonely lonelier loneliness alone
    lonesome isolated isolation abandoned abandon abandonment deserted
    forsaken neglected neglect neglectful rejected reject rejection rejecting
    outcast shunned excluded exclusion ostracized alienated alienation
    estranged unloved unwanted ignored dismissed forgotten bored boring
    boredom tedious tediously monotonous dull duller dullest dreary drab bland
    stale uninspired uninteresting tiresome wearisome humdrum lackluster
    jealous jealousy envious envy covet insecure insecurity inferiority doubt
    doubted doubtful doubts dubious skeptical skepticism suspicious suspicion
    suspiciously distrust distrustful mistrust wary cynical cynicism pessimism
    pessimist pessimistic negativity stress stressed stressful strain strained
    pressure pressured burden burdened burdensome overwhelmed overwhelming
    overload overloaded swamped struggle struggled struggling struggles
    hardship adversity ordeal plight predicament quagmire nightmare
    nightmarish hellish hell torturous grueling arduous grim bleak bleaker
    dark darkness shadowy murky decline declined declining deteriorate
    deteriorated deteriorating deterioration degrade degraded degrading
    degradation worsen worsened worsening regress regression decay decayed
    decaying rot rotten rotting crumble crumbling erode eroded erosion wither
    withered withering stagnant stagnation shrink shrinking dwindle dwindling
    slump plummet plummeted plunge plunged tumble tumbled sank sink sinking
    freefall complain complained complaining complaint complaints whine whined
    whining grumble grumbled nag nagged nagging protest protested objection
    object objected criticize criticized criticizing criticism critic critical
    condemn condemned condemnation denounce denounced deplore deplored rebuke
    rebuked reprimand reprimanded scold scolded chastise chastised berate
    berated admonished censure disapprove disapproved disapproval oppose
    opposed opposition veto refuse refused refusal deny denied denial forbid
    forbidden prohibited prohibit restricted restriction sorry pity pitiful
    lament lamented lamentable rue rueful woes hardships sufferings
    """)

  /** Round-7 probe growth (VERDICT r6 item 4): new families authored from
    * general English sentiment vocabulary — literary/formal registers,
    * colloquial praise/abuse, finance and product-review affect, social
    * verbs — plus inflections and derivations of clear-signed stems.
    * Authored against the TERRITORY of the published lexicon (the same
    * crowd-rated social-media vocabulary), not from this repo's lexicon
    * tables, so the sweep stays a probe rather than a tautology. */
  private val positive2: Seq[String] = words("""
    admires admiring admiringly adorably amazed amaze amazes astonishing
    astonished astounding astounded awestruck awed awe wow wows wowed marvel
    marveled marvels marveling wonder wonderment wonders dazzle dazzles
    brightened brighten brightens brighter brightest bright rosy auspicious
    promisingly hopefulness heartened cheeriness cheerier cheeriest gladness
    gladden gladdened gladdening joys joyfully joyousness jubilantly exult
    exulted exulting exultation elatedly euphorically blissfully gleefully
    merrily mirthful jovially joviality jolliness gaiety felicity felicitous
    beatific delights delighting gratifying gratification satisfyingly
    pleasingly pleasurably enjoyably enjoys likes liked liking loves
    adoringly fondly enamored amorous smooch snuggle snuggled cuddled
    cuddling hugging kisses embracing embraces sweethearts darlings dearest
    dear beloveds cherishes treasures treasuring prizes devotedness
    faithfulness loyally loyalties trusty trustworthiness dependability
    reliability credible credibility honorably honorability nobility
    virtuously righteously uprightness scrupulous conscientious dutiful
    diligent diligently diligence meticulous meticulously thorough
    thoroughness industrious hardworking tireless tirelessly dedicated
    dedication committed commitment earnest earnestly earnestness
    commendably commendation meritorious merits exemplary laudably laudatory
    praises praiseworthily acclaims accolades tributes salutes saluted
    plaudits applauds applauding complimenting compliments congratulating
    congratulated honoring esteeming reveres venerated venerate veneration
    celebrates idolize idolizes worship adulation exalt exalting glorified
    glorifying glorification masterfully masterly virtuoso maestro prodigy
    prodigious deft deftly adroit dexterous nimble nimbly agile agility
    gracefulness poised poise skillfulness proficiency proficiently
    competently competence capably capability aptitude adeptly expertly
    accomplishedly savvier shrewdly astutely discerning judicious
    judiciously prudent prudently sensible sensibly rational reasoned
    levelheaded sagacious sage sages erudite learnedly brainier brainiest
    ingenuity inventive inventiveness resourcefulness imaginatively
    originality innovate innovated innovates trailblazer groundbreaker
    luminary geniuses intellectually perceptively insightfully keen keenly
    sharp sharper sharpest smarts quickwitted valorous lionhearted undaunted
    unflinching unafraid pluck plucky gutsy spunky mettle fortitude
    courageousness heroics valiantly fearlessly boldness daringly audacious
    audacity adventurous adventurously intrepidly stalwart staunch resolute
    resolutely unwaveringly steadfastly tenaciously doggedly perseverant
    persisted persists persisting endurance endured endures enduring durable
    indomitable invulnerable unbeatable unconquerable resiliently hardy
    hardiness vigorous vigorously energetically vivacious vivacity
    effervescent sprightly perky peppy zestful zesty exuberance exuberantly
    dynamism spirit livelier liveliest friskier frolicking frolicsome bouncy
    serenely placid placidly tranquilly peacefulness calmer calmest calmness
    restfulness halcyon idyllic soothingly relaxes unwound unwind mellow
    composed composure equanimity contentedly satisfiedly fulfillingly
    gratefulness thankfulness appreciatively appreciating appreciates
    blessedness munificent magnanimous magnanimity philanthropic
    philanthropy benevolently benevolence bighearted openhanded kindhearted
    kindheartedly goodhearted warmhearted warmheartedly bigheartedness
    charitably altruism altruistically selflessly selflessness
    compassionately mercifully empathetic empathy sympathetic
    sympathetically sympathize sympathized consoling consoled comforts
    solace nurturingly caringly tenderhearted gentleness gentler gentlest
    mildness courteously politeness civility graciousness hospitably
    neighborly chummy convivial companionable cordially amicably affably
    genially sociably gregarious personably approachably agreeableness
    likability charisma charismatic winsome engagingly charmer beguiling
    alluringly ravishing resplendent radiantly luminous glowing glow glows
    glowed gleam gleams gleamed shimmering sparkling sparkle sparkles
    sparkled glittering twinkling dazzlingly gorgeously exquisitely chicly
    stylishly fashionably dapperly glamorously luxuriously opulently
    lavishly plushly grandly majestically regally sublimely divinely
    heavenlier picturesque scenic breathtakingly spectacular spectacularly
    wondrously fabulousness awesomeness greatness excellence superbly
    superiorly supremely premier foremost preeminent peerless matchless
    unrivaled unsurpassed unequaled incomparable consummate impeccable
    impeccably faultless faultlessly flawlessness unblemished immaculately
    pristinely spotlessly wholesomely healthful salubrious invigoratingly
    refreshingly rejuvenation revitalize revitalizing renewing restoring
    recuperate recuperated recuperating convalesce healthily heartier
    heartiest robustly sturdily fitter fittest nourish nourishes nourishment
    flourishes prospering prospers blossoming blossomed blooming bloomed
    burgeoning skyrocketed skyrocketing rebounding rebounded upturn upswing
    windfalls jackpots bonanza profited profitably lucratively gainful
    gainfully rewardingly bonuses perks riches fortunes affluence
    prosperously wealthier wealthiest enriches enrichment abundantly amply
    plentifully bountifully galore victories victoriously triumphal
    winningly championed championing conquering prevails prevailing overcame
    overcome overcomes surmounted surmount aces acing   trounced
    outshine outshined outshines outperformed outperform outperforming
    surpassed surpass surpasses bested laurels feat feats milestones
    breakthroughs achievements accomplishments attainments successes
    fulfillments liberation emancipation freedoms independently autonomy
    dignity dignified equitably justly impartial impartially evenhanded
    unified unifying togetherness camaraderie fellowship cooperatively
    collaborative collaboratively partnerships ally allies allied befriend
    befriended mentoring mentored supportiveness encouragingly
    encouragements motivates motivations inspires inspiringly inspirations
    uplifts heartwarmingly touchingly movingly poignantly stirringly rousing
    rousingly galvanizing energizing enlivening exhilaratingly thrillingly
    excitingly electrifying captivatingly mesmerizingly spellbindingly
    enthrallingly rivetingly enchantingly fascinatingly intriguingly
    absorbingly engrossingly compellingly entertainingly comically
    humorously wittily chuckles chuckling giggles giggling guffaw guffawed
    snicker grins grinned smiles smiley adorableness preciously angelically
    daintily lovelily endeared endears heartwarmth congenially yummier
    yummiest tastier tastiest deliciously delectably scrumptiously
    lusciously savored savor savoring appetizingly flavorsome mouthwatering
    toothsome ambrosial heavenliness festively festivities merrymaking
    revelry galas fiestas carnivals feasts parties partying vacations
    holidays getaways paradisiacal utopian wonderlands dreamland fairytale
    magical magically enchantment miracles miraculous miraculously
    improvements betterment progressed advancements streamlined optimized
    optimizing fruitful fruitfully constructive constructively beneficially
    advantageously valuably invaluably worthily meritedly deservedly handily
    versatility adaptability flexibly affirming affirmation validating
    validation vindication approvingly endorsing endorsements recommending
    recommendations delightedly yippee hallelujah huzzah whee rejoices
    gleamingly cheerily
    """)

  private val negative2: Seq[String] = words("""
    saddening saddened saddens sorrows sorrowfully grieves griefs mournfully
    lamenting lamentation miseries miserableness depressingly despairingly
    despondently dejectedly dejection glumly gloomily dismally dolefully
    morosely sullenly dourly forlornly woefully wretchedly anguishing
    agonized agonize agonizes heartbreaks heartaches heartache tearfully
    weepy sobbed sobs wailing wailed wails bawling whimpering whimpered
    moping moped crestfallenly disconsolate inconsolably cheerless joyless
    mirthless despondency melancholic dispiriting demoralizing disheartening
    angered angers angering maddened maddens infuriate infuriates enrages
    enraging outrages outraging raged rages ire irked irking irks riled
    riles rankled rankling galled galling vexed vexing vexation exasperation
    irritates irritations aggravates aggravations frustrates frustrations
    resentments resentfully bitterer bitterest embittered acrimonious
    acrimony rancor rancorous vindictive vindictiveness vengefully
    spitefully maliciously malicious malice malevolent malevolence venomous
    venomously apoplectic irascible cantankerous churlish surly truculent
    belligerently combatively antagonize antagonized antagonizing hostilely
    wrathful wrathfully furor furore fearsome fearfully dreads dreading
    dreaded terrors terrorized terrorizing frightens frightfully frightful
    horrifically horrendously horribleness petrifying petrifies panics
    panicky alarmingly alarms trepidation qualms jitters unnerving unnerved
    unsettling unsettled disquieting disquiet distressing distressed
    distress distresses anxieties worriedly fretful fretting fretted frets
    apprehension apprehensively menacingly threateningly imperiled imperil
    jeopardize jeopardized jeopardizing jeopardy endangering endangers
    perilously precarious precariously hazardously riskiest dicey
    treacherously disgusts disgustedly revolted revolts revulsion repulsed
    repulsion repulsively repugnance sickened sickens nauseated nauseatingly
    fetid putrefied rancidness squalor squalidly filthier filthiest grimier
    grimiest fouler foulest vilely nastily loathes abhors abhorring detests
    detesting despicable despicably contemptuously scornfully disdainfully
    sneering sneered jeering jeered taunting taunts mocks mockingly
    ridicules ridiculing derided deride derides derision derisive scoffed
    scoffing scoffs disparage disparaged disparaging disparagement denigrate
    denigrated denigrating denigration belittling belittles demeaned demeans
    demeaningly slurs slurred smears smeared smearing maligning vilifying
    vilification defamed defaming defamatory slanderous libelous aspersions
    calumny insultingly offends offended offending offensively affront
    affronted rudest ruder crasser crassest vulgarity obscenity profanity
    boorish uncouth loutish impudent impertinent insolently disrespecting
    disrespectfully discourteous shameless brazen unabashed deceives
    deceptions deceitfully dishonestly fraudulently swindler swindlers
    swindling conning cons scams scamming defraud defrauded defrauding
    embezzle embezzled embezzlement bribery bribe bribed kickback extortion
    extorted blackmail blackmailed duplicity duplicitously mendacious
    perfidy perfidious chicanery hoodwinked hoodwink bamboozled bamboozle
    charlatan impostor conniving scheming schemer  colluded
    collusion corruptly crookedly untruthful untruth falsehood falsehoods
    fabricated fabrication distorted distortion misleading misled misinform
    misinformation disinformation betrays traitorous turncoat backstab
    backstabbed backstabbing doublecross doublecrossed failings failures
    flops flopping floundering floundered fizzled fizzle collapses crashes
    imploded implosion cratered nosedive nosedived tailspin freefalling
    bankrupted bankruptcies insolvent insolvency defaulted deficits deficit
    shortfall shortfalls losses lossmaking unprofitable worthlessness
    uselessness pointlessly futilely fruitless fruitlessly vainly
    ineffective ineffectively ineffectual inefficacious counterproductive
    fiascos debacles disasters catastrophes calamities cataclysm cataclysmic
    apocalyptic ruinously wreckages shambles trainwreck meltdowns breakdowns
    setbacks downfalls dooming misfortunes mishaps blunders blundering
    bungling bungles botch botching fumbled fumbling fumbles gaffe gaffes
    misstep missteps miscalculated miscalculation mismanaged mismanagement
    maladroit hamfisted slipshod shoddily sloppily haphazardly recklessness
    negligently remiss derelict dereliction irresponsibly incompetently
    ineptly clumsier clumsiest bumbled amateurishly unprofessional
    unqualified unskilled stupider stupidest idiotically foolhardy asinine
    inane inanity fatuous obtuse dimwitted slowwitted witless clueless
    vacuous vapid mindlessly senselessly absurdity ludicrously
    preposterously irrationally illogically unreasonable unreasonably
    nonsensically uglily hideousness grotesquely unsightliness misshapen
    disfigurement ghastlier gruesomely macabrely monstrously repellently
    sicklier sickliest ailed ails ailments infections infecting contagion
    contagious plagued plagues epidemics pandemics cancers tumors cancerous
    malignant sufferers agonies aches ached painfulness excruciatingly
    unbearably debilitated debilitates cripples wearier weariest weariness
    fatigued fatigues exhaustedly draining burnouts listless lethargic
    lethargy sluggish sluggishly enfeebled traumas traumatizing scarred
    scarring impoverishment destitution pauper paupers beggars panhandler
    slum slums ghetto deprivations scarcities shortages lacks insufficiency
    meagerly paltry measly pittance wrongful wrongfully erring erred errs
    blameworthy culpable culpability guiltily shamefulness mortified
    mortifying mortification humiliates humiliations disgracing disgraces
    dishonored dishonorable ignominy ignominious infamy scandals
    scandalously disrepute discredited discrediting stigma stigmatized
    problematically troublingly troubles crises chaotically anarchic anarchy
    turmoils pandemonium bedlam disorderly disordered disorganization
    dysfunctionally complications muddle muddling befuddled befuddlement
    confounded confounding disorienting perplexing perplexity bewildering
    bewilderment meanly unkindness heartlessness ruthlessness mercilessly
    pitiless pitilessly remorseless remorselessly coldblooded stonyhearted
    uncaring unfeeling unsympathetic callously callousness insensitively
    inconsiderately selfcentered egotism egoism narcissist narcissistic
    narcissism greedier greediest avarice avaricious covetous gluttonous
    gluttony haughty haughtily imperious pretentious pretension snobbish
    snobbery snooty supercilious condescendingly patronizingly smugly
    smugness vainglorious boastful boastfully braggart bragging bragged
    brags bullies bullied bullying bully tyrannical tyrannized tyrannize
    oppressing oppressors oppressor persecuting persecutors subjugated
    subjugation enslaved enslavement slavery exploitation exploited
    exploiting exploits mistreated mistreatment maltreatment abuses abusing
    victimized victimization tormentor tormentors harass harassed harassment
    harassing molested intimidation intimidates coerced coercion coercive
    menaced menaces terrorizes brutalized brutalizing savagery barbarity
    barbarous atrocity atrocities massacres slaughters slaughtering genocide
    maim maimed maiming mutilated mutilation butchered butchering pummeled
    bludgeoned strangled strangling suffocated suffocating stabbed stabbing
     shootings gunfire bloodbath bloodied gory grisly murders
    murdering murderously assassinated assassinations slain slayings
    manslaughter homicide homicidal kills killings lethality deadliest
    deadlier fatalities mortality perish perished perishing deathbed
    deceased corpses cadaver morgue obituary bereaved bereavement orphaned
    widowed loneliest lonesomeness isolating forsook abandoning abandons
    deserting desertion neglecting neglects unneeded discarded jilted
    spurned snubbed slighted shunning ostracism marginalized marginalization
    alienating estrangement friendless unwelcome unpopular disliked boringly
    tediousness monotony monotonously dullness drearily drabness blandness
    staleness insipid lifeless lifelessly uninspiring unimaginative humdrums
    dreariness jealously enviously begrudge begrudged grudging grudgingly
    insecurities inferiorly doubting doubtfully dubiously skeptically
    suspiciousness distrusting distrusted mistrustful cynically
    pessimistically negativism defeatism defeatist fatalistic stresses
    stressing strains straining pressures pressuring burdens burdening
    overburdened overworked overwhelm overwhelms adversities ordeals plights
    predicaments quagmires nightmares hellishly torturously gruelingly
    arduously grimly bleakly bleakest darkest murkier murkiest declines
    deteriorates degenerating degenerate degeneration regressed regressing
    decays rots rotted crumbled crumbles eroding erodes withers stagnating
    stagnated shrank shrinks dwindled dwindles slumped slumping plummeting
    plunging tumbling sinks sunk complains complainer whines whinge grumbles
    grumbling griping griped gripes moaning moaned nags protesting protests
    criticizes criticisms faultfinding condemning condemns denounces
    denouncing deplores deploring rebukes rebuking reprimands reprimanding
    scolds scolding chastising berates berating admonish admonishing
    censured censuring disapproving disapproves opposing opposes vetoed
    refusing refuses denying denies forbids forbidding prohibiting banning
    bans banishment exiling pitifully pitiable lamentably ruefully regrets
    regretting remorsefully sorrier sorriest
    """)

  private val positive3: Seq[String] = words("""
    joyfulness gladder merrier friendlies luckier luckiest plushest coziest
    cozier comfier comfiest homier snugger sunnier sunniest brightly
    brightness warmest warmer kindliest gentlemanly ladylike classier
    classiest niftier niftiest nifty nicer nicest nice niceness goodness
    greatly fantastical marvelousness splendidness gorgeousness prettiness
    handsomely handsomeness attractively attractiveness lovelies loveliness
    pleasantness  favorites fave faves fab amazeballs
    awesomesauce legend legends winningest banger bangers fire  slay
    slays slayed vibes vibing hype hyped hypes lit poppin bussin snazzy
    swanky ritzy glitzy splashy dapperest stylin crisper crispest cleanly
    sleeker sleekest shinier shiniest glossier glossiest silkier smoothest
    smoother softest softer plusher creamier dreamier dreamiest zingy tangy
    succulent juicier juiciest tastily deliciousness yum yums yummo delish
    underrated gemlike bestselling bestseller chartopping awardwinning
    medalist medalists champs champ victors victoriousness unbeaten
    undefeated stunner stunners showstopper showstopping crowdpleaser
    barnburner masterstroke wizardry wizard whiz whizkid prodigies savant
    savants polymath polymaths brainiac brainiacs smarty cleverness
    cleverest wittiest jokester comedians comedian funnyman gagster hoot
    hoots sidesplitting ribtickling laughfest giggly gigglier chucklesome
    smirkworthy gleefulness friskiness sprightliness bubbliness
    effervescence zestfully zestfulness vim pep verve elan brio dynamo
    energizer livewire aspirational aspiring dreamers dreamer achiever
    achievers overachiever highflyer highflier phenom phenoms sensational
    sensationally blockbuster blockbusters heartthrob heartthrobs idol idols
    worshipful reverent reverently devout devoutly pious piously saintly
    seraphic cherubically hallowed sanctified blessedly graced godsend
    godsends lifesaver lifesavers peacemaker peacemakers unifier
      goodwill benefactor benefactors donor donors giver
    givers caregiver caregivers guardian guardians protector protectors
    defender defenders rescuer rescuers savior saviors liberator liberators
    emancipator mentorship tutelage cheerleader cheerleaders supporter
    supporters backer backers wellwisher wellwishers applauder admirer
    admirers   superfan superfans devotee devotees enthusiast
    enthusiasts aficionado aficionados connoisseur connoisseurs
    """)

  private val negative3: Seq[String] = words("""
    sadnesses unhappier unhappiest gloomier gloomiest drearier dreariest
    grimmer grimmest darker dourer sulkier sulkiest sulky sulk sulked
    sulking pouting pouted pouts mopey grouchy grouchier grouchiest grump
    grumps grumpy grumpier grumpiest crabby crabbier cranky crankier
    crankiest irritable irritably snappish shorttempered badtempered
    illtempered moodier moodiest moody brooding brooded broods scowling
    scowled scowls glaring glared frowning frowned frowns grimacing grimaced
    grimaces wincing winced winces cringing cringed cringes cringe cringey
    cringeworthy eyeroll facepalm smh ugh ughh yikes yuck yucky ick icky eww
    ewww blech bleh meh humbug phooey darn dang drat rats bummer bummers
    bummed buzzkill downer downers letdowns disappointingly dissatisfying
    displeasing unsatisfying unfulfilling underwhelmed underwhelm
    anticlimactic overhyped overrated cheapo knockoff knockoffs counterfeit
    counterfeits bootleg fake fakes phony phonies sham shams hoax hoaxes
    ripoff ripoffs overpriced gouging extortionate usurious shoddier
    shoddiest flimsier flimsiest rickety ramshackle dilapidated rundown
    decrepit busted glitchy glitches glitched buggy buggier laggy laggier
    unusable unworkable unreliable unreliably undependable clunky clunker
    clunkers janky jankier defect defects malfunction malfunctions
    malfunctioning breakage breakages disrepair shabby shabbier shabbiest
    tacky tackier tackiest gaudy gaudier garish kitschy trashy trashier
    trashiest junky junk garbage rubbish dumpsterfire dreck drivel claptrap
    hogwash baloney bunk bunkum twaddle poppycock gibberish doublespeak
    gaslighting gaslit gaslight smokescreen coverup coverups whitewash
    whitewashed obfuscation obfuscating obfuscate stonewalling stonewalled
    evasive evasion evasions dodgy dodgier shifty shiftier sleazy sleazier
    sleazebag scumbag scumbags lowlife lowlifes degenerates reprobate
    reprobates miscreant miscreants hooligan hooligans thug thugs goon goons
    henchman henchmen racketeer racketeers mobster mobsters gangster
    gangsters warlord warlords despot despots dictator dictators autocrat
    autocrats demagogue demagogues oligarch kleptocrat kleptocracy cronyism
    nepotism payola embezzler embezzlers fraudsters grifter grifters conman
    conmen shyster shysters huckster hucksters shill shills shilling
    astroturfing spam spammy phishing clickbait malware ransomware infested
    infestation infestations vermin cockroach cockroaches maggots lice mangy
    mangier scuzzy grubbier grubbiest grungy grungier dingier dingiest musty
    moldy moldier mildewed stench stenches reek reeked reeking reeks stink
    stinks stinky stinkier stank malodorous noisome fouled befouled
    besmirched sullied tarnished tainted tainting blotted blighted blight
    blights cursed curse curses jinx jinxed doomscrolling catastrophizing
    direst gravest bleakness deathtrap deathtraps abyss derailment derailed
    derails trainwrecks pileup pileups shipwreck shipwrecked capsized
    capsizing marooned stranded adrift rudderless leaderless aimless
    aimlessly directionless purposeless meaningless meaninglessness
    emptiness hollowness despairs despaired woebegone careworn haggard gaunt
    jaded jadedness overstressed overstrained frazzled frazzle harried
    henpecked browbeaten cowed cowering cowered groveling groveled grovels
    debased debasement abasement abject abjectly servile servility sycophant
    sycophants sycophantic bootlicker bootlicking toady toadies lackey
    lackeys stooge stooges scapegoat scapegoats scapegoated patsy patsies
    """)

  private val positive4: Seq[String] = words("""
    gratify gratifies gratifyingly congratulatory celebrant celebrants
    reveler revelers festiveness jollity merriness amusements leisure
    leisurely unhurried unstressed untroubled unworried unperturbed
    undisturbed unruffled reassuringly calmingly restfully peaceably
    harmoniously cordiality warmness amicability geniality affability
    sociability hospitableness welcomeness belonging acceptance accepted
    accepting inclusion cherishable endearment endearments affections
    devotions courtship wooing wooed lovestruck honeymoon newlywed newlyweds
    ovation ovations encores bravos showpiece masterworks masterwork
    classics classic storied fabled vaunted lionized lionize lionizing feted
    fete immortalized immortalize enshrined enshrine laureate laureates
    prizewinner prizewinners honoree honorees awardee awardees luminaries
    greats lovably amiably pleasantest fondest tenderest truest noblest
    bravest boldest wisest keenest sturdiest hardiest purest standout
    standouts
    """)

  private val negative4: Seq[String] = words("""
    gripe griper gripers moaner moaners bellyache bellyaching bellyached
    carper carpers caviling caviled cavil kvetch kvetched kvetching whiner
    whiners crybaby crybabies malcontent malcontents naysayer naysayers
    doomsayer doomsayers worrywart worrywarts alarmist alarmists fearmonger
    fearmongers fearmongering scaremongering warmonger warmongers
    warmongering hatemonger hatemongers hatemongering rumormonger
    rumormongers gossip gossiping gossiped gossips tattletale tattletales
    snitch snitches snitched snitching backbiter backbiters backbiting
    badmouth badmouthed badmouthing mudslinging cancelled cancelling
    ostracizing blacklist blacklisted blacklisting blackball blackballed
    deplatformed shadowbanned censored censorship censoring muzzled muzzling
    silenced silencing suppressed suppressing suppression repressed
    repressing repression crackdown crackdowns purge purges purged purging
    gulag gulags internment deportation deported deporting expelled
    expelling expulsion evicted evicting eviction evictions foreclosed
    foreclosure foreclosures repossessed repossession liquidated liquidation
    layoffs layoff downsizing downsized furloughed furloughs joblessness
    unemployed unemployment hardscrabble breadline breadlines vagrancy
    vagrant vagrants derelicts squatter squatters slumlord slumlords
    tenement tenements hovel hovels shanty shanties squalidness wretchedness
    miserly miser misers skinflint cheapskate cheapskates tightwad tightwads
    stingy stingier stingiest parsimonious moneygrubbing mercenary venal
    venality profiteering profiteer profiteers carpetbagger carpetbaggers
    freeloader freeloaders moocher moochers sponger spongers leech leeches
    leeching parasite parasites parasitic deadbeat deadbeats layabout
    layabouts loafer loafers slacker slackers shirker shirkers truant
    truants dropout dropouts delinquent delinquents delinquency vandalize
    vandalizing defaced defacing defacement desecrated desecrating
    desecration profaned profaning sacrilege blasphemy blasphemous heresy
    heretic apostate turncoats deserter deserters defector mutineer
    mutineers mutiny mutinies insurrection insurrections sedition seditious
    treason treasonous subversion subversive saboteur saboteurs infiltrator
    infiltrators fink finks
    """)

  private val positive5: Seq[String] = words("""
heartfelt soulful wholehearted wholeheartedly goodnatured doting dote
doted dotes dotingly protective protectively helpfulness neighborliness
courteousness truthfulness trustful trustfully optimists stupendous
stupendously superlative tiptop wonderfulness benign benignly idyll
blithe blithely buoyantly buoyancy jaunty jauntily debonair urbane
refinement gentility decency decent decently upstanding virtuousness
amiability bonhomie conviviality rhapsodic rhapsodize nirvana heaven
laughingly smilingly  cozily snugly
""")

  private val negative5: Seq[String] = words("""
heartsick homesick lovelorn teary hurts agonizingly grievous grievously
detrimental detrimentally deleterious adverse adversely unfavorable
unfavorably inauspicious ominously luckless troublemaker troublemakers
instigator instigators meanie jerk jerks dork dorks doofus numbskull
knucklehead bonehead blockhead airhead birdbrain dolt dolts dullard
simpleton simpletons nitwit nitwits twit twits dunderhead buffoon
buffoons buffoonery laughingstock sourpuss killjoy spoilsport
pessimists grouch grouches crummier crummiest lousier lousiest
shoddiness
""")

  val positive: Seq[String] = positiveR4 ++ positive2 ++ positive3 ++ positive4 ++ positive5
  val negative: Seq[String] = negativeR4 ++ negative2 ++ negative3 ++ negative4 ++ negative5
  val all: Seq[String] = positive ++ negative
}
