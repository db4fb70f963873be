package graft.sentiment

/** Round-4 coverage probe: ~2,100 common sentiment-bearing English words,
  * authored independently of the lexicon (drawn from general sentiment
  * vocabulary — emotion families, praise/criticism, success/failure,
  * morality, harm, social affect — the territory the published VADER
  * lexicon's ~7.5k head covers).  The sweep spec scores every probe word
  * and requires ≥95% nonzero with the intended sign; the residue is the
  * deliberately-unscored ambiguous tail (dominant sense neutral or
  * context-inverted), mirroring the round-3 650-word probe's policy.
  *
  * Kept as two big string blocks (not Seq literals) so the class
  * initializer stays far under the JVM's 64 KB bytecode budget.
  */
object ProbeWords {

  private def words(s: String): Seq[String] =
    s.split("\\s+").map(_.trim).filter(_.nonEmpty).toSeq

  val positive: Seq[String] = words("""
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

  val negative: Seq[String] = words("""
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

  val all: Seq[String] = positive ++ negative
}
