package graft.sentiment

/** Pure-Scala implementation of the VADER sentiment algorithm
  * (Hutto & Gilbert, "VADER: A Parsimonious Rule-based Model for Sentiment
  * Analysis of Social Media Text", ICWSM 2014 — public paper + MIT-licensed
  * reference implementation).
  *
  * Reference parity (SURVEY.md §2.5 U1): the reference calls
  * `SentimentIntensityAnalyzer().polarity_scores(text)['compound']` through a
  * Python UDF (`consumer/spark_streaming_job.py:15–25, 39, 134`). Re-hosting
  * the algorithm in the JVM deletes the Python serialization boundary — the
  * expensive per-row pickle round-trip the reference pays on every record —
  * which is the single largest throughput win over the reference pipeline.
  *
  * The published algorithm: lexicon valence lookup per token, modified by
  * degree adverbs (boosters, ±0.293, decayed 5%/10% at distance 2/3),
  * negation within a 3-token window (×−0.74), ALL-CAPS emphasis (±0.733 when
  * the document is mixed-case), "but" clause re-weighting (0.5 before /
  * 1.5 after), exclamation (+0.292 each, max 4) and question-mark
  * amplification, and normalization x/√(x²+α) with α=15.
  *
  * The embedded lexicon covers the published lexicon's high-frequency head
  * (~1.3 k hand-authored stems, widened to ~3 k entries by derived
  * inflections; VADER-scale valences in [−4, 4]). Bit-exact parity with the Python library
  * is neither achievable nor required (the DuckDB oracle cannot express VADER
  * either); golden ScalaTest cases define this engine's truth — see
  * VaderSpec. Thresholds (±0.05) and null→0.0 handling are the binding
  * semantics and live in SentimentFunctions.
  */
object Vader {

  // --- constants from the published algorithm ---
  private val BoostIncr  = 0.293
  private val BoostDecr  = -0.293
  private val CapsIncr   = 0.733
  private val NegScalar  = -0.74
  private val Alpha      = 15.0

  private[sentiment] val boosters: Map[String, Double] = {
    val incr = Seq("absolutely", "amazingly", "awfully", "completely",
      "considerably", "decidedly", "deeply", "enormously", "entirely",
      "especially", "exceptionally", "extremely", "fabulously", "fully",
      "greatly", "highly", "hugely", "incredibly", "intensely", "majorly",
      "more", "most", "particularly", "purely", "quite", "really",
      "remarkably", "so", "substantially", "thoroughly", "totally",
      "tremendously", "unbelievably", "unusually", "utterly", "very")
    val decr = Seq("almost", "barely", "hardly", "kinda", "less", "little",
      "marginally", "occasionally", "partly", "scarcely", "slightly",
      "somewhat", "sorta")
    (incr.map(_ -> BoostIncr) ++ decr.map(_ -> BoostDecr)).toMap
  }

  private[sentiment] val negations: Set[String] = Set(
    "aint", "arent", "cannot", "cant", "couldnt", "darent", "didnt",
    "doesnt", "ain't", "aren't", "can't", "couldn't", "daren't", "didn't",
    "doesn't", "dont", "hadnt", "hasnt", "havent", "isnt", "mightnt",
    "mustnt", "don't", "hadn't", "hasn't", "haven't", "isn't", "mightn't",
    "mustn't", "neednt", "needn't", "neither", "never", "none", "nope",
    "nor", "not", "nothing", "nowhere", "oughtnt", "oughtn't", "rarely",
    "seldom", "shant", "shan't", "shouldnt", "shouldn't", "wasnt", "wasn't",
    "werent", "weren't", "without", "wont", "won't", "wouldnt", "wouldn't",
    "despite")

  /** Hand-authored VADER-scale stems: token → mean valence in [−4, 4].
    * Values follow the published lexicon's scale and spirit (ICWSM-2014,
    * MIT-licensed `vader_lexicon.txt` — ~7.5 k crowd-rated entries); this
    * set covers its high-frequency head.  [[lexicon]] widens it further
    * with derived inflections. */
  private[sentiment] val baseLexicon: Map[String, Double] = Map(
    // strongly positive
    "amazing" -> 2.8, "awesome" -> 3.1, "best" -> 3.2, "brilliant" -> 2.8,
    "excellent" -> 3.2, "exceptional" -> 2.7, "extraordinary" -> 2.6,
    "fabulous" -> 2.9, "fantastic" -> 2.6, "great" -> 3.1, "incredible" -> 2.6,
    "love" -> 3.2, "loved" -> 2.9, "loves" -> 2.7, "lovely" -> 2.8,
    "magnificent" -> 2.9, "outstanding" -> 3.1, "perfect" -> 2.7,
    "phenomenal" -> 2.9, "spectacular" -> 2.8, "superb" -> 3.0,
    "terrific" -> 2.7, "wonderful" -> 2.7, "wow" -> 2.8, "stellar" -> 2.4,
    // positive
    "admire" -> 1.9, "adorable" -> 2.2, "adore" -> 2.9, "agree" -> 1.5,
    "amused" -> 1.6, "appreciate" -> 1.9, "attractive" -> 1.9, "beautiful" -> 2.9,
    "benefit" -> 1.5, "better" -> 1.9, "bless" -> 1.8, "calm" -> 1.3,
    "care" -> 2.2, "celebrate" -> 2.7, "champion" -> 2.4, "charming" -> 2.2,
    "cheerful" -> 2.5, "clean" -> 1.7, "clever" -> 2.0, "comfort" -> 1.5,
    "confident" -> 2.2, "cool" -> 1.3, "creative" -> 1.9, "cute" -> 2.0,
    "delight" -> 2.9, "delighted" -> 2.7, "delicious" -> 2.5, "easy" -> 1.9,
    "elegant" -> 2.1, "encourage" -> 2.3, "energetic" -> 1.9, "enjoy" -> 2.2,
    "enjoyed" -> 2.3, "enthusiastic" -> 2.3, "excited" -> 2.2, "exciting" -> 2.2,
    "fair" -> 1.7, "faith" -> 1.9, "fancy" -> 1.5, "fast" -> 0.9,
    "favorite" -> 2.0, "fine" -> 0.8, "free" -> 1.9, "fresh" -> 1.3,
    "friend" -> 2.2, "friendly" -> 2.2, "fun" -> 2.3, "funny" -> 1.9,
    "generous" -> 2.3, "gentle" -> 1.9, "gift" -> 1.9, "glad" -> 2.0,
    "good" -> 1.9, "grateful" -> 2.5, "happy" -> 2.7, "happiness" -> 2.6,
    "healthy" -> 1.7, "helpful" -> 1.8, "hope" -> 1.9, "hopeful" -> 2.0,
    "impressed" -> 2.1, "impressive" -> 2.3, "improve" -> 1.9,
    "improved" -> 2.1, "inspire" -> 2.4, "inspiring" -> 2.5, "interesting" -> 1.7,
    "joy" -> 2.8, "keen" -> 1.5, "kind" -> 2.4, "laugh" -> 2.6,
    "like" -> 1.5, "liked" -> 1.8, "likes" -> 1.7, "lucky" -> 2.4,
    "nice" -> 1.8, "optimistic" -> 2.4, "paradise" -> 2.9, "peace" -> 2.5,
    "peaceful" -> 2.2, "play" -> 1.5, "pleasant" -> 2.3, "please" -> 1.3,
    "pleased" -> 2.1, "pleasure" -> 2.6, "popular" -> 2.1, "positive" -> 2.3,
    "pretty" -> 2.2, "proud" -> 2.1, "recommend" -> 1.6, "relaxed" -> 1.9,
    "relief" -> 1.9, "rich" -> 2.2, "safe" -> 1.8, "satisfied" -> 2.0,
    "save" -> 2.2, "secure" -> 1.4, "smart" -> 1.7, "smile" -> 2.3,
    "smooth" -> 1.3, "special" -> 1.7, "strong" -> 2.3, "succeed" -> 2.4,
    "success" -> 2.7, "successful" -> 2.6, "super" -> 2.9, "support" -> 1.7,
    "sweet" -> 2.0, "thank" -> 1.9, "thanks" -> 1.9, "thrilled" -> 2.9,
    "top" -> 2.0, "triumph" -> 2.7, "trust" -> 2.3, "useful" -> 1.9,
    "valuable" -> 2.1, "victory" -> 2.8, "vibrant" -> 2.1, "warm" -> 1.6,
    "welcome" -> 2.0, "win" -> 2.8, "winner" -> 2.8, "wise" -> 2.2,
    "worthy" -> 1.9, "yes" -> 1.7, "yay" -> 2.4,
    // strongly negative
    "abysmal" -> -2.7, "atrocious" -> -2.8, "awful" -> -2.0, "disaster" -> -3.1,
    "disastrous" -> -2.9, "dreadful" -> -2.6, "hate" -> -2.7, "hated" -> -2.6,
    "hates" -> -2.3, "horrible" -> -2.5, "horrific" -> -3.0, "terrible" -> -2.1,
    "worst" -> -3.1, "evil" -> -3.4, "catastrophe" -> -2.6, "nightmare" -> -2.5,
    // negative
    "abandon" -> -1.9, "abuse" -> -3.2, "afraid" -> -2.2, "aggressive" -> -1.2,
    "alone" -> -1.0, "angry" -> -2.3, "annoy" -> -1.9, "annoyed" -> -1.8,
    "annoying" -> -1.7, "anxious" -> -1.9, "ashamed" -> -2.1, "bad" -> -2.5,
    "bitter" -> -1.8, "blame" -> -1.4, "bored" -> -1.3, "boring" -> -1.3,
    "broke" -> -1.1, "broken" -> -1.8, "cancel" -> -1.1, "cheap" -> -0.9,
    "cheat" -> -2.1, "complain" -> -1.6, "complaint" -> -1.5, "conflict" -> -1.4,
    "confused" -> -1.2, "crap" -> -1.8, "crash" -> -1.7, "crazy" -> -1.4,
    "cruel" -> -2.7, "cry" -> -2.1, "damage" -> -1.9, "danger" -> -2.4,
    "dangerous" -> -2.2, "dead" -> -3.3, "death" -> -2.9, "defeat" -> -2.0,
    "depressed" -> -2.3, "desperate" -> -1.8, "destroy" -> -2.5,
    "destroyed" -> -2.3, "die" -> -2.9, "difficult" -> -1.5, "dirty" -> -1.8,
    "disappoint" -> -1.8, "disappointed" -> -2.1, "disappointing" -> -2.0,
    "disgust" -> -2.4, "disgusting" -> -2.4, "dislike" -> -1.6, "doubt" -> -1.2,
    "dumb" -> -2.1, "embarrassed" -> -1.7, "enemy" -> -2.4, "error" -> -1.5,
    "fail" -> -2.3, "failed" -> -2.1, "failure" -> -2.3, "fake" -> -1.8,
    "fear" -> -2.2, "fight" -> -1.6, "fired" -> -1.8, "fool" -> -1.8,
    "forget" -> -0.9, "fraud" -> -2.6, "frustrated" -> -2.0,
    "frustrating" -> -1.9, "greedy" -> -2.1, "grief" -> -2.2, "guilty" -> -2.0,
    "harm" -> -2.4, "harsh" -> -1.8, "hell" -> -2.3, "hopeless" -> -2.5,
    "hurt" -> -2.2, "ignore" -> -1.3, "ill" -> -1.8, "injury" -> -1.9,
    "insane" -> -1.6, "insult" -> -2.2, "jealous" -> -1.8, "kill" -> -3.2,
    "lazy" -> -1.6, "lie" -> -1.9, "lied" -> -2.1, "lonely" -> -1.9,
    "lose" -> -1.7, "loser" -> -2.3, "loss" -> -1.7, "lost" -> -1.4,
    "mad" -> -2.2, "mess" -> -1.5, "miss" -> -0.8, "mistake" -> -1.7,
    "nasty" -> -2.4, "negative" -> -1.9, "nervous" -> -1.6, "no" -> -1.2,
    "pain" -> -2.3, "painful" -> -2.2, "panic" -> -2.2, "pathetic" -> -2.3,
    "poor" -> -1.9, "problem" -> -1.7, "reject" -> -1.7, "rejected" -> -2.0,
    "rude" -> -2.0, "ruin" -> -2.2, "ruined" -> -2.3, "sad" -> -2.1,
    "scam" -> -2.4, "scared" -> -2.0, "shame" -> -2.1, "sick" -> -1.9,
    "slow" -> -1.0, "sorry" -> -0.3, "stress" -> -1.8, "stressed" -> -1.9,
    "struggle" -> -1.7, "stupid" -> -2.4, "suck" -> -2.1, "sucks" -> -2.0,
    "suffer" -> -2.3, "terrified" -> -2.7, "threat" -> -2.1, "tired" -> -1.3,
    "tragedy" -> -2.9, "tragic" -> -2.5, "trash" -> -1.9, "trouble" -> -1.9,
    "ugly" -> -2.2, "unfair" -> -2.1, "unhappy" -> -2.2, "upset" -> -1.9,
    "useless" -> -1.9, "victim" -> -1.9, "violence" -> -2.9, "waste" -> -1.8,
    "weak" -> -1.8, "wrong" -> -1.9, "worried" -> -1.9, "worry" -> -1.9,
    // emoticons (the published lexicon carries these; the tokenizer keeps
    // punctuation-only tokens of length ≤ 2 and strips only the edges of
    // longer ones, so these survive tokenization)
    ":)" -> 2.0, ":-)" -> 2.2, ":d" -> 2.3, ":-d" -> 2.3, ";)" -> 1.6,
    ";-)" -> 1.6, ":(" -> -1.9, ":-(" -> -2.2, ":/" -> -1.4, ":-/" -> -1.4,
    ":p" -> 1.2, "<3" -> 2.8, ":o" -> 0.9, "=(" -> -1.9, "=)" -> 2.0,
    // --- round-2 coverage growth: the published lexicon's high-frequency
    // tail (same [−4, 4] scale; valences authored to its published spirit).
    // positive: approval / quality
    "ability" -> 1.3, "able" -> 1.1, "abundant" -> 1.9, "accept" -> 1.1,
    "accepted" -> 1.2, "accomplish" -> 1.9, "accomplished" -> 2.0,
    "accomplishment" -> 2.0, "achieve" -> 1.8, "achievement" -> 2.1,
    "active" -> 1.3, "admired" -> 2.2, "advantage" -> 1.6, "adventure" -> 1.4,
    "affection" -> 2.4, "affordable" -> 1.4, "agreeable" -> 1.6,
    "agreed" -> 1.2, "agreement" -> 1.2, "alive" -> 1.6, "amaze" -> 2.5,
    "amazed" -> 2.4, "ambitious" -> 1.5, "angel" -> 2.2, "appeal" -> 1.2,
    "appealing" -> 1.8, "applaud" -> 2.0, "appreciated" -> 2.1,
    "appreciation" -> 2.0, "approval" -> 1.7, "approve" -> 1.7,
    "approved" -> 1.8, "assure" -> 1.2, "assured" -> 1.3, "astonishing" -> 2.1,
    "attract" -> 1.4, "authentic" -> 1.6, "award" -> 2.4, "awarded" -> 2.2,
    "backed" -> 0.9, "balanced" -> 1.2, "beauty" -> 2.5, "beloved" -> 2.6,
    "beneficial" -> 1.8, "blessed" -> 2.8, "blessing" -> 2.6, "bliss" -> 2.9,
    "bold" -> 1.2, "bonus" -> 1.9, "boost" -> 1.5, "brave" -> 2.2,
    "bright" -> 1.8, "brighter" -> 1.9, "brilliance" -> 2.4, "calming" -> 1.6,
    "capable" -> 1.4, "celebrated" -> 2.2, "celebration" -> 2.5,
    "certain" -> 1.1, "charismatic" -> 2.1, "charitable" -> 1.9,
    "charity" -> 1.8, "cheer" -> 2.3, "cheered" -> 2.2, "cheers" -> 1.9,
    "cherish" -> 2.4, "classic" -> 1.3, "comfortable" -> 1.7,
    "comforting" -> 1.8, "commend" -> 1.8, "commitment" -> 1.3,
    "compassion" -> 2.2, "compassionate" -> 2.3, "compliment" -> 1.9,
    "confidence" -> 2.0, "congrats" -> 2.4, "congratulations" -> 2.7,
    "considerate" -> 2.0, "content" -> 1.4, "convenient" -> 1.4,
    "courage" -> 2.2, "courageous" -> 2.3, "courteous" -> 1.8,
    "craved" -> 0.9, "credible" -> 1.4, "cuddle" -> 2.2, "curious" -> 1.2,
    "darling" -> 2.3, "dazzling" -> 2.4, "dear" -> 1.6, "decent" -> 1.2,
    "dedicated" -> 1.6, "delightful" -> 2.6, "dependable" -> 1.7,
    "deserve" -> 1.0, "deserved" -> 1.3, "desirable" -> 1.6, "desire" -> 1.2,
    "determined" -> 1.4, "devoted" -> 1.9, "dignity" -> 1.6, "divine" -> 2.4,
    "dream" -> 1.5, "dynamic" -> 1.2, "eager" -> 1.6, "earnest" -> 1.3,
    "ecstatic" -> 2.9, "educated" -> 1.4, "effective" -> 1.5,
    "efficient" -> 1.6, "effortless" -> 1.7, "empower" -> 1.8,
    "empowered" -> 1.9, "enchanting" -> 2.3, "encouraged" -> 1.9,
    "encouraging" -> 2.0, "endorse" -> 1.4, "engaged" -> 1.2,
    "engaging" -> 1.5, "enhance" -> 1.4, "enhanced" -> 1.5, "enjoyable" -> 2.2,
    "enjoying" -> 2.2, "enjoys" -> 2.0, "enlightened" -> 1.8,
    "entertained" -> 1.8, "entertaining" -> 1.9, "enthusiasm" -> 2.2,
    "excel" -> 2.0, "excellence" -> 2.6, "excels" -> 2.0, "excitement" -> 2.3,
    "exquisite" -> 2.5, "faithful" -> 1.9, "fame" -> 1.6, "famous" -> 1.7,
    "fascinating" -> 2.1, "favor" -> 1.3, "favored" -> 1.5, "fearless" -> 1.9,
    "festive" -> 1.9, "fit" -> 1.1, "flawless" -> 2.5, "flourish" -> 2.0,
    "fond" -> 1.7, "forgive" -> 1.4, "forgiven" -> 1.5, "fortunate" -> 2.1,
    "fortune" -> 1.9, "freedom" -> 2.3, "friendship" -> 2.3, "fulfill" -> 1.6,
    "fulfilled" -> 1.9, "gain" -> 1.4, "gained" -> 1.4, "genius" -> 2.5,
    "gentleman" -> 1.6, "genuine" -> 1.8, "gifted" -> 2.0, "giving" -> 1.4,
    "glorious" -> 2.6, "glory" -> 2.2, "glow" -> 1.6, "glowing" -> 1.9,
    "goodness" -> 2.1, "gorgeous" -> 2.6, "grace" -> 1.9, "graceful" -> 2.0,
    "gracious" -> 2.0, "grand" -> 1.9, "gratitude" -> 2.3, "greater" -> 1.6,
    "greatest" -> 2.8, "grin" -> 1.7, "growth" -> 1.4, "guarantee" -> 1.2,
    "handsome" -> 2.1, "harmless" -> 1.0, "harmony" -> 2.0, "heal" -> 1.7,
    "healed" -> 1.8, "healing" -> 1.7, "heartfelt" -> 2.1, "heaven" -> 2.5,
    "heavenly" -> 2.5, "hero" -> 2.5, "heroic" -> 2.4, "highlight" -> 1.3,
    "hilarious" -> 2.2, "honest" -> 1.9, "honesty" -> 2.0, "honor" -> 2.1,
    "honored" -> 2.3, "hoping" -> 1.5, "hug" -> 2.1, "humble" -> 1.4,
    "humor" -> 1.6, "ideal" -> 1.9, "importance" -> 1.2, "important" -> 1.2,
    "improvement" -> 1.7, "improving" -> 1.7, "innocent" -> 1.2,
    "innovative" -> 1.8, "insightful" -> 1.9, "inspiration" -> 2.3,
    "inspirational" -> 2.4, "inspired" -> 2.2, "intelligent" -> 2.0,
    "interested" -> 1.4, "intimate" -> 1.4, "invincible" -> 1.8,
    "inviting" -> 1.6, "irresistible" -> 1.9, "joke" -> 1.1, "jolly" -> 2.1,
    "joyful" -> 2.7, "joyous" -> 2.7, "justice" -> 1.8, "kindness" -> 2.3,
    "laughed" -> 2.2, "laughing" -> 2.3, "laughter" -> 2.4, "legend" -> 2.0,
    "legendary" -> 2.1, "liberty" -> 1.9, "lively" -> 1.8, "logical" -> 1.2,
    "loving" -> 2.6, "loyal" -> 1.9, "loyalty" -> 1.9, "magic" -> 1.8,
    "magical" -> 2.1, "marvelous" -> 2.6, "masterpiece" -> 2.6,
    "mature" -> 1.2, "meaningful" -> 1.6, "memorable" -> 1.6, "merit" -> 1.4,
    "merry" -> 2.2, "mighty" -> 1.6, "miracle" -> 2.5, "motivated" -> 1.7,
    "motivation" -> 1.5, "neat" -> 1.5, "noble" -> 1.9, "nurture" -> 1.6,
    "okay" -> 0.9, "opportunity" -> 1.4, "optimism" -> 2.1, "original" -> 1.2,
    "passion" -> 1.9, "passionate" -> 2.0, "patience" -> 1.4, "patient" -> 1.2,
    "peacefully" -> 2.1, "perfection" -> 2.6, "perfectly" -> 2.3,
    "playful" -> 1.8, "pleasing" -> 1.9, "plentiful" -> 1.6, "polite" -> 1.7,
    "powerful" -> 1.7, "praise" -> 2.1, "praised" -> 2.1, "precious" -> 2.2,
    "prestige" -> 1.6, "privilege" -> 1.6, "prize" -> 1.9, "productive" -> 1.6,
    "profit" -> 1.6, "progress" -> 1.6, "promising" -> 1.7, "promote" -> 1.3,
    "promoted" -> 1.7, "prosperity" -> 2.1, "prosperous" -> 2.1,
    "protect" -> 1.3, "protected" -> 1.4, "proudly" -> 2.0, "pure" -> 1.5,
    "radiant" -> 2.2, "readily" -> 0.9, "reassure" -> 1.4, "refined" -> 1.3,
    "refreshing" -> 1.8, "relaxing" -> 1.8, "reliable" -> 1.7, "relieve" -> 1.5,
    "relieved" -> 1.8, "remarkable" -> 2.1, "rescue" -> 1.6, "rescued" -> 1.7,
    "resolve" -> 1.1, "resolved" -> 1.3, "respect" -> 1.9, "respected" -> 2.0,
    "respectful" -> 1.9, "restore" -> 1.2, "restored" -> 1.4, "revive" -> 1.4,
    "reward" -> 1.9, "rewarded" -> 2.0, "rewarding" -> 2.1, "right" -> 1.1,
    "robust" -> 1.4, "romantic" -> 1.9, "satisfaction" -> 1.9,
    "satisfying" -> 1.9, "saved" -> 1.8, "savior" -> 2.2, "secured" -> 1.4,
    "sensational" -> 2.3, "serene" -> 1.9, "share" -> 1.2, "shared" -> 1.2,
    "shine" -> 1.6, "shining" -> 1.8, "sincere" -> 1.8, "skilled" -> 1.6,
    "skillful" -> 1.7, "smarter" -> 1.8, "smiled" -> 2.2, "smiling" -> 2.4,
    "soothing" -> 1.7, "sophisticated" -> 1.5, "spirit" -> 1.3,
    "spirited" -> 1.5, "splendid" -> 2.5, "stable" -> 1.1, "steady" -> 1.1,
    "strength" -> 1.7, "stronger" -> 1.7, "strongest" -> 2.0, "stunning" -> 2.3,
    "succeeded" -> 2.2, "succeeding" -> 2.0, "successfully" -> 2.2,
    "sufficient" -> 1.0, "suitable" -> 1.1, "sunny" -> 1.9, "sunshine" -> 2.1,
    "superior" -> 1.8, "supported" -> 1.5, "supportive" -> 1.8,
    "supreme" -> 2.0, "surprise" -> 1.1, "surprised" -> 1.2, "sweetest" -> 2.5,
    "sweetheart" -> 2.6, "talent" -> 1.7, "talented" -> 1.9, "tasty" -> 1.9,
    "teach" -> 1.0, "tender" -> 1.5, "thankful" -> 2.2, "thoughtful" -> 1.8,
    "thrill" -> 2.0, "thrilling" -> 2.2, "thrive" -> 1.9, "thriving" -> 2.0,
    "tolerant" -> 1.3, "tranquil" -> 1.7, "treasure" -> 2.2, "treat" -> 1.3,
    "tremendous" -> 2.2, "true" -> 1.4, "truly" -> 1.2, "truth" -> 1.5,
    "truthful" -> 1.8, "unbeatable" -> 2.1, "unique" -> 1.4, "united" -> 1.4,
    "unity" -> 1.6, "uplifting" -> 2.2, "upgrade" -> 1.4, "upgraded" -> 1.5,
    "usefulness" -> 1.5, "value" -> 1.3, "valued" -> 1.7, "vigorous" -> 1.3,
    "virtue" -> 1.7, "vital" -> 1.2, "vivid" -> 1.4, "wealth" -> 2.0,
    "wealthy" -> 1.9, "welcomed" -> 1.9, "wellbeing" -> 1.9, "whole" -> 0.9,
    "willing" -> 1.0, "winning" -> 2.4, "wins" -> 2.2, "wisdom" -> 2.0,
    "wished" -> 1.0, "witty" -> 1.8, "won" -> 2.4, "wonder" -> 1.3,
    "wonderfully" -> 2.6, "worth" -> 1.3, "worthwhile" -> 1.7, "wholesome" -> 2.0,
    // negative: disapproval / harm / distress
    "abandoned" -> -2.0, "abducted" -> -2.5, "abhor" -> -2.6, "abort" -> -1.5,
    "absurd" -> -1.6, "abused" -> -3.0, "abusive" -> -2.9, "accident" -> -1.9,
    "accused" -> -1.8, "ache" -> -1.8, "aching" -> -1.8, "addicted" -> -1.7,
    "addiction" -> -1.9, "aggravated" -> -2.0, "aggression" -> -1.9,
    "agitated" -> -1.8, "agony" -> -2.7, "alarm" -> -1.4, "alarming" -> -1.9,
    "alienated" -> -1.8, "anger" -> -2.5, "angered" -> -2.3, "anguish" -> -2.5,
    "annoyance" -> -1.8, "anxiety" -> -2.0, "apathy" -> -1.3, "appalled" -> -2.2,
    "appalling" -> -2.3, "argue" -> -1.4, "argument" -> -1.5, "arrogant" -> -2.0,
    "assault" -> -2.6, "atrocity" -> -3.0, "attack" -> -2.1, "attacked" -> -2.1,
    "avoid" -> -1.0, "awkward" -> -1.2, "backlash" -> -1.6, "ban" -> -1.6,
    "banned" -> -1.8, "bankrupt" -> -2.4, "bankruptcy" -> -2.4, "battle" -> -1.4,
    "beaten" -> -1.9, "betray" -> -2.6, "betrayal" -> -2.7, "betrayed" -> -2.6,
    "bizarre" -> -1.1, "blamed" -> -1.6, "bleak" -> -1.8, "blind" -> -1.4,
    "bloody" -> -1.9, "bomb" -> -2.4, "bother" -> -1.3, "bothered" -> -1.4,
    "brutal" -> -2.6, "bullied" -> -2.4, "bully" -> -2.3, "burden" -> -1.6,
    "burn" -> -1.6, "burned" -> -1.6, "cancer" -> -2.8, "chaos" -> -1.9,
    "chaotic" -> -1.8, "cheated" -> -2.3, "cheater" -> -2.3, "clash" -> -1.4,
    "collapse" -> -1.9, "collapsed" -> -1.9, "complained" -> -1.6,
    "complaints" -> -1.6, "con" -> -1.4, "condemn" -> -2.0, "condemned" -> -2.1,
    "confusion" -> -1.3, "contempt" -> -2.0, "controversial" -> -1.1,
    "controversy" -> -1.2, "corrupt" -> -2.5, "corruption" -> -2.5,
    "costly" -> -1.2, "coward" -> -2.0, "crashed" -> -1.8, "crime" -> -2.3,
    "criminal" -> -2.2, "crisis" -> -2.2, "critical" -> -1.2,
    "criticism" -> -1.4, "criticize" -> -1.6, "criticized" -> -1.6,
    "crude" -> -1.4, "crushed" -> -1.9, "curse" -> -1.9, "cursed" -> -2.1,
    "cynical" -> -1.5, "damaged" -> -1.9, "damn" -> -1.6, "darkness" -> -1.2,
    "deceived" -> -2.2, "deception" -> -2.1, "decline" -> -1.2,
    "declined" -> -1.2, "defect" -> -1.6, "defective" -> -1.9,
    "defensive" -> -0.9, "deficit" -> -1.4, "degrade" -> -1.9,
    "degrading" -> -2.1, "dejected" -> -2.1, "delay" -> -1.1, "delayed" -> -1.2,
    "demise" -> -1.9, "demolish" -> -1.7, "denial" -> -1.3, "denied" -> -1.6,
    "deny" -> -1.3, "deprived" -> -1.8, "despair" -> -2.5, "despise" -> -2.4,
    "despised" -> -2.4, "destruction" -> -2.4, "destructive" -> -2.3,
    "deteriorate" -> -1.8, "devastated" -> -2.7, "devastating" -> -2.7,
    "devil" -> -2.4, "dictator" -> -2.2, "dying" -> -2.7, "dire" -> -1.9,
    "disabled" -> -1.3, "disadvantage" -> -1.5, "disagree" -> -1.2,
    "disagreement" -> -1.3, "disappointment" -> -2.1, "disapprove" -> -1.7,
    "discomfort" -> -1.5, "discouraged" -> -1.8, "discrimination" -> -2.2,
    "disease" -> -2.0, "disgrace" -> -2.2, "disgraceful" -> -2.3,
    "disgusted" -> -2.3, "dishonest" -> -2.2, "dismal" -> -2.0,
    "disorder" -> -1.5, "displeased" -> -1.8, "dispute" -> -1.3,
    "disregard" -> -1.4, "disrespect" -> -2.0, "disrespectful" -> -2.1,
    "disrupt" -> -1.4, "disruption" -> -1.4, "dissatisfied" -> -1.9,
    "distract" -> -1.1, "distraught" -> -2.2, "distress" -> -2.0,
    "distressed" -> -2.1, "disturbed" -> -1.8, "disturbing" -> -2.0,
    "divorce" -> -1.9, "doom" -> -2.1, "doomed" -> -2.3, "downfall" -> -1.9,
    "drag" -> -1.0, "drained" -> -1.5, "dread" -> -2.1, "dreaded" -> -2.2,
    "drown" -> -2.1, "drunk" -> -1.4, "dull" -> -1.3, "dump" -> -1.4,
    "dumped" -> -1.7, "egotistical" -> -1.8, "eliminate" -> -1.2,
    "embarrassing" -> -1.7, "embarrassment" -> -1.8, "emergency" -> -1.9,
    "endless" -> -0.8, "enraged" -> -2.5, "envious" -> -1.6, "envy" -> -1.5,
    "erratic" -> -1.3, "errors" -> -1.6, "exaggerate" -> -1.1,
    "excluded" -> -1.5, "excuse" -> -1.0, "exhausted" -> -1.8,
    "exhausting" -> -1.8, "expelled" -> -1.9, "expensive" -> -1.1,
    "exploit" -> -1.8, "exploited" -> -2.0, "explosion" -> -1.6,
    "extremist" -> -2.0, "failing" -> -2.0, "fails" -> -1.9, "fallen" -> -1.3,
    "false" -> -1.5, "fatal" -> -2.5, "fatigue" -> -1.4, "fault" -> -1.5,
    "faulty" -> -1.7, "feared" -> -2.0, "fearful" -> -2.1, "fears" -> -1.9,
    "fell" -> -0.9, "fever" -> -1.4, "fiasco" -> -2.1, "filthy" -> -2.1,
    "flaw" -> -1.5, "flawed" -> -1.7, "flee" -> -1.5, "forced" -> -1.3,
    "forgotten" -> -1.2, "foul" -> -1.9, "fragile" -> -1.1, "frantic" -> -1.6,
    "freak" -> -1.4, "frightened" -> -2.1, "frightening" -> -2.2,
    "frustration" -> -1.9, "furious" -> -2.5, "gloom" -> -1.9, "gloomy" -> -1.9,
    "grave" -> -1.6, "greed" -> -2.1, "grim" -> -1.8, "gross" -> -1.9,
    "grudge" -> -1.6, "guilt" -> -1.9, "harassed" -> -2.2, "harassment" -> -2.3,
    "hardship" -> -1.8, "harmed" -> -2.2, "harmful" -> -2.2, "hatred" -> -2.9,
    "hazard" -> -1.8, "hazardous" -> -1.9, "heartbreak" -> -2.5,
    "heartbreaking" -> -2.6, "heartbroken" -> -2.7, "hellish" -> -2.4,
    "helpless" -> -1.9, "hideous" -> -2.2, "hoax" -> -1.8, "homeless" -> -1.9,
    "horrendous" -> -2.6, "horrified" -> -2.6, "horrifying" -> -2.7,
    "horror" -> -2.5, "hostile" -> -2.1, "humiliated" -> -2.4,
    "humiliating" -> -2.4, "humiliation" -> -2.4, "hunger" -> -1.6,
    "hungry" -> -1.1, "hurricane" -> -1.8, "hurting" -> -2.1, "hurts" -> -2.1,
    "hysteria" -> -1.7, "idiot" -> -2.3, "idiotic" -> -2.3, "ignorant" -> -1.9,
    "ignored" -> -1.5, "illegal" -> -2.0, "illness" -> -1.9, "immoral" -> -2.1,
    "impatient" -> -1.3, "impossible" -> -1.4, "inability" -> -1.3,
    "inadequate" -> -1.6, "incompetent" -> -2.1, "inconsiderate" -> -1.8,
    "inconvenient" -> -1.4, "incorrect" -> -1.4, "indifferent" -> -0.9,
    "ineffective" -> -1.6, "inefficient" -> -1.6, "inferior" -> -1.7,
    "inflict" -> -1.8, "injured" -> -2.0, "injustice" -> -2.3,
    "insecure" -> -1.6, "insensitive" -> -1.7, "insulted" -> -2.2,
    "insulting" -> -2.2, "intimidated" -> -1.8, "intolerant" -> -1.8,
    "invasion" -> -1.9, "irrational" -> -1.4, "irresponsible" -> -1.8,
    "irritated" -> -1.9, "irritating" -> -1.9, "isolated" -> -1.4,
    "jail" -> -1.9, "jerk" -> -1.9, "judgmental" -> -1.5,
    "killed" -> -3.0, "killing" -> -2.8, "lack" -> -1.3, "lacking" -> -1.4,
    "lame" -> -1.7, "lawsuit" -> -1.5, "leak" -> -1.2, "liar" -> -2.3,
    "lies" -> -1.8, "limited" -> -0.9, "livid" -> -2.3, "losing" -> -1.8,
    "losses" -> -1.7, "lousy" -> -2.0, "low" -> -1.1, "lying" -> -2.1,
    "madness" -> -1.7, "malicious" -> -2.4, "manipulate" -> -1.9,
    "manipulated" -> -2.0, "massacre" -> -3.1, "meaningless" -> -1.7,
    "messed" -> -1.6, "messy" -> -1.4, "miserable" -> -2.5, "misery" -> -2.5,
    "misleading" -> -1.8, "missed" -> -1.1, "missing" -> -1.3,
    "mistaken" -> -1.5, "mistakes" -> -1.7, "mock" -> -1.7, "mocked" -> -1.8,
    "moody" -> -1.3, "mourn" -> -2.2, "mourning" -> -2.2, "murder" -> -3.3,
    "murdered" -> -3.2, "neglect" -> -1.9, "neglected" -> -2.0,
    "nightmarish" -> -2.5, "noisy" -> -1.1, "nonsense" -> -1.5,
    "obnoxious" -> -2.0, "offend" -> -1.8, "offended" -> -1.9,
    "offensive" -> -2.0, "oppressed" -> -2.0, "outdated" -> -1.1,
    "outrage" -> -2.2, "outraged" -> -2.3, "outrageous" -> -2.0,
    "overdue" -> -1.1, "overpriced" -> -1.7, "overwhelmed" -> -1.3,
    "panicked" -> -2.1, "paranoid" -> -1.7, "pessimistic" -> -1.8,
    "petty" -> -1.4, "phony" -> -1.8, "pissed" -> -2.3, "pitiful" -> -2.0,
    "pity" -> -1.4, "poison" -> -2.2, "poisonous" -> -2.3, "polluted" -> -1.9,
    "pollution" -> -1.8, "poverty" -> -2.1, "powerless" -> -1.7,
    "prejudice" -> -2.0, "pressure" -> -1.1, "prison" -> -1.9,
    "problematic" -> -1.6, "problems" -> -1.7, "protest" -> -1.2,
    "punish" -> -1.9, "punished" -> -2.0, "punishment" -> -2.0,
    "quit" -> -1.2, "racist" -> -2.8, "rage" -> -2.4, "rant" -> -1.3,
    "rebellion" -> -1.3, "reckless" -> -1.9, "refusal" -> -1.4,
    "refuse" -> -1.3, "refused" -> -1.5, "regret" -> -1.9, "regretful" -> -2.0,
    "regrets" -> -1.9, "rejection" -> -2.1, "remorse" -> -1.9,
    "resent" -> -1.9, "resentment" -> -1.9, "restless" -> -1.2,
    "revenge" -> -2.0, "ridicule" -> -1.9, "ridiculous" -> -1.6,
    "riot" -> -1.8, "risk" -> -1.3, "risky" -> -1.4, "rotten" -> -2.1,
    "rough" -> -1.3, "ruthless" -> -2.2, "sabotage" -> -2.1, "sadness" -> -2.2,
    "savage" -> -1.9, "scandal" -> -2.0, "scandalous" -> -2.1, "scare" -> -1.9,
    "scary" -> -2.0, "scream" -> -1.6, "screaming" -> -1.7, "screwed" -> -1.9,
    "selfish" -> -2.0, "severe" -> -1.7, "shady" -> -1.6, "shameful" -> -2.2,
    "shameless" -> -1.9, "shatter" -> -1.8, "shattered" -> -2.0,
    "shock" -> -1.4, "shocked" -> -1.5, "shocking" -> -1.6, "shortage" -> -1.4,
    "sickening" -> -2.4, "sinister" -> -2.1, "skeptical" -> -1.2,
    "slap" -> -1.6, "slaughter" -> -2.9, "slave" -> -2.2, "sloppy" -> -1.6,
    "sluggish" -> -1.3, "smash" -> -1.3, "smashed" -> -1.4, "sob" -> -1.9,
    "sobbing" -> -2.1, "somber" -> -1.6, "sore" -> -1.4, "sorrow" -> -2.3,
    "spam" -> -1.6, "spite" -> -1.8, "steal" -> -2.2, "stealing" -> -2.2,
    "stink" -> -1.8, "stinks" -> -1.8, "stolen" -> -2.1, "storm" -> -1.1,
    "strain" -> -1.3, "strange" -> -0.9, "stressful" -> -1.9, "strict" -> -1.1,
    "struggled" -> -1.7, "struggling" -> -1.8, "stuck" -> -1.3,
    "stupidity" -> -2.3, "suffered" -> -2.2, "suffering" -> -2.3,
    "suspicious" -> -1.5, "swear" -> -1.2, "tension" -> -1.4,
    "terribly" -> -2.2, "terror" -> -2.8, "terrorism" -> -3.1,
    "terrorist" -> -2.9, "theft" -> -2.1, "threaten" -> -2.1,
    "threatened" -> -2.1, "threatening" -> -2.2, "tortured" -> -2.8,
    "torture" -> -2.8, "toxic" -> -2.1, "tragically" -> -2.5, "trapped" -> -1.8,
    "traumatic" -> -2.4, "troubled" -> -1.8, "troubling" -> -1.8,
    "turmoil" -> -1.8, "unacceptable" -> -1.9, "unbearable" -> -2.2,
    "uncertain" -> -1.1, "uncomfortable" -> -1.5, "unemployed" -> -1.7,
    "unfairly" -> -2.0, "unfortunate" -> -1.8, "unfortunately" -> -1.6,
    "ungrateful" -> -1.9, "unhealthy" -> -1.7, "unjust" -> -2.1,
    "unlucky" -> -1.7, "unpleasant" -> -1.8, "unprofessional" -> -1.8,
    "unreliable" -> -1.7, "unsafe" -> -1.8, "unstable" -> -1.5,
    "unsuccessful" -> -1.8, "unwanted" -> -1.6, "unworthy" -> -1.8,
    "urgent" -> -1.0, "vain" -> -1.3, "vanish" -> -1.1, "vengeance" -> -2.1,
    "vicious" -> -2.3, "villain" -> -2.1, "violent" -> -2.6, "virus" -> -1.8,
    "vulnerable" -> -1.2, "war" -> -2.4, "warned" -> -1.3, "warning" -> -1.4,
    "wasted" -> -1.9, "weakness" -> -1.6, "weep" -> -2.0, "weird" -> -0.9,
    "whine" -> -1.5, "wicked" -> -1.9, "widespread" -> -0.5, "worse" -> -2.1,
    "worthless" -> -2.2, "wound" -> -1.9, "wounded" -> -2.0, "wreck" -> -1.9,
    "wrecked" -> -2.0,
    // social-media slang / abbreviations (the published lexicon covers these)
    "lol" -> 1.6, "lmao" -> 1.9, "rofl" -> 2.0, "haha" -> 2.0, "hahaha" -> 2.2,
    "hehe" -> 1.5, "omg" -> 0.8, "wtf" -> -2.1, "meh" -> -0.8, "ugh" -> -1.6,
    "yikes" -> -1.2, "yuck" -> -1.8, "eww" -> -1.8, "ew" -> -1.6,
    "woohoo" -> 2.4, "yippee" -> 2.4, "hooray" -> 2.5, "bravo" -> 2.3,
    "kudos" -> 2.1, "thx" -> 1.6, "ty" -> 1.5, "np" -> 1.0, "pls" -> 0.3,
    "smh" -> -1.3, "fml" -> -2.4, "ffs" -> -2.0, "damnit" -> -1.9,
    "dammit" -> -1.9, "goddamn" -> -1.8, "bs" -> -1.7, "sux" -> -1.9,
    "epic" -> 2.0, "noob" -> -1.2, "salty" -> -1.1,
    "lit" -> 1.8, "dope" -> 1.7, "fire" -> 1.2, "goat" -> 2.0, "based" -> 1.1, "cringe" -> -1.7,
    "cringey" -> -1.7, "mid" -> -0.8, "slay" -> 1.9,
    "stan" -> 1.3, "vibes" -> 1.4)

  /** Derived inflections widen [[baseLexicon]] toward the published
    * lexicon's coverage: common English suffix forms carry the stem's
    * valence when not hand-authored.  Generated non-words ("gooder") are
    * harmless — they are never looked up; real-but-neutral derivations
    * that would misfire ("numb" → "number") are stoplisted. */
  private val neutralDerived: Set[String] = Set(
    "number", "numbers", "numbered", "numbering", "matter", "matters",
    "mattered", "winder", "fonder", "wander", "wonders", "founder",
    "flatter", "singer", "letter", "litter", "ladder", "differ",
    "corner", "conner", "cooler", "dummy",
    // audited collisions: real words whose meaning departs from the stem
    "sober",    // ≠ sob
    "liter",    // ≠ lit (slang)
    "stranger", // noun, not the comparative of strange
    "doper",    // drug user, not dope (slang praise)
    "fires",    // literal fires ≠ "fire" (slang praise)
    "supers", "tenders")

  private[sentiment] val inflected: Map[String, Double] = {
    val out = scala.collection.mutable.Map[String, Double]()
    baseLexicon.foreach { case (w, v) =>
      if (w.length >= 3 && w.forall(_.isLetter)) {
        val forms =
          if (w.endsWith("e")) Seq(w + "d", w + "s", w + "r")
          else if (w.endsWith("y")) Seq(w.dropRight(1) + "ies", w.dropRight(1) + "ied", w.dropRight(1) + "ier")
          else Seq(w + "ed", w + "ing", w + "s", w + "er")
        forms.foreach { f =>
          if (!baseLexicon.contains(f) && !neutralDerived.contains(f) &&
              !boosters.contains(f) && !negations.contains(f))
            out.getOrElseUpdate(f, v): Unit
        }
      }
    }
    out.toMap
  }

  /** Full lookup lexicon (hand-authored entries win over derived forms). */
  private[sentiment] val lexicon: Map[String, Double] = inflected ++ baseLexicon

  /** Published special-case idioms (ICWSM-2014 reference implementation):
    * multi-word expressions whose sentiment overrides the word-level
    * lexicon ("the bomb" is praise, "yeah right" is sarcasm).  Bigrams and
    * trigrams, matched on the lookup token stream; matched positions are
    * scored once, at the idiom's head, with the idiom's valence. */
  private[sentiment] val idiomBigrams: Map[(String, String), Double] = Map(
    ("the", "shit") -> 3.0, ("the", "bomb") -> 3.0, ("bad", "ass") -> 1.5,
    ("yeah", "right") -> -2.0)

  private[sentiment] val idiomTrigrams: Map[(String, String, String), Double] = Map(
    ("cut", "the", "mustard") -> 2.0, ("kiss", "of", "death") -> -1.5,
    ("hand", "to", "mouth") -> -2.0)

  private val punctStrip = "^[\\p{Punct}]+|[\\p{Punct}]+$"

  /** Tokenize like VADER: whitespace split, strip leading/trailing
    * punctuation from words longer than 2 chars — but a token whose raw
    * lowercase form is itself in the lexicon (emoticons like ":-)") is kept
    * verbatim, as the published implementation does. Returns
    * (original, lookup-form) pairs. */
  private[sentiment] def tokenize(text: String): Array[(String, String)] =
    text.split("\\s+").filter(_.nonEmpty).map { w =>
      val rawLower = w.toLowerCase
      val lookup =
        if (lexicon.contains(rawLower)) rawLower
        else {
          val stripped =
            (if (w.length > 2) w.replaceAll(punctStrip, "") else w).toLowerCase
          if (stripped.isEmpty) rawLower else stripped
        }
      (w, lookup)
    }

  private def isUpper(w: String): Boolean =
    w.length > 1 && w.exists(_.isLetter) && w.filter(_.isLetter).forall(_.isUpper)

  /** The compound score in [−1, 1]; the reference's only consumed output. */
  def compound(text: String): Double = {
    if (text == null || text.trim.isEmpty) return 0.0
    val toks = tokenize(text)
    if (toks.isEmpty) return 0.0
    val lower = toks.map(_._2)
    val mixedCase = {
      val caps = toks.count(t => isUpper(t._1))
      caps > 0 && caps < toks.length
    }

    val butIdx = lower.indexOf("but")
    val sentiments = new Array[Double](toks.length)

    // idiom pass: trigrams first (longest match wins), then bigrams; the
    // head position carries the idiom valence, the tail positions score 0
    val idiomAt = new Array[Double](toks.length)
    val idiomHead = new Array[Boolean](toks.length)
    val idiomTail = new Array[Boolean](toks.length)
    var k = 0
    while (k < lower.length) {
      if (!idiomTail(k) && k + 2 < lower.length &&
          idiomTrigrams.contains((lower(k), lower(k + 1), lower(k + 2)))) {
        idiomAt(k) = idiomTrigrams((lower(k), lower(k + 1), lower(k + 2)))
        idiomHead(k) = true; idiomTail(k + 1) = true; idiomTail(k + 2) = true
        k += 3
      } else if (!idiomTail(k) && k + 1 < lower.length &&
          idiomBigrams.contains((lower(k), lower(k + 1)))) {
        idiomAt(k) = idiomBigrams((lower(k), lower(k + 1)))
        idiomHead(k) = true; idiomTail(k + 1) = true
        k += 2
      } else k += 1
    }

    var i = 0
    while (i < toks.length) {
      val (orig, word) = toks(i)
      var valence = 0.0
      val isBoosterHere = boosters.contains(word)
      if (idiomHead(i)) {
        valence = idiomAt(i)
        // clause re-weighting still applies to idioms
        if (butIdx >= 0) {
          if (i < butIdx) valence *= 0.5
          else if (i > butIdx) valence *= 1.5
        }
      } else if (idiomTail(i)) {
        // consumed by the idiom at its head — contributes nothing itself
      } else if (!isBoosterHere && lexicon.contains(word)) {
        valence = lexicon(word)
        // ALL-CAPS emphasis on the sentiment-bearing word itself
        if (mixedCase && isUpper(orig))
          valence += (if (valence > 0) CapsIncr else -CapsIncr)
        // look back up to 3 tokens for boosters and negations
        var dist = 1
        while (dist <= 3 && i - dist >= 0) {
          val (_, prev) = toks(i - dist)
          if (!lexicon.contains(prev)) {
            boosters.get(prev).foreach { b0 =>
              val b = if (valence < 0) -b0 else b0
              val decay = dist match {
                case 1 => 1.0
                case 2 => 0.95
                case 3 => 0.9
              }
              valence += b * decay
            }
            if (negations.contains(prev)) {
              // published special case: "never so X" / "never this X" is an
              // intensifier (×1.25), not a negation
              val neverBoost = prev == "never" && dist >= 2 && {
                var j2 = i - dist + 1
                var found = false
                while (j2 < i && !found) {
                  if (lower(j2) == "so" || lower(j2) == "this") found = true
                  j2 += 1
                }
                found
              }
              valence *= (if (neverBoost) 1.25 else NegScalar)
            }
            // "least X" de-amplifies unless preceded by "at" ("at least")
            if (dist == 1 && prev == "least" &&
                (i - 2 < 0 || lower(i - 2) != "at")) valence *= NegScalar
          }
          dist += 1
        }
        // "but" clause re-weighting
        if (butIdx >= 0) {
          if (i < butIdx) valence *= 0.5
          else if (i > butIdx) valence *= 1.5
        }
      }
      sentiments(i) = valence
      i += 1
    }

    var sum = sentiments.sum
    if (sum != 0.0) {
      // punctuation emphasis (published amplification rules)
      val epCount = math.min(text.count(_ == '!'), 4)
      val epAmp = epCount * 0.292
      val qmCount = text.count(_ == '?')
      val qmAmp = if (qmCount > 1) { if (qmCount <= 3) qmCount * 0.18 else 0.96 } else 0.0
      val punct = epAmp + qmAmp
      sum += (if (sum > 0) punct else -punct)
    }
    val c = sum / math.sqrt(sum * sum + Alpha)
    // clamp for safety; round to 4 dp like the published implementation
    math.round(math.max(-1.0, math.min(1.0, c)) * 10000.0) / 10000.0
  }
}
