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
  * The embedded lexicon is a compact subset (~450 high-frequency terms with
  * VADER-scale valences in [−4, 4]). Bit-exact parity with the Python library
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

  /** Compact VADER-scale lexicon: token → mean valence in [−4, 4]. */
  private[sentiment] val lexicon: Map[String, Double] = Map(
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
    ":p" -> 1.2, "<3" -> 2.8, ":o" -> 0.9, "=(" -> -1.9, "=)" -> 2.0)

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

    var i = 0
    while (i < toks.length) {
      val (orig, word) = toks(i)
      var valence = 0.0
      val isBoosterHere = boosters.contains(word)
      if (!isBoosterHere && lexicon.contains(word)) {
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
            if (negations.contains(prev)) valence *= NegScalar
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
