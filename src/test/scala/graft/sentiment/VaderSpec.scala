package graft.sentiment

import org.scalatest.funsuite.AnyFunSuite

/** Golden + property tests for the Scala VADER engine (SURVEY.md §5.2.1–2).
  * The DuckDB oracle cannot express VADER, so these tests ARE the truth for
  * U1; binding semantics from the reference are null/blank → 0.0
  * (CSJ:19–20) and the ±0.05 label thresholds (CSJ:31–36).
  * Property tests use seeded sampling (offline cache has no
  * scalatest-scalacheck bridge). */
class VaderSpec extends AnyFunSuite {

  test("null/blank/whitespace → 0.0 (CSJ:19–20 parity)") {
    assert(Vader.compound(null) == 0.0)
    assert(Vader.compound("") == 0.0)
    assert(Vader.compound("   ") == 0.0)
  }

  test("no lexicon hits → 0.0") {
    assert(Vader.compound("the table row column batch") == 0.0)
    assert(Vader.compound("12345 !!!") == 0.0) // punctuation alone never creates sentiment
  }

  test("sign correctness on clearly polar text") {
    assert(Vader.compound("i love this new product") > 0.05)
    assert(Vader.compound("this is amazing and wonderful") > 0.05)
    assert(Vader.compound("i hate this, it is terrible") < -0.05)
    assert(Vader.compound("worst experience ever, absolutely horrible") < -0.05)
  }

  test("booster amplifies, diminisher damps") {
    val base = Vader.compound("this is good")
    assert(Vader.compound("this is very good") > base)
    assert(Vader.compound("this is slightly good") < base)
    assert(Vader.compound("this is slightly good") > 0)
  }

  test("negation flips polarity (×−0.74)") {
    assert(Vader.compound("this is not good") < 0)
    assert(Vader.compound("this is not bad") > 0)
    val plain = Vader.compound("this is good")
    assert(math.abs(Vader.compound("this is not good")) < plain)
  }

  test("exclamation amplification (up to 4)") {
    val base = Vader.compound("this is great")
    val one  = Vader.compound("this is great!")
    val four = Vader.compound("this is great!!!!")
    val ten  = Vader.compound("this is great!!!!!!!!!!")
    assert(one > base)
    assert(four > one)
    assert(ten == four) // capped at 4
  }

  test("'but' re-weights clauses toward the latter") {
    val s = Vader.compound("the food is great but the service is terrible")
    assert(s < 0) // latter (negative) clause dominates at 1.5×
    val t = Vader.compound("the service is terrible but the food is great")
    assert(t > 0)
  }

  test("ALL-CAPS emphasis fires only in mixed-case text") {
    val mixed = Vader.compound("this is GREAT stuff")
    val plain = Vader.compound("this is great stuff")
    assert(mixed > plain)
    // uniform case (as after lower()) — no caps boost anywhere
    assert(Vader.compound("THIS IS GREAT STUFF") == Vader.compound("this is great stuff"))
  }

  test("emoticons carry sentiment and survive tokenization") {
    assert(Vader.compound("that was fun :)") > Vader.compound("that was fun"))
    assert(Vader.compound("oh no :-(") < -0.05)
    assert(Vader.compound(":)") > 0.05)
    assert(Vader.compound("the table :-)") > 0.05) // 3-char emoticon not stripped away
  }

  test("golden values are stable (regression pins)") {
    // Pins against accidental algorithm drift; update deliberately only.
    assert(Vader.compound("i love this new product") == 0.6369)
    assert(Vader.compound("i hate this, it is terrible") == -0.7783)
    assert(Vader.compound("this is not good") == -0.3412)
    assert(Vader.compound("this is very good!") == 0.54)
  }

  test("round-2 lexicon growth: ≥2.5k entries, inflections resolve, polarity sane") {
    assert(Vader.lexicon.size >= 2500, s"lexicon too small: ${Vader.lexicon.size}")
    // newly covered high-frequency words score with the right sign
    assert(Vader.compound("what a gorgeous and inspiring masterpiece") > 0.05)
    assert(Vader.compound("utterly devastating betrayal, heartbroken") < -0.05)
    assert(Vader.compound("lol that was hilarious") > 0.05)
    assert(Vader.compound("ugh this is so frustrating smh") < -0.05)
    // derived inflections carry the stem's valence
    assert(Vader.compound("she praises the design") > 0.05)   // praise + s
    assert(Vader.compound("they betrayed and harassed him") < -0.05)
    // hand-authored entries always win over derived forms
    assert(Vader.baseLexicon.keySet.subsetOf(Vader.lexicon.keySet))
    Vader.baseLexicon.foreach { case (w, v) => assert(Vader.lexicon(w) == v) }
    // the neutral stoplist keeps real-word collisions unscored: "number"
    // (≠ numb), "sober" (≠ sob), "liter" (≠ lit), "stranger" (≠ strange)
    for (w <- Seq("number", "sober", "liter", "stranger", "doper", "fires"))
      assert(!Vader.lexicon.contains(w), s"'$w' leaked into the lexicon")
    assert(Vader.compound("the number of rows in the table") == 0.0)
    assert(Vader.compound("he stayed sober and drank a liter of water") == 0.0)
  }

  test("round-2 goldens: new-word pins (update deliberately only)") {
    assert(Vader.compound("congratulations on a remarkable achievement") > 0.5)
    assert(Vader.compound("a toxic and abusive workplace") < -0.5)
    val pos = Vader.compound("kudos, flawless execution")
    val neg = Vader.compound("a dreadful, catastrophic failure")
    assert(pos > 0.3 && pos == Vader.compound("kudos, flawless execution"))
    assert(neg < -0.3 && neg == Vader.compound("a dreadful, catastrophic failure"))
  }

  test("round-3 lexicon growth: ≥5k entries, extension disjointness proven, polarity sane") {
    // the round-3 extension block pushes total coverage past 5k surface
    // forms (core + extension + derived inflections)
    assert(Vader.lexicon.size >= 5000, s"lexicon too small: ${Vader.lexicon.size}")
    // extension words score with the right sign
    assert(Vader.compound("a breathtaking and immaculate performance") > 0.05)
    assert(Vader.compound("an excruciating and humiliating ordeal") < -0.05)
    assert(Vader.compound("the staff were hospitable and attentive") > 0.05)
    assert(Vader.compound("deceitful scammer, utterly repulsive") < -0.05)
    assert(Vader.compound("that set was a banger, crowd was hyped") > 0.05)
    assert(Vader.compound("bruh this glitch is infuriating") < -0.05)
    // inflections derive from extension stems too ("soars" ← soar)
    assert(Vader.compound("morale soars after the win") > 0.05)
    // rule machinery composes with extension words
    assert(Vader.compound("this is not trustworthy") < 0)
    assert(Vader.compound("extremely treacherous conditions") <
      Vader.compound("treacherous conditions"))
    // round-3 stoplist: derivation collisions stay unscored
    for (w <- Seq("robed", "hyper", "primer", "franks", "suss"))
      assert(!Vader.lexicon.contains(w), s"'$w' leaked into the lexicon")
    assert(Vader.compound("the robed figure held a primer") == 0.0)
  }

  test("round-3 goldens: extension-word pins (update deliberately only)") {
    val g1 = Vader.compound("a flawless, breathtaking masterpiece")
    val g2 = Vader.compound("vile, deceitful and utterly repugnant")
    val g3 = Vader.compound("not a trustworthy recommendation")
    assert(g1 > 0.5 && g1 == Vader.compound("a flawless, breathtaking masterpiece"))
    assert(g2 < -0.5 && g2 == Vader.compound("vile, deceitful and utterly repugnant"))
    assert(g3 < 0 && g3 == Vader.compound("not a trustworthy recommendation"))
  }

  test("head-fill sweep: the ~650-word coverage probe scores nonzero, signs sane") {
    // round-3b: common sentiment words surfaced as lexicon gaps by the
    // coverage probe now score, with the intended sign — and the
    // deliberately-excluded ambiguous words stay zero as STEMS
    val pos = Seq("ace", "bravery", "charm", "cure", "dazzle", "excite",
      "help", "marvel", "motivate", "optimist", "relax", "satisfy",
      "soothe", "valiant")
    val neg = Seq("addict", "arrest", "careless", "confuse", "cruelty",
      "enrage", "frustrate", "grieve", "invade", "nuisance", "paralyze",
      "pessimist", "pollute", "snub")
    pos.foreach(w => assert(Vader.compound(w) > 0.0, s"'$w' should be positive"))
    neg.foreach(w => assert(Vader.compound(w) < 0.0, s"'$w' should be negative"))
    // inflections derive from the new stems too
    assert(Vader.compound("cured") > 0 && Vader.compound("frustrated") < 0)
    // excluded-on-purpose: dominant sense neutral or slang-inverted
    for (w <- Seq("down", "bet", "odd", "force", "demand", "beast", "wild"))
      assert(Vader.compound(w) == 0.0, s"'$w' must stay unscored")
    // pins (update deliberately only)
    val g = Vader.compound("the cure was a marvel, everyone relaxed")
    assert(g > 0.3 && g == Vader.compound("the cure was a marvel, everyone relaxed"))
    val h = Vader.compound("careless polluters enraged the grieving town")
    assert(h < -0.3 && h == Vader.compound("careless polluters enraged the grieving town"))
  }

  test("probe sweep: ≥5,000 words, ≥99% coverage, every zero policy-pinned, zero wrong signs") {
    // The VERDICT-r6 bar: a probe of 5,000+ common sentiment-bearing
    // words (ProbeWords — authored from general English sentiment
    // vocabulary, not from this repo's lexicon tables) must score
    // nonzero for ≥99%.  Booster/negation probe words are RULE
    // words — VADER's published design scores them through the rule
    // machinery, never the lexicon — so they count as covered; the only
    // legitimate zeros are the deliberately-excluded ambiguous stems
    // (documented at extensionR4Positive).
    assert(ProbeWords.all.size >= 5000, s"probe too small: ${ProbeWords.all.size}")
    assert(ProbeWords.all.distinct.size == ProbeWords.all.size, "probe has duplicates")
    def ruleWord(w: String) = Vader.boosters.contains(w) || Vader.negations.contains(w)
    val zp = ProbeWords.positive.filterNot(ruleWord).filter(w => Vader.compound(w) == 0.0)
    val zn = ProbeWords.negative.filterNot(ruleWord).filter(w => Vader.compound(w) == 0.0)
    val covered = ProbeWords.all.size - zp.size - zn.size
    assert(covered.toDouble / ProbeWords.all.size >= 0.99,
      s"coverage ${covered}/${ProbeWords.all.size}; zeros: ${(zp ++ zn).mkString(" ")}")
    // round-6 tightening: every remaining zero must be a DELIBERATE
    // policy exclusion (the pinned ambiguous stems below, or a probe
    // inflection of one) — an accidental gap can no longer hide in the
    // coverage slack
    val policyZeros = Set("just", "power", "new", "newest", "novel", "modern",
      "rare", "weapon", "mean", "meaner", "meanest", "cold", "mortal",
      "object", "objected", "critic")
    val accidental = (zp ++ zn).filterNot(policyZeros)
    assert(accidental.isEmpty,
      s"non-policy coverage gaps: ${accidental.mkString(" ")}")
    // every covered probe word scores with the intended sign
    val wrongPos = ProbeWords.positive.filter(w => Vader.compound(w) < 0.0)
    val wrongNeg = ProbeWords.negative.filter(w => Vader.compound(w) > 0.0)
    assert(wrongPos.isEmpty, s"positive probe words scoring negative: ${wrongPos.mkString(" ")}")
    assert(wrongNeg.isEmpty, s"negative probe words scoring positive: ${wrongNeg.mkString(" ")}")
    // the ambiguous exclusions are zero ON PURPOSE — pin them so a future
    // derivation rule can't silently give them a wrong-sense valence
    for (w <- Seq("mean", "cold", "object", "critic", "rare", "new", "novel",
        "modern", "weapon", "mortal", "power", "just"))
      assert(Vader.compound(w) == 0.0, s"'$w' must stay unscored (ambiguous)")
  }

  test("round-4 goldens: derivational forms score at stem valence (update deliberately only)") {
    // derivational widening: -ly adverbs, -ness/-ment/-ation nouns,
    // superlatives, CVC doubling, vowel-y and e+ing inflections
    assert(Vader.compound("she spoke cheerfully and graciously") > 0.05)
    assert(Vader.compound("the sadness and loneliness of exclusion") < -0.05)
    assert(Vader.compound("pure amusement and excitement") > 0.05)
    assert(Vader.compound("their admiration and appreciation") > 0.05)
    assert(Vader.compound("the saddest, dreariest day") < -0.05)
    assert(Vader.compound("worrying and crying all night") < -0.05)
    assert(Vader.compound("destroying everything, betraying everyone") < -0.05)
    // stoplisted derivations stay neutral
    assert(Vader.compound("the business will likely reopen shortly") == 0.0)
    assert(Vader.compound("the witness held a tumbler and a plunger") == 0.0)
    for (w <- Seq("witness", "witnesses", "likeness", "jester", "sinker"))
      assert(!Vader.lexicon.contains(w), s"'$w' leaked into the lexicon")
    val g = Vader.compound("a jubilant celebration, pure mirth and merriment")
    assert(g > 0.5 && g == Vader.compound("a jubilant celebration, pure mirth and merriment"))
    val h = Vader.compound("treachery, carnage and utter futility")
    assert(h < -0.5 && h == Vader.compound("treachery, carnage and utter futility"))
  }

  test("special-case idioms override word-level valence (published table)") {
    assert(Vader.compound("that track is the bomb") > 0.05)      // idiom beats "bomb" −2.4
    assert(Vader.compound("yeah right, great service") <
      Vader.compound("great service"))                           // sarcasm marker drags down
    assert(Vader.compound("a real kiss of death for the project") < -0.05)
    assert(Vader.compound("he is one bad ass driver") > 0.05)    // idiom beats "bad" −2.5
    // round-5: the published table's remaining entries
    assert(Vader.compound("this cake is to die for") > 0.05)     // idiom beats "die" (negative)
    assert(Vader.compound("she left with a broken heart") < -0.05)
    assert(Vader.compound("the beating heart of the city") > 0.05)
    assert(Vader.compound("meet me at the bus stop") == 0.0)     // neutralizer consumes "stop"
    assert(Vader.compound("what a badass") > 0.05)               // single-word form
  }

  test("'never so/this X' intensifies instead of negating (published special case)") {
    val plain = Vader.compound("the food was good")
    assert(Vader.compound("the food was never so good") > plain) // ×1.25 + booster
    assert(Vader.compound("the food was never good") < 0)        // plain negation path intact
  }

  private def sampleTexts(n: Int): Seq[String] = {
    val rng = new scala.util.Random(42)
    val vocab: IndexedSeq[String] =
      (Vader.lexicon.keys ++ Vader.boosters.keys ++ Vader.negations ++
        Seq("but", "!", "?", "table", "row", "x1", "ZZZ", "")).toIndexedSeq
    (0 until n).map { _ =>
      val len = rng.nextInt(12)
      (0 until len).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" ")
    }
  }

  test("property: compound always in [−1, 1] and deterministic (200 seeded samples)") {
    sampleTexts(200).foreach { t =>
      val c = Vader.compound(t)
      assert(c >= -1.0 && c <= 1.0, s"out of range for: '$t'")
      assert(c == Vader.compound(t), s"nondeterministic for: '$t'")
    }
  }

  test("property: label partition is total with inclusive ±0.05 boundaries") {
    def label(score: Double): String =
      if (score >= 0.05) "positive" else if (score <= -0.05) "negative" else "neutral"
    val rng = new scala.util.Random(7)
    (0 until 1000).foreach { _ =>
      val s = rng.nextDouble() * 2 - 1
      assert(Set("positive", "negative", "neutral").contains(label(s)))
    }
    assert(label(0.05) == "positive")   // boundary inclusive (CSJ:31)
    assert(label(-0.05) == "negative")  // boundary inclusive (CSJ:33)
    assert(label(0.0499) == "neutral")
    assert(label(-0.0499) == "neutral")
  }
}
