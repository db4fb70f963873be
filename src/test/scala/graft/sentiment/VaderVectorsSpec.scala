package graft.sentiment

import org.scalatest.funsuite.AnyFunSuite

/** The published VADER project's canonical README demo sentences with
  * their published compound scores — the closest thing to a conformance
  * suite the reference's sentiment core has (the reference consumes
  * exactly this `compound` output, `consumer/spark_streaming_job.py:15–25`).
  *
  * Tolerance contract (bit-parity is NOT the bar — the lexicon here is
  * hand-authored on the published [−4, 4] scale, not a copy of the
  * crowd-rated file with its per-word means):
  *   - `exact`  (±0.0005): vectors whose every constant (word valences,
  *     rule scalars, normalization) this engine reproduces — these pin
  *     the RULE ENGINE (negation, boosters incl. ALL-CAPS and bigram
  *     forms, but-clause, punctuation, idioms, α-normalization) at the
  *     published arithmetic, 4-dp equal.
  *   - `close`  (±0.01): sentences summing several lexicon words where
  *     one or two hand-authored valences sit a notch off the published
  *     crowd means (e.g. our handsome/funny pair differs by ≈0.09 total
  *     pre-normalization); the rule arithmetic is identical.
  *   - `loose`  (±0.10): one slang valence off the published mean by up
  *     to 0.2 ("lol").
  *   - `sign`: idiom sentences whose published scoring path is not fully
  *     reconstructible from the paper ("quite bad ass"); the engine must
  *     agree on polarity and stay within 0.35.
  * Any strengthening (a loose vector drifting to exact) is free; any
  * WEAKENING fails this spec. */
class VaderVectorsSpec extends AnyFunSuite {

  private val exact = Seq(
    "The book was good." -> 0.4404,
    "At least it isn't a horrible book." -> 0.4310,
    "Make sure you :) or :D today!" -> 0.8633,
    "Today SUX!" -> -0.5461,
    "The book was only kind of good." -> 0.3832,
    "The plot was good, but the characters are uncompelling and the dialog is not great." -> -0.7042,
    "Sentiment analysis has never been good." -> -0.3412,
    "Sentiment analysis has never been this good!" -> 0.5672,
    "Most automated sentiment analysis tools are shit." -> -0.5574,
    "With VADER, sentiment analysis is the shit!" -> 0.6476,
    "Roger Dodger is one of the most compelling variations on this theme." -> 0.2944,
    "Roger Dodger is one of the least compelling variations on this theme." -> -0.1695,
    "Not bad at all" -> 0.4310)

  private val close = Seq(
    "VADER is smart, handsome, and funny." -> 0.8316,
    "VADER is smart, handsome, and funny!" -> 0.8439,
    "VADER is very smart, handsome, and funny." -> 0.8545,
    "VADER is VERY SMART, handsome, and FUNNY." -> 0.9227,
    "VADER is VERY SMART, handsome, and FUNNY!!!" -> 0.9342,
    "VADER is VERY SMART, uber handsome, and FRIGGIN FUNNY!!!" -> 0.9469,
    "VADER is not smart, handsome, nor funny." -> -0.7424)

  private val loose = Seq(
    "Today only kinda sux! But I'll get by, lol" -> 0.5249)

  private val signOnly = Seq(
    "On the other hand, VADER is quite bad ass" -> 0.5574)

  private def check(vectors: Seq[(String, Double)], tol: Double): Unit =
    vectors.foreach { case (text, want) =>
      val got = Vader.compound(text)
      assert(math.abs(got - want) <= tol,
        f"'$text': got $got%.4f, published $want%.4f (tol $tol)")
    }

  test("exact tier: 13 published vectors reproduce to 4 dp")(check(exact, 0.0005))
  test("close tier: published vectors within ±0.01")(check(close, 0.01))
  test("loose tier: published vectors within ±0.10")(check(loose, 0.10))
  test("sign tier: polarity agreement within ±0.35") {
    signOnly.foreach { case (text, want) =>
      val got = Vader.compound(text)
      assert(math.signum(got) == math.signum(want), s"'$text': sign flipped ($got vs $want)")
      assert(math.abs(got - want) <= 0.35, f"'$text': got $got%.4f vs $want%.4f")
    }
  }
}
