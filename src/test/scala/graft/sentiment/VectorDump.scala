package graft.sentiment

/** Dev tool: print the engine's compound for every published README
  * vector next to the published value — the input the VaderVectorsSpec
  * tier assignment is authored from.
  * Run: `sbt "Test/runMain graft.sentiment.VectorDump"`. */
object VectorDump {
  def main(args: Array[String]): Unit = {
    val vs = Seq(
      "VADER is smart, handsome, and funny." -> 0.8316,
      "VADER is smart, handsome, and funny!" -> 0.8439,
      "VADER is very smart, handsome, and funny." -> 0.8545,
      "VADER is VERY SMART, handsome, and FUNNY." -> 0.9227,
      "VADER is VERY SMART, handsome, and FUNNY!!!" -> 0.9342,
      "VADER is VERY SMART, uber handsome, and FRIGGIN FUNNY!!!" -> 0.9469,
      "VADER is not smart, handsome, nor funny." -> -0.7424,
      "Today only kinda sux! But I'll get by, lol" -> 0.5249,
      "On the other hand, VADER is quite bad ass" -> 0.5574)
    vs.foreach { case (t, want) =>
      val got = Vader.compound(t)
      println(f"== got $got%.4f want $want%.4f diff ${math.abs(got - want)}%.4f :: $t")
    }
  }
}
