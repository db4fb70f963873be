package graft.queries

import graft.SparkSpec

/** Independent plain-Scala recount of d11's SemDeDup pipeline: load the
  * raw embeddings once, replay quantization → seed assignment → one
  * integer k-means step → cluster-scoped similarity → dominance prune
  * entirely in local Scala collections (no Spark expressions, no shared
  * helpers), and require the distributed query to agree row-for-row.
  * The DuckDB oracle already pins values cross-engine; this pins them
  * against a THIRD, loop-written implementation, so a shared
  * misreading of the algorithm cannot hide in matching SQL.
  *
  * Also asserts the semantic contract directly on the output:
  *   - every dropped doc has a within-cluster dominating witness at
  *     cos ≥ 0.4 — farther from the centroid, or distance-tied with a
  *     smaller id.  The witness itself may have been dropped by a THIRD
  *     doc dissimilar to this one: similarity is not transitive, and the
  *     published SemDeDup implementation's triu-max-sim rule drops
  *     against any higher-order similar example, retained or not —
  *     chains legitimately over-drop relative to component-wise keep-one;
  *   - no ≥ 0.4-similar pair survives among the kept docs of a cluster
  *     (any such pair is ordered by (dist, id), so one side always
  *     dominates the other) — the prune terminates with a τ-separated
  *     survivor set, the paper's guarantee.
  */
class SemDedupRecountSpec extends SparkSpec {

  private val K = 10
  private val Scale = 64

  test("d11 output equals a local loop replay, and the prune contract holds") {
    val raw = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS emb")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)

    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.iterator.map(i => a(i) * b(i)).sum
    val qv: Map[Long, Array[Long]] =
      raw.map { case (id, e) => id -> e.map(x => math.floor(x * Scale).toLong) }.toMap
    val vv: Map[Long, Long] = qv.map { case (id, q) => id -> dot(q, q) }

    def assign(cents: Seq[(Int, Array[Long], Long)]): Map[Long, (Int, Long)] =
      qv.map { case (id, q) =>
        val best = cents.map { case (li, c, cc) =>
          (vv(id) - 2 * dot(q, c) + cc, li)
        }.min
        id -> (best._2, best._1)
      }

    val seeds = (0 until K).map(i => (i, qv(i.toLong), vv(i.toLong)))
    val a0 = assign(seeds)
    val cents = (0 until K).map { li =>
      val members = qv.keys.filter(id => a0(id)._1 == li).toSeq
      val c = Array.tabulate(64) { d =>
        math.floorDiv(members.map(id => qv(id)(d)).sum, members.size)
      }
      (li, c, dot(c, c))
    }
    val a1 = assign(cents)

    def similar(a: Long, b: Long): Boolean = {
      val d = dot(qv(a), qv(b))
      d > 0 && 25 * d * d >= 4 * vv(a) * vv(b)
    }
    // dominance: b dropped iff some same-cluster a is similar and
    // (farther from the centroid, or tied with a smaller id)
    val ids = raw.map(_._1)
    val dropped = ids.filter { b =>
      ids.exists { a =>
        a != b && a1(a)._1 == a1(b)._1 && similar(a, b) &&
          (a1(a)._2 > a1(b)._2 || (a1(a)._2 == a1(b)._2 && a < b))
      }
    }.toSet

    val got = Similarity.d11SemanticDedup.fn(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
    assert(got.map(_._1).toSeq == ids.toSeq, "one output row per vector, ordered")
    got.foreach { case (id, li, dist, kept) =>
      assert(li == a1(id)._1, s"cluster of $id")
      assert(dist == a1(id)._2, s"dist of $id")
      assert(kept == !dropped(id), s"kept flag of $id")
    }
    assert(dropped.nonEmpty, "corpus must actually contain semantic dups")

    // contract on the output alone
    val byId = got.map(g => g._1 -> g).toMap
    dropped.foreach { b =>
      val witness = ids.exists { a =>
        a != b && byId(a)._2 == byId(b)._2 && similar(a, b) &&
          (byId(a)._3 > byId(b)._3 || (byId(a)._3 == byId(b)._3 && a < b))
      }
      assert(witness, s"dropped $b has no dominating witness")
    }
    for {
      a <- ids if byId(a)._4
      b <- ids if b > a && byId(b)._4 && byId(a)._2 == byId(b)._2 && similar(a, b)
    } fail(s"kept pair $a,$b is still ≥τ similar — the survivor set is not τ-separated")
  }
}
