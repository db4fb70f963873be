package graft.queries

/** Parametrized planted clustered corpus for the d5/d7 kernel scaling
  * curve: n/50 well-separated clusters × 50 points in 64-dim.  Cluster
  * directions are ±basis vectors (up to 128 distinct clusters): distinct
  * clusters are orthogonal (normalized distance √2 ≈ 1.414) or opposite
  * (distance 2), both above the kernel's ball-prune bound
  * PruneR + ballRadius ≈ 1.3455, so ball pruning provably activates for
  * every cross-cluster pair and the exact output is exactly the
  * within-cluster pairs — the same geometry as QueryPacksSpec's fixed
  * n=1000 corpus, extended so n can scale. */
object PlantedClusters {

  /** splitmix64 — deterministic pseudo-random noise. */
  private def mix(x: Long): Long = {
    var h = x * 0x9E3779B97F4A7C15L
    h ^= h >>> 30; h *= 0xBF58476D1CE4E5B9L
    h ^= h >>> 27; h *= 0x94D049BB133111EBL
    h ^ (h >>> 31)
  }

  def corpus(n: Long): Seq[(Long, Array[Double], Double)] = {
    require(n % 50 == 0 && n / 50 <= 128, s"n=$n needs n/50 clusters ≤ 128")
    (0L until n).map { id =>
      val cluster = (id / 50).toInt
      val axis = cluster / 2
      val sign = if (cluster % 2 == 0) 1.0 else -1.0
      val emb = new Array[Double](64)
      emb(axis) = sign
      var i = 0
      while (i < 64) {
        emb(i) += 0.005 * (mix((id << 8) | i).toDouble / Long.MaxValue)
        i += 1
      }
      (id, emb, math.sqrt(emb.map(x => x * x).sum))
    }
  }
}
