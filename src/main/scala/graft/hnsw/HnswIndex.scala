package graft.hnsw

import java.util.{Comparator, PriorityQueue}
import scala.collection.mutable

/** Similarity metric over float vectors, double accumulation.
  * Semantics per reference src/similarity.ts:2-24 — euclidean is the
  * similarity 1/(1+L2), not a distance (higher is better for both). */
sealed trait Metric extends Serializable {
  def name: String
  def sim(a: Array[Float], b: Array[Float]): Double
}
object Metric {
  case object Cosine extends Metric {
    val name = "cosine"
    def sim(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }
  case object Euclidean extends Metric {
    val name = "euclidean"
    def sim(a: Array[Float], b: Array[Float]): Double = {
      var ss = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val d = a(i).toDouble - b(i)
        ss += d * d
        i += 1
      }
      1.0 / (1.0 + math.sqrt(ss))
    }
  }
  /** Invalid metric throws — reference src/main.ts:42-44. */
  def apply(name: String): Metric = name match {
    case "cosine"    => Cosine
    case "euclidean" => Euclidean
    case other       => throw new IllegalArgumentException(s"Invalid metric: $other")
  }
}

/** Graph node (reference src/node.ts:1-13): jagged per-layer adjacency,
  * each layer holding at most M neighbor ids. */
final class HnswNode(val id: Long, val vector: Array[Float], val level: Int) {
  var neighbors: Array[Array[Long]] = Array.fill(level + 1)(Array.empty[Long])
  def neighborsAt(l: Int): Array[Long] =
    if (l < neighbors.length) neighbors(l) else Array.empty[Long]
  def ensureLevel(l: Int): Unit =
    if (l >= neighbors.length) {
      val grown = Array.fill(l + 1)(Array.empty[Long])
      System.arraycopy(neighbors, 0, grown, 0, neighbors.length)
      neighbors = grown
    }
}

/** Injectable level sampler (the reference mocks selectLevel in tests —
  * tests/HNSW.test.ts:32-34 — so keep it pluggable). */
trait LevelSampler extends Serializable { def level(id: Long): Int }

/** Deterministic, partition-order-independent sampler: the level draw is a
  * pure function of (seed, id) via a splitmix64 mix, walking the same
  * cumulative probability table as the reference (src/main.ts:47-69,
  * probs[l] = e^(−l/mL)(1−e^(−1/mL)), mL = 1/ln M, truncated below 1e-9).
  * This removes the reference's only nondeterminism (unseeded
  * Math.random, src/main.ts:60) while preserving the distribution. */
final class SeededLevelSampler(probs: Array[Double], seed: Long) extends LevelSampler {
  def level(id: Long): Int = {
    var z = seed ^ (id * 0x9E3779B97F4A7C15L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    var r = (z >>> 11).toDouble / (1L << 53).toDouble
    var i = 0
    while (i < probs.length) {
      if (r < probs(i)) return i
      r -= probs(i)
      i += 1
    }
    probs.length - 1
  }
}

object HnswIndex {
  /** Level probability table (reference src/main.ts:47-57). */
  def levelProbs(m: Int): Array[Double] = {
    val levelMult = 1.0 / math.log(m)
    val buf = mutable.ArrayBuffer.empty[Double]
    var level = 0
    var continue = true
    while (continue) {
      val p = math.exp(-level / levelMult) * (1 - math.exp(-1.0 / levelMult))
      if (p < 1e-9) continue = false
      else { buf += p; level += 1 }
    }
    buf.toArray
  }
}

/** Executor-local HNSW index — a faithful Scala re-expression of the
  * reference algorithm (src/main.ts:8-317): greedy multi-layer descent,
  * ef-bounded best-first layer search, diversity-pruned bidirectional
  * linking with reciprocal-link cleanup. One instance per Spark partition
  * in the distributed model (see [[graft.hnsw.HnswSpark]]); never touched
  * by Catalyst — this is deliberately plain JVM code on the executor.
  *
  * @param efSearchOpt defaults to efConstruction for back-compat
  *                    (reference src/main.ts:29).
  */
final class HnswIndex(
    val M: Int = 16,
    val efConstruction: Int = 200,
    private[hnsw] var dIn: Int = -1,
    val metric: Metric = Metric.Cosine,
    efSearchOpt: Option[Int] = None,
    samplerOpt: Option[LevelSampler] = None,
    val seed: Long = 42L) extends Serializable {

  val efSearch: Int = efSearchOpt.getOrElse(efConstruction)
  val probs: Array[Double] = HnswIndex.levelProbs(M)
  private val sampler: LevelSampler =
    samplerOpt.getOrElse(new SeededLevelSampler(probs, seed))

  val nodes: mutable.LongMap[HnswNode] = mutable.LongMap.empty
  var levelMax: Int = -1
  var entryPointId: Long = -1L
  def d: Int = dIn
  def size: Int = nodes.size

  private def sim(a: Array[Float], b: Array[Float]): Double = metric.sim(a, b)

  /** O4 greedy 1-NN hill-climb at one layer (src/main.ts:71-91). */
  private def greedySearch(query: Array[Float], entry: HnswNode, level: Int): HnswNode = {
    var bestNode = entry
    var bestScore = sim(query, entry.vector)
    var improved = true
    while (improved) {
      improved = false
      val nbrs = bestNode.neighborsAt(level)
      var i = 0
      while (i < nbrs.length) {
        val nn = nodes(nbrs(i))
        val s = sim(query, nn.vector)
        if (s > bestScore) { bestScore = s; bestNode = nn; improved = true }
        i += 1
      }
    }
    bestNode
  }

  /** O5 ef-bounded best-first layer search (src/main.ts:93-129).
    * Returns candidates sorted by descending score. */
  private def searchLayer(query: Array[Float], entry: HnswNode, level: Int,
      ef: Int): Array[HnswNode] = {
    val visited = mutable.LongMap.empty[Unit]
    visited(entry.id) = ()
    // candidates: max-heap by score; best: min-heap by score, bounded at ef
    val candidates = new PriorityQueue[(Double, HnswNode)](
      new Comparator[(Double, HnswNode)] {
        def compare(a: (Double, HnswNode), b: (Double, HnswNode)) =
          java.lang.Double.compare(b._1, a._1)
      })
    val best = new PriorityQueue[(Double, HnswNode)](
      new Comparator[(Double, HnswNode)] {
        def compare(a: (Double, HnswNode), b: (Double, HnswNode)) =
          java.lang.Double.compare(a._1, b._1)
      })
    val entryScore = sim(query, entry.vector)
    candidates.add((entryScore, entry))
    best.add((entryScore, entry))

    var break = false
    while (!break && !candidates.isEmpty) {
      val current = candidates.poll()
      val worstBest = best.peek()
      if (worstBest != null && best.size >= ef && current._1 < worstBest._1) {
        break = true
      } else {
        val nbrs = current._2.neighborsAt(level)
        var i = 0
        while (i < nbrs.length) {
          val nid = nbrs(i)
          if (!visited.contains(nid)) {
            visited(nid) = ()
            val nn = nodes(nid)
            val s = sim(query, nn.vector)
            val worst = best.peek()
            if (best.size < ef || s > (if (worst == null) Double.NegativeInfinity else worst._1)) {
              candidates.add((s, nn))
              best.add((s, nn))
              if (best.size > ef) best.poll()
            }
          }
          i += 1
        }
      }
    }
    // descending score with ascending-id tie-break: the reference leaves
    // tie order to heap internals (src/main.ts:125-128), which is not
    // stable across serialize/deserialize — the id tie-break makes search
    // results fully deterministic without changing which nodes qualify
    best.toArray(Array.empty[(Double, HnswNode)])
      .sortBy(t => (-t._1, t._2.id))
      .map(_._2)
  }

  /** O6 neighbor-diversity selection (src/main.ts:171-200): keep a
    * candidate only if it is at least as close to the base as to every
    * already-kept neighbor (ties keep). */
  private def selectNeighborsHeuristic(node: HnswNode, candidates: Seq[HnswNode],
      maxNeighbors: Int): Seq[HnswNode] = {
    val unique = mutable.LinkedHashMap.empty[Long, HnswNode]
    candidates.foreach { c => if (c.id != node.id) unique(c.id) = c }
    val scored = unique.values.toArray
      .map(c => (c, sim(node.vector, c.vector)))
      .sortBy(-_._2)
    val selected = mutable.ArrayBuffer.empty[HnswNode]
    var i = 0
    while (i < scored.length && selected.length < maxNeighbors) {
      val (cand, score) = scored(i)
      val ok = selected.forall(kept => sim(cand.vector, kept.vector) <= score)
      if (ok) selected += cand
      i += 1
    }
    selected.toSeq
  }

  /** O7 pruned adjacency insert (src/main.ts:154-169): re-select over
    * existing∪new, return displaced ids. */
  private def insertNeighbor(node: HnswNode, neighborId: Long, level: Int): Array[Long] = {
    node.ensureLevel(level)
    val existing = node.neighbors(level).filter(_ != neighborId)
    val candidateIds = existing :+ neighborId
    val candidateNodes = candidateIds.flatMap(nodes.get)
    val selected = selectNeighborsHeuristic(node, candidateNodes.toSeq, M)
    val selectedIds = selected.map(_.id).toArray
    val removed = existing.filterNot(selectedIds.contains)
    node.neighbors(level) = selectedIds
    removed
  }

  /** O8 bidirectional link + reciprocal cleanup (src/main.ts:139-152):
    * strip the back-edge of any neighbor displaced by pruning, keeping the
    * graph symmetric. */
  private def addBidirectionalConnection(node: HnswNode, other: HnswNode, level: Int): Unit = {
    val removedFromNode = insertNeighbor(node, other.id, level)
    val removedFromOther = insertNeighbor(other, node.id, level)
    removeReciprocalLinks(node, removedFromNode, level)
    removeReciprocalLinks(other, removedFromOther, level)
  }

  private def removeReciprocalLinks(node: HnswNode, removedIds: Array[Long], level: Int): Unit =
    removedIds.foreach { rid =>
      nodes.get(rid).foreach { rn =>
        if (level < rn.neighbors.length) {
          rn.neighbors(level) = rn.neighbors(level).filter(_ != node.id)
        }
      }
    }

  private def connectNodeAtLevel(node: HnswNode, candidates: Array[HnswNode], level: Int): Unit =
    selectNeighborsHeuristic(node, candidates.toSeq, M)
      .foreach(addBidirectionalConnection(node, _, level))

  /** O9 node insert (src/main.ts:202-229). */
  private def addNodeToGraph(node: HnswNode): Unit = {
    if (entryPointId == -1L) {
      entryPointId = node.id
      levelMax = node.level
      return
    }
    val currentMaxLevel = levelMax
    var entry = nodes(entryPointId)
    var level = currentMaxLevel
    while (level > node.level) {
      entry = greedySearch(node.vector, entry, level)
      level -= 1
    }
    level = math.min(node.level, currentMaxLevel)
    while (level >= 0) {
      val found = searchLayer(node.vector, entry, level, efConstruction)
      connectNodeAtLevel(node, found, level)
      if (found.nonEmpty) entry = found(0)
      level -= 1
    }
    if (node.level > levelMax) {
      entryPointId = node.id
      levelMax = node.level
    }
  }

  /** O10 point ingest (src/main.ts:234-248): dim infer/check, duplicate-id
    * throw, sampled level, graph insert. */
  def addPoint(id: Long, vector: Array[Float]): Unit = {
    if (dIn != -1 && vector.length != dIn)
      throw new IllegalArgumentException("All vectors must be of the same dimension")
    dIn = vector.length
    if (nodes.contains(id))
      throw new IllegalArgumentException(s"Node with id $id already exists")
    val node = new HnswNode(id, vector, sampler.level(id))
    nodes(id) = node
    addNodeToGraph(node)
  }

  /** O11 bulk build (src/main.ts:288-317) with progress cadence: callback
    * every `progressInterval` inserts plus a final partial call. */
  def buildIndex(data: Iterator[(Long, Array[Float])],
      onProgress: (Long, Long) => Unit = null,
      progressInterval: Long = 10000L,
      total: Long = -1L): Unit = {
    nodes.clear()
    levelMax = -1
    entryPointId = -1L
    dIn = -1
    var i = 0L
    data.foreach { case (id, vec) =>
      addPoint(id, vec)
      i += 1
      if (onProgress != null && i % progressInterval == 0) onProgress(i, total)
    }
    if (onProgress != null && i % progressInterval != 0) onProgress(i, i)
  }

  /** O12 k-NN query (src/main.ts:253-283): greedy descent to layer 1,
    * ef-bounded layer-0 search, dedupe, recompute scores, truncate at k. */
  def searchKNN(query: Array[Float], k: Int,
      efSearchOverride: Option[Int] = None): Array[(Long, Double)] = {
    if (entryPointId == -1L || nodes.isEmpty || k <= 0) return Array.empty
    var entry = nodes(entryPointId)
    var level = levelMax
    while (level > 0) {
      entry = greedySearch(query, entry, level)
      level -= 1
    }
    val ef = math.max(k, efSearchOverride.getOrElse(efSearch))
    val candidates = searchLayer(query, entry, 0, ef)
    val seen = mutable.LongMap.empty[Unit]
    val results = mutable.ArrayBuffer.empty[(Long, Double)]
    var i = 0
    while (i < candidates.length && results.length < k) {
      val n = candidates(i)
      if (!seen.contains(n.id)) {
        seen(n.id) = ()
        results += ((n.id, sim(n.vector, query)))
      }
      i += 1
    }
    results.toArray
  }

  /** O13 serialize: flatten to rows (the Spark-native analog of toJSON,
    * src/main.ts:322-344). */
  def toRows: Iterator[HnswGraphRow] =
    nodes.valuesIterator.map { n =>
      HnswGraphRow(n.id, n.level, n.vector, n.neighbors)
    }
}

/** Row form of one graph node for DataFrame/parquet persistence. */
case class HnswGraphRow(id: Long, level: Int, vector: Array[Float],
    neighbors: Array[Array[Long]])

object HnswSerde {
  /** O14 deserialize from rows (src/main.ts:349-362): efSearch defaults to
    * efConstruction when absent (back-compat, src/main.ts:351). */
  def fromRows(rows: Iterator[HnswGraphRow], m: Int, efConstruction: Int,
      metric: Metric, efSearch: Option[Int], seed: Long,
      levelMax: Int, entryPointId: Long): HnswIndex = {
    val idx = new HnswIndex(m, efConstruction, -1, metric, efSearch, None, seed)
    var d = -1
    rows.foreach { r =>
      val n = new HnswNode(r.id, r.vector, r.level)
      n.neighbors = r.neighbors
      idx.nodes(r.id) = n
      d = r.vector.length
    }
    idx.levelMax = levelMax
    idx.entryPointId = entryPointId
    if (d != -1) idx.dIn = d
    idx
  }
}
