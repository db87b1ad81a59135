package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{EmbeddingBridge, Sgns}

/** SGNS word2vec at corpus scale: train the engine's own embedding
  * model on a synthetic Zipf-ish corpus (default 1M docs × 40 tokens =
  * 40M training tokens), then serve the trained model back through the
  * ModelRunner bridge over the full corpus — the BASELINE throughput
  * row for the learned-embedding path (train tokens/s per epoch, bridge
  * docs/s at inference).
  *
  * The corpus is generated in-flight from seeded hashes (quadratic-skew
  * word draw over `vocab` words — common ids dominate like a Zipf
  * head), so the run measures the trainer, not a parquet scan.
  *
  * `sbt "runMain graft.bench.SgnsScaleMain 1000000 40 50000 32 3"`
  */
object SgnsScaleMain {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 1000000L
    val tokensPerDoc = if (args.length > 1) args(1).toInt else 40
    val vocab = if (args.length > 2) args(2).toInt else 50000
    val dim = if (args.length > 3) args(3).toInt else 32
    val epochs = if (args.length > 4) args(4).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.range(0, nDocs)
      .select(col("id").as("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val sb = new StringBuilder
          var t = 0
          while (t < tokensPerDoc) {
            val h = graft.operators.HashStubModel.md5Long60(s"sgns:$id:$t")
            val u = (h.toDouble) / (1L << 60).toDouble
            val w = (u * u * vocab).toInt  // quadratic skew: Zipf-ish head
            if (t > 0) sb.append(' ')
            sb.append('w').append(w)
            t += 1
          }
          (id, sb.result())
        }
      }
      .toDF("doc_id", "text")
      .persist()
    docs.count()

    val t0 = System.nanoTime()
    val model = Sgns.train(docs, dim = dim, window = 2, negatives = 4,
      epochs = epochs, minCount = 2)
    val trainWall = (System.nanoTime() - t0) / 1e9
    val totalTokens = nDocs * tokensPerDoc
    println(f"[sgns-scale] train: $nDocs docs x $tokensPerDoc tokens, " +
      f"vocab=${model.vocab.length} dim=$dim epochs=$epochs " +
      f"wall=$trainWall%.1fs " +
      f"tokens/s/epoch=${totalTokens * epochs / trainWall / 1e6}%.2fM " +
      f"losses=${model.losses.map(l => f"$l%.4f").mkString(",")}")

    val t1 = System.nanoTime()
    val nEmb = EmbeddingBridge.embed(docs, new Sgns.Runner(model),
      batchSize = 256).count()
    val embWall = (System.nanoTime() - t1) / 1e9
    println(f"[sgns-scale] bridge-serve: $nEmb docs in $embWall%.1fs " +
      f"(${nEmb / embWall / 1e3}%.1fk docs/s, " +
      f"${nEmb * tokensPerDoc / embWall / 1e6}%.2fM tokens/s)")

    docs.unpersist()
    spark.stop()
  }
}
