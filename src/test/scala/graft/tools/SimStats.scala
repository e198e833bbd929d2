package graft.tools

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** One-off diagnostic: simhash value distribution of a documents corpus —
  * distinct sketch count and the biggest identical-sketch groups, which
  * bound the banded self-join's fan-out.
  */
object SimStats {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.SparkEntry.session("graft-simstats")
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sims = docs.select(col("doc_id"), graft.ops.Dedup.simHash(col("text")).as("sim"))
    val groups = sims.groupBy(col("sim")).agg(count(lit(1)).as("n")).persist()
    val nDistinct = groups.count()
    val top = groups.orderBy(col("n").desc).limit(10).collect()
    val sumSq = groups.agg(sum(col("n") * col("n"))).collect()(0).getLong(0)
    println(s"SIMSTATS docs=${docs.count()} distinct_sims=$nDistinct sum_n2=$sumSq")
    top.take(3).foreach(r => println(s"SIMSTATS top group n=${r.getLong(1)}"))
    // banded join fan-out per config: sum over (table, key) buckets of
    // C(size, 2) = rows the self-join must emit
    for ((kb, maxH) <- Seq((1, 8), (2, 8), (1, 3), (2, 3), (3, 3), (4, 3))) {
      val b = maxH + kb
      val bits = 64
      val widths = Array.tabulate(b)(i => bits / b + (if (i < bits % b) 1 else 0))
      val offsets = widths.scanLeft(0)(_ + _)
      def blockBits(blk: Int) = {
        val mask = (1L << widths(blk)) - 1
        shiftright(col("sim"), offsets(blk)).bitwiseAND(lit(mask))
      }
      val subsets = (0 until b).combinations(kb).toSeq
      val chunks = subsets.zipWithIndex.map { case (blks, t) =>
        val packed = blks.map { blk =>
          val off = blks.takeWhile(_ != blk).map(widths).sum
          if (off == 0) blockBits(blk) else shiftleft(blockBits(blk), off)
        }.reduce((a, c) => a.bitwiseOR(c))
        struct(lit(t).as("chunk"), packed.as("key"))
      }
      val fanout = sims.select(explode(array(chunks: _*)).as("cc"))
        .groupBy(col("cc.chunk"), col("cc.key")).agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * (col("n") - 1) / 2).as("pairs"), max(col("n")).as("maxb"))
        .collect()(0)
      println(s"SIMSTATS maxH=$maxH keyBlocks=$kb tables=${subsets.size} joinRows=${fanout.get(0)} maxBucket=${fanout.get(1)}")
    }
    // entropy-balanced permutation: measure per-bit P(1), spread bits
    // over blocks serpentine by entropy, re-measure the fan-out
    val bitProbs = sims.select((0 until 64).map(i =>
        avg(shiftright(col("sim"), i).bitwiseAND(lit(1L)).cast("double")).as(s"b$i")): _*)
      .collect()(0)
    val ent = (0 until 64).map { i =>
      val p = bitProbs.getDouble(i)
      val e = if (p <= 0 || p >= 1) 0.0
        else -p * math.log(p) - (1 - p) * math.log(1 - p)
      (i, e)
    }
    println("SIMSTATS bit entropies: " + ent.map(e => f"${e._2}%.2f").mkString(","))
    for ((kb, maxH) <- Seq((1, 8), (2, 8), (1, 3), (2, 3), (3, 3), (4, 3))) {
      val b = maxH + kb
      // serpentine assignment by entropy rank: block j gets ranks j, 2b-1-j, 2b+j, ...
      val ranked = ent.sortBy(-_._2).map(_._1)
      val assign = Array.fill(b)(scala.collection.mutable.ArrayBuffer.empty[Int])
      ranked.zipWithIndex.foreach { case (bit, r) =>
        val cycle = r / b; val pos = r % b
        val blk = if (cycle % 2 == 0) pos else b - 1 - pos
        assign(blk) += bit
      }
      def blockKey(blk: Int): Column =
        assign(blk).zipWithIndex.map { case (bit, j) =>
          shiftleft(shiftright(col("sim"), bit).bitwiseAND(lit(1L)), j)
        }.reduce((a, c) => a.bitwiseOR(c))
      val subsets = (0 until b).combinations(kb).toSeq
      val chunks = subsets.zipWithIndex.map { case (blks, t) =>
        val packed = blks.zipWithIndex.map { case (blk, bi) =>
          val off = blks.take(bi).map(assign(_).size).sum
          if (off == 0) blockKey(blk) else shiftleft(blockKey(blk), off)
        }.reduce((a: Column, c: Column) => a.bitwiseOR(c))
        struct(lit(t).as("chunk"), packed.as("key"))
      }
      val fanout = sims.select(explode(array(chunks: _*)).as("cc"))
        .groupBy(col("cc.chunk"), col("cc.key")).agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * (col("n") - 1) / 2).as("pairs"), max(col("n")).as("maxb"))
        .collect()(0)
      println(s"SIMSTATS BALANCED maxH=$maxH keyBlocks=$kb tables=${subsets.size} joinRows=${fanout.get(0)} maxBucket=${fanout.get(1)}")
    }
    spark.stop()
  }
}
