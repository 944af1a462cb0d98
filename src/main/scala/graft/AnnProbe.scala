package graft

import org.apache.spark.sql.functions._

import graft.data.Similarity

/** Diagnostic: stage-by-stage timing for the two-level IVF path. Not part of
  * the bench record — used to localize hot spots at big nCells.
  * Env: SPARK_GRAFT_ANN_N (default 50000), SPARK_GRAFT_ANN_CELLS (4096).
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_ANN_N", "50000").toLong
    val nCells = sys.env.getOrElse("SPARK_GRAFT_ANN_CELLS", "4096").toInt
    val spark = Bench.session(32)
    import Bench.time

    val path = s"/tmp/graft_ann_probe_${n}_c$nCells"
    if (!Bench.parquetComplete(path))
      AnnBench.synthesize(spark, n, nCells).repartition(64).write.mode("overwrite").parquet(path)
    val emb = spark.read.parquet(path)
    println(s"[probe] corpus rows=${emb.count()}")

    val (cents0, tSeed) = time {
      emb
        .where(col("vec_id") < nCells)
        .select(col("vec_id").cast("int").as("cell"), col("embedding").cast("array<double>").as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
        .sortBy(_._1)
        .toSeq
    }
    println(f"[probe] seed collect: ${cents0.size} cells in $tSeed%.1fs")

    val ((coarse, parent), tCoarsen) = time(Similarity.coarsen(cents0, 64))
    val sizes = parent.groupBy(_._2).map(_._2.size).toSeq.sorted
    println(
      f"[probe] coarsen: $tCoarsen%.1fs; children per coarse min=${sizes.head} max=${sizes.last} p50=${sizes(sizes.size / 2)}")

    val vdf = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

    // step A0: the OLD struct-array formulation (reference, interpreted)
    val (ca0, tA0) = time {
      vdf
        .select(col("vec_id"), explode(slice(Similarity.cellRanking(col("v"), coarse), 1, 4)).as("cp"))
        .count()
    }
    println(f"[probe] A0 explode coarse (old sort_array path): $ca0 rows in $tA0%.1fs")

    // step A: coarse ranking + explode via the native expression (no join)
    val (ca, tA) = time {
      vdf
        .select(col("vec_id"), explode(Similarity.nearest(col("v"), coarse, 4)).as("cp"))
        .count()
    }
    println(f"[probe] A explode coarse (native nearest_cells): $ca rows in $tA%.1fs")

    // step B: full candidate generation (explode + broadcast join + negd)
    val cands = Similarity.broadcastCandidates(vdf, cents0, 4)
    val (cb, tB) = time(cands.count())
    println(f"[probe] B candidates: $cb rows in $tB%.1fs")

    // step C: narrow aggregate — candidates WITHOUT v through min(struct)
    // (this is the shipped production formulation: aggregate skinny, then
    // re-join v by vec_id)
    val (cc, tC) = time {
      cands
        .select(col("vec_id"), col("negd"), col("cell"))
        .groupBy("vec_id")
        .agg(min(struct(col("negd"), col("cell"))).as("m"))
        .count()
    }
    println(f"[probe] C agg no-v (production: skinny agg + re-join): $cc rows in $tC%.1fs")

    // step D: the RETIRED formulation (carries v through the aggregate via
    // first(v)) — kept as a diagnostic to show what the narrow-agg rewrite buys
    val (cd, tD) = time {
      cands
        .groupBy("vec_id")
        .agg(min(struct(col("negd"), col("cell"))).as("m"), first(col("v")).as("v"))
        .count()
    }
    println(f"[probe] D agg with v (retired first(v) formulation): $cd rows in $tD%.1fs")

    spark.stop()
  }
}
