package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed EXACT grouped percentiles (round-12 verdict item 1).
  *
  * The built-in `percentile()` aggregate buffers each group's full value
  * set in ONE reducer — with `l_returnflag`'s ~4 groups that funnels a
  * 100 TB table into ~4 tasks (the steepest 8× scaler in BASELINE.md).
  * This module computes the SAME interpolated percentile with no task
  * ever holding more than one range-partition:
  *
  *  1. range-partition + sort by `(group, value)` — a TeraSort-style
  *     distributed sort; every task holds ~|data|/P rows regardless of
  *     group cardinality. Materialized once (`localCheckpoint`, the
  *     repo-wide two-pass idiom — see KMeansOps.scala:35).
  *  2. per-(partition, group) counts — an O(P·G) aggregate collected to
  *     the driver (bounded by partitions × groups, not data).
  *  3. driver computes each group's total n, the target ranks
  *     `pos = p·(n−1)` → `(floor, ceil, frac)` (the exact formula both
  *     Spark's `Percentile` and DuckDB's `quantile_cont` use), and each
  *     partition's per-group starting offset.
  *  4. one narrow `mapPartitions` pass assigns global ranks with a
  *     running counter (rows arrive sorted) and emits ONLY the ≤ 2·|ps|
  *     boundary rows per group — O(G·|ps|) rows total.
  *  5. interpolate `v_lo + (v_hi − v_lo)·frac` per group.
  *
  * Ties across partition boundaries are safe: equal sort keys carry equal
  * values, so which duplicate receives the boundary rank cannot change
  * the picked value. Reference scope: the reference engine has no
  * quantile operator at all (SURVEY.md §2.6 extended ops); semantics are
  * pinned to DuckDB `quantile_cont` via the shared oracle.
  *
  * Cardinality envelope: the driver-side maps are O(P·G), so this design
  * targets LOW-cardinality groupings — exactly the regime where the
  * built-in aggregate degenerates to G giant reducers. At high G the
  * per-group buffers are small and already parallel, so the built-in
  * `percentile()` (or the sketch path) is the right tool there; the two
  * regimes meet around G ≈ shuffle parallelism.
  */
object QuantileOps {

  /** Stage 1: the range-partitioned sorted run. Exposed for PlanSpec,
    * which pins that every group spans >1 partition (the whole point —
    * no group ever funnels into a single task). */
  private[graft] def rangedByGroupValue(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.select(col(groupCol).cast("string").as("g"),
        col(valCol).cast("double").as("v"))
      .repartitionByRange(parts, col("g"), col("v"))
      .sortWithinPartitions("g", "v")
  }

  private final case class Cut(lo: Long, hi: Long, frac: Double)

  /** Exact interpolated percentiles of `valCol` per `groupCol` group.
    * Output columns: `groupCol` (string), one double column per named
    * percentile in `ps`, `n` (group count) — raw doubles; callers apply
    * their own rounding discipline (rIeee) on top. */
  private[graft] def exactPercentiles(df: DataFrame, groupCol: String,
      valCol: String, ps: Seq[(String, Double)]): DataFrame =
    exactPercentilesOn(
      rangedByGroupValue(df, groupCol, valCol).localCheckpoint(),
      groupCol, ps)

  /** The percentile computation over an ALREADY-RANGED-AND-PINNED (g, v)
    * run — split from [[exactPercentiles]] (r21) so a caller that needs
    * BOTH the exact cuts and another aggregate over the same rows
    * (approx_percentile_agg's sketch side) can share one scan + one
    * range exchange instead of re-reading the table per consumer. */
  private[graft] def exactPercentilesOn(ranged: DataFrame, groupCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    val spark = ranged.sparkSession
    import spark.implicits._

    val withPid = ranged.withColumn("pid", spark_partition_id())

    // O(P·G) — partitions × groups, never data-scaled
    val cnts: Map[(Int, String), Long] = withPid
      .groupBy(col("pid"), col("g")).count().collect()
      .map(r => ((r.getInt(0), r.getString(1)), r.getLong(2))).toMap
    val totals: Map[String, Long] =
      cnts.groupBy(_._1._2).map { case (g, m) => (g, m.values.sum) }
    val cuts: Map[String, Seq[Cut]] = totals.map { case (g, n) =>
      g -> ps.map { case (_, p) =>
        // double math on purpose: bit-identical to Percentile /
        // quantile_cont's own position computation
        val pos = p * (n - 1).toDouble
        val lo = math.floor(pos).toLong
        Cut(lo, math.ceil(pos).toLong, pos - lo)
      }
    }
    val needed: Map[String, Set[Long]] = cuts.map { case (g, cs) =>
      (g, cs.flatMap(c => Seq(c.lo, c.hi)).toSet)
    }
    val pids = cnts.keys.map(_._1).toSeq.distinct.sorted
    val offsets: Map[(Int, String), Long] = (for {
      g <- totals.keys; pid <- pids
    } yield (pid, g) ->
      pids.filter(_ < pid).map(p2 => cnts.getOrElse((p2, g), 0L)).sum).toMap

    // narrow pass: running rank per group from the partition's offset;
    // emits only boundary rows (≤ 2·|ps| per group corpus-wide)
    val picked: Array[(String, Long, Double)] = withPid
      .select(col("g"), col("v"), col("pid")).as[(String, Double, Int)]
      .mapPartitions { it =>
        var curG: String = null
        var rank = 0L
        it.flatMap { case (g, v, pid) =>
          if (g != curG) { curG = g; rank = offsets((pid, g)) }
          val r = rank
          rank += 1
          if (needed(g).contains(r)) Iterator.single((g, r, v))
          else Iterator.empty
        }
      }.collect()

    val byG: Map[String, Map[Long, Double]] = picked.groupBy(_._1)
      .map { case (g, a) => (g, a.map(t => (t._2, t._3)).toMap) }
    val out = totals.keys.toSeq.sorted.map { g =>
      val vals = byG(g)
      val pcts = cuts(g).map { c =>
        val vlo = vals(c.lo)
        vlo + (vals(c.hi) - vlo) * c.frac
      }
      Row.fromSeq(g +: pcts :+ totals(g))
    }
    val schema = StructType(
      StructField(groupCol, StringType) +:
        ps.map { case (name, _) => StructField(name, DoubleType) } :+
        StructField("n", LongType))
    spark.createDataFrame(spark.sparkContext.parallelize(out, 1), schema)
  }
}
