package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** X99 ANN index lifecycle ([[AnnIndex]]): build persists a
  * cell-partitioned store atomically, query probes only its cells,
  * recall holds against brute force, and the CLI drives both paths.
  */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def prng(parts: Int*): Float =
    MurmurHash3.orderedHash(parts).toFloat / Int.MaxValue.toFloat

  private val dim = 16

  private def clustered(nClusters: Int, perCluster: Int) = {
    val centers = Array.tabulate(nClusters, dim)((c, d) => prng(1, c, d) * 10f)
    val rows = for {
      c <- 0 until nClusters
      m <- 0 until perCluster
    } yield {
      val id = (c * perCluster + m).toLong
      (id, Array.tabulate(dim)(d => centers(c)(d) + prng(2, id.toInt, d) * 0.1f).toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("cellSources orders increments by numeric suffix, not lexicographically") {
    val dir = java.nio.file.Files.createTempDirectory("annsrc").toString
    val index = s"$dir/index"
    for (n <- Seq(2, 10, 1))
      assert(new java.io.File(s"$index/cells_inc_$n.parquet").mkdirs())
    val srcs = AnnIndex.cellSources(spark, index)
    // base first, then oldest-first by generation number: 1, 2, 10
    // (lexicographic would put cells_inc_10 before cells_inc_2).
    assert(srcs == Seq(
      s"$index/cells.parquet",
      s"$index/cells_inc_1.parquet",
      s"$index/cells_inc_2.parquet",
      s"$index/cells_inc_10.parquet"))
  }

  test("build + query: cell census partitions the corpus; probe recall matches brute force") {
    val dir = java.nio.file.Files.createTempDirectory("annidx").toString
    val corpus = clustered(nClusters = 6, perCluster = 20)
    corpus.write.mode("overwrite").parquet(s"$dir/corpus")
    val census = AnnIndex.build(spark, AnnIndex.Config(
      input = s"$dir/corpus", storeDir = s"$dir/store",
      dim = dim, nCentroids = 6, iters = 3, seedSample = 120))
    assert(census.agg(sum("n")).head().getLong(0) == 120L)
    // the on-disk layout IS cell-partitioned (the partition-pruning claim)
    val cellDirs = new java.io.File(s"$dir/store/index/cells.parquet")
      .listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.length >= 2, "expected cell=N partition directories")

    val queries = corpus.filter(col("vec_id") < 5)
    val got = AnnIndex.query(spark, s"$dir/store", queries,
        "vec_id", "embedding", k = 10, nProbe = 2)
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val exact = graft.ops.Similarity.bruteForceTopK(
        corpus, queries, "vec_id", "embedding", 10)
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val recall = exact.keys.toSeq
      .map(q => (exact(q) & got(q)).size.toDouble / 10).sum / exact.size
    assert(recall >= 0.9, s"probe recall $recall")
    graft.CachedFrames.unpersistAll()
  }

  test("rebuild swaps atomically and the store stays queryable") {
    val dir = java.nio.file.Files.createTempDirectory("annidx2").toString
    clustered(4, 10).write.mode("overwrite").parquet(s"$dir/corpus")
    def build() = AnnIndex.build(spark, AnnIndex.Config(
      input = s"$dir/corpus", storeDir = s"$dir/store",
      dim = dim, nCentroids = 4, iters = 2, seedSample = 40))
    build(); build() // refresh over an existing index must swap, not fail
    assert(!new java.io.File(s"$dir/store/index.next").exists())
    assert(!new java.io.File(s"$dir/store/index.old").exists())
    val out = AnnIndex.query(spark, s"$dir/store",
      clustered(4, 10).filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 3, nProbe = 1)
    assert(out.count() == 3)
  }

  test("CLI: ann-index then ann-query end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("anncli").toString
    val corpus = clustered(4, 10)
    corpus.write.mode("overwrite").parquet(s"$dir/corpus")
    corpus.filter(col("vec_id") < 3).write.mode("overwrite").parquet(s"$dir/q")
    val census = graft.Main.run(spark, Map("pipeline" -> "ann-index",
      "input" -> s"$dir/corpus", "store_dir" -> s"$dir/store",
      "dim" -> dim.toString, "n_centroids" -> "4"))
    assert(census.agg(sum("n")).head().getLong(0) == 40L)
    val res = graft.Main.run(spark, Map("pipeline" -> "ann-query",
      "store_dir" -> s"$dir/store", "queries" -> s"$dir/q",
      "output" -> s"$dir/out", "k" -> "5", "n_probe" -> "2"))
    assert(res.groupBy("qid").count().count() == 3)
    assert(res.filter(col("rank") > 5).isEmpty)
  }

  test("append indexes an increment against live centroids; compact folds it back") {
    val dir = java.nio.file.Files.createTempDirectory("annappend").toString
    val base = clustered(4, 10)
    base.write.mode("overwrite").parquet(s"$dir/corpus")
    AnnIndex.build(spark, AnnIndex.Config(
      input = s"$dir/corpus", storeDir = s"$dir/store",
      dim = dim, nCentroids = 4, iters = 2, seedSample = 40))
    // increment: shifted-id copies of 5 base vectors (same geometry →
    // same cells), plus both NULL shapes which must be excluded
    val inc = base.filter(col("vec_id") < 5)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
      .unionByName(Seq(
        (2000L, null: Seq[java.lang.Float]),
        (2001L, Seq[java.lang.Float](null) ++ Seq.fill(dim - 1)(Float.box(1f))))
        .toDF("vec_id", "embedding"))
    inc.write.mode("overwrite").parquet(s"$dir/inc")
    val census = AnnIndex.append(spark, s"$dir/store", s"$dir/inc")
    assert(census.agg(sum("n")).head().getLong(0) == 45L) // 40 base + 5 good
    assert(census.filter(col("cell").isNull).isEmpty)
    // an in-flight (uncommitted) increment is invisible to readers
    assert(new java.io.File(s"$dir/store/index/cells_inc_1.parquet.tmp").mkdirs())
    assert(AnnIndex.cellSources(spark, s"$dir/store/index").size == 2)
    // a query finds the appended twin of its own vector at rank 1
    // (sim = 1 exactly; ties with the query row itself are excluded)
    val q = base.filter(col("vec_id") === 0L)
    val top = AnnIndex.query(spark, s"$dir/store", q,
      "vec_id", "embedding", k = 3, nProbe = 2)
      .filter(col("rank") === 1).head()
    assert(top.getAs[Long]("nid") == 1000L && top.getAs[Double]("sim") > 0.999999)
    // a second append lands as the next generation (tmp name is free)
    new java.io.File(s"$dir/store/index/cells_inc_1.parquet.tmp").delete()
    AnnIndex.append(spark, s"$dir/store", s"$dir/inc")
    assert(AnnIndex.cellSources(spark, s"$dir/store/index").size == 3)
    val preCompact = AnnIndex.query(spark, s"$dir/store", q,
      "vec_id", "embedding", k = 5, nProbe = 2)
      .select("qid", "rank", "nid").as[(Long, Int, Long)].collect().toSet
    // plan pin: a cell predicate prunes partitions in EVERY
    // generation's scan through the union (the scale claim — without
    // it an increment would re-read whole-index bytes per probe)
    val unioned = AnnIndex.cellSources(spark, s"$dir/store/index")
      .map(spark.read.parquet(_)).reduce(_ unionByName _)
      .filter(col("cell") === 1)
    val leaves = unioned.queryExecution.executedPlan
      .collectLeaves().map(_.toString)
    assert(leaves.size == 3, s"expected 3 generation scans, got ${leaves.size}")
    assert(leaves.forall("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(_).isDefined),
      leaves.mkString("\n---\n"))
    // compact: one base again, same query results, atomic leftovers gone
    val compacted = AnnIndex.compact(spark, s"$dir/store")
    assert(compacted.agg(sum("n")).head().getLong(0) == 50L)
    assert(AnnIndex.cellSources(spark, s"$dir/store/index").size == 1)
    assert(!new java.io.File(s"$dir/store/index.next").exists())
    val postCompact = AnnIndex.query(spark, s"$dir/store", q,
      "vec_id", "embedding", k = 5, nProbe = 2)
      .select("qid", "rank", "nid").as[(Long, Int, Long)].collect().toSet
    assert(postCompact == preCompact)
  }

  test("CLI: ann-append and ann-compact drive the increment lifecycle") {
    val dir = java.nio.file.Files.createTempDirectory("annclia").toString
    val corpus = clustered(3, 8)
    corpus.write.mode("overwrite").parquet(s"$dir/corpus")
    corpus.select((col("vec_id") + 500L).as("vec_id"), col("embedding"))
      .limit(4).write.mode("overwrite").parquet(s"$dir/inc")
    graft.Main.run(spark, Map("pipeline" -> "ann-index",
      "input" -> s"$dir/corpus", "store_dir" -> s"$dir/store",
      "dim" -> dim.toString, "n_centroids" -> "3"))
    val census = graft.Main.run(spark, Map("pipeline" -> "ann-append",
      "input" -> s"$dir/inc", "store_dir" -> s"$dir/store"))
    assert(census.agg(sum("n")).head().getLong(0) == 28L)
    val compacted = graft.Main.run(spark, Map("pipeline" -> "ann-compact",
      "store_dir" -> s"$dir/store"))
    assert(compacted.agg(sum("n")).head().getLong(0) == 28L)
    assert(AnnIndex.cellSources(spark, s"$dir/store/index").size == 1)
  }

  test("build excludes null-vector rows instead of writing an unqueryable cell=null partition") {
    val dir = java.nio.file.Files.createTempDirectory("annnull").toString
    val good = clustered(3, 8)
    // Both NULL shapes: a NULL vector AND a vector with one NULL
    // element (ADVICE r14 — the kernel is element-null-propagating,
    // so an element null also argmaxes to cell=null if not excluded).
    val bad = Seq(
      (900L, null: Seq[java.lang.Float]),
      (901L, Seq[java.lang.Float](1f, null) ++ Seq.fill(dim - 2)(Float.box(0f))))
      .toDF("vec_id", "embedding")
    good.unionByName(bad).write.mode("overwrite").parquet(s"$dir/corpus")
    val census = AnnIndex.build(spark, AnnIndex.Config(
      input = s"$dir/corpus", storeDir = s"$dir/store",
      dim = dim, nCentroids = 3, iters = 1, seedSample = 24))
    assert(census.agg(sum("n")).head().getLong(0) == 24L, "null row must not be indexed")
    assert(census.filter(col("cell").isNull).isEmpty, "no cell=null census row")
    val cellDirs = new java.io.File(s"$dir/store/index/cells.parquet")
      .listFiles().map(_.getName).filter(_.startsWith("cell="))
    assert(!cellDirs.exists(_.contains("HIVE_DEFAULT")), cellDirs.mkString(","))
  }

  test("PQ store: codes-only cells shrink the index; ADC + refine recall; lifecycle") {
    val dir = java.nio.file.Files.createTempDirectory("annpq").toString
    val corpus = clustered(6, 200)
    corpus.write.mode("overwrite").parquet(s"$dir/corpus")
    def cfg(store: String, m: Int) = AnnIndex.Config(
      input = s"$dir/corpus", storeDir = store, dim = dim,
      nCentroids = 6, iters = 2, seedSample = 120, pqM = m, pqKsub = 16)
    AnnIndex.build(spark, cfg(s"$dir/raw", 0))
    val cachesBefore = graft.CachedFrames.size
    val census = AnnIndex.build(spark, cfg(s"$dir/pq", 4))
    // the training cache is a bounded working set, released by build
    // itself — a long-lived app must not accumulate one per refresh
    assert(graft.CachedFrames.size == cachesBefore)
    assert(census.agg(sum("n")).head().getLong(0) == 1200L)

    // the compression claim, measured: the PQ cells dataset is less
    // than half the raw one on disk (1200 × 4 small codes vs 16 floats)
    def bytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
      walk(new java.io.File(p))
    }
    val rawB = bytes(s"$dir/raw/index/cells.parquet")
    val pqB = bytes(s"$dir/pq/index/cells.parquet")
    assert(pqB < rawB / 2, s"pq cells $pqB bytes vs raw $rawB")
    // and the cells carry NO raw vectors — only ids and codes
    assert(spark.read.parquet(s"$dir/pq/index/cells.parquet").columns.toSet
      == Set("vec_id", "pq_codes", "cell"))

    // ADC-only query: coarse neighborhood is exact on this fixture
    val queries = corpus.filter(col("vec_id") < 5)
    val adc = AnnIndex.query(spark, s"$dir/pq", queries,
      "vec_id", "embedding", k = 10, nProbe = 2)
      .select("qid", "nid").as[(Long, Long)].collect()
    assert(adc.length == 50)
    adc.foreach { case (q, n) => assert(n / 200 == q / 200, s"$n left $q's cluster") }

    // exact refine over the bounded ADC shortlist recovers brute-force
    // recall — measured on a corpus with REAL neighborhood structure
    // (noise comparable to the spread: distinct cosine gaps). The
    // tight fixture above is the adversarial case for ANY quantizer:
    // within a cluster every member is a 1e-5-level near-tie, so an
    // ADC shortlist is as good as random there — which is exactly why
    // the contract pins the coarse neighborhood on it, not rank order.
    val noisy = {
      val centers = Array.tabulate(6, dim)((c, d) => prng(1, c, d) * 10f)
      val rows = for { c <- 0 until 6; m <- 0 until 100 } yield {
        val id = (c * 100 + m).toLong
        (id, Array.tabulate(dim)(d => centers(c)(d) + prng(3, id.toInt, d) * 4f).toSeq)
      }
      rows.toDF("vec_id", "embedding")
    }
    noisy.write.mode("overwrite").parquet(s"$dir/noisy")
    AnnIndex.build(spark, AnnIndex.Config(
      input = s"$dir/noisy", storeDir = s"$dir/pq2", dim = dim,
      nCentroids = 6, iters = 2, seedSample = 120, pqM = 8, pqKsub = 16))
    val nq = noisy.filter(col("vec_id") < 5)
    val refined = AnnIndex.query(spark, s"$dir/pq2", nq,
      "vec_id", "embedding", k = 10, nProbe = 2,
      refineWith = Some(noisy), refineFactor = 8)
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val exact = graft.ops.Similarity.bruteForceTopK(
        noisy, nq, "vec_id", "embedding", 10)
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val recall = exact.keys.toSeq
      .map(q => (exact(q) & refined(q)).size.toDouble / 10).sum / exact.size
    assert(recall >= 0.9, s"refined recall $recall")

    // append encodes against the live codebooks; the refined query
    // finds the appended twin at rank 1 with sim = 1 (on the noisy
    // store, where ADC rank order is meaningful)
    noisy.filter(col("vec_id") === 0L)
      .select((col("vec_id") + 5000L).as("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$dir/inc")
    val census2 = AnnIndex.append(spark, s"$dir/pq2", s"$dir/inc")
    assert(census2.agg(sum("n")).head().getLong(0) == 601L)
    val q0 = noisy.filter(col("vec_id") === 0L)
    val fullCorpus = noisy.unionByName(spark.read.parquet(s"$dir/inc"))
    val top = AnnIndex.query(spark, s"$dir/pq2", q0,
      "vec_id", "embedding", k = 3, nProbe = 2,
      refineWith = Some(fullCorpus)).filter(col("rank") === 1).head()
    assert(top.getAs[Long]("nid") == 5000L && top.getAs[Double]("sim") > 0.999999)
    // a refine corpus LACKING the appended twin (refineWith pointed at
    // the original build input — the natural operator choice) must not
    // silently drop it: the twin stays, carrying its ADC estimate
    val partial = AnnIndex.query(spark, s"$dir/pq2", q0,
      "vec_id", "embedding", k = 3, nProbe = 2, refineWith = Some(noisy))
    assert(partial.filter(col("nid") === 5000L).count() == 1,
      "appended id must survive a refine corpus that lacks it")

    // compact carries the codebooks and preserves results exactly
    val pre = AnnIndex.query(spark, s"$dir/pq2", q0,
      "vec_id", "embedding", k = 5, nProbe = 2)
      .select("qid", "rank", "nid").as[(Long, Int, Long)].collect().toSet
    AnnIndex.compact(spark, s"$dir/pq2")
    assert(AnnIndex.cellSources(spark, s"$dir/pq2/index").size == 1)
    val post = AnnIndex.query(spark, s"$dir/pq2", q0,
      "vec_id", "embedding", k = 5, nProbe = 2)
      .select("qid", "rank", "nid").as[(Long, Int, Long)].collect().toSet
    assert(post == pre)

    // the raw store is already exact — refineWith is a contract error
    intercept[IllegalArgumentException] {
      AnnIndex.query(spark, s"$dir/raw", q0,
        "vec_id", "embedding", k = 3, nProbe = 2, refineWith = Some(corpus))
    }
    graft.CachedFrames.unpersistAll()
  }

  test("CLI: pq-compressed ann-index with refined ann-query") {
    val dir = java.nio.file.Files.createTempDirectory("annpqcli").toString
    val corpus = clustered(3, 10)
    corpus.write.mode("overwrite").parquet(s"$dir/corpus")
    corpus.filter(col("vec_id") < 2).write.mode("overwrite").parquet(s"$dir/q")
    graft.Main.run(spark, Map("pipeline" -> "ann-index",
      "input" -> s"$dir/corpus", "store_dir" -> s"$dir/store",
      "dim" -> dim.toString, "n_centroids" -> "3", "pq_m" -> "4", "pq_ksub" -> "8"))
    assert(new java.io.File(s"$dir/store/index/codebooks.parquet").exists())
    val res = graft.Main.run(spark, Map("pipeline" -> "ann-query",
      "store_dir" -> s"$dir/store", "queries" -> s"$dir/q",
      "output" -> s"$dir/out", "k" -> "5", "n_probe" -> "2",
      "refine_with" -> s"$dir/corpus", "refine_factor" -> "2"))
    assert(res.groupBy("qid").count().count() == 2)
    assert(res.filter(col("rank") > 5).isEmpty)
  }

  test("raw store: a zero-norm stored vector scores NaN and must never reach the ranking") {
    val dir = java.nio.file.Files.createTempDirectory("annzero").toString
    val corpus = clustered(3, 8)
      .unionByName(Seq((900L, Seq.fill(dim)(0f))).toDF("vec_id", "embedding"))
    corpus.write.mode("overwrite").parquet(s"$dir/corpus")
    AnnIndex.build(spark, AnnIndex.Config(
      input = s"$dir/corpus", storeDir = s"$dir/store",
      dim = dim, nCentroids = 3, iters = 1, seedSample = 24))
    // probing every cell guarantees the zero row's cell is read;
    // unguarded, cosine(q, 0) = NaN sorts ABOVE every real sim and
    // the degenerate row becomes rank 1 for every query
    val out = AnnIndex.query(spark, s"$dir/store",
      corpus.filter(col("vec_id") === 0L), "vec_id", "embedding",
      k = 3, nProbe = 3).collect()
    assert(out.length == 3)
    assert(!out.exists(_.getAs[Long]("nid") == 900L), "zero vector must not rank")
    assert(out.forall(r => !r.getAs[Double]("sim").isNaN))
  }

  test("query validates nProbe against the stored cell count") {
    val dir = java.nio.file.Files.createTempDirectory("annidx3").toString
    clustered(2, 5).write.mode("overwrite").parquet(s"$dir/corpus")
    AnnIndex.build(spark, AnnIndex.Config(
      input = s"$dir/corpus", storeDir = s"$dir/store",
      dim = dim, nCentroids = 2, iters = 1, seedSample = 10))
    intercept[IllegalArgumentException] {
      AnnIndex.query(spark, s"$dir/store", clustered(2, 5),
        "vec_id", "embedding", k = 3, nProbe = 99)
    }
  }
}
