package graft

import org.apache.spark.sql.functions._
import graft.llm.SimHash
import graft.udx.TopKAggregator

/** Custom-extension coverage: SparkSessionExtensions function install,
  * the native SimHash expression, and the bounded-heap top-k aggregate
  * vs the window formulation it replaces. */
class UdxSpec extends GraftSpec {

  test("GraftExtensions installs graft_* functions at session build time") {
    // no NGrams.register call here — the functions must come from the
    // spark.sql.extensions config on the shared test session
    val ng = spark.sql("SELECT graft_ngrams('abcd', 3) AS g").collect().map(_.getString(0))
    assert(ng.toSeq == Seq("abc", "bcd"))
    val sh = spark.sql("SELECT graft_simhash('a b c') AS s").collect()(0).getLong(0)
    assert(sh == SimHash.simhash64("a b c"))
  }

  test("native simhash expression is null-safe and matches the Scala impl") {
    import SparkSpecBase.spark.implicits._
    val df = Seq(Some("x y z"), None).toDF("t")
      .selectExpr("graft_simhash(t) AS s")
    val rows = df.collect()
    assert(rows(0).getLong(0) == SimHash.simhash64("x y z"))
    assert(rows(1).isNullAt(0))
  }

  test("bounded-heap topk equals window row_number topk") {
    val orders = graft.tables.Tables.t(spark, sfDir, "orders")
      .select(col("o_custkey"), round(col("o_totalprice"), 2).as("score"), col("o_orderkey"))
    val viaAgg = orders.groupBy("o_custkey")
      .agg(TopKAggregator.topk(3)(col("score"), col("o_orderkey")).as("tk"))
      .select(col("o_custkey"), posexplode(col("tk.items")))
      .select(col("o_custkey"), col("col._2").as("id"), col("col._1").as("score"),
        (col("pos") + 1).as("rnk"))
      .orderBy("o_custkey", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(desc("score"), asc("o_orderkey"))
    val viaWindow = orders.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("o_custkey", "o_orderkey", "score", "rnk")
      .orderBy("o_custkey", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(viaAgg.toSeq == viaWindow.toSeq)
  }

  test("topk partial aggregation: merge of disjoint buffers is ordered and capped") {
    val agg = new TopKAggregator.TopK(3)
    val a = Seq((0.9, 1L), (0.5, 2L), (0.1, 3L)).foldLeft(agg.zero)(agg.reduce)
    val b = Seq((0.8, 4L), (0.5, 1L), (0.95, 9L)).foldLeft(agg.zero)(agg.reduce)
    val m = agg.merge(a, b).items
    assert(m == Seq((0.95, 9L), (0.9, 1L), (0.8, 4L)))
  }

  test("optimizer rule rewrites the HOF dot-product idiom to the fused kernel") {
    // parquet-backed source (a literal LocalRelation would be constant-
    // folded before the rewrite is observable)
    val emb = graft.tables.Tables.t(spark, sfDir, "embeddings").filter(col("vec_id") < 20)
    val df = emb.select(col("vec_id"), graft.llm.Vectors.dot(
      graft.llm.Vectors.toDouble(col("embedding")),
      graft.llm.Vectors.toDouble(col("embedding"))).as("d"))
    // the injected VectorKernelRewrite must have replaced the
    // aggregate(zip_with(...)) chain with graft_fdot in the optimized plan
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_fdot"), s"rule did not fire:\n$opt")
    assert(!opt.contains("aggregate("), s"HOF chain survived:\n$opt")
    // and values equal a driver-side fold over the raw vectors
    val raw = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    df.collect().foreach { r =>
      val v = raw(r.getLong(0))
      val expected = v.foldLeft(0.0) { (s, x) => s + x.toDouble * x.toDouble }
      assert(r.getDouble(1) == expected)
    }
  }

  test("graft_shingles64 mirrors the string-shingle sets: sizes and pairwise intersections") {
    import graft.llm.MinHash
    val texts = graft.tables.Tables.t(spark, sfDir, "documents")
      .filter(col("doc_id") < 60).orderBy("doc_id")
      .select("text").collect().map(_.getString(0))
    def stringShingles(t: String): Set[String] = {
      // the exact Catalyst formulation the kernel replaced: split keeps
      // empty tokens; short texts produce one joined shingle
      val w = t.split(" ", -1)
      if (w.length < 3) Set(w.mkString(" "))
      else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val hashed = texts.map(t => MinHash.shingleHashes(t).toSet)
    val strs = texts.map(stringShingles)
    hashed.zip(strs).foreach { case (h, s) => assert(h.size == s.size) }
    for (i <- texts.indices; j <- (i + 1) until texts.length) {
      assert(hashed(i).intersect(hashed(j)).size == strs(i).intersect(strs(j)).size,
        s"pair ($i,$j) intersection mismatch")
    }
  }

  test("graft_fdot/graft_fnorm are bit-identical to the HOF double formulation") {
    import SparkSpecBase.spark.implicits._
    graft.udx.NGrams.registerAll(spark)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(
      graft.llm.Vectors.fdot(col("a"), col("b")).as("kd"),
      graft.llm.Vectors.dot(
        graft.llm.Vectors.toDouble(col("a")), graft.llm.Vectors.toDouble(col("b"))).as("hd"),
      graft.llm.Vectors.fnorm(col("a")).as("kn"),
      graft.llm.Vectors.norm(graft.llm.Vectors.toDouble(col("a"))).as("hn")).collect()
    // the kernel folds left-to-right in double exactly like the HOFs, so
    // equality must be EXACT (==), not approximate
    got.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), s"fdot ${r.getDouble(0)} != ${r.getDouble(1)}")
      assert(r.getDouble(2) == r.getDouble(3), s"fnorm ${r.getDouble(2)} != ${r.getDouble(3)}")
    }
  }

  test("Misra-Gries candidates contain every true heavy hitter at any partitioning") {
    import SparkSpecBase.spark.implicits._
    val k = 16
    // zipf-ish synthetic stream with planted heavies + noise tail
    val rnd = new scala.util.Random(11)
    val data: Seq[Long] = (0 until 5000).map { _ =>
      val u = rnd.nextInt(1000)
      (200L / (1 + u)) // key 200..0, heavily skewed toward small u → large key
    }
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = data.size.toLong
    val trueHeavy = exact.filter { case (_, c) => c > n / (k + 1) }.keySet
    for (parts <- Seq(1, 3, 32)) {
      val cands = data.toDF("x").repartition(parts)
        .agg(graft.udx.MisraGries.mg(k)(col("x")).as("mg"))
        .select(explode(map_keys(col("mg.keys"))).as("hk"))
        .collect().map(_.getLong(0)).toSet
      assert(cands.size <= k, s"parts=$parts buffer exceeded k")
      assert(trueHeavy.subsetOf(cands),
        s"parts=$parts lost heavy hitters: ${trueHeavy -- cands}")
    }
  }

  test("agg_heavy_hitters equals the naive exact groupBy+threshold form") {
    val got = graft.queries.UdxQueries.aggHeavyHitters(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // naive: full exact counts, no sketch
    val u = conv(substring(md5(concat(col("l_orderkey").cast("string"),
        lit("-"), col("l_linenumber").cast("string"))), 1, 15), 16, 10)
      .cast("long") % 10000L
    val src = graft.tables.Tables.t(spark, sfDir, "lineitem")
      .select(call_function("div", lit(10000L), lit(1L) + u).as("hk"))
    val tot = src.count()
    val want = src.groupBy("hk").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 100 > lit(tot))
      .select(col("hk"), col("cnt"),
        call_function("div", col("cnt") * 10000L, lit(tot)).as("bp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (-x._2, x._1))
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty, "skew construction should yield at least one heavy hitter")
  }
}
