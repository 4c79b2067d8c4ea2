package graft.operators

import graft.SparkSpec
import graft.model.{Alias, Dict, Page}
import graft.sources.Tables
import graft.text.HtmlCodec
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {

  /** (id1, id2) row set of a pair-emitting operator's output. */
  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = df
    .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("pages synthesis: byte-identity invariant holds for every url at sf0.001") {
    import spark.implicits._
    val bad = Tables.pages(spark, sfDir)
      .map(p => if (HtmlCodec.extract(p.html) == p.text) 0 else 1)
      .reduce(_ + _)
    assert(bad == 0)
  }

  test("mention scan matches driver-side brute force on a sample page") {
    import spark.implicits._
    val pages = Tables.pages(spark, sfDir).limit(20).cache()
    val got = Mentions.scan(spark, pages, Dict.surfaces, wordBounds = false)
      .map(m => (m.url, m.surface, m.begin)).collect().toSet
    val want = pages.collect().flatMap { p =>
      Dict.surfaces.flatMap { su =>
        (0 to p.text.length - su.length)
          .filter(i => p.text.startsWith(su, i))
          .map(i => (p.url, su, i))
      }
    }.toSet
    assert(got == want && got.nonEmpty)
  }

  test("word-bound mentions never split tokens") {
    import spark.implicits._
    val pages = Tables.pages(spark, sfDir).limit(20)
    val ms = Mentions.scan(spark, pages, Dict.surfaces, wordBounds = true).collect()
    assert(ms.nonEmpty)
    val byUrl = pages.collect().map(p => p.url -> p.text).toMap
    ms.foreach { m =>
      val t = byUrl(m.url)
      assert(t.substring(m.begin, m.end) == m.surface)
      assert(m.begin == 0 || !t.charAt(m.begin - 1).isLetterOrDigit)
      assert(m.end == t.length || !t.charAt(m.end).isLetterOrDigit)
    }
  }

  test("linking: ambiguous surface resolves to highest-prior qid, salted join agrees with plain") {
    import spark.implicits._
    val pages = Tables.pages(spark, sfDir).limit(50)
    val mentions = Mentions.scan(spark, pages, Dict.surfaces, wordBounds = true)
    val top1 = Linking.topK(Linking.candidates(spark, mentions, Dict.aliases), 1)
    val tableRows = top1.filter(col("surface") === "table").select("qid").distinct().collect()
    assert(tableRows.map(_.getString(0)).toSeq == Seq("Q1013")) // prior 0.7 beats 0.3

    val dim = Dict.aliases.toDF()
    val plain = mentions.toDF().join(dim, Seq("surface"))
      .select("url", "begin", "qid").collect().toSet
    val salted = Linking.saltedJoin(mentions.toDF(), dim, salt = 4)
      .select("url", "begin", "qid").collect().toSet
    assert(plain == salted && plain.nonEmpty)
  }

  test("tf-idf scoring: rare surfaces outrank ubiquitous ones at equal prior") {
    import spark.implicits._
    val cands = Seq(
      ("u1", "common", "Q1", 0.5), ("u2", "common", "Q1", 0.5), ("u3", "common", "Q1", 0.5),
      ("u1", "rare", "Q2", 0.5)
    ).toDF("url", "surface", "qid", "score")
    val scored = Linking.tfidfScored(cands, totalDocs = 3)
      .collect().map(r => (r.getAs[String]("surface"), r.getAs[Double]("score"))).toMap
    assert(scored("rare") > scored("common"))
  }

  test("salted join distributes a skewed head surface across the salt domain") {
    import spark.implicits._
    // 'scan' is the deliberately skewed head surface: every fact row hits it
    val facts = (0 until 1000).map(i => (s"https://u/$i", "scan", i)).toDF("url", "surface", "begin")
    val dim = Dict.aliases.toDF()
    val out = Linking.saltedJoin(facts, dim, salt = 8)
    assert(out.count() == 1000)
    // the salt column spreads urls over the full domain before the join
    val saltDist = facts.withColumn("salt", pmod(hash(col("url")), lit(8)))
      .groupBy("salt").count().collect()
    assert(saltDist.length == 8) // all 8 salt buckets populated
  }

  test("triple diff: added/removed/diffOps consistent, A\\A empty") {
    import spark.implicits._
    val a = Seq(("E1", "s1", "p", "o1"), ("E1", "s1", "p", "o2"), ("E2", "s2", "p", "o3"))
      .toDF("entity", "subj", "pred", "obj")
    val b = Seq(("E1", "s1", "p", "o1"), ("E1", "s1", "p", "o9"))
      .toDF("entity", "subj", "pred", "obj")
    val keys = Seq("entity", "subj", "pred", "obj")
    assert(TripleDiff.added(b, a, keys).collect().map(_.getString(3)).toSet == Set("o9"))
    assert(TripleDiff.removed(b, a, keys).collect().map(_.getString(3)).toSet == Set("o2", "o3"))
    val ops = TripleDiff.diffOps(a, b, keys).collect()
      .map(r => (r.getAs[String]("obj"), r.getAs[String]("op"))).toSet
    assert(ops == Set(("o9", "INSERT"), ("o2", "DELETE"), ("o3", "DELETE")))
    assert(TripleDiff.diffOps(a, a, keys).count() == 0)
  }

  test("property: diffOpsFromFlags equals diffOps on a randomly flagged shared frame") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val rng = new scala.util.Random(11)
    val keys = Seq("entity", "subj", "pred", "obj")
    // shared frame with per-row membership flags (each row in ≥1 revision),
    // including duplicate key rows with differing flags (max-combine case)
    val rows = (0 until 60).map { i =>
      val inOld = rng.nextBoolean()
      ("E", s"s${i % 9}", s"p${i % 2}", s"o${i % 13}", inOld, !inOld || rng.nextBoolean())
    }
    val df = rows.toDF("entity", "subj", "pred", "obj", "in_old", "in_new")
    val viaFlags = TripleDiff
      .diffOpsFromFlags(df, col("in_old"), col("in_new"), keys)
      .collect().map(_.toSeq).toSet
    val viaDiff = TripleDiff
      .diffOps(
        df.filter(col("in_old")).select(keys.map(col): _*),
        df.filter(col("in_new")).select(keys.map(col): _*), keys)
      .collect().map(_.toSeq).toSet
    assert(viaFlags == viaDiff)
    // one aggregation exchange, no join, in the flag form's plan
    val plan = TripleDiff.diffOpsFromFlags(df, col("in_old"), lit(true), keys)
      .queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
        case p => p
      }
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e }
    assert(shuffles.size <= 1, plan.toString)
  }

  test("property: diff anti-symmetry — added(B,A) equals removed(A,B)") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val all = (0 until 40).map(i => ("E", s"s${i % 7}", s"p${i % 3}", s"o$i"))
    val a = all.filter(_ => rng.nextBoolean()).toDF("entity", "subj", "pred", "obj")
    val b = all.filter(_ => rng.nextBoolean()).toDF("entity", "subj", "pred", "obj")
    val keys = Seq("entity", "subj", "pred", "obj")
    val addedBA = TripleDiff.added(b, a, keys).collect().map(_.toSeq).toSet
    val removedAB = TripleDiff.removed(a, b, keys).collect().map(_.toSeq).toSet
    assert(addedBA == removedAB)
    // and diffOps agrees with the two anti-joins
    val ops = TripleDiff.diffOps(a, b, keys).collect()
      .map(r => (r.toSeq.dropRight(1), r.getAs[String]("op"))).toMap
    assert(ops.filter(_._2 == "INSERT").keySet == addedBA.map(_.asInstanceOf[Seq[Any]]))
  }

  test("exact dedup groups identical normalized texts") {
    import spark.implicits._
    val docs = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(docs, "text", "doc_id").collect()
      .map(r => (r.getAs[Long]("survivor_id"), r.getAs[Long]("n_copies"))).toSet
    assert(out == Set((1L, 2L), (3L, 1L)))
  }

  test("minhash LSH finds the planted near-duplicate, not the unrelated doc") {
    import spark.implicits._
    val base = (1 to 200).map(i => s"token$i").mkString(" ")
    val nearDup = base.replace("token5 ", "token5x ")
    val other = (1 to 200).map(i => s"zzz$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val sigs = Dedup.minHashSignatures(spark, docs, "doc_id", "text")
    val pairs = Dedup.minHashCandidates(spark, sigs, bands = 16, minEstJaccard = 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    // exact verification keeps the pair
    val verified = Dedup.verifyJaccard(spark, docs, "doc_id", "text",
      Seq((1L, 2L)).toDF("id1", "id2"), shingleN = 5, minJaccard = 0.8).count()
    assert(verified == 1)
  }

  test("simhash near-dup pairs: hamming bound respected and planted dup found") {
    import spark.implicits._
    val base = (1 to 300).map(i => s"w$i").mkString(" ")
    val nearDup = base.replace("w7 ", "w7x ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, "completely different words here"))
      .toDF("doc_id", "text")
    val hashes = Dedup.simHashes(spark, docs, "doc_id", "text")
    val pairs = Dedup.simHashPairs(spark, hashes, maxHamming = 6).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(pairs.forall(_.getAs[Int]("hamming") <= 6))
  }

  test("ANN: LSH top-k ⊆ high recall vs brute force; query vec is its own nearest") {
    import spark.implicits._
    val emb = Tables.read(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .as[Array[Float]].head()
    val brute = Ann.bruteForceTopK(spark, emb, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0))
    assert(brute.head == 0L) // self-similarity = 1.0 tops the list
    // plane count scales with corpus size: ~log2(N / bucketTarget); 4 planes
    // for 500 vectors ≈ 30/bucket (the default 12 targets ≥10^6 vectors)
    val lsh = Ann.lshTopK(spark, emb, "vec_id", "embedding", q, 10, nPlanes = 4)
      .collect().map(_.getLong(0)).toSet
    assert(lsh.contains(0L))
    // recall of LSH against brute-force top-10 should be non-trivial
    assert(brute.count(lsh.contains) >= 3)
  }

  test("IVF ANN: self is found, recall vs brute force is non-trivial, cells partition the corpus") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") === 0)
      .select("embedding").as[Array[Float]].head()
    val brute = Ann.bruteForceTopK(spark, emb, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0))
    val ivf = Ann.ivfTopK(spark, emb, "vec_id", "embedding", q, 10, nCells = 8, nProbe = 3)
      .collect().map(_.getLong(0)).toSet
    assert(ivf.contains(0L)) // the query's own cell is always probed
    assert(brute.count(ivf.contains) >= 5, s"ivf=$ivf brute=${brute.toSeq}")
    // probing fewer cells scans a strict subset of the corpus: full probe == brute
    val full = Ann.ivfTopK(spark, emb, "vec_id", "embedding", q, 10, nCells = 8, nProbe = 8)
      .collect().map(_.getLong(0))
    assert(full.toSeq == brute.toSeq)
  }

  test("canonicalizeUrl: scheme/host case, default vs non-default ports, tracking params, sorting, fragments") {
    import spark.implicits._
    import graft.functions.TextAnalysis
    val urls = Seq(
      (1L, "HTTP://WWW.Example.com:80/a"),
      (2L, "https://Example.COM:443/p?utm_source=x&b=2&a=1#f"),
      (3L, "https://site.org:8443/x?gclid=abc&z=9&utm_campaign=q&y=1"),
      (4L, "http://example.com"),
      (5L, "https://h.io:80/q"), // :80 is NOT default for https — kept
      (6L, "ftp://Weird.Host:21/f?b=1&a=2") // unknown scheme: port kept, params still sorted
    ).toDF("id", "url")
    val out = urls.select(col("id"), TextAnalysis.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "http://www.example.com/a")
    assert(out(2L) == "https://example.com/p?a=1&b=2")
    assert(out(3L) == "https://site.org:8443/x?y=1&z=9")
    assert(out(4L) == "http://example.com/")
    assert(out(5L) == "https://h.io:80/q")
    assert(out(6L) == "ftp://weird.host:21/f?a=2&b=1")
  }

  test("redactPii: emails and phones scrubbed, multiples handled, plain text untouched") {
    import spark.implicits._
    import graft.functions.TextAnalysis
    val rows = Seq(
      (1L, "reach a.b-c_9@sub.example.org or x@y.io today"),
      (2L, "call 555-123-4567 then 800-000-9999 thanks"),
      (3L, "mixed bob@corp.com and 555-111-2222 in one line"),
      (4L, "no pii here, just words and numbers 12345 and a-b"),
      (5L, "not-a-phone 55-123-4567 and 5551-123-4567 stay") // boundaries respected
    ).toDF("id", "text")
    val out = rows.select(col("id"), TextAnalysis.redactPii(col("text")).as("clean"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "reach [EMAIL] or [EMAIL] today")
    assert(out(2L) == "call [PHONE] then [PHONE] thanks")
    assert(out(3L) == "mixed [EMAIL] and [PHONE] in one line")
    assert(out(4L) == "no pii here, just words and numbers 12345 and a-b")
    assert(out(5L) == "not-a-phone 55-123-4567 and 5551-123-4567 stay")
  }

  test("simHash48: md5 parity, identical text → hamming 0, banding finds planted dup") {
    import spark.implicits._
    import graft.functions.Sketches
    // md5 parity with DuckDB pinned: md5('hello') = 5d41402abc4b... →
    // first 12 hex = 0x5d41402abc4b
    assert(Sketches.md5Hex("hello") == "5d41402abc4b2a76b9719d911017c592")
    assert(java.lang.Long.parseLong(Sketches.md5Hex("hello").take(12), 16) == 0x5d41402abc4bL)
    assert(Sketches.simHash48("") == 0L)
    assert(Sketches.simHash48("same words here") == Sketches.simHash48("SAME   words\there"))
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"), // near-dup of 1
      (3L, "completely different vocabulary everywhere tonight ocean")
    ).toDF("doc_id", "text")
    val hashes = docs.as[(Long, String)].map { case (id, t) => (id, Sketches.simHash48(t)) }
      .toDF("id", "simhash")
    val pairs = Dedup.simHashPairs(spark, hashes, maxHamming = 12, chunks = 4, chunkBits = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("dropBoilerplate: corpus-frequent paragraph removed, order kept, all-boilerplate doc survives empty") {
    import spark.implicits._
    val footer = "copyright acme corp reserved"
    val docs = (1L to 12L).map { i =>
      val body = if (i == 12) "" else s"unique${i} payload${i} words${i} here${i} tail${i} end${i} x${i} y${i}"
      (i, s"$footer $body")
    }.toDF("doc_id", "text")
    val out = Dedup.dropBoilerplate(docs, "doc_id", "text", paraWords = 4, maxDocFreq = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 12)
    // the footer paragraph (df=12 ≥ 10) is gone from every doc
    assert(out.values.forall(!_.contains("copyright")))
    // original body survives in order
    assert(out(3L) == "unique3 payload3 words3 here3 tail3 end3 x3 y3")
    // a doc that was ALL boilerplate keeps an empty row, not a dropped row
    assert(out(12L) == "")
    // rare paragraphs (df=1) are never dropped
    assert(out(7L).startsWith("unique7"))
  }

  test("components: chains, cliques, disjoint components, empty input, singletons via clusters") {
    import spark.implicits._
    // chain 1-2-3-4-5, clique {10,11,12}, separate pair (20,21), cross-link 5-10
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L),
      (5L, 10L)
    ).toDF("id1", "id2")
    val comp = Dedup.components(spark, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 1L, 11L -> 1L, 12L -> 1L, // cross-link merges the clique into the chain
      20L -> 20L, 21L -> 20L)
    assert(comp == expect)
    // empty candidate set → empty mapping, no failure
    assert(Dedup.components(spark, Seq.empty[(Long, Long)].toDF("id1", "id2")).count() == 0)
    // clusters: unpaired docs are their own singleton cluster and survive
    val docs = (1L to 6L).toDF("doc_id")
    val cl = Dedup.clusters(docs, "doc_id", Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(cl == Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true), (5L, 5L, true), (6L, 6L, true)))
  }

  test("components property: 200 seeded random multigraphs edges == union-find (dups, self-loops, stars, rings)") {
    import spark.implicits._
    val rng = new scala.util.Random(1234)
    // one biggish random multigraph: 120 edges over 60 nodes, with
    // duplicates, self-loops, and reversed repeats mixed in
    val edges = Seq.fill(120)((rng.nextInt(60).toLong, rng.nextInt(60).toLong)) ++
      Seq((7L, 7L), (3L, 9L), (9L, 3L), (3L, 9L)) // explicit degenerates
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) { parent(r) = parent.getOrElse(parent(r), parent(r)); r = parent(r) }
      r
    }
    edges.filter(e => e._1 != e._2).foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = parent.keys.map(k => k -> find(k)).toMap
    val comp = Dedup.components(spark, edges.toDF("id1", "id2")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == truth)
  }

  test("components over minhash candidate pairs equals union-find ground truth") {
    val docs = Tables.read(spark, sfDir, "documents")
    val sigs = Dedup.minHashSignatures(spark, docs, "doc_id", "text")
    val pairs = Dedup.minHashCandidates(spark, sigs, bands = 16, minEstJaccard = 0.7)
      .select(col("id1"), col("id2"))
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    // driver-side union-find over the same edges (path-halving)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) { parent(r) = parent.getOrElse(parent(r), parent(r)); r = parent(r) }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = parent.keys.map(k => k -> find(k)).toMap
    val comp = Dedup.components(spark, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(edges.nonEmpty && comp == truth)
  }

  test("gate-variant ANN: full-probe IVF gate == brute order; LSH gate finds self; reduced-score argmin == true argmin") {
    import spark.implicits._
    val emb = Tables.read(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select("embedding").as[Array[Float]].head()
    // full probe scans everything ⇒ identical to brute-force scaled-dot order
    val bruteByDot = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .collect()
      .map { case (id, v) => (id, graft.functions.Sketches.scaledDot(v, q)) }
      .sortBy { case (id, d) => (-d, id) }.take(10).map(_._1).toSeq
    val fullProbe = Ann.ivfTopKGate(spark, emb, "vec_id", "embedding", q, 10, nCells = 16, nProbe = 16)
      .collect().map(_.getLong(0)).toSeq
    assert(fullProbe == bruteByDot)
    // the query's own signature is Hamming 0 from itself ⇒ always scanned
    val lshGate = Ann.lshTopKGate(spark, emb, "vec_id", "embedding", q, 10, nPlanes = 5)
      .collect().map(_.getLong(0)).toSet
    assert(lshGate.contains(0L))
    // rankCellsInt's reduced score (Σx²−2a·x) ranks exactly like true ‖a−x‖²
    val cents = Ann.intCentroids(q.length, 16)
    val a = Ann.milliScaled(q)
    val byTrueDist = cents.indices.sortBy { c =>
      val d = cents(c).zipWithIndex.map { case (x, i) => val t = a(i) - x; t * t }.sum
      (d, c)
    }.toSeq
    assert(Ann.rankCellsInt(a, cents).toSeq == byTrueDist)
  }

  test("topKPerGroupAgg == topKPerGroup on multi-query ANN scoring") {
    import spark.implicits._
    import graft.functions.Sketches
    val emb = Tables.read(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val qB = spark.sparkContext.broadcast(queries)
    val scored = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) => qB.value.map { case (q, qv) => (q, id, Sketches.scaledDot(v, qv)) } }
      .toDF("query_id", "vec_id", "scaled_dot")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"), r.getAs[Long]("scaled_dot"),
        r.getAs[Int]("rank"))
    val win = Ann.topKPerGroup(scored, "query_id", "scaled_dot", "vec_id", 7).collect().map(key).toSet
    val agg = Ann.topKPerGroupAgg(scored, "query_id", "scaled_dot", "vec_id", 7).collect().map(key).toSet
    assert(agg == win && agg.size == 4 * 7)
  }

  test("int8 quantized ANN: quantization bounds, self found, high recall vs float brute force") {
    import spark.implicits._
    // quantization is clamp(floor(v*127)) — exact and bounded
    val q = Ann.quantizeInt8(Array(0.5f, -0.5f, 1.5f, -1.5f, 0.0f))
    assert(q.toSeq == Seq[Byte](63, -64, 127, -127, 0))
    assert(Ann.dotInt8(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6)) == 4 + 10 + 18)
    val emb = Tables.read(spark, sfDir, "embeddings")
    val qv = emb.filter(col("vec_id") === 0).select("embedding").as[Array[Float]].head()
    val brute = Ann.bruteForceTopK(spark, emb, "vec_id", "embedding", qv, 10)
      .collect().map(_.getLong(0))
    val int8 = Ann.int8TopK(spark, emb, "vec_id", "embedding", qv, 10)
      .collect().map(_.getLong(0))
    assert(int8.head == 0L) // self-similarity still tops the quantized list
    assert(brute.count(int8.toSet.contains) >= 7, s"int8=${int8.toSeq} brute=${brute.toSeq}")
  }

  test("Aggregator top-k returns exactly the window top-k rows") {
    val mentions = Mentions.scan(spark, Tables.pages(spark, sfDir), graft.model.Dict.surfaces)
    val cands = Linking.candidates(spark, mentions, graft.model.Dict.aliases)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("url"), r.getAs[String]("surface"), r.getAs[Int]("begin"),
        r.getAs[String]("qid"))
    val viaWindow = Linking.topK(cands, 2).collect().map(key).toSet
    val viaAgg = Linking.topKAgg(cands, 2).collect().map(key).toSet
    assert(viaAgg == viaWindow && viaAgg.nonEmpty)
  }

  test("nearDupPairs: planted near-dups found, no false pairs, empty input safe") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val base = (0L until 40L).map(i => (i, Array.fill(32)(rng.nextGaussian().toFloat)))
    // plant: ids 100+i are tiny perturbations of ids 0..9 (cosine ≈ 1)
    val planted = base.take(10).map { case (i, v) =>
      (100L + i, v.map(x => x * 1.0005f + 0.0001f))
    }
    val emb = (base ++ planted).toDF("vec_id", "embedding")
    val pairs = Ann.nearDupPairs(spark, emb, "vec_id", "embedding", minCosine = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (0L until 10L).map(i => (i, 100L + i)).toSet)

    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Ann.nearDupPairs(spark, empty, "vec_id", "embedding").count() == 0)
  }

  test("multimodal metadata: real PNG decode over binary column") {
    // pure roundtrip: decode(encode(w, h, g)) == (w, h, w*h*g*3) exactly (PNG lossless)
    val bytes = Multimodal.encodePng(20, 10, 37)
    assert(Multimodal.isPng(bytes))
    assert(Multimodal.decodeImage(bytes) == ((20, 10, 20L * 10 * 37 * 3)))
    // undecodable payload degrades to the (0, 0, -1) sentinel, not an NPE
    assert(Multimodal.decodeImage("not a png".getBytes) == ((0, 0, -1L)))
    assert(Multimodal.decodeImage(Array.emptyByteArray) == ((0, 0, -1L)))

    val media = Tables.media(spark, sfDir).limit(10)
    val meta = Multimodal.imageMeta(spark, media).collect()
    assert(meta.length == 10)
    meta.foreach { m =>
      assert(m.is_png && m.n_bytes > 8)
      assert(m.width == 16 + (m.media_id % 48).toInt)
      assert(m.height == 16 + (m.media_id % 24).toInt)
      assert(m.px_sum == m.width.toLong * m.height * (m.media_id % 256) * 3)
    }
    val frames = Multimodal.sampleFrames(spark, Tables.pages(spark, sfDir).limit(10)).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getAs[Int]("frame_idx") % 4 == 0))
  }

  test("multiQueryTopK (score-inside-combine) == flatMap + window form, row for row") {
    import spark.implicits._
    import graft.functions.Sketches
    val emb = Tables.read(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val qB = spark.sparkContext.broadcast(queries)
    val scored = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) => qB.value.map { case (q, qv) => (q, id, Sketches.scaledDot(v, qv)) } }
      .toDF("query_id", "vec_id", "scaled_dot")
    val win = Ann.topKPerGroup(scored, "query_id", "scaled_dot", "vec_id", 7)
      .select(col("query_id"), col("vec_id"), col("scaled_dot"), col("rank").cast("long"))
      .collect().map(_.toSeq).toSet
    val fused = Ann.multiQueryTopK(spark, emb, "vec_id", "embedding", queries, 7)
      .collect().map(_.toSeq).toSet
    assert(fused == win && fused.size == 4 * 7)
  }

  test("stored int8 layout: same rows as read-time quantization; on-disk bytes ≥3× smaller than float") {
    import spark.implicits._
    val emb = Tables.read(spark, sfDir, "embeddings")
    val qv = emb.filter(col("vec_id") === 0).select("embedding").as[Array[Float]].head()
    val tmp = java.nio.file.Files.createTempDirectory("graft_int8_spec").toString
    Ann.int8WriteLayout(spark, emb, "vec_id", "embedding", s"$tmp/int8")
    // float comparison table with the SAME columns-minus-quantization, so the
    // size ratio isolates the quantized column (the source table carries an
    // extra label column that would inflate the ratio in our favor)
    emb.select(col("vec_id").cast("long"), col("embedding"))
      .write.mode("overwrite").parquet(s"$tmp/float")
    def bytes(p: String): Long = {
      val d = new java.io.File(p)
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    val ratio = bytes(s"$tmp/float").toDouble / bytes(s"$tmp/int8")
    assert(ratio >= 3.0, s"int8 layout only ${ratio}x smaller than float32")
    val stored = Ann.int8TopKStored(spark, s"$tmp/int8", "vec_id", qv, 10)
      .collect().map(_.toSeq).toSeq
    val onTheFly = Ann.int8TopK(spark, emb, "vec_id", "embedding", qv, 10)
      .collect().map(_.toSeq).toSeq
    assert(stored == onTheFly && stored.nonEmpty)
  }

  test("IVF cell-partitioned layout: partitioned probe == unpartitioned gate, row for row") {
    import spark.implicits._
    val emb = Tables.read(spark, sfDir, "embeddings")
    val qv = emb.filter(col("vec_id") === 0).select("embedding").as[Array[Float]].head()
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_spec").toString
    Ann.ivfWriteLayoutGate(spark, emb, "vec_id", "embedding", s"$tmp/cells", nCells = 16)
    val part = Ann.ivfTopKPartitioned(spark, s"$tmp/cells", "vec_id", "embedding", qv, 20, 16, 4)
      .collect().map(_.toSeq).toSeq
    val gate = Ann.ivfTopKGate(spark, emb, "vec_id", "embedding", qv, 20, 16, 4)
      .collect().map(_.toSeq).toSeq
    assert(part == gate && part.nonEmpty)
  }

  test("LSH bucket-partitioned layout: partitioned probe == unpartitioned gate, row for row") {
    import spark.implicits._
    val emb = Tables.read(spark, sfDir, "embeddings")
    val qv = emb.filter(col("vec_id") === 0).select("embedding").as[Array[Float]].head()
    val tmp = java.nio.file.Files.createTempDirectory("graft_lsh_spec").toString
    Ann.lshWriteLayoutGate(spark, emb, "vec_id", "embedding", s"$tmp/buckets", nPlanes = 5)
    val part = Ann.lshTopKPartitioned(spark, s"$tmp/buckets", "vec_id", "embedding", qv, 20, 5)
      .collect().map(_.toSeq).toSeq
    val gate = Ann.lshTopKGate(spark, emb, "vec_id", "embedding", qv, 20, 5)
      .collect().map(_.toSeq).toSeq
    assert(part == gate && part.nonEmpty)
  }

  test("embedding near-dup incremental: union(old pairs, new-batch increment) == full corpus pairs") {
    val (emb, planted) = graft.Queries.plantedEmb(spark, sfDir)
    // planted ids are original+1e6 (even offset), so parity splits the
    // planted batch while keeping each planted copy near its original
    val newBatch = planted.filter(col("vec_id") % 2 === 0)
    val oldCorpus = emb.unionByName(planted.filter(col("vec_id") % 2 =!= 0))
    val all = emb.unionByName(planted)
    val oldPairs = pairSet(Ann.nearDupPairs(spark, oldCorpus, "vec_id", "embedding"))
    val incr = pairSet(Ann.nearDupPairsIncremental(spark, all, newBatch, "vec_id", "embedding"))
    val full = pairSet(Ann.nearDupPairs(spark, all, "vec_id", "embedding"))
    assert(oldPairs.nonEmpty && incr.nonEmpty, s"old=${oldPairs.size} incr=${incr.size}")
    assert((oldPairs ++ incr) == full, s"union=${(oldPairs ++ incr).size} full=${full.size}")
  }

  test("compactLayout: fewer files, identical rows, pruning/meta/audit all preserved") {
    import spark.implicits._
    import org.apache.spark.sql.functions.input_file_name
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toFile.toString
    val bandPath = s"$tmp/bands"
    val docs = Tables.read(spark, sfDir, "documents")
    val sigs = Dedup.minHashSignatures(spark, docs, "doc_id", "text")
    // a base build + three daily appends: every bucket dir accumulates
    // per-batch small files — the state compaction exists to fix
    Dedup.writeBandLayout(spark, sigs.filter(col("id") % 4 === 0), bandPath)
    (1 to 3).foreach(i =>
      Dedup.appendBandLayout(spark, sigs.filter(col("id") % 4 === i), bandPath))
    def rows = spark.read.parquet(bandPath)
      .select("id", "band", "bkey", "bucket").collect().map(_.toSeq).toSet
    def files = spark.read.parquet(bandPath)
      .select(input_file_name()).distinct().count()
    val rowsBefore = rows
    val filesBefore = files
    assert(Tables.auditLayoutLineage(spark, bandPath, sigs, "id"))

    Tables.compactLayout(spark, bandPath, "bucket")

    assert(rows == rowsBefore, "compaction changed the data")
    assert(files < filesBefore, s"no file reduction: ${files} !< $filesBefore")
    // the single compact lineage row still vouches for the full source
    assert(Tables.auditLayoutLineage(spark, bandPath, sigs, "id"))
    // _meta survived AND the pruned path still equals the unpruned one
    val newSigs = sigs.filter(col("id") % 4 === 3)
    val pruned = pairSet(Dedup.minHashCandidatesStoredPruned(
      spark, bandPath, sigs, newSigs, minEstJaccard = 0.7))
    val unpruned = pairSet(Dedup.minHashCandidatesIncremental(
      spark, sigs, newSigs, minEstJaccard = 0.7))
    assert(pruned == unpruned, s"pruned=$pruned unpruned=$unpruned")

    // crash recovery: simulate dying between the two swap renames (path
    // absent, old layout stranded at .pre_compact) — the next invocation
    // must RESTORE and converge, not delete the sole surviving copy
    java.nio.file.Files.move(
      java.nio.file.Paths.get(bandPath), java.nio.file.Paths.get(bandPath + ".pre_compact"))
    Tables.compactLayout(spark, bandPath, "bucket")
    assert(rows == rowsBefore, "crash-recovery compaction lost or changed data")
    assert(Tables.auditLayoutLineage(spark, bandPath, sigs, "id"))
    // a wrong partition column must error, never rewrite
    val e = intercept[IllegalArgumentException] {
      Tables.compactLayout(spark, bandPath, "band")
    }
    assert(e.getMessage.contains("partitioned by"), e.getMessage)
  }

  test("simhash incremental: union(old pairs, new-batch increment) == full corpus pairs") {
    import spark.implicits._
    val hashes = Tables.read(spark, sfDir, "documents")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, graft.functions.Sketches.simHash48(text)) }
      .toDF("id", "simhash")
    val newH = hashes.filter(col("id") % 2 =!= 0)
    val oldH = hashes.filter(col("id") % 2 === 0)
    val oldPairs = pairSet(Dedup.simHashPairs(spark, oldH, 3, 4, 12))
    val incr = pairSet(Dedup.simHashPairsIncremental(spark, hashes, newH, 3, 4, 12))
    val full = pairSet(Dedup.simHashPairs(spark, hashes, 3, 4, 12))
    assert(incr.nonEmpty && full.nonEmpty, s"incr=${incr.size} full=${full.size}")
    assert((oldPairs ++ incr) == full, s"union=${(oldPairs ++ incr).size} full=${full.size}")
  }

  test("layout parameter guard: probing or appending with mismatched constants fails loudly, never silently mis-probes") {
    import spark.implicits._
    val emb = Tables.read(spark, sfDir, "embeddings")
    val qv = emb.filter(col("vec_id") === 0).select("embedding").as[Array[Float]].head()
    val tmp = java.nio.file.Files.createTempDirectory("graft_meta_guard").toString
    Ann.ivfWriteLayoutGate(spark, emb, "vec_id", "embedding", s"$tmp/cells", nCells = 16)
    // a 32-cell probe of a 16-cell layout would rank cells against the
    // wrong centroid family and silently return wrong neighbors — the meta
    // guard turns that into an error naming the parameter
    val e1 = intercept[IllegalArgumentException] {
      Ann.ivfTopKPartitioned(spark, s"$tmp/cells", "vec_id", "embedding", qv, 20,
        nCells = 32, nProbe = 4)
    }
    assert(e1.getMessage.contains("n_cells"), e1.getMessage)
    Ann.pqWriteLayout(spark, emb, "vec_id", "embedding", s"$tmp/codes", m = 8, kw = 16)
    val e2 = intercept[IllegalArgumentException] {
      Ann.pqTopKStored(spark, s"$tmp/codes", "vec_id", qv, 20, m = 8, kw = 8)
    }
    assert(e2.getMessage.contains("kw"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      Ann.lshAppendLayout(spark, emb.limit(1), "vec_id", "embedding", s"$tmp/cells", nPlanes = 5)
    }
    // appending LSH rows into an IVF layout: the meta has no n_planes
    // field at all — the by-name read itself refuses
    assert(e3.getMessage.contains("n_planes"), e3.getMessage)

    // rebuild-in-place flips the layout's contract: writeLayoutMeta must
    // DROP the memoized validation of the old parameters, so a probe that
    // matched before the rebuild fails after it (instead of the memo
    // silently disabling the guard for exactly the rebuild case)
    Ann.ivfWriteLayoutGate(spark, emb, "vec_id", "embedding", s"$tmp/rebuilt", nCells = 16)
    Ann.ivfTopKPartitioned(spark, s"$tmp/rebuilt", "vec_id", "embedding", qv, 20,
      nCells = 16, nProbe = 4).collect() // validates + memoizes n_cells=16
    Ann.ivfWriteLayoutGate(spark, emb, "vec_id", "embedding", s"$tmp/rebuilt", nCells = 8)
    val e4 = intercept[IllegalArgumentException] {
      Ann.ivfTopKPartitioned(spark, s"$tmp/rebuilt", "vec_id", "embedding", qv, 20,
        nCells = 16, nProbe = 4)
    }
    assert(e4.getMessage.contains("n_cells"), e4.getMessage)
    // ...and the rebuilt contract itself validates
    assert(Ann.ivfTopKPartitioned(spark, s"$tmp/rebuilt", "vec_id", "embedding", qv, 20,
      nCells = 8, nProbe = 4).collect().nonEmpty)
  }

  test("batched IVF over the partitioned layout == M independent ivfTopKGate calls") {
    import spark.implicits._
    val emb = Tables.read(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val tmp = java.nio.file.Files.createTempDirectory("graft_mivf_spec").toString
    Ann.ivfWriteLayoutGate(spark, emb, "vec_id", "embedding", s"$tmp/cells", nCells = 16)
    val batched = Ann.multiQueryIvfPartitioned(
        spark, s"$tmp/cells", "vec_id", "embedding", queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val independent = queries.flatMap { case (qid, qv) =>
      Ann.ivfTopKGate(spark, emb, "vec_id", "embedding", qv, 10, 16, 4)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, r.getLong(0), r.getLong(1), (i + 1).toLong) }
    }.toSet
    assert(batched == independent && batched.nonEmpty)
  }

  test("PQ ANN: stored-code ADC == driver-side recompute; self found; recall vs brute non-trivial") {
    import spark.implicits._
    val emb = Tables.read(spark, sfDir, "embeddings")
    val qv = emb.filter(col("vec_id") === 0).select("embedding").as[Array[Float]].head()
    val tmp = java.nio.file.Files.createTempDirectory("graft_pq_spec").toString
    Ann.pqWriteLayout(spark, emb, "vec_id", "embedding", s"$tmp/codes", m = 8, kw = 16)
    val stored = Ann.pqTopKStored(spark, s"$tmp/codes", "vec_id", qv, 20, 8, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // exactness of the machinery: recompute assignment + ADC on the driver
    // from the float source and reproduce every (id, score) pair
    val books = Ann.pqCodebooks(qv.length, 8, 16)
    val qtab = Ann.pqQueryTable(qv, books)
    val all = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val local = all.map { case (id, v) =>
      val codes = Ann.pqAssign(Ann.milliScaled(v), books)
      (id, codes.zipWithIndex.map { case (c, s) => qtab(s)(c & 0xff) }.sum)
    }.sortBy { case (id, sc) => (-sc, id) }.take(20).toSeq
    assert(stored.toSeq == local)
    // retrieval quality: approximate, but must beat chance by a wide margin
    val brute = Ann.bruteForceTopK(spark, emb, "vec_id", "embedding", qv, 20)
      .collect().map(_.getLong(0)).toSet
    val recall = stored.count(h => brute.contains(h._1))
    assert(recall >= 5, s"PQ recall@20 vs brute = $recall/20")
  }

  test("decontaminate: 8-gram overlap flags exactly the planted train doc; short docs never match") {
    import spark.implicits._
    val evalText = "alpha beta gamma delta epsilon zeta eta theta iota"
    val docs = Seq(
      (0L, evalText),                                        // eval
      (1L, "prefix words " + evalText),                      // train, contains an eval 8-gram
      (2L, "alpha beta gamma delta epsilon zeta eta"),       // train, longest shared run = 7 words
      (3L, "completely different content with many words present here"),
      (4L, "alpha beta")                                     // shorter than one gram
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminate(docs, "doc_id", "text", col("doc_id") === 0, n = 8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
  }

  test("repetitionStats: exact counts on repeated / distinct / short texts") {
    import graft.functions.TextAnalysis.repetitionStats
    assert(repetitionStats("a a a a") == ((3L, 3L)))       // all 2-grams are "a a"
    assert(repetitionStats("w1 w2 w3 w4") == ((1L, 3L)))   // all distinct
    assert(repetitionStats("spam ham spam ham spam") == ((2L, 4L))) // "spam ham" twice
    assert(repetitionStats("solo") == ((0L, 0L)))
    assert(repetitionStats("") == ((0L, 0L)))
  }

  test("stratified sampling is deterministic, rate-respecting, and full-rate strata keep everything") {
    import spark.implicits._
    val docs = Tables.read(spark, sfDir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("source"))
    // rate 1000 keeps every row; rate 0 keeps none
    assert(Curation.stratifiedSample(docs, "doc_id", lit(1000L)).count() == docs.count())
    assert(Curation.stratifiedSample(docs, "doc_id", lit(0L)).count() == 0)
    // deterministic: two runs select the identical row set
    val a = Curation.stratifiedSample(docs, "doc_id", lit(500L)).collect().map(_.getLong(0)).toSet
    val b = Curation.stratifiedSample(docs, "doc_id", lit(500L)).collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty && a.size < docs.count())
    // the kept fraction tracks the rate (hash buckets ~uniform)
    assert(math.abs(a.size.toDouble / docs.count() - 0.5) < 0.1, s"${a.size}")
  }

  test("upsample replicates each row exactly weight times with epochs 0..w-1") {
    import spark.implicits._
    val docs = Seq((1L, "src0"), (2L, "src1"), (3L, "src2")).toDF("doc_id", "source")
    val w = lit(1L) + pmod(expr("cast(substr(source, 4) as bigint)"), lit(3L))
    val out = Curation.upsample(docs, w).collect()
      .map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(out == Seq((1L, 0L), (2L, 0L), (2L, 1L), (3L, 0L), (3L, 1L), (3L, 2L)))
    // weight 0 DROPS the row (sequence(0,-1) would otherwise step backwards),
    // and a NULL weight (recipe-join miss) behaves like 0
    val srcNum = expr("cast(substr(source, 4) as bigint)")
    val zeroed = Curation.upsample(docs, pmod(srcNum, lit(3L)))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(zeroed == Seq((2L, 0L), (3L, 0L), (3L, 1L))) // src0 weight 0 vanishes
    val nulled = Curation.upsample(docs, when(srcNum === 1, lit(2L)))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(nulled == Seq((2L, 0L), (2L, 1L))) // NULL-weight sources vanish
  }

  test("thumbnail: dims math, PNG roundtrip on uniform images, undecodable degrades to empty") {
    assert(Multimodal.thumbDims(64, 32, 16) == ((16, 8)))
    assert(Multimodal.thumbDims(10, 8, 16) == ((10, 8)))    // within bound: untouched
    assert(Multimodal.thumbDims(1000, 1, 16) == ((16, 1)))  // clamp keeps ≥ 1
    val t = Multimodal.thumbnail(Multimodal.encodePng(40, 20, 7), 10)
    assert(Multimodal.isPng(t))
    assert(Multimodal.decodeImage(t) == ((10, 5, 10L * 5 * 7 * 3))) // uniform survives resize
    assert(Multimodal.thumbnail("not a png".getBytes, 10).isEmpty)
  }

  test("WAV codec: hand-written RIFF bytes roundtrip; malformed input degrades to sentinel") {
    val w = Multimodal.encodeWav(16000, 2, 1234)
    assert(Multimodal.isWav(w))
    assert(w.length == 44 + 1234 * 2 * 2)
    assert(Multimodal.decodeWav(w) == ((16000, 2, 1234L)))
    // untrusted-binary stance: truncated, wrong-magic, non-PCM all sentinel
    assert(Multimodal.decodeWav(w.take(30)) == ((0, 0, -1L)))
    assert(Multimodal.decodeWav("RIFFxxxxJUNK".getBytes) == ((0, 0, -1L)))
    val nonPcm = w.clone(); nonPcm(20) = 3 // format tag != 1
    assert(Multimodal.decodeWav(nonPcm) == ((0, 0, -1L)))
    // real-world shape: a LIST chunk BETWEEN fmt and data still parses
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "INFOxx".getBytes("US-ASCII")
    val withList = w.take(36) ++ listChunk ++ w.drop(36)
    assert(Multimodal.decodeWav(withList) == ((16000, 2, 1234L)))
    // a lying declared data size is clamped to the bytes actually present
    val lying = w.clone()
    lying(40) = -1; lying(41) = -1; lying(42) = -1; lying(43) = 0x7f // ~2 GB claimed
    assert(Multimodal.decodeWav(lying) == ((16000, 2, 1234L)))
    // a crafted fmt length cannot index out of bounds (sentinel, no throw)
    val crafted = w.take(44).clone()
    crafted(16) = -1; crafted(17) = -1; crafted(18) = -1; crafted(19) = 0x7f
    assert(Multimodal.decodeWav(crafted) == ((0, 0, -1L)))
    // recognized-but-corrupt image payloads degrade, never throw: 25 bytes
    // = valid PNG magic + truncated IHDR, which ImageIO THROWS on (it does
    // not return null for a recognized format)
    val png = Multimodal.encodePng(20, 10, 5)
    assert(Multimodal.decodeImage(png.take(25)) == ((0, 0, -1L)))
    assert(Multimodal.thumbnail(png.take(25), 8).isEmpty)
  }

  test("entity rank: damped floor respected, link structure separates ranks, deterministic") {
    val r = graft.Queries.q70EntityRank(spark, sfDir).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.nonEmpty)
    assert(r.values.forall(_ >= 150000L)) // the damping floor
    assert(r.values.max > 150000L)        // linked-to entities rise above it
    val r2 = graft.Queries.q70EntityRank(spark, sfDir).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == r2) // exact-integer iteration is bit-reproducible
  }

  test("decontaminate: empty eval set flags nothing and does not crash") {
    import spark.implicits._
    val flags = Dedup.decontaminate(
      Seq((1L, "some words here")).toDF("doc_id", "text"), "doc_id", "text", lit(false))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags == Map(1L -> false))
  }

  test("componentsWithStatus: degrades past maxIters (labels + false flag), converges exactly otherwise") {
    import spark.implicits._
    // a length-32 chain needs several star rounds; maxIters=1 cannot finish
    val chain = (1L until 32L).map(d => (d - 1, d)).toDF("id1", "id2")
    val (labels, converged) = Dedup.componentsWithStatus(spark, chain, maxIters = 1)
    assert(!converged)
    val degraded = labels.collect()
    assert(degraded.nonEmpty) // degraded labels returned, job not killed
    // the one-row-per-id contract must survive degradation (a multi-parent
    // mid-state would otherwise duplicate every downstream join)
    assert(degraded.map(_.getLong(0)).distinct.length == degraded.length)
    val (labels2, converged2) = Dedup.componentsWithStatus(spark, chain, maxIters = 20)
    assert(converged2)
    val m = labels2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 32L).forall(m(_) == 0L))
  }

  test("clusters: throws on non-convergence by default; degrades only when opted in") {
    import spark.implicits._
    val chain = (1L until 32L).map(d => (d - 1, d)).toDF("id1", "id2")
    val docs = (0L until 32L).toDF("doc_id")
    intercept[IllegalStateException] {
      Dedup.clusters(docs, "doc_id", chain, maxIters = 1)
    }
    val degraded = Dedup.clusters(docs, "doc_id", chain, maxIters = 1, requireConverged = false)
    assert(degraded.count() == 32)
  }

  test("signature layout append: incremental candidates find cross-batch pairs; old ∪ incremental == full") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_sig_layout").toFile.toString + "/sigs"
    val docs = Tables.read(spark, sfDir, "documents")
    val batchA = docs.filter(col("doc_id") % 2 === 0)
    val batchB = docs.filter(col("doc_id") % 2 =!= 0)
    // day 1: build from batch A, run candidates (what that run would emit)
    Dedup.writeSignatureLayout(spark, batchA, "doc_id", "text", path)
    val before = pairSet(Dedup.minHashCandidates(spark, spark.read.parquet(path), 16, 0.7))
    // day 2: append batch B's signatures (sketch the NEW docs only), then
    // incremental candidates = new batch banded against the full table
    Dedup.appendSignatureLayout(spark, batchB, "doc_id", "text", path)
    val all = spark.read.parquet(path)
    val newSigs = Dedup.minHashSignatures(spark, batchB, "doc_id", "text")
    val inc = pairSet(Dedup.minHashCandidatesIncremental(spark, all, newSigs, 16, 0.7))
    // the two runs together equal one full-corpus run over the merged table
    val full = pairSet(Dedup.minHashCandidates(spark, all, 16, 0.7))
    assert((before ++ inc) == full, s"union ${(before ++ inc).size} vs full ${full.size}")
    // incremental emits ONLY pairs touching the new batch — and does find
    // pairs SPANNING the batches (the fixture plants cross-parity near-dups)
    assert(inc.forall { case (a, b) => a % 2 != 0 || b % 2 != 0 })
    assert(inc.exists { case (a, b) => a % 2 != b % 2 }, "no cross-batch pair found")
    // lineage recorded both mutations and accounts for every doc
    val lin = Tables.readLayoutLineage(spark, path).collect()
    assert(lin.map(_.getAs[String]("op")).sorted.toSeq == Seq("append", "build"))
    assert(lin.map(_.getAs[Long]("rows")).sum == docs.count())
  }

  test("lineage audit: xor fingerprints compose across disjoint batches; a dropped batch is detected") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_lin_audit").toFile.toString + "/sigs"
    val docs = Tables.read(spark, sfDir, "documents")
    Dedup.writeSignatureLayout(spark, docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", path)
    // audit should FAIL while a batch is missing...
    assert(!Tables.auditLayoutLineage(spark, path, docs, "doc_id"))
    Dedup.appendSignatureLayout(spark, docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", path)
    // ...and PASS once the recorded batches cover the source exactly —
    // verified from the lineage log alone, no layout data files read
    assert(Tables.auditLayoutLineage(spark, path, docs, "doc_id"))
    // a source the layout does NOT match is rejected
    assert(!Tables.auditLayoutLineage(spark, path, docs.filter(col("doc_id") > 10), "doc_id"))
  }

  test("safeDecode fuzz: random and truncated binary payloads never throw, always sentinel or valid") {
    val rnd = new scala.util.Random(42)
    val png = Multimodal.encodePng(24, 16, 120)
    val cases =
      (0 until 150).map(_ => Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)) ++
        (1 until 20).map(i => png.take(png.length * i / 20)) ++ // truncated PNGs
        Seq(Array.emptyByteArray, png)
    cases.foreach { bytes =>
      val (w, h, s) = Multimodal.decodeImage(bytes)
      assert((w == 0 && h == 0 && s == -1L) || (w > 0 && h > 0 && s >= 0),
        s"unexpected decode result ($w,$h,$s) for ${bytes.length} bytes")
      val t = Multimodal.thumbnail(bytes, 8)
      assert(t != null) // empty array or a valid re-encoded thumbnail, never a throw
    }
  }

  test("componentsIncremental: label update over new pairs equals components of the cumulative graph") {
    import spark.implicits._
    val docs = Tables.read(spark, sfDir, "documents")
    val sigsA = Dedup.minHashSignatures(spark, docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
    val sigsB = Dedup.minHashSignatures(spark, docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text")
    val all = sigsA.unionByName(sigsB)
    val oldPairs = Dedup.minHashCandidates(spark, sigsA, 16, 0.7).select("id1", "id2")
    val newPairs = Dedup.minHashCandidatesIncremental(spark, all, sigsB, 16, 0.7).select("id1", "id2")
    def labels(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oldLabels = Dedup.components(spark, oldPairs)
    val updated = labels(Dedup.componentsIncremental(spark, oldLabels, newPairs))
    val full = labels(Dedup.components(spark,
      Dedup.minHashCandidates(spark, all, 16, 0.7).select("id1", "id2")))
    assert(updated == full && full.nonEmpty, s"updated=${updated.size} full=${full.size}")
    // the update genuinely merged across batches: some component spans parities
    assert(full.exists { case (id, c) => id % 2 != c % 2 })
  }

  test("banded-key layout: pruned incremental candidates equal the unpruned path; small append prunes files") {
    import spark.implicits._
    import org.apache.spark.sql.functions.input_file_name
    val tmp = java.nio.file.Files.createTempDirectory("graft_band_layout").toFile.toString
    val bandPath = s"$tmp/bands"
    val docs = Tables.read(spark, sfDir, "documents")
    // "corpus" = everything but three docs; "append" = those three (33 and
    // 436 are a planted cross-batch near-dup pair, so the tiny append must
    // still find its pair against the stored corpus)
    val newIds = Seq(33L, 436L, 7L)
    val batchA = docs.filter(!col("doc_id").isin(newIds.map(Long.box): _*))
    val batchB = docs.filter(col("doc_id").isin(newIds.map(Long.box): _*))
    val sigsA = Dedup.minHashSignatures(spark, batchA, "doc_id", "text")
    val sigsB = Dedup.minHashSignatures(spark, batchB, "doc_id", "text")
    Dedup.writeBandLayout(spark, sigsA, bandPath)
    Dedup.appendBandLayout(spark, sigsB, bandPath)
    val allSigs = sigsA.unionByName(sigsB)
    val pruned = pairSet(Dedup.minHashCandidatesStoredPruned(
      spark, bandPath, allSigs, sigsB, minEstJaccard = 0.7))
    val unpruned = pairSet(Dedup.minHashCandidatesIncremental(
      spark, allSigs, sigsB, minEstJaccard = 0.7))
    assert(pruned == unpruned, s"pruned=$pruned unpruned=$unpruned")
    assert(pruned.exists { case (a, b) => a == 33L && b == 436L },
      "the planted cross-batch pair was not found")
    // the 3-doc append touches ≤ 48 of 256 buckets — the stored scan must
    // read a strict subset of the layout's files (computed with the SAME
    // bucket function the operator uses)
    val layout = spark.read.parquet(bandPath)
    val newKeys = sigsB.as[(Long, Array[Long])].collect()
      .flatMap { case (_, sig) => graft.functions.Sketches.bandKeys(sig, 16).map(_._2) }
      .distinct.toSeq
    val bucketSet = newKeys.toDF("bkey")
      .select(Tables.format.bucket(col("bkey"), 256).as("bucket"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val filesAll = layout.select(input_file_name()).distinct().count()
    val filesPruned = layout.filter(col("bucket").isin(bucketSet.map(Long.box): _*))
      .select(input_file_name()).distinct().count()
    assert(filesPruned > 0 && filesPruned < filesAll,
      s"no stored-side pruning: pruned=$filesPruned all=$filesAll (buckets ${bucketSet.size})")
  }

  test("decontaminateBloom == decontaminate on a corpus where Bloom false positives occur") {
    import spark.implicits._
    // eval docs share the 'canary' gram family; train docs are distinct
    // word-soup. A deliberately tiny, saturated filter (expected 5 items at
    // fpp 0.5, ~100 inserted) makes mightContain fire on many non-member
    // grams — which the exact re-check join must turn back into clean docs.
    val n = 4
    def evalText(i: Int) = s"eval canary phrase number $i shared benchmark gram family tail$i"
    def cleanText(i: Int) = (0 until 12).map(j => s"w${i}x$j").mkString(" ")
    def dirtyText(i: Int) = s"prefix$i eval canary phrase number ${i % 3} suffix$i pad pad pad"
    val docs = ((0 until 10).map(i => (i.toLong, evalText(i), true)) ++
      (100 until 160).map(i => (i.toLong, cleanText(i), false)) ++
      (200 until 210).map(i => (i.toLong, dirtyText(i), false)))
      .toDF("doc_id", "text", "ev")
    val exact = Dedup.decontaminate(docs, "doc_id", "text", col("ev"), n)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val bloom = Dedup.decontaminateBloom(docs, "doc_id", "text", col("ev"), n,
        expectedGrams = 5L, fpp = 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(bloom == exact)
    assert(exact.count(_._2) == 10 && exact.size == 70)
    // prove the test corpus actually exercises the FP path: rebuild the same
    // filter (deterministic hashing) and count train grams that pass the
    // screen but are NOT eval grams
    val evalGramsDf = docs.filter(col("ev")).select(col("text")).as[String]
      .flatMap(Dedup.wordGrams(_, n)).toDF("gram").distinct()
    val bf = evalGramsDf.stat.bloomFilter("gram", 5L, 0.5)
    val evalSet = evalGramsDf.as[String].collect().toSet
    val fps = docs.filter(!col("ev")).select(col("text")).as[String].collect()
      .flatMap(Dedup.wordGrams(_, n))
      .filter(g => bf.mightContainString(g) && !evalSet.contains(g))
    assert(fps.nonEmpty, "fixture produced no Bloom false positives - weaken the filter")
  }

  test("quality classifier: separates planted good/bad docs; recall vs heuristic qualityColumns") {
    import spark.implicits._
    import graft.functions.TextAnalysis
    // planted fixtures: clean stopword-rich English vs digit/punct spam
    val good = (0 until 10).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog and it is a fine day " +
        s"for all of them to run in the warm sun near variant$i"))
    val bad = (10 until 20).map(i =>
      (i.toLong, s"4711 99 $i 0x3f 12345 86 %%% !!! ??? *** 17-4 9.99 $$$i ((("))
    val planted = (good ++ bad).toDF("doc_id", "text")
    val scored = planted.select(col("doc_id") +:
      TextAnalysis.qualityClassifierColumns(col("text")): _*).collect()
    scored.foreach { r =>
      val expectKeep = r.getLong(0) < 10
      assert(r.getBoolean(3) == expectKeep,
        s"doc ${r.getLong(0)} score=${r.getLong(2)} keep=${r.getBoolean(3)}")
    }
    // recall vs the heuristic quality filter on the real fixture corpus:
    // of docs the ratio heuristic keeps, the classifier must keep >= 90%
    val docs = Tables.read(spark, sfDir, "documents")
    val both = docs.select(
      (col("doc_id").cast("long").as("doc_id") +:
        (TextAnalysis.qualityColumns(col("text")) ++
          Seq(TextAnalysis.qualityClassifierColumns(col("text")).last.as("clf_keep")))): _*)
      .withColumn("heur_keep",
        col("punct_per_mille") <= 100L && col("n_tokens") >= 5L &&
          col("mean_token_len_milli").between(2000L, 12000L))
      .select(col("heur_keep"), col("clf_keep"))
      .collect()
    val heurKept = both.count(_.getBoolean(0))
    val agree = both.count(r => r.getBoolean(0) && r.getBoolean(1))
    assert(heurKept > 100, s"heuristic kept only $heurKept - fixture assumption broken")
    assert(agree.toDouble / heurKept >= 0.9,
      s"classifier recall ${agree.toDouble / heurKept} vs heuristic keep set $heurKept")
  }
}
