package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docsDf = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the deep dark forest tonight"
    Seq(
      (1L, base),
      (2L, base),                                              // exact dup of 1
      (3L, base.replace("quick", "swift")),                    // near dup of 1
      (4L, "completely different content about spark query engines and distributed aggregation pipelines at scale"),
      (5L, "the quick brown fox jumps over the lazy dog and runs far away into the deep dark forest today"), // near dup
      (6L, "")                                                 // empty text edge
    ).toDF("doc_id", "text")
  }

  test("exact dedup: stats and kept rows") {
    val stats = Dedup.exactDupStats(docsDf, "text", "doc_id").collect()(0)
    assert(stats.getAs[Long]("n_docs") == 6)
    assert(stats.getAs[Long]("n_distinct_texts") == 5)
    assert(stats.getAs[Long]("n_dup_docs") == 1)
    val kept = Dedup.exactDedup(docsDf, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L, 6L)) // 2 dropped (dup of 1)
  }

  test("dedup/text operators tolerate null text (dirty-corpus hardening)") {
    import spark.implicits._
    // real crawls carry null/empty documents; operators must neither crash
    // nor pair null docs with everything
    val dirty = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, null.asInstanceOf[String]),
      (4L, ""),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    // exact dedup: nulls group together (digest of null is null), both kept
    // behaviors acceptable — assert no crash and the real dup IS collapsed
    val kept = Dedup.exactDedup(dirty, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && !kept.contains(2L))
    // minhash: null signatures drop out of banding; only the planted pair
    val pairs = Dedup.minhashNearDupPairs(dirty, "text", "doc_id", threshold = 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
    // simhash: same containment
    val sp = Dedup.simhashNearDupPairs(dirty, "text", "doc_id", maxHamming = 3)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sp.toSeq == Seq((1L, 2L)))
    // text stats: null rows yield null stats, not exceptions
    val ts = dirty.select(col("doc_id"),
      TextAnalysis.piiCount(col("text")).as("pii"),
      graft.operators.TextAnalysis.textStats(col("text")).as("st"))
    assert(ts.collect().length == 5)
  }

  test("minhash LSH finds planted near-dups and skips unrelated docs") {
    val pairs = Dedup.minhashNearDupPairs(docsDf, "text", "doc_id",
        numHashes = 64, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // exact dup: jaccard 1.0
    assert(pairs.contains((1L, 3L)) || pairs.contains((1L, 5L))) // near dups found
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // unrelated never pairs
    // exact-dup pair must carry jaccard 1.0
    val j12 = Dedup.minhashNearDupPairs(docsDf, "text", "doc_id", threshold = 0.5)
      .filter(col("id1") === 1 && col("id2") === 2).collect()(0).getDouble(2)
    assert(j12 == 1.0)
  }

  test("cross-corpus dedup: new batch loses planted dups, keeps fresh docs") {
    import spark.implicits._
    val corpus = docsDf.filter(col("doc_id") <= 4)
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog and runs far away into the deep dark forest tonight"), // dup of corpus 1
      (11L, "entirely novel text about sparse register arrays and wire formats for cardinality sketches today"),
      (12L, "completely different content about spark query engines and distributed aggregation pipelines at scale") // dup of corpus 4
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashCrossDupPairs(corpus, batch, "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 10L)) || pairs.contains((2L, 10L)))
    assert(pairs.contains((4L, 12L)))
    assert(!pairs.exists(_._2 == 11L))
    // within-corpus dups (1 vs 2) must NOT pair — cross-corpus only
    assert(pairs.forall { case (a, b) => a <= 4 && b >= 10 })
    val kept = Dedup.dedupAgainst(corpus, batch, "text", "doc_id", threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(11L), s"got $kept")
  }

  test("simhash: identical texts at hamming 0, near-dups within 8 bits") {
    val pairs = Dedup.simhashNearDupPairs(docsDf, "text", "doc_id", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val p12 = pairs.find(p => p._1 == 1 && p._2 == 2)
    assert(p12.exists(_._3 == 0))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ngram jaccard column function") {
    import spark.implicits._
    val df = Seq(("a b c d e", "a b c d e"), ("a b c d e", "x y z w v")).toDF("t1", "t2")
    val j = df.select(Dedup.ngramJaccard(col("t1"), col("t2")).as("j"))
      .collect().map(_.getDouble(0))
    assert(j(0) == 1.0 && j(1) == 0.0)
  }

  test("interval overlap join equals naive theta join, incl. multi-bucket spans") {
    import spark.implicits._
    // spans chosen to cross several width-8 buckets and to include: nested,
    // partial, touching-at-endpoint, and disjoint interval pairs
    val l = Seq((1L, 0L, 30L), (2L, 5L, 7L), (3L, 40L, 41L), (4L, 16L, 16L))
      .toDF("lid", "ls", "le")
    val r = Seq((10L, 6L, 50L), (11L, 31L, 39L), (12L, 0L, 4L), (13L, 16L, 24L))
      .toDF("rid", "rs", "re")
    val got = RangeJoin.intervalOverlapJoin(l, r, "ls", "le", "rs", "re", bucketWidth = 8)
      .select("lid", "rid").collect().map(rr => (rr.getLong(0), rr.getLong(1))).sorted.toSeq
    val naive = l.crossJoin(r)
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect().map(rr => (rr.getLong(0), rr.getLong(1))).sorted.toSeq
    assert(got == naive, s"bucketed $got != naive $naive")
    assert(got.distinct == got, "duplicate pairs from multi-bucket spans")
  }

  test("language ID on real multilingual snippets") {
    import spark.implicits._
    val df = Seq(
      ("en", "the cat sat on the mat and it was happy to be in the sun"),
      ("fr", "le chat est dans la maison et il ne veut pas sortir pour le moment"),
      ("es", "el perro corre por la calle y los gatos duermen en una casa"),
      ("de", "der Hund und die Katze sind in der Stadt mit einem Auto"),
      ("zh", "今天天气很好我们一起去公园散步吧"),
      ("und", "zzz qqq xxx")
    ).toDF("expected", "text")
    val got = df.select(col("expected"), TextAnalysis.langId(col("text")).as("got")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"lang mismatch: expected ${r.getString(0)} got ${r.getString(1)}"))
  }

  test("token counts: whitespace and BPE-ish") {
    import spark.implicits._
    val df = Seq("hello world", "  padded   out  ", "", "don't stop, never-stop!").toDF("t")
    val got = df.select(
      TextAnalysis.tokenCount(col("t")).as("ws"),
      TextAnalysis.tokenCountBpe(col("t")).as("bpe")).collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(got(0) == ((2, 2)))
    assert(got(1) == ((2, 2)))
    assert(got(2) == ((0, 0)))
    // whitespace: [don't, stop,, never-stop!] = 3
    // BPE-ish: [don,',t] [stop,,] [never,-,stop,!] = 3+2+4 = 9
    assert(got(3) == ((3, 9)))
  }

  test("bm25 ranks multi-term and rare-term matches above common-term ones") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spark shuffle spark shuffle vector"), // all three terms, short
      (1L, "spark is a framework and spark is fast and spark scales"), // common term only
      (2L, "the vector unit"), // rare term, very short
      (3L, "spark " + ("filler " * 200)), // one hit, long doc -> length-normalized down
      (4L, "nothing relevant here")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "shuffle", "vector"), k = 10).collect()
    val byId = got.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
    // doc 4 has no term hit -> absent
    assert(!byId.contains(4L) && got.length == 4)
    // doc 0 hits all three terms and must rank first
    assert(got(0).getAs[Long]("doc_id") == 0L)
    assert(got(0).getAs[Long]("n_terms_hit") == 3L)
    // rare full-term doc 2 outranks common-term doc 1 and diluted doc 3
    assert(byId(2L) > byId(1L) && byId(2L) > byId(3L))
    // length normalization: one 'spark' in a 201-word doc scores below
    // three 'spark' in an 11-word doc
    assert(byId(1L) > byId(3L))
  }

  test("bigram repetition flags looping text, passes varied text") {
    import spark.implicits._
    val df = Seq(
      (0L, "buy now buy now buy now buy now buy now"), // pure loop
      (1L, "the quick brown fox jumps over the lazy dog"), // all distinct
      (2L, "one two one two three"), // partial repetition
      (3L, "word"), // single word -> no bigrams
      (4L, "")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextAnalysis.bigramRepetition(col("text")).as("r"))
      .orderBy("doc_id").collect()
      .map(r => (r.getStruct(1).getLong(0), r.getStruct(1).getDouble(1), r.getStruct(1).getDouble(2)))
    // doc 0: 9 bigrams, "buy now" x5 of 9, every bigram occurs >1 time
    assert(got(0) == ((9L, 5.0 / 9, 1.0)))
    // doc 1: 8 bigrams, all distinct
    assert(got(1) == ((8L, 1.0 / 8, 0.0)))
    // doc 2: bigrams (one two)x2, (two one), (two three): top 2/4, dup 2/4
    assert(got(2) == ((4L, 0.5, 0.5)))
    assert(got(3) == ((0L, 0.0, 0.0)))
    assert(got(4) == ((0L, 0.0, 0.0)))
  }

  test("quality score ranks clean text above junk") {
    import spark.implicits._
    val clean = "The quick brown fox jumps over the lazy dog. " * 10
    val junk = "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( )))) ____ ++++"
    val df = Seq(clean, junk).toDF("t")
    val s = df.select(TextAnalysis.qualityScore(col("t"))).collect().map(_.getDouble(0))
    assert(s(0) > 0.9 && s(1) < 0.5 && s(0) > s(1))
  }

  test("text_stats native expression matches builtin-composed formulas") {
    // parity gate for the single-pass TextStats path: compare against the
    // original builtin formulation (regex counts + array-lambda stopword
    // filters) on the real documents table plus crafted edge cases
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
      .union(Seq("", "   ", "a", "今天天气 mixed latin 123!?",
        "don't; stop--never. 'quoted' (parens) [brackets]").toDF("text"))
    val ws = TextAnalysis.words(col("text"))
    val allStops = graft.functions.TextStatsProfiles.stopwords.values.flatten.toSeq.distinct
    val builtin = docs.select(
      length(col("text")).as("n_chars"),
      size(ws).as("n_words"),
      coalesce(regexp_count(col("text"), lit("\\p{L}")), lit(0)).as("n_alpha"),
      coalesce(regexp_count(col("text"), lit("[\\p{Punct}]")), lit(0)).as("n_punct"),
      coalesce(regexp_count(col("text"), lit("[\\u4e00-\\u9fff\\u3040-\\u30ff]")), lit(0)).as("n_cjk"),
      size(filter(ws, w => array_contains(typedLit(allStops), w))).as("stop_all"))
    val native = docs.select(TextAnalysis.textStats(col("text")).as("ts"))
      .select(col("ts.n_chars"), col("ts.n_words"), col("ts.n_alpha"),
        col("ts.n_punct"), col("ts.n_cjk"), col("ts.stop_all"))
    val b = builtin.collect().map(_.toSeq)
    val n = native.collect().map(_.toSeq)
    assert(b.length == n.length)
    b.zip(n).foreach { case (x, y) => assert(x == y, s"builtin $x != native $y") }
  }

  test("fingerprint: whitespace/case-insensitive equality") {
    import spark.implicits._
    val df = Seq(("A  B\tC", "a b c"), ("abc", "abd")).toDF("t1", "t2")
    val got = df.select(
      (TextAnalysis.fingerprint(col("t1")) === TextAnalysis.fingerprint(col("t2"))).as("eq"))
      .collect().map(_.getBoolean(0))
    assert(got(0) && !got(1))
  }

  test("similarity: brute-force top-k exact on crafted vectors") {
    import spark.implicits._
    // orthonormal-ish: v0 near v1, far from v2
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val top = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "query_id", "qvec", k = 2, excludeSelf = true).collect()
    assert(top(0).getAs[Long]("neighbor_id") == 1L) // rank 1 = closest
    assert(top(1).getAs[Long]("neighbor_id") == 2L)
  }

  test("topK family: unrelated id spaces keep coincident-id neighbors (excludeSelf off by default)") {
    import spark.implicits._
    // corpus id 7 is the TRUE nearest neighbor of a query that happens to
    // also carry id 7 in its own, unrelated id space. The old default
    // (excludeSelf=true) silently dropped it; the guard is now opt-in.
    val corpus = Seq(
      (7L, Array(1.0f, 0.0f, 0.0f)),
      (8L, Array(0.7f, 0.7f, 0.0f)),
      (9L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val queries = Seq((7L, Array(0.99f, 0.05f, 0.0f)))
      .toDF("qid", "qvec")
    val bf = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "qid", "qvec", k = 1).collect()
    assert(bf.head.getAs[Long]("neighbor_id") == 7L,
      "coincident-id true neighbor dropped by default self-exclusion")
    val planes = Similarity.randomHyperplaneTables(8, 2, 3)
    val lsh = Similarity.lshTopK(corpus, "vec_id", "embedding",
      queries, "qid", "qvec", planes, k = 1).collect()
    assert(lsh.head.getAs[Long]("neighbor_id") == 7L)
    // opt-in still works for corpus-drawn queries (self-search)
    val self = corpus.select($"vec_id".as("qid"), $"embedding".as("qvec"))
      .filter($"qid" === 7L)
    val ex = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      self, "qid", "qvec", k = 1, excludeSelf = true).collect()
    assert(ex.head.getAs[Long]("neighbor_id") == 8L)
  }

  test("IVF recall vs brute force on real embeddings (sf0.001)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "query_id", "qvec", k = 10, excludeSelf = true).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val cents = Similarity.fitCentroids(emb, "embedding", "vec_id", nlist = 8, sampleSize = 500)
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
      queries, "query_id", "qvec", cents, k = 10, nprobe = 3, excludeSelf = true).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.6, s"IVF recall too low: $recall") // nprobe=3/8 buckets
    // determinism: same centroids on refit
    val cents2 = Similarity.fitCentroids(emb, "embedding", "vec_id", nlist = 8, sampleSize = 500)
    assert(cents.map(_.toSeq).toSeq == cents2.map(_.toSeq).toSeq)
  }

  test("IVF append stats: in-distribution batch quiet, shifted batch flags drift") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") % 2 === 0)
    val cents = Similarity.fitCentroids(corpus, "embedding", "vec_id",
      nlist = 8, sampleSize = 500)
    // in-distribution append: the odd half of the same corpus
    val inDist = emb.filter(col("vec_id") % 2 === 1)
    val quiet = Similarity.ivfAppendStats(corpus, inDist, "embedding", cents)
      .collect()
    assert(quiet.nonEmpty)
    val maxQuietDrift = quiet.map(_.getAs[Double]("share_drift")).max
    assert(maxQuietDrift < 0.1, s"in-distribution batch drifted: $maxQuietDrift")
    // shifted append: every new vector lands in ONE bucket -> its new_share
    // approaches 1 while its corpus share stays ~1/8
    val oneBucket = Similarity.ivfAppendStats(corpus,
      corpus.limit(200).withColumn("embedding",
        expr("transform(embedding, x -> float(0.1))")),
      "embedding", cents).collect()
    val hot = oneBucket.filter(_.getAs[Long]("n_new") > 0)
    assert(hot.length == 1, s"constant vectors spread across ${hot.length} buckets")
    assert(hot.head.getAs[Double]("share_drift") > 0.5)
    // bookkeeping: shares sum to 1 on each side
    val cs = quiet.map(_.getAs[Double]("corpus_share")).sum
    val ns = quiet.map(_.getAs[Double]("new_share")).sum
    assert(math.abs(cs - 1.0) < 1e-9 && math.abs(ns - 1.0) < 1e-9)
  }

  test("IVF refit: collapsed batch triggers centroid replacement and fit recovers") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") % 2 === 0)
    val cents = Similarity.fitCentroids(corpus, "embedding", "vec_id",
      nlist = 8, sampleSize = 500)
    // quiet append: nothing crosses a threshold, centroids come back frozen.
    // fit_drop runs ~0.07-0.15 on these near-isotropic vectors even in
    // distribution (centroids overfit the 250-row corpus sample), so the
    // fit threshold is tuned above that noise floor — it's a per-corpus knob
    val inDist = emb.filter(col("vec_id") % 2 === 1)
    val (same, _, refitNone) = Similarity.ivfRefit(
      corpus, inDist, "embedding", "vec_id", cents, fitDropThreshold = 0.2)
    assert(refitNone.isEmpty)
    assert(same.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
    // collapsed append: every vector is the constant 0.1-vector -> one hot
    // bucket, share_drift ~1 there
    val collapsed = corpus.limit(200).withColumn("embedding",
      expr("transform(embedding, x -> float(0.1))"))
    val (updated, stats, refit) = Similarity.ivfRefit(
      corpus, collapsed, "embedding", "vec_id", cents, fitDropThreshold = 0.2)
    val hot = stats.filter(col("n_new") > 0).collect()
    assert(hot.length == 1)
    val hotBucket = hot.head.getAs[Int]("bucket")
    assert(refit.contains(hotBucket), s"hot bucket $hotBucket not refit: $refit")
    // untouched slots keep their exact centroids
    cents.indices.filterNot(refit.contains).foreach { b =>
      assert(updated(b).toSeq == cents(b).toSeq, s"frozen bucket $b moved")
    }
    // recovery: re-run the stats with the NEW centroids and the collapsed
    // batch folded into the corpus — the batch's bucket now fits tightly
    // (a refit centroid sits on the constant vector). share_drift is NOT
    // expected to recover: a homogeneous batch always differs in
    // composition from the mixed corpus no matter how good the centroids
    // are — fit is the signal that measures the partitioning itself
    val stats2 = Similarity.ivfAppendStats(
      corpus.unionByName(collapsed), collapsed, "embedding", updated).collect()
    val hot2 = stats2.filter(_.getAs[Long]("n_new") > 0)
    assert(hot2.nonEmpty)
    val fitNew2 = hot2.map(_.getAs[Double]("fit_new")).min
    assert(fitNew2 > 0.99, s"post-refit fit_new $fitNew2 not recovered")
    val preFit = hot.head.getAs[Double]("fit_new")
    assert(fitNew2 > preFit, s"fit did not improve: $preFit -> $fitNew2")
  }

  test("IVF refit: high-id append still reaches the sample (per-side budgets)") {
    // Regression: the refit sample used to be the lowest-id slice of
    // corpus ∪ newBatch. With appended ids above every corpus id (the normal
    // append case) and a drifted bucket holding >= sampleSize corpus rows,
    // the sample held zero new vectors, the replacement centroid refit the
    // OLD distribution, and the same bucket re-triggered forever.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") % 2 === 0)
    // nlist=2 so each bucket holds ~125 corpus rows > sampleSize=64
    val cents = Similarity.fitCentroids(corpus, "embedding", "vec_id",
      nlist = 2, sampleSize = 500)
    val collapsedHighId = corpus.limit(200)
      .withColumn("vec_id", col("vec_id") + lit(1000000L))
      .withColumn("embedding", expr("transform(embedding, x -> float(0.1))"))
    val (updated, stats, refit) = Similarity.ivfRefit(
      corpus, collapsedHighId, "embedding", "vec_id", cents,
      fitDropThreshold = 0.2, sampleSize = 64)
    assert(refit.nonEmpty, "collapsed high-id batch did not trigger a refit")
    // the refit centroids must reflect the NEW vectors: folding the batch in
    // and re-scoring, its bucket now fits tightly (a centroid sits on the
    // constant vector). Under the old union-lowest-ids sample this stayed at
    // the pre-refit fit because no new vector ever reached the sample.
    val stats2 = Similarity.ivfAppendStats(
      corpus.unionByName(collapsedHighId), collapsedHighId, "embedding", updated)
      .collect()
    val hot2 = stats2.filter(_.getAs[Long]("n_new") > 0)
    assert(hot2.nonEmpty)
    val fitNew2 = hot2.map(_.getAs[Double]("fit_new")).min
    // with k=1 over the mixed per-side sample the replacement is a weighted
    // mean, not exactly the constant vector — 0.95 still cleanly separates
    // from the old union-lowest-ids behavior (which refit to the corpus
    // mean, fit_new ~0.7)
    val preFit = stats.filter(col("n_new") > 0).collect()
      .map(_.getAs[Double]("fit_new")).min
    assert(fitNew2 > 0.95 && fitNew2 > preFit,
      s"post-refit fit_new $fitNew2 (pre $preFit): new batch never reached the refit sample")
  }

  test("LSH-bucketed ANN recall vs brute force on real embeddings (sf0.001)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "query_id", "qvec", k = 10, excludeSelf = true).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val planes = Similarity.randomHyperplaneTables(4, 4, 64)
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding",
      queries, "query_id", "qvec", planes, k = 10, excludeSelf = true).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // these embeddings are near-isotropic (true neighbors at cos ~0.3), the
    // hard case for sign-bit LSH: 4 tables x 4 bits + H<=1 probing is sized
    // for high recall on it; clustered data gets the same recall much cheaper
    val recall = (bf & lsh).size.toDouble / bf.size
    assert(recall >= 0.6, s"LSH ANN recall too low: $recall")
    // every reported neighbor must carry its true cosine (verify step is exact):
    // re-derive one row's cosine via the builtin formulation
    val one = Similarity.lshTopK(emb, "vec_id", "embedding",
      queries, "query_id", "qvec", planes, k = 1, excludeSelf = true)
      .orderBy(col("query_id")).limit(1).collect()(0)
    val qv = emb.filter(col("vec_id") === one.getAs[Long]("query_id"))
    val nv = emb.filter(col("vec_id") === one.getAs[Long]("neighbor_id"))
    val expect = qv.crossJoin(nv.select(col("embedding").as("nvec")))
      .select(round(Similarity.cosine(col("embedding"), col("nvec")), 4))
      .collect()(0).getDouble(0)
    assert(one.getAs[Double]("cos") == expect)
  }

  test("PQ ADC recall vs brute force on real embeddings (sf0.001)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "query_id", "qvec", k = 10, excludeSelf = true).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val cbs = Similarity.fitPqCodebooks(emb, "embedding", "vec_id",
      m = 8, ksub = 16, sampleSize = 500)
    val pq = Similarity.pqTopK(emb, "vec_id", "embedding",
      queries, "query_id", "qvec", cbs, k = 10, refine = 8, excludeSelf = true).collect()
    val pqSet = pq.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // 16 centroids/subspace on near-isotropic vectors is coarse; the exact
    // re-rank of 8k candidates recovers most of the loss
    val recall = (bf & pqSet).size.toDouble / bf.size
    assert(recall >= 0.5, s"PQ recall too low: $recall")
    // every query returns exactly k rows, ranked 1..k, and the reported
    // cosine comes from the exact re-rank (monotone non-increasing per query)
    pq.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      assert(rows.length == 10)
      val byRank = rows.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to 10))
      val coss = byRank.map(_.getAs[Double]("cos")).toSeq
      assert(coss == coss.sorted.reverse, s"cos not ranked: $coss")
    }
    // determinism: refit yields identical codebooks
    val cbs2 = Similarity.fitPqCodebooks(emb, "embedding", "vec_id",
      m = 8, ksub = 16, sampleSize = 500)
    assert(cbs.map(_.map(_.toSeq).toSeq).toSeq == cbs2.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("IVF-PQ recall vs brute force; scan restricted to probed buckets") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "query_id", "qvec", k = 10, excludeSelf = true).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val cents = Similarity.fitCentroids(emb, "embedding", "vec_id", nlist = 8, sampleSize = 500)
    val cbs = Similarity.fitPqCodebooks(emb, "embedding", "vec_id",
      m = 8, ksub = 16, sampleSize = 500)
    val ivfpq = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      queries, "query_id", "qvec", cents, cbs, k = 10, nprobe = 4, refine = 8, excludeSelf = true)
    val got = ivfpq.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (bf & got).size.toDouble / bf.size
    // two stacked approximations (4/8 buckets probed + 16-centroid PQ) with
    // an exact re-rank: coarser than either alone but must stay useful
    assert(recall >= 0.4, s"IVF-PQ recall too low: $recall")
    // every returned neighbor must actually live in a probed bucket: the
    // result set is a subset of the pure-IVF candidate universe at same nprobe
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
      queries, "query_id", "qvec", cents, k = 1000, nprobe = 4, excludeSelf = true).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(got.subsetOf(ivf), s"IVF-PQ returned a neighbor outside its probed buckets")
  }

  test("ANN fit functions tolerate null embedding rows (dirty-corpus hardening)") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .union(Seq((99990L, null.asInstanceOf[Array[Float]], 0))
        .toDF("vec_id", "embedding", "label"))
    // null rows must not break the driver-side sample collect
    val cents = Similarity.fitCentroids(emb, "embedding", "vec_id", nlist = 8, sampleSize = 500)
    assert(cents.length == 8)
    val cbs = Similarity.fitPqCodebooks(emb, "embedding", "vec_id",
      m = 8, ksub = 16, sampleSize = 500)
    assert(cbs.length == 8 && cbs(0).length == 16)
    // and the scoring paths skip them (null-safe expressions -> null score)
    val q = emb.filter(col("vec_id") < 2).filter(col("embedding").isNotNull)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val got = Similarity.pqTopK(emb, "vec_id", "embedding",
      q, "query_id", "qvec", cbs, k = 5, refine = 4, excludeSelf = true).collect()
    assert(got.length == 10) // 2 queries x 5 results, null row never surfaces
    assert(!got.exists(_.getAs[Long]("neighbor_id") == 99990L))
  }

  test("PQ recall is near-total on clustered embeddings (the realistic case)") {
    import spark.implicits._
    // 10 tight clusters in 64-dim: center c has +-0.05 jitter per dim.
    // Real embedding corpora cluster; the isotropic table above is the
    // adversarial floor, this is the expected operating regime. Tight
    // clusters mean all ~100 members of a cluster share one PQ code — ADC
    // ranks BETWEEN cells, the exact re-rank orders WITHIN one — so the
    // candidate budget k*refine must cover a cell for near-total recall
    // (the standard PQ sizing rule; with refine too small the candidates
    // are an arbitrary same-score subset of the cell).
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(10)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val rows = (0L until 1000L).map { i =>
      val c = centers((i % 10).toInt)
      (i, c.map(v => v + (rnd.nextFloat() - 0.5f) * 0.1f))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val q = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      q, "query_id", "qvec", k = 10, excludeSelf = true).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val cbs = Similarity.fitPqCodebooks(emb, "embedding", "vec_id",
      m = 8, ksub = 16, sampleSize = 1000)
    val pq = Similarity.pqTopK(emb, "vec_id", "embedding",
      q, "query_id", "qvec", cbs, k = 10, refine = 12, excludeSelf = true).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (bf & pq).size.toDouble / bf.size
    assert(recall >= 0.9, s"clustered PQ recall $recall < 0.9")
    // under-budgeted candidates demonstrably truncate the cell: same query,
    // refine=4 (40 candidates < 100-member cell) must do measurably worse
    val small = Similarity.pqTopK(emb, "vec_id", "embedding",
      q, "query_id", "qvec", cbs, k = 10, refine = 4, excludeSelf = true).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert((bf & small).size.toDouble / bf.size < recall)
  }

  test("pq_encode codes reconstruct subspace-nearest centroids (crafted)") {
    import spark.implicits._
    // 4-dim vectors, m=2 subspaces of 2 dims, 2 centroids each: codebook
    // built by hand so the expected code is obvious
    val cbs: Array[Array[Array[Double]]] = Array(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)),   // subspace 0
      Array(Array(-1.0, 0.0), Array(0.0, -1.0))) // subspace 1
    val df = Seq(
      (0L, Array(0.9f, 0.1f, -0.8f, 0.0f)),  // -> codes (0, 0)
      (1L, Array(0.1f, 0.9f, 0.1f, -0.9f))   // -> codes (1, 1)
    ).toDF("id", "v")
    val got = df.select(col("id"), Similarity.pqEncode(col("v"), cbs).as("c"))
      .orderBy("id").collect()
      .map(_.getAs[Array[Byte]]("c").toSeq)
    assert(got(0) == Seq[Byte](0, 0))
    assert(got(1) == Seq[Byte](1, 1))
  }

  test("semantic dedup: lower-id-wins drop policy, incl. chains and ties") {
    import spark.implicits._
    // crafted unit vectors: 0≈1≈2 (a chain of near-identicals), 3 isolated,
    // 4 is an exact copy of 0 with a higher id
    val base = Array(1.0f, 0.0f, 0.0f)
    val near = Array(0.999f, 0.045f, 0.0f)
    val near2 = Array(0.998f, 0.06f, 0.0f)
    val far = Array(0.0f, 0.0f, 1.0f)
    val corpus = Seq(
      (0L, base), (1L, near), (2L, near2), (3L, far), (4L, base.clone()))
      .toDF("vec_id", "embedding")
    val planes = Similarity.randomHyperplaneTables(8, 16, 3)
    val dropped = Similarity.semanticDropList(
        corpus, "vec_id", "embedding", planes, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1, 2, 4 all have 0 as a lower-id near-dup (global policy: 2 drops
    // even though 1, its other partner, is itself dropped)
    assert(dropped == Map(1L -> 0L, 2L -> 0L, 4L -> 0L), s"got $dropped")
    val kept = Similarity.semanticDedupKeep(
        corpus, "vec_id", "embedding", planes, threshold = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(0L, 3L), s"got $kept")
  }

  test("embedding near-dup finds planted duplicates (multi-table, capped)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // plant: vec 9001 = copy of vec 1, vec 9002 = copy of vec 2
    val planted = emb.union(
      emb.filter(col("vec_id").isin(1, 2))
        .withColumn("vec_id", col("vec_id") + 9000))
    val planes = Similarity.randomHyperplaneTables(4, 16, 64)
    val pairs = Similarity.embeddingNearDupPairs(planted, "vec_id", "embedding",
        planes, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 9001L && p._3 == 1.0))
    assert(pairs.exists(p => p._1 == 2L && p._2 == 9002L && p._3 == 1.0))
    pairs.foreach(p => assert(p._1 < p._2 && p._3 >= 0.99))
    // recall vs brute force at this threshold: identical copies collide in
    // every table, so LSH must find the full exact pair set here
    val bf = planted.alias("a").crossJoin(planted.alias("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", Similarity.cosine(col("a.embedding"), col("b.embedding")))
      .filter(col("cos") >= 0.99)
      .select(col("a.vec_id"), col("b.vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.map(p => (p._1, p._2)).toSet == bf, "LSH pair set != brute-force pair set")
    // sub-16-bit tables are rejected (the n²/2^bits scale trap)
    intercept[IllegalArgumentException] {
      Similarity.embeddingNearDupPairs(planted, "vec_id", "embedding",
        Similarity.randomHyperplaneTables(2, 4, 64))
    }
  }

  test("embedding near-dup bucket cap bounds degenerate corpora") {
    import spark.implicits._
    // 500 identical vectors: uncapped this is C(500,2) ≈ 125k pairs; the
    // bucket cap must drop the degenerate bucket entirely
    val vec = Array.fill(8)(0.5f)
    val degenerate = (0 until 500).map(i => (i.toLong, vec)).toDF("vec_id", "embedding")
    val planes = Similarity.randomHyperplaneTables(2, 16, 8)
    val pairs = Similarity.embeddingNearDupPairs(degenerate, "vec_id", "embedding",
      planes, threshold = 0.9, maxBucket = 100)
    assert(pairs.count() == 0L, "capped degenerate bucket must produce no candidate pairs")
  }

  test("simhash bucket cap bounds identical-doc blowup") {
    import spark.implicits._
    // 1k identical docs share ALL simhash chunks: uncapped that is a
    // C(1000,2)x4-row candidate explosion; the cap drops the hot buckets
    val docs = (0 until 1000).map(i => (i.toLong, "same text for every single document here"))
      .toDF("doc_id", "text")
    val capped = Dedup.simhashNearDupPairs(docs, "text", "doc_id", maxHamming = 3, maxBucket = 100)
    assert(capped.count() == 0L, "capped hot chunk buckets must produce no candidates")
    // and a mixed corpus still finds its small-bucket pairs under the cap
    val mixed = docsDf
    val pairs = Dedup.simhashNearDupPairs(mixed, "text", "doc_id", maxHamming = 8, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 1 && p._2 == 2 && p._3 == 0))
  }

  test("word frequencies: exact counts, case-folded, punctuation-split") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat sat. THE cat!"),
      (2L, "a dog; the dog")
    ).toDF("doc_id", "text")
    val freq = TextAnalysis.wordFrequencies(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(freq == Map("the" -> 3L, "cat" -> 2L, "sat" -> 1L, "a" -> 1L, "dog" -> 2L))
  }

  test("unigram surprisal: rare-word docs score above common-word docs") {
    import spark.implicits._
    // 'zzz' appears once in a 12-token corpus; 'the' dominates. A doc made
    // of rare tokens must out-score a doc of the most common token, and the
    // hand-computed surprisal of the common-only doc must match exactly.
    val docs = Seq(
      (1L, "the the the the the"),
      (2L, "the the the the the"),
      (3L, "zzz qqq")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.unigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rows(1)._1 == 5L)
    // p(the) = 10/12 -> -log2 = 0.263  (rounded to 4 decimals)
    assert(math.abs(rows(1)._2 - 0.263) < 0.001)
    assert(rows(3)._2 > rows(1)._2 + 2.0, "rare-token doc must score far higher")
    assert(rows(3)._3 == rows(3)._2, "uniform-rarity doc: max == mean")
  }
}
