package graft

import graft.operators.{Cdc, Colloc, Graph, InvertedIndex}

import org.apache.spark.sql.functions._

/** Cdc (latest-wins / MERGE / SCD-2), Graph (integer PageRank),
  * InvertedIndex, and Colloc (PMI) semantics on hand-checkable inputs. */
class CdcGraphSpec extends SparkSuite {

  private def changelog = {
    import spark.implicits._
    // (key, ms, event_id, op, v)
    Seq(
      (1L, 10L, 100L, "U", "a"),
      (1L, 20L, 101L, "U", "b"), // winner for key 1
      (2L, 10L, 102L, "U", "c"),
      (2L, 10L, 103L, "D", "d"), // same ms — event_id breaks the tie, delete wins
      (4L, 5L, 104L, "U", "new") // insert (no base row)
    ).toDF("k", "ms", "event_id", "_op", "v")
  }

  test("latestState: greatest (seq, tie) row wins per key") {
    val out = Cdc.latestState(changelog, "k", Seq("ms", "event_id"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(4)))
    assert(out.toSeq == Seq((1L, "b"), (2L, "d"), (4L, "new")))
  }

  test("merge: upsert replaces, delete removes, new key inserts, untouched passes through") {
    import spark.implicits._
    val base = Seq((1L, "old1"), (2L, "old2"), (3L, "old3")).toDF("k", "v")
    val ops = Cdc.latestState(changelog, "k", Seq("ms", "event_id"))
      .drop("ms", "event_id")
    val out = Cdc.merge(base, ops, "k")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    // 1 updated, 2 deleted, 3 untouched, 4 inserted
    assert(out.toSeq == Seq((1L, "b"), (3L, "old3"), (4L, "new")))
  }

  test("scd2: consecutive-equal states compress; intervals tile; tail open") {
    import spark.implicits._
    val ch = Seq(
      (1L, 10L, 1L, "x"), (1L, 20L, 2L, "x"), // same run
      (1L, 30L, 3L, "y"), (1L, 40L, 4L, "x"), // x again = NEW version
      (2L, 10L, 5L, "z")
    ).toDF("k", "ms", "event_id", "st")
    val out = Cdc.scd2(ch, "k", "ms", Seq("st"), Seq("event_id"))
      .orderBy("k", "version").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getString(4)))
    assert(out.toSeq == Seq(
      (1L, 1, 10L, Some(30L), "x"),
      (1L, 2, 30L, Some(40L), "y"),
      (1L, 3, 40L, None, "x"),
      (2L, 1, 10L, None, "z")))
  }

  /** Driver-side replica of the exact integer recurrence. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val outdeg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) / outdeg(s) }.sum
      }
      r = nodes.map(n => n -> (150000L + 85L * in.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  test("pageRankInt matches the driver-side integer recurrence; hubs outrank leaves") {
    import spark.implicits._
    // star into 1 plus a 2-cycle and a dangler
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L), (2L, 3L), (5L, 1L))
    val out = Graph.pageRankInt(edges.toDF("s", "d"), "s", "d", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == refPageRank(edges, 3))
    assert(out(1L) > out(4L) && out(1L) > out(5L)) // the hub beats pure sources
  }

  test("inverted index: build + persisted search == brute-force token filter") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join stream fast"),
      (2L, "join stream slow path"), // has 'slow' -> excluded
      (3L, "join only no stream"),   // hmm: contains 'stream'? yes -> kept
      (4L, "stream but not the other term"),
      (5L, "JOIN Stream case folded")
    ).toDF("doc_id", "text")
    InvertedIndex.writeIndex(docs, "doc_id", "text", "graft_spec_inv_idx")
    val got = InvertedIndex.search(spark, "graft_spec_inv_idx",
        all = Seq("join", "stream"), none = Seq("slow"))
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 3L, 5L))
    // tf is a real count and dl the doc's token count, not flags
    val row = spark.table("graft_spec_inv_idx")
      .where(col("term") === "join" && col("doc_id") === 5L)
      .select(col("tf"), col("dl"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(row == Seq((1L, 4L)))
  }

  test("pmi: quantized micro-nats match driver-side math; repeated pair tops list") {
    import spark.implicits._
    // "big data" appears 5x across docs; all words otherwise unique-ish
    val docs = (1 to 5).map(i => (i.toLong, s"big data w$i")).toDF("doc_id", "text")
    val out = Colloc.pmi(docs, "doc_id", "text", minCount = 2L)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    // counts: tokens = 15, c(big)=c(data)=5, c(big,data)=5
    val expected = math.round(math.log(5.0 * 15.0 / 5.0 / 5.0) * 1e6)
    assert(out == Map(("big", "data") -> (5L, expected)))
  }

  test("personalized pageRankInt: seed-only mass, unreachable nodes exactly 0, all-seeds = plain") {
    import spark.implicits._
    // 1 -> 2 -> 3 chain plus a disconnected 4 -> 5: seeds {1}
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val out = graft.operators.Graph.pageRankInt(edges, "src", "dst",
        iterations = 3, seeds = Some(seeds))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1 has no in-edges: pure teleport each round = 150000
    assert(out(1L) == 150000L)
    // trust flows down the chain; nothing reaches the disconnected pair
    assert(out(2L) > 0L && out(3L) > 0L)
    assert(out(4L) == 0L && out(5L) == 0L)
    // round arithmetic check: r1(2) = 85 * 1000000 // 100 = 850000;
    // r2(2) = 85 * 150000 // 100 = 127500 (contrib from 1's r1);
    // r3(2) = the same 127500 (1 is constant from round 1 on)
    assert(out(2L) == 127500L)
    // r3(3) = 85 * r2(2) // 100 = 85 * 850000... via chain: r2(3) from r1(2)=850000
    // -> r3(3) = 85 * 127500... no: r3(3) uses r2(2) = 127500 -> 108375
    assert(out(3L) == 85L * 127500L / 100L)
    // seeds = every node reduces bit-for-bit to the plain form
    val allNodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("node")
    val p1 = graft.operators.Graph.pageRankInt(edges, "src", "dst", iterations = 2,
      seeds = Some(allNodes)).collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val p2 = graft.operators.Graph.pageRankInt(edges, "src", "dst", iterations = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(p1.toSeq == p2.toSeq)
  }

  test("weighted pageRankInt: rank splits by weight ratio; all-1 weights equal unweighted") {
    import spark.implicits._
    // A -> B (w 3), A -> C (w 1): B draws 3/4 of A's mass
    val we = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val r = graft.operators.Graph.pageRankInt(we, "src", "dst",
        iterations = 1, weightCol = Some("w"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    // strength(A)=4; in(B)=(1e6·3) DIV 4, in(C)=(1e6·1) DIV 4; teleport 150000
    assert(r(2L) == 150000L + 85L * 750000L / 100L)
    assert(r(3L) == 150000L + 85L * 250000L / 100L)
    assert(r(1L) == 150000L)
    // weightCol = None is bit-for-bit the all-ones weighted form
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val un = graft.operators.Graph.pageRankInt(edges, "src", "dst", iterations = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    val ones = graft.operators.Graph.pageRankInt(
        edges.withColumn("w", lit(1L)), "src", "dst", iterations = 3,
        weightCol = Some("w"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    assert(un.sameElements(ones))
  }

  test("clusteringCoefficient: exact wedge count, 3T/W, matching graph gives NULL") {
    import spark.implicits._
    // triangle 1-2-3 with pendant 3-4: T=1, degs (2,2,3,1) -> W=1+1+3+0=5
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = graft.operators.Graph.clusteringCoefficient(edges, "src", "dst")
      .collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L && r.getLong(2) == 1L)
    assert(r.getLong(3) == 5L)
    assert(r.getDouble(4) == 3.0 / 5.0)
    // wedge-free matching: C is NULL, not a lying 0
    val matching = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    val m = graft.operators.Graph.clusteringCoefficient(matching, "src", "dst")
      .collect().head
    assert(m.getLong(2) == 0L && m.getLong(3) == 0L && m.isNullAt(4))
  }
}
