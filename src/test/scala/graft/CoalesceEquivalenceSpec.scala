package graft

import graft.coalesce._
import graft.dialect.AnsiDialect
import java.nio.file.Files
import java.sql.DriverManager

/** The coalescing correctness property (SURVEY §7.5 step 2, mirroring
  * the reference's coalescing test intent): applying the COALESCED
  * statements yields exactly the destination state of applying the
  * original statements one by one — for seeded random workloads, against
  * a real SQL engine (Derby, ANSI shapes: multi-VALUES, CASE-WHEN
  * update, OR-combined delete). */
class CoalesceEquivalenceSpec extends SparkSpecBase {

  private def freshDb(name: String): String = {
    val dir = Files.createTempDirectory("coal-eq").toFile.getAbsolutePath
    val url = s"jdbc:derby:$dir/$name;create=true"
    val c = DriverManager.getConnection(url)
    c.createStatement().execute(
      "CREATE TABLE \"t\" (\"id\" VARCHAR(16) PRIMARY KEY, \"a\" VARCHAR(32), \"b\" VARCHAR(32))")
    c.close()
    url
  }

  private def apply(url: String, sqls: Seq[String]): Unit = {
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      sqls.foreach(s => st.execute(s.stripSuffix(";")))
      st.close()
    } finally c.close()
  }

  private def snapshot(url: String): Map[String, (String, String)] = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery("SELECT \"id\", \"a\", \"b\" FROM \"t\"")
      val m = scala.collection.mutable.Map.empty[String, (String, String)]
      while (rs.next()) m(rs.getString(1)) = (rs.getString(2), rs.getString(3))
      m.toMap
    } finally c.close()
  }

  private def lit(s: String) = "'" + s.replace("'", "''") + "'"

  test("property: coalesced ≡ sequential for random workloads (10 seeds)") {
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val live = scala.collection.mutable.Set.empty[Int]
      var nextId = 0
      val stmts: Seq[DmlStmt] = (1 to 120).map { _ =>
        val c = rnd.nextInt(10)
        if (c < 4 || live.isEmpty) {
          nextId += 1; live += nextId
          InsertRow("\"t\"", Seq("\"id\"", "\"a\"", "\"b\""),
            Seq(lit(nextId.toString), lit(s"a$nextId"), lit(s"b'${rnd.nextInt(100)}")))
        } else if (c < 7) {
          val id = live.toSeq(rnd.nextInt(live.size))
          rnd.nextInt(3) match {
            case 0 =>
              UpdateRow("\"t\"", Seq("\"a\""), Seq(lit(s"u${rnd.nextInt(100)}")),
                Seq("\"id\"" -> Some(lit(id.toString))))
            case 1 =>
              UpdateRow("\"t\"", Seq("\"a\"", "\"b\""),
                Seq(lit(s"u${rnd.nextInt(100)}"), lit(s"w${rnd.nextInt(100)}")),
                Seq("\"id\"" -> Some(lit(id.toString))))
            case _ =>
              // KEY-MUTATING update (SET ∩ WHERE keys ≠ ∅): a statement can
              // move a row into a later statement's WHERE, so these runs must
              // never merge — sequential-exact emission is asserted by the
              // equivalence check. Chains arise naturally when a later pick
              // hits the freshly-assigned id.
              nextId += 1
              live -= id; live += nextId
              UpdateRow("\"t\"", Seq("\"id\""), Seq(lit(nextId.toString)),
                Seq("\"id\"" -> Some(lit(id.toString))))
          }
        } else {
          val id = live.toSeq(rnd.nextInt(live.size))
          live -= id
          DeleteRow("\"t\"", Seq("\"id\"" -> Some(lit(id.toString))))
        }
      }

      // naive: each statement rendered individually (runs of size 1)
      val naive = stmts.flatMap(s => Coalescer.coalesce(Seq(s), AnsiDialect))
      // coalesced: full run-length merge, small caps to exercise chunking
      val coalesced = Coalescer.coalesce(stmts, AnsiDialect,
        CoalesceConfig(maxStatementBytes = 512, maxRowsPerInsert = 7))

      assert(coalesced.size < naive.size, s"seed $seed: nothing coalesced")
      val u1 = freshDb(s"naive$seed"); val u2 = freshDb(s"coal$seed")
      apply(u1, naive); apply(u2, coalesced)
      assert(snapshot(u1) == snapshot(u2), s"seed $seed diverged")
    }
  }
}
