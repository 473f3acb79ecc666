package graft

/** Independent replay of the `text_bpe` encoder: the query is a nested
  * SQL `replace` cascade; this spec re-runs the identical sequential
  * left-to-right non-overlapping merge semantics through plain
  * `java.lang.String.replace` (a separate implementation of the same
  * contract) and checks counts AND encoded strings doc-by-doc. */
class BpeSpec extends SparkSuite {

  private def encode(text: String): String = {
    var s = " " + text.toLowerCase.replace(" ", "_")
      .flatMap(c => s"$c ")
    for ((a, b) <- SparkEntry.BpeMerges)
      s = s.replace(s" $a $b ", s" $a$b ")
    s.trim
  }

  test("text_bpe matches a plain-Scala sequential merge replay") {
    val out = SparkEntry.queries("text_bpe")(spark, "/root/testdata/sf0.001")
      .limit(20).collect()
    assert(out.nonEmpty)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val enc = encode(docs(r.getLong(0)))
      val n = enc.count(_ == ' ') + 1
      assert(r.getLong(1) === n.toLong, s"doc ${r.getLong(0)} token count")
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(enc.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getString(2) === md5, s"doc ${r.getLong(0)} encoded string")
    }
  }

  test("BPE merges actually compress: multi-char symbols appear") {
    // 'the' assembles through t+h -> th, th+e -> the (rank-ordered
    // cascade consuming earlier outputs)
    assert(encode("the query") === "the _ qu er y")
  }
}
