package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** S9/S11 pushdown parity: the Mongo pipeline / ES query DSL compiled to
  * Catalyst, checked for semantics (incl. Mongo null/missing rules) and for
  * the scale property that actually matters — the `$match`/`term` predicate
  * reaching the parquet scan as a pushed filter. */
class DocPushdownSpec extends SparkSuite {

  import spark.implicits._

  private lazy val people = Seq(
    ("a", Some(31L), Some("nyc"), Seq("x", "y")),
    ("b", Some(25L), Some("sf"), Seq("x")),
    ("c", None, Some("nyc"), Seq.empty[String]),
    ("d", Some(40L), None, Seq("z", "x", "y"))
  ).toDF("_id", "age", "city", "tags")

  private def ids(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select("_id").as[String].collect().toSet

  // ---------------------------------------------------------------- Mongo

  test("$match: comparison / $in / $exists / $regex / $size operators") {
    def m(json: String): Set[String] =
      ids(DocPushdown.mongoPipeline(people, s"""[{"$$match": $json}]"""))
    assert(m("""{"age": {"$gte": 30}}""") === Set("a", "d"))
    assert(m("""{"age": {"$gt": 25, "$lt": 40}}""") === Set("a"))
    assert(m("""{"city": {"$in": ["nyc", "la"]}}""") === Set("a", "c"))
    assert(m("""{"city": {"$exists": false}}""") === Set("d"))
    assert(m("""{"_id": {"$regex": "^[ab]$"}}""") === Set("a", "b"))
    assert(m("""{"tags": {"$size": 2}}""") === Set("a"))
    assert(m("""{"$or": [{"city": "sf"}, {"age": 40}]}""") === Set("b", "d"))
    assert(m("""{"$nor": [{"city": "sf"}, {"age": 40}]}""") === Set("a", "c"))
  }

  test("$unwind: drops empty/missing by default, preserve + array index options") {
    // default: one row per element; c (empty array) disappears
    val un = DocPushdown.mongoPipeline(people, """[{"$unwind": "$tags"}]""")
    assert(un.select("_id", "tags").as[(String, String)].collect().toSet
      === Set(("a", "x"), ("a", "y"), ("b", "x"), ("d", "z"), ("d", "x"), ("d", "y")))
    // preserveNullAndEmptyArrays keeps c with a null element
    val keep = DocPushdown.mongoPipeline(people,
      """[{"$unwind": {"path": "$tags", "preserveNullAndEmptyArrays": true}}]""")
    assert(keep.filter(col("_id") === "c").select("tags")
      .as[Option[String]].collect().toSeq === Seq(None))
    // includeArrayIndex adds the element position
    val idx = DocPushdown.mongoPipeline(people,
      """[{"$unwind": {"path": "$tags", "includeArrayIndex": "pos"}}]""")
    assert(idx.filter(col("_id") === "d").select("pos", "tags")
      .as[(Long, String)].collect().toSet === Set((0L, "z"), (1L, "x"), (2L, "y")))
    // composes: unwind then match then count
    val n = DocPushdown.mongoPipeline(people,
      """[{"$unwind": "$tags"}, {"$match": {"tags": "x"}}, {"$count": "n"}]""")
      .as[Long].head()
    assert(n === 3L)
  }

  test("$group: field/_id-null/document keys, $sum/$avg/$min/$max/$push accumulators") {
    // group by city: sum(1) counts docs, avg/min/max over age
    val byCity = DocPushdown.mongoPipeline(people,
      """[{"$group": {"_id": "$city", "n": {"$sum": 1},
        |"avg_age": {"$avg": "$age"}, "top": {"$max": "$age"}}}]""".stripMargin)
    val rows = byCity.select(col("_id"), col("n"), col("avg_age"), col("top"))
      .as[(Option[String], Long, Option[Double], Option[Long])].collect().toSet
    assert(rows === Set(
      (Some("nyc"), 2L, Some(31.0), Some(31L)), // c's null age ignored by avg/max
      (Some("sf"), 1L, Some(25.0), Some(25L)),
      (None, 1L, Some(40.0), Some(40L))))
    // _id: null = one global bucket
    val global = DocPushdown.mongoPipeline(people,
      """[{"$group": {"_id": null, "n": {"$sum": 1}, "min_age": {"$min": "$age"}}}]""")
    assert(global.select("n", "min_age").as[(Long, Long)].head() === ((4L, 25L)))
    // document _id -> struct key; $push collects per group
    val doc = DocPushdown.mongoPipeline(people,
      """[{"$unwind": "$tags"},
        |{"$group": {"_id": {"t": "$tags"}, "who": {"$push": "$_id"}}}]""".stripMargin)
    val who = doc.select(col("_id.t"), array_sort(col("who")))
      .as[(String, Seq[String])].collect().toMap
    assert(who === Map("x" -> Seq("a", "b", "d"), "y" -> Seq("a", "d"), "z" -> Seq("d")))
  }

  test("$lookup joins a registry collection as an array field (empty on no match)") {
    val orders = Seq(("a", 10L), ("a", 20L), ("b", 5L)).toDF("who", "amt")
    val got = DocPushdown.mongoPipeline(people,
      """[{"$lookup": {"from": "orders", "localField": "_id",
        |"foreignField": "who", "as": "ords"}}]""".stripMargin,
      lookups = Map("orders" -> orders))
    assert(got.columns.toSeq === people.columns.toSeq :+ "ords")
    val byId = got.select(col("_id"), col("ords.amt"))
      .as[(String, Seq[Long])].collect().toMap
    assert(byId("a").sorted === Seq(10L, 20L))
    assert(byId("b") === Seq(5L))
    assert(byId("c") === Nil) // no match -> EMPTY array, not null
    // composes: lookup then unwind flattens the array like a join
    val n = DocPushdown.mongoPipeline(people,
      """[{"$lookup": {"from": "orders", "localField": "_id",
        |"foreignField": "who", "as": "ords"}},
        |{"$unwind": "$ords"}, {"$count": "n"}]""".stripMargin,
      lookups = Map("orders" -> orders)).as[Long].head()
    assert(n === 3L)
    // unknown collection fails with the registry message
    val e = intercept[IllegalArgumentException](DocPushdown.mongoPipeline(people,
      """[{"$lookup": {"from": "nope", "localField": "_id",
        |"foreignField": "who", "as": "x"}}]""".stripMargin))
    assert(e.getMessage.contains("nope"))
  }

  test("$match null semantics follow Mongo: null matches missing; $ne/$nin match missing") {
    def m(json: String): Set[String] =
      ids(DocPushdown.mongoPipeline(people, s"""[{"$$match": $json}]"""))
    assert(m("""{"age": null}""") === Set("c"))
    assert(m("""{"city": {"$ne": "nyc"}}""") === Set("b", "d"))
    assert(m("""{"city": {"$nin": ["nyc", "sf"]}}""") === Set("d"))
  }

  test("$project include keeps _id by default; exclude drops; $sort+$limit; $count") {
    val inc = DocPushdown.mongoPipeline(people, """[{"$project": {"age": 1}}]""")
    assert(inc.columns.toSet === Set("age", "_id"))
    val noId = DocPushdown.mongoPipeline(people, """[{"$project": {"age": 1, "_id": 0}}]""")
    assert(noId.columns.toSeq === Seq("age"))
    val exc = DocPushdown.mongoPipeline(people, """[{"$project": {"tags": 0}}]""")
    assert(exc.columns.toSet === Set("_id", "age", "city"))
    val top = DocPushdown.mongoPipeline(people,
      """[{"$match": {"age": {"$exists": true}}}, {"$sort": {"age": -1}}, {"$limit": 2}]""")
    assert(top.select("_id").as[String].collect().toSeq === Seq("d", "a"))
    val cnt = DocPushdown.mongoPipeline(people, """[{"$count": "n"}]""")
    assert(cnt.as[Long].collect().toSeq === Seq(4L))
    intercept[IllegalArgumentException](
      DocPushdown.mongoPipeline(people, """[{"$lookup": {}}]""").count())
  }

  test("$match predicate is pushed down to the parquet scan") {
    val dir = Files.createTempDirectory("graft-pushdown").toString
    people.write.mode("overwrite").parquet(dir)
    val scanned = spark.read.parquet(dir)
    val df = DocPushdown.mongoPipeline(scanned, """[{"$match": {"age": {"$gte": 30}}}]""")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("GreaterThanOrEqual(age,30)"),
      s"filter not pushed:\n$plan")
    assert(ids(df) === Set("a", "d"))
  }

  // ------------------------------------------------------------------- ES

  test("es.query: term / terms / range / exists / wildcard / ids / match") {
    def q(json: String): Set[String] =
      ids(DocPushdown.esRead(people, Some(s"""{"query": $json}"""), None, None))
    assert(q("""{"match_all": {}}""") === Set("a", "b", "c", "d"))
    assert(q("""{"term": {"city": "nyc"}}""") === Set("a", "c"))
    assert(q("""{"term": {"city": {"value": "sf"}}}""") === Set("b"))
    assert(q("""{"terms": {"city": ["nyc", "sf"]}}""") === Set("a", "b", "c"))
    assert(q("""{"range": {"age": {"gte": 25, "lt": 40}}}""") === Set("a", "b"))
    assert(q("""{"exists": {"field": "city"}}""") === Set("a", "b", "c"))
    assert(q("""{"wildcard": {"_id": "a*"}}""") === Set("a"))
    assert(q("""{"ids": {"values": ["a", "d"]}}""") === Set("a", "d"))
    assert(q("""{"match": {"city": "NYC la"}}""") === Set("a", "c"))
  }

  test("es.query bool: must AND, must_not NOT (null-safe), bare should OR") {
    def q(json: String): Set[String] =
      ids(DocPushdown.esRead(people, Some(s"""{"query": $json}"""), None, None))
    assert(q("""{"bool": {"must": [{"term": {"city": "nyc"}}, {"range": {"age": {"gte": 30}}}]}}""")
      === Set("a"))
    // must_not over a field that is null for some docs: ES filter context
    // keeps docs where the clause is not a positive match
    assert(q("""{"bool": {"must_not": [{"term": {"city": "nyc"}}]}}""") === Set("b", "d"))
    assert(q("""{"bool": {"should": [{"term": {"city": "sf"}}, {"term": {"_id": "c"}}]}}""")
      === Set("b", "c"))
  }

  test("_source projection and field include/exclude compose in order") {
    val src = DocPushdown.esRead(people,
      Some("""{"_source": ["_id", "age", "city"], "query": {"match_all": {}}}"""),
      None, Some("city"))
    assert(src.columns.toSeq === Seq("_id", "age"))
    val inc = DocPushdown.esRead(people, None, Some("_id, tags"), None)
    assert(inc.columns.toSeq === Seq("_id", "tags"))
    val obj = DocPushdown.esRead(people,
      Some("""{"_source": {"includes": ["_id"]}}"""), None, None)
    assert(obj.columns.toSeq === Seq("_id"))
  }

  // ---------------------------------------------------------------- S8 URI

  test("es.read.field.as.array.include wraps scalar fields, leaves arrays alone") {
    val wrapped = DocPushdown.esRead(people, None, None, None,
      asArrayInclude = Some("city, tags, missing"))
    // scalar city -> single-element array; null stays null
    val cities = wrapped.select(col("_id"), col("city"))
      .as[(String, Option[Seq[String]])].collect().toMap
    assert(cities("a") === Some(Seq("nyc")))
    assert(cities("d") === None)
    // tags was already an array: untouched
    assert(wrapped.schema("tags").dataType ===
      people.schema("tags").dataType)
    assert(wrapped.filter(col("_id") === "d").select("tags")
      .as[Seq[String]].head() === Seq("z", "x", "y"))
  }

  test("MongoUri parses the reference's credential-spliced URI shapes") {
    val u = MongoUri.parse("mongodb://usr:p%40ss@h1:27017,h2:27018/mydb?replicaSet=rs0&ssl=true")
    assert(u.user === Some("usr") && u.password === Some("p%40ss"))
    assert(u.hosts === Seq("h1:27017", "h2:27018"))
    assert(u.database === Some("mydb"))
    assert(u.options === Map("replicaSet" -> "rs0", "ssl" -> "true"))
    assert(u.render === "mongodb://usr:p%40ss@h1:27017,h2:27018/mydb?replicaSet=rs0&ssl=true")
    val bare = MongoUri.parse("mongodb://localhost:27017")
    assert(bare.user.isEmpty && bare.database.isEmpty && bare.hosts === Seq("localhost:27017"))
    intercept[IllegalArgumentException](MongoUri.parse("http://nope"))
  }
}
