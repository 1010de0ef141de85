package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions
import graft.ops.Similarity

/** Native `FloatVecDot` Catalyst expression: bit-parity with the HOF
  * formulation, null handling, codegen presence, SQL registration.
  */
class VectorExprSpec extends SparkSpecBase {
  import spark.implicits._

  private def vecs = (0 until 50).map { i =>
    val rnd = new scala.util.Random(i)
    (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))
  }

  test("matches the higher-order-function dot product to float precision") {
    // NOT bit-identical by design: zip_with multiplies in FLOAT (the array
    // element type) before the double accumulation, while the native
    // expression multiplies in double — strictly more precise. Agreement is
    // within float rounding of the products.
    val emb = vecs.toDF("vec_id", "embedding")
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
    val worst = pairs.select(
      abs(VectorExpressions.vec_dot(col("a.embedding"), col("b.embedding")) -
        Similarity.dotHof(col("a.embedding"), col("b.embedding"))).as("d"))
      .agg(max(col("d"))).head().getDouble(0)
    assert(worst < 1e-4, s"max deviation $worst")
  }

  test("null ELEMENT propagates to null (containsNull arrays)") {
    val df = Seq(
      (1L, Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](3f, 4f)),
      (2L, Seq[java.lang.Float](1f, null), Seq[java.lang.Float](3f, 4f))
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), VectorExpressions.vec_dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got(1L) == 11.0)
    assert(got(2L) == null)
  }

  test("accepts array<double> on either side (hyperplane literals)") {
    val df = Seq((1L, Array(1f, 2f))).toDF("id", "v")
    val plane = typedLit(Seq(0.5d, 0.25d))
    assert(df.select(VectorExpressions.vec_dot(col("v"), plane))
      .head().getDouble(0) == 1.0)
  }

  test("q17-shaped plan: cosine top-k runs the native dot inside codegen") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 3), emb, k = 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("zip_with") && !plan.contains("aggregate("),
      s"interpreted HOF survives in q17 plan:\n$plan")
    assert(plan.contains("vec_dot") || plan.contains("floatvecdot") ||
      plan.contains("FloatVecDot"), s"native dot missing from plan:\n$plan")
    assert(out.count() > 0)
  }

  test("null and length-mismatch handling") {
    val df = Seq(
      (1L, Array(1f, 2f), Array(3f, 4f)),
      (2L, null.asInstanceOf[Array[Float]], Array(3f, 4f))
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), VectorExpressions.vec_dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got(1L) == 11.0)
    assert(got(2L) == null)
    // shorter array: dot over the common prefix
    val short = Seq((1L, Array(1f, 2f, 5f), Array(2f, 2f))).toDF("id", "a", "b")
    assert(short.select(VectorExpressions.vec_dot(col("a"), col("b")))
      .head().getDouble(0) == 6.0)
  }

  test("stays inside whole-stage codegen (no fallback)") {
    // parquet-backed scan so the plan cannot collapse to LocalTableScan
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = emb.select(VectorExpressions.vec_dot(col("embedding"), col("embedding")).as("d"))
      .filter(col("d") > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expected codegen span:\n$plan")
    assert(df.count() > 0)
  }

  test("SQL registration: vec_dot usable from spark.sql") {
    VectorExpressions.register(spark)
    vecs.toDF("vec_id", "embedding").createOrReplaceTempView("ve")
    val n = spark.sql(
      "SELECT count(*) FROM ve a JOIN ve b ON a.vec_id < b.vec_id " +
        "WHERE vec_dot(a.embedding, b.embedding) > 0").head().getLong(0)
    assert(n > 0)
  }

  test("rejects wrong input types at analysis time") {
    val df = Seq((1L, "oops")).toDF("id", "s")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorExpressions.vec_dot(col("s"), col("s"))).collect()
    }
  }

  test("SQL wrong arity is a proper analysis error, not an index crash") {
    VectorExpressions.register(spark)
    vecs.toDF("vec_id", "embedding").createOrReplaceTempView("ve_arity")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_dot(embedding) FROM ve_arity").collect()
    }
    assert(e.getMessage.contains("vec_dot"))
  }
}
