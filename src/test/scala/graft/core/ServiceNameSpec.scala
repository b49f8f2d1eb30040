package graft.core

import org.scalatest.funsuite.AnyFunSuite

class ServiceNameSpec extends AnyFunSuite {

  test("reference examples: strip, digit prefix, sub, collapse, lower, truncate") {
    assert(ServiceName.normalize("  My Service!  ") == Right("my_service_"))
    assert(ServiceName.normalize("9lives") == Right("_9lives"))
    assert(ServiceName.normalize("a--b  c") == Right("a_b_c"))
    assert(ServiceName.normalize("ALL CAPS") == Right("all_caps"))
    assert(ServiceName.normalize("x" * 300).map(_.length) == Right(128))
    assert(ServiceName.normalize("").isLeft)
    assert(ServiceName.normalize("   ").isLeft)
    assert(ServiceName.normalize(null).isLeft)
  }

  test("digit check happens before substitution, lower after sub") {
    // " 9a" strips to "9a" -> "_9a"; substitution after prefix.
    assert(ServiceName.normalize(" 9a!") == Right("_9a_"))
    // Leading non-digit symbol does not trigger the prefix.
    assert(ServiceName.normalize("!9a") == Right("_9a"))
  }

  test("property: output matches ^[a-z0-9_]{1,128}$, never digit-led, idempotent") {
    val rng = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val s = List.fill(rng.nextInt(200))((' ' + rng.nextInt(95)).toChar).mkString
      ServiceName.normalize(s) match {
        case Right(out) =>
          assert(out.matches("^[a-z0-9_]{1,128}$"), s"'$s' -> '$out'")
          assert(!out.head.isDigit)
          // Idempotent: normalizing the output is a fixpoint.
          assert(ServiceName.normalize(out) == Right(out))
        case Left(_) => assert(s.trim.isEmpty)
      }
    }
  }

  test("column form agrees with the pure function") {
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    val names = Seq("  My Service!  ", "9lives", "a--b  c", "ALL CAPS",
      "x" * 300, "Data (2024) — v2", "foo.bar-baz")
    val got = names.toDF("n")
      .select(ServiceName.normalizeCol(org.apache.spark.sql.functions.col("n")))
      .as[String].collect().toSeq
    val want = names.map(n => ServiceName.normalize(n).toOption.get)
    assert(got == want)
  }
}
