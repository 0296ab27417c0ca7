package graft.ts

import graft.SparkTestSession
import org.scalacheck.{Gen, Prop, Properties}
import java.sql.Timestamp

/** Property-based invariants for the time core (SURVEY §5: ScalaCheck
  * for T2 parse fallback and T3 bucket-boundary invariants), run through
  * sbt's native ScalaCheck framework against real Spark plans. */
object TimePropertiesSpec extends Properties("graft.ts") {

  private lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.functions._

  private val tsGen: Gen[Timestamp] =
    Gen.choose(0L, 4102444800L).map(s => new Timestamp(s * 1000)) // 1970..2100

  private val grains = Gen.oneOf("D", "W", "M", "H", "m")

  property("bucket <= ds < bucketEnd, and bucket is idempotent") =
    Prop.forAll(Gen.listOfN(30, tsGen), grains) { (stamps, g) =>
      import spark.implicits._
      stamps.isEmpty || {
        val df = stamps.toDF("ds")
        val bad = df.filter(
          !(TimeOps.bucket($"ds", Some(g)) <= $"ds" &&
            $"ds" < TimeOps.bucketEnd($"ds", g))).count()
        val notFix = df.select(TimeOps.bucket($"ds", Some(g)).as("b"))
          .filter(TimeOps.bucket($"b", Some(g)) =!= $"b").count()
        bad == 0 && notFix == 0
      }
    }

  property("format-then-parse roundtrips to the minute") =
    Prop.forAll(Gen.listOfN(30, tsGen)) { stamps =>
      import spark.implicits._
      stamps.isEmpty || {
        val df = stamps.toDF("ds")
        df.select($"ds",
            TimeOps.parseTimestamp(date_format($"ds", "dd-MM-yyyy HH:mm")).as("rt"))
          .filter($"rt" =!= date_trunc("minute", $"ds")).count() == 0
      }
    }

  property("grain normalization is total and a fixpoint over accepted spellings") =
    Prop.forAll(Gen.oneOf("D", "W", "M", "H", "m", "min", "T",
                          "day", "week", "month", "hour", "minute")) { g =>
      val n = TimeOps.normalizeGrain(g)
      Set("D", "W", "M", "H", "m")(n) && TimeOps.normalizeGrain(n) == n
    }
}
