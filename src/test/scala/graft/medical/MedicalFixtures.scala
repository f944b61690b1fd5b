package graft.medical

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Synthetic fixture cohorts per FIXTURES.md §5: seed-fixed, with every
  * pathology the cleaning/quality stages exist for — comma-decimal numbers,
  * "prawda"/"" and "tak"/"nie" booleans, 0/1 ints, nulls, out-of-range
  * values (SUV>70, TBR>1) and |z|>3 outliers. */
object MedicalFixtures {

  private def rng = new scala.util.Random(20240812L)

  def studyRaw(spark: SparkSession): DataFrame = {
    val r = rng
    def comma(v: Double): String = f"$v%.2f".replace('.', ',')
    def prawda(): String = if (r.nextBoolean()) "prawda" else ""
    def tak(): String = if (r.nextBoolean()) "tak" else "nie"
    val rows = (1 to 30).map { i =>
      val suv = if (i == 7) 85.0 else 2.0 + r.nextDouble() * 8 // one >70 violation
      val bg = 0.5 + r.nextDouble() * 2
      val tbr = if (i == 9) 1.4 else r.nextDouble() * 0.9 // one >1 violation
      Row(
        if (i == 30) null else (if (r.nextBoolean()) "Mężczyzna" else "Kobieta"),
        f"19${40 + r.nextInt(40)}%2d-01-15",
        f"2021-${1 + r.nextInt(12)}%02d-10",
        f"2020-${1 + r.nextInt(12)}%02d-05",
        comma(suv), comma(bg), comma(tbr),
        if (i % 5 == 0) null else comma(1.0 + r.nextDouble() * 40), // CRP nulls
        comma(4.0 + r.nextDouble() * 8),
        comma(200 + r.nextDouble() * 150), comma(70 + r.nextDouble() * 60),
        prawda(), prawda(), prawda(), prawda(), prawda(), prawda(), prawda(),
        prawda(), prawda(), prawda(), prawda(), prawda(), prawda(),
        tak(), tak(), tak(),
        r.nextInt(2), r.nextInt(2), r.nextInt(2), r.nextInt(2), r.nextInt(2), r.nextInt(2),
        r.nextInt(2), r.nextInt(2), r.nextInt(2), r.nextInt(2),
        if (r.nextBoolean()) "ob. nacz. biodrowe" else "aorty piersiowej",
        if (r.nextBoolean()) "StentGraft" else "Proteza",
        Seq("Dakron", "PTFE", "inny")(r.nextInt(3)),
        (1 + r.nextInt(5)).toString, (1 + r.nextInt(3)).toString,
        Seq("A", "B", "C")(r.nextInt(3)))
    }
    val bools = Seq("cukrzyca", "zgon", "Ogniskowe gromadzenie znacznika",
      "Nieregularne zarysy", "PecherzykiGazu", "przetokaPachwinowa",
      "Obszar plynowy w okolicy", "Naciek zapalny w okolicy",
      "Skrzeplina w okolicy miejsca podejrzanego o zapalenie",
      "wysiekZatarcieTluszczu", "przetoka ropna", "activeLymphNodes",
      "tetniakRzekomyObraz")
    val schema = StructType(
      Seq(StructField("Płeć", StringType),
        StructField("Rok urodzenia", StringType),
        StructField("Data badania", StringType),
        StructField("Data operacji", StringType),
        StructField("SUV (max) w miejscu zapalenia", StringType),
        StructField("SUV (max) tła", StringType),
        StructField("tumor to background ratio", StringType),
        StructField("CRP(6 mcy)", StringType),
        StructField("WBC(6 mcy)", StringType),
        StructField("Podana Aktywnosc", StringType),
        StructField("Glikemia", StringType)) ++
      bools.map(StructField(_, StringType)) ++
      Seq(StructField("Gorączka", StringType),
        StructField("tętniak", StringType),
        StructField("Otyłość", StringType),
        StructField("przyczyna - tętniak", IntegerType),
        StructField("przyczyna - niedrożność", IntegerType),
        StructField("przyczyna - uraz", IntegerType),
        StructField("przyczyna - inne", IntegerType),
        StructField("lok - aorta brzuszna", IntegerType),
        StructField("okolica rozwidlenia", IntegerType),
        StructField("lewe ramie", IntegerType),
        StructField("prawe ramie", IntegerType),
        StructField("proteza dodatni", IntegerType),
        StructField("krew +", IntegerType),
        StructField("uproszczona klasyfikacja", StringType),
        StructField("Rodzaj protezy", StringType),
        StructField("Material", StringType),
        StructField("skala5Stopnie", StringType),
        StructField("skala3Stopnie", StringType),
        StructField("imageTypeOurClassification", StringType)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  def controlRaw(spark: SparkSession): DataFrame = {
    val r = rng
    def comma(v: Double): String = f"$v%.2f".replace('.', ',')
    val rows = (1 to 25).map { i =>
      Row(
        if (i == 25) null else f"2021-${1 + r.nextInt(12)}%02d-20",
        f"20${10 + r.nextInt(10)}%2d-06-01",
        f"2022-${1 + r.nextInt(12)}%02d-11",
        1930 + r.nextInt(50),
        comma(if (i == 3) 40.0 else 1.0 + r.nextDouble() * 3), // one z-outlier
        comma(0.5 + r.nextDouble()),
        comma(150 + r.nextDouble() * 200), comma(60 + r.nextDouble() * 80),
        r.nextInt(2), r.nextInt(2), r.nextInt(2), r.nextInt(2), r.nextInt(2),
        Seq("kontrola", "inne")(r.nextInt(2)),
        if (r.nextBoolean()) "stentgraft" else "proteza",
        if (r.nextBoolean()) "Y" else "B",
        (1 + r.nextInt(5)).toString, (1 + r.nextInt(3)).toString,
        if (r.nextBoolean()) "Mężczyzna" else "Kobieta")
    }
    val schema = StructType(Seq(
      StructField("data badania 1", StringType),
      StructField("data wszczepienia stentgraftu", StringType),
      StructField("ostatnia wizyta pacjenta bez stwierdzonego zakażenia protezy", StringType),
      StructField("Rok z peselu", IntegerType),
      StructField("SUV protezy", StringType),
      StructField("tło", StringType),
      StructField("aktywnosc w dniu podania [MBq]", StringType),
      StructField("glukoza w dniu podania [mg/dl]", StringType),
      StructField("proteza udowo - podkolanowa", IntegerType),
      StructField("przetoka pachwinowa", IntegerType),
      StructField("cukrzyca", IntegerType),
      StructField("zarejestrowany zgon", IntegerType),
      StructField("reoperacje", IntegerType),
      StructField("powód standaryzowany", StringType),
      StructField("stentgraft czy proteza", StringType),
      StructField("typ", StringType),
      StructField("skala5Stopnie", StringType),
      StructField("skala3Stopnie", StringType),
      StructField("Płeć", StringType)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  def twoPointRaw(spark: SparkSession): DataFrame = {
    val r = rng
    def comma(v: Double): String = f"$v%.2f".replace('.', ',')
    def prawda(): String = if (r.nextBoolean()) "prawda" else ""
    val rows = (1 to 12).map { i =>
      Row(
        if (i == 12) null else f"2020-${1 + r.nextInt(12)}%02d-01",
        f"2021-${1 + r.nextInt(12)}%02d-01",
        f"2019-${1 + r.nextInt(12)}%02d-01",
        comma(2.0 + r.nextDouble() * 6), comma(0.5 + r.nextDouble()),
        comma(2.0 + r.nextDouble() * 6), comma(0.5 + r.nextDouble()),
        comma(200 + r.nextDouble() * 100),
        prawda(), prawda(),
        r.nextInt(2),
        (1 + r.nextInt(5)).toString, (1 + r.nextInt(3)).toString)
    }
    val schema = StructType(Seq(
      StructField("Data badania wcześniejsze", StringType),
      StructField("Data badania późniejsze", StringType),
      StructField("Data operacji", StringType),
      StructField("SUV (max) w miejscu zapalenia44", StringType),
      StructField("SUV (max) tła45", StringType),
      StructField("SUV (max) w miejscu zapalenia71", StringType),
      StructField("SUV (max) tła72", StringType),
      StructField("Podana aktywność badanie wcześniejsze", StringType),
      StructField("Nieregularne zarysy48", StringType),
      StructField("PecherzykiGazu49", StringType),
      StructField("lokalizacja ogniska podwyższonego gromadzenia33", IntegerType),
      StructField("skala5StopnieStudy1", StringType),
      StructField("skala3StopnieStudy1", StringType)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }
}
