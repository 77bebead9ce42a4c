package graft

import org.apache.spark.sql.functions._
import graft.pipelines.Geographies

/** The full geography rename stage (reference R/rename_geographies.R:36-268
  * + data-raw/run_rename_geographies.R:5-173) on a synthetic bench_regions.
  */
class GeographyStageSpec extends SparkTestBase {
  import spark.implicits._

  test("cleanBenchRegions: EU drop, new-geo resolution incl. remaps, NA iso, dedup, recount") {
    val bench = Seq(
      ("Europe", "Germany", "DE"),
      ("Europe", "European Union", "EU"),       // ambiguous pseudo-country -> dropped
      ("Africa", "Namibia", "NA"),              // Namibia's iso2 IS the string "NA"
      ("Africa", "Egypt", "EG"),
      ("Africa", "Egypt, Arab Rep.", "EG"))     // duplicate (geo, iso) -> one survivor
      .toDF("scenario_geography", "country", "country_iso")
    val newGeos = Seq(
      ("Coastal China", "China"),               // resolved via codelist
      ("Indochina", "Viet Nam"))                // resolved via the curated remap
      .toDF("scenario_geography", "country")
    val codelist = Seq(("Germany", "DE"), ("Egypt", "EG"), ("China", "CN"),
      ("Vietnam", "VN"), ("Namibia", "NA"))
      .toDF("country", "country_iso")
    val out = Geographies.cleanBenchRegions(bench, newGeos, codelist).cache()
    assert(out.filter(col("country_iso") === "EU").count() == 0)
    assert(out.filter(col("scenario_geography") === "Coastal China")
      .select("country_iso").as[String].head() == "CN")
    assert(out.filter(col("scenario_geography") === "Indochina")
      .select("country_iso").as[String].head() == "VN")
    // Namibia survives with its literal "NA" iso, codelist name joined back
    val namibia = out.filter(col("scenario_geography") === "Africa" &&
      col("country_iso") === "NA")
    assert(namibia.count() == 1)
    assert(namibia.select("country").as[String].head() == "Namibia")
    // dedup: one Egypt row, spelled from the codelist
    val egypt = out.filter(col("country_iso") === "EG")
    assert(egypt.count() == 1)
    assert(egypt.select("country").as[String].head() == "Egypt")
    // reg_count after dedup: Africa has Namibia + Egypt = 2
    assert(egypt.select("reg_count").as[Long].head() == 2)
  }

  test("regroupAndRenameGeographies end-to-end: grouping, standardization, input rename, containment") {
    // EU and European Union hold identical country sets -> grouped under the
    // longest name, which then standardizes; the other sets are disjoint
    // (a subset-pair would also group — overlap is asymmetric in the
    // reference — so the fixture keeps them properly distinct)
    val bench = Seq(
      ("EU", "DE"), ("EU", "FR"),
      ("European Union", "DE"), ("European Union", "FR"),
      ("Oil & Gas Belt (R5)", "SA"), ("Oil & Gas Belt (R5)", "AE"),
      ("Asia", "CN"), ("Asia", "JP"))
      .toDF("scenario_geography", "country_iso")
    val inputA = Seq(("EU", 1.0), ("Asia", 2.0)).toDF("scenario_geography", "v")
    val inputB = Seq(("Oil & Gas Belt (R5)", 3.0)).toDF("scenario_geography", "v")
    val (benchOut, renamed) =
      Geographies.regroupAndRenameGeographies(bench, Seq(inputA, inputB), matchingTol = 1.0)
    val newNames = benchOut
      .select("scenario_geography", "scenario_geography_newname")
      .as[(String, String)].collect().toMap
    assert(newNames("EU") == "EuropeanUnion")
    assert(newNames("European Union") == "EuropeanUnion")
    assert(newNames("Oil & Gas Belt (R5)") == "OilAndGasBelt")
    assert(newNames("Asia") == "Asia")
    // inputs renamed through the same mapping
    assert(renamed.head.select("scenario_geography").as[String].collect().toSet ==
      Set("EuropeanUnion", "Asia"))
    assert(renamed(1).select("scenario_geography").as[String].head() == "OilAndGasBelt")
  }

  test("regroupAndRenameGeographies rejects duplicate (geography, iso) pairs") {
    val bench = Seq(("EU", "DE"), ("EU", "DE")).toDF("scenario_geography", "country_iso")
    val input = Seq(("EU", 1.0)).toDF("scenario_geography", "v")
    intercept[graft.core.DataChecks.CheckFailed] {
      Geographies.regroupAndRenameGeographies(bench, Seq(input))
    }
  }

  test("getAllUniqueGeographies: sorted distinct union across frames") {
    val a = Seq(("Global", 1), ("EU", 2)).toDF("scenario_geography", "x")
    val b = Seq(("Asia", 3), ("Global", 4)).toDF("scenario_geography", "y")
    val out = Geographies.getAllUniqueGeographies(Seq(a, b))
      .as[String].collect().toSeq
    assert(out == Seq("Asia", "EU", "Global"))
  }
}
