package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Full reference-pipeline composition (SURVEY §3.1-3.2) over one coherent
  * literal world: network build → evidence propagation → associations →
  * drug bundles → new-drug hypotheses → AE-containment scoring.
  */
class PipelineEndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("end-to-end: evidences through associations to scored hypotheses") {
    // --- network: G1–G2 interact (accessions P1/P2)
    val edges = Seq(("P1", "P2")).toDF("A", "B")
    val genes = Seq(("P1", "G1"), ("P2", "G2")).toDF("accession", "id")
    val lut = DrugDisease.networkLut(edges, genes)

    // --- evidences: strong genetics on (G1, D1) only
    val evs = Seq(
      ("G1", "D1", "e1", 0.9, 0.0),
      ("G1", "D1", "e2", 0.8, 0.4)
    ).toDF("target_id", "disease_id", "evs_id", "genetics", "europepmc")

    // --- propagate across the network: evidence reaches G2 too
    val propagated = DrugDisease.propagate(evs, lut)
      .drop("target_id").withColumnRenamed("propagated_id", "target_id")
    val assoc = DrugDisease.makeAssociations(
      propagated, Seq(col("target_id"), col("disease_id")))
    val byTargetAssoc = assoc.select(col("target_id"), col("harmonic"))
      .as[(String, Double)].collect().toMap
    // both targets scored identically: genetics [0.9,0.8] -> 0.9 + 0.2 = 1.1
    // europepmc [0.4,0.0] -> 0.4; combine: 1.1 + (0.4*0.2)/4 = 1.12
    assert(byTargetAssoc.keySet == Set("G1", "G2"))
    assert(math.abs(byTargetAssoc("G1") - 1.12) < 1e-9)

    // --- drug world: d1 treats D1 already; d2 targets G2 (MoA) but is not
    //     used for D1 -> the repurposing hypothesis
    val drugs = Seq(
      ("d1", "DrugOne", 4L, Seq.empty[String]),
      ("d2", "DrugTwo", 3L, Seq("G2", "G1"))
    ).toDF("drug_id", "drug_name", "max_clinical_trial_phase", "target_ids")
    val aesByDrug = Seq(("d1", Seq("nausea")), ("d2", Seq("nausea", "rash")))
      .toDF("drug_id", "aes")
    val aggregations = Seq(("d1", "D1")).toDF("drug_id", "disease_id")

    val forDisease = DrugDisease.drugsForDisease(drugs, aesByDrug, aggregations)
    val forTarget = DrugDisease.drugsForTarget(drugs, aesByDrug.toDF("target_id", "aes"))

    val decorated = assoc
      .join(forDisease, Seq("disease_id"), "left_outer")
      .join(forTarget.select(col("target_id"), col("drugs_for_target")),
        Seq("target_id"), "left_outer")
      .where(col("drugs_for_target").isNotNull)
    val hyp = DrugDisease.newDrugs(decorated)
      .withColumn("disease_aes_from_drugs", lit(Array("nausea", "headache")))
    val hypRows = hyp.select(col("target_id"), col("new_drugs"))
      .as[(String, Seq[String])].collect().toMap
    // d2 reaches G1 and G2; d1 is already a D1 drug -> new only d2
    assert(hypRows.values.toSet == Set(Seq("d2")))

    // --- AE containment: d2 aes {nausea, rash} vs disease {nausea, headache}
    // s1 = 1 - 1/2 = 0.5 ; s2 = 1 - 1/2 = 0.5 ; blend = 0.5
    val scored = DrugDisease.scoreHypotheses(
      hyp.select(col("disease_id"), col("target_id"),
        col("new_drugs").as("hypotheses"), col("disease_aes_from_drugs")),
      aesByDrug)
    val out = scored
      .select(col("target_id"), col("drug_hypothesis"),
        round(col("drug_hypothesis_disease_aes_score"), 6).as("s"))
      .as[(String, String, Double)].collect().toSet
    assert(out == Set(("G1", "d2", 0.5), ("G2", "d2", 0.5)))
  }
}
