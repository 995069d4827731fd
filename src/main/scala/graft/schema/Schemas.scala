package graft.schema

import org.apache.spark.sql.types._

/** Explicit StructTypes for every reference input (FIXTURES.md §B; fields
  * derived from the loader projections at the cited reference lines). The
  * reference inferred all 12 JSON schemas on read (SURVEY §1.3) — declaring
  * them kills the inference pass and makes corrupt-record capture possible.
  */
object Schemas {

  /** drugs (sc:93-107; MoA nesting sc:409). */
  val drugs: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("type", StringType),
    StructField("pref_name", StringType),
    StructField("max_clinical_trial_phase", LongType),
    StructField("number_of_mechanisms_of_action", LongType),
    StructField("indications", ArrayType(StructType(Seq(
      StructField("efo_id", StringType))))),
    StructField("mechanisms_of_action", ArrayType(StructType(Seq(
      StructField("target_components", ArrayType(StructType(Seq(
        StructField("ensembl", StringType)))))))))))

  /** targets/genes (sc:109-132, accession LUT sc:20-24, 56-58). */
  val targets: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("approved_symbol", StringType),
    StructField("biotype", StringType),
    StructField("hgnc_id", StringType),
    StructField("uniprot_accessions", ArrayType(StringType)),
    StructField("go", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("value", StructType(Seq(
        StructField("term", StringType))))))))))

  /** diseases/EFO (sc:159-188). */
  val diseases: StructType = StructType(Seq(
    StructField("code", StringType),
    StructField("label", StringType),
    StructField("path_codes", ArrayType(ArrayType(StringType))),
    StructField("phenotypes", ArrayType(StringType)),
    StructField("therapeutic_codes", ArrayType(StringType))))

  /** literature evidences (sc:222-235). */
  val evidences: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("sourceID", StringType),
    StructField("disease", StructType(Seq(StructField("id", StringType)))),
    StructField("target", StructType(Seq(StructField("id", StringType)))),
    StructField("scores", StructType(Seq(
      StructField("association_score", DoubleType))))))

  /** PPI interactions (sc:13-76). */
  val interactions: StructType = StructType(Seq(
    StructField("interactorA_uniprot_name", StringType),
    StructField("interactorB_uniprot_name", StringType),
    StructField("mi_score", DoubleType),
    StructField("source_databases", ArrayType(StringType))))

  /** aggregated drugs (sc:277-289). */
  val aggregations: StructType = StructType(Seq(
    StructField("disease_id", StringType),
    StructField("drug_id", StringType),
    StructField("associated_diseases", ArrayType(StringType)),
    StructField("associated_targets", ArrayType(StringType))))

  /** GWAS studies parquet (sc:205-206). */
  val studies: StructType = StructType(Seq(
    StructField("study_id", StringType),
    StructField("trait_reported", StringType),
    StructField("trait_efos", ArrayType(StringType)),
    StructField("trait_category", StringType)))

  /** L2G predictions parquet (sc:208-209). */
  val predictions: StructType = StructType(Seq(
    StructField("study_id", StringType),
    StructField("chrom", StringType),
    StructField("pos", LongType),
    StructField("ref", StringType),
    StructField("alt", StringType),
    StructField("y_proba_all_features", DoubleType),
    StructField("gene_id", StringType)))

  /** FAERS significant AEs by drug (sc:237-255). */
  val faersByDrug: StructType = StructType(Seq(
    StructField("chembl_id", StringType),
    StructField("event", StringType),
    StructField("count", LongType),
    StructField("llr", DoubleType),
    StructField("critval", DoubleType)))

  /** FAERS significant AEs by target (sc:257-275). */
  val faersByTarget: StructType = StructType(Seq(
    StructField("target_id", StringType),
    StructField("event", StringType),
    StructField("report_count", LongType),
    StructField("llr", DoubleType),
    StructField("critval", DoubleType)))

  /** baseline expression (sc:79-90). */
  val expression: StructType = StructType(Seq(
    StructField("gene", StringType),
    StructField("tissues", ArrayType(StructType(Seq(
      StructField("efo_code", StringType),
      StructField("rna", StructType(Seq(StructField("zscore", DoubleType)))),
      StructField("protein", StructType(Seq(StructField("level", DoubleType))))))))))

  /** whitelist (optional source, sc:377-378). */
  val whitelist: StructType = StructType(Seq(
    StructField("whitelist_id", StringType),
    StructField("whitelist", ArrayType(StringType))))
}
