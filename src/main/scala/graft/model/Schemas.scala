package graft.model

import org.apache.spark.sql.types._

/** Fixed entity schemas of the catalog data model — the Spark
  * re-expression of the reference's 24 concrete models
  * (/root/reference/tantalus/models.py; SURVEY §1.1) plus the hidden
  * M2M bridge tables. Conventions:
  *  - FK / OneToOne → `<rel>_id` LongType + referential equi-join;
  *  - M2M → explicit bridge table `(a_id, b_id)`;
  *  - choice fields → StringType validated at write;
  *  - polymorphic Storage → one table, `storage_type` discriminator +
  *    nullable subtype columns (/root/reference/tantalus/api/serializers.py:22-31);
  *  - NullBooleanField → nullable BooleanType (three-valued);
  *  - every entity has an append-only `historical_<entity>` twin with
  *    history columns (django-simple-history analog).
  */
object Schemas {

  private def f(n: String, t: DataType, nullable: Boolean = true) = StructField(n, t, nullable)
  private val id = LongType
  private val S  = StringType
  private val TS = TimestampType

  // --- core account / tagging / organization ---
  val user = StructType(Seq(
    f("id", id, nullable = false), f("username", S, nullable = false), f("email", S),
    f("is_active", BooleanType)))
  val tag     = StructType(Seq(f("id", id, nullable = false), f("name", S, nullable = false), f("owner_id", id)))
  val project = StructType(Seq(f("id", id, nullable = false), f("name", S, nullable = false)))

  // --- specimen hierarchy (models.py:82-182) ---
  val patient = StructType(Seq(
    f("id", id, nullable = false), f("patient_id", S, nullable = false),
    f("reference_id", S), f("external_patient_id", S), f("case_id", S)))
  val sample = StructType(Seq(
    f("id", id, nullable = false), f("sample_id", S, nullable = false),
    f("external_sample_id", S), f("patient_id", id), f("submitter", S),
    f("researcher", S), f("tissue", S), f("note", S),
    f("is_reference", BooleanType))) // NullBoolean: three-valued

  // --- library / sequencing (models.py:185-327) ---
  val libraryType = StructType(Seq(
    f("id", id, nullable = false), f("name", S, nullable = false), f("description", S)))
  val dnaLibrary = StructType(Seq(
    f("id", id, nullable = false), f("library_id", S, nullable = false),
    f("library_type_id", id), f("index_format", S), // ∈ {S,D,TENX,N}
    f("owner_id", id)))
  val sequencingLane = StructType(Seq(
    f("id", id, nullable = false), f("flowcell_id", S, nullable = false),
    f("lane_number", S), // '' .. '9'
    f("dna_library_id", id), f("sequencing_centre", S), // ∈ {GSC,BRC,IGO}
    f("sequencing_instrument", S), f("sequencing_library_id", S),
    f("read_type", S))) // ∈ {P,S,TENX}

  // --- files (models.py:330-418) ---
  val fileResource = StructType(Seq(
    f("id", id, nullable = false), f("filename", S, nullable = false),
    f("md5", S), f("size", LongType), f("created", TS), f("last_updated", TS),
    f("is_folder", BooleanType), f("owner_id", id)))
  val sequenceFileInfo = StructType(Seq(
    f("id", id, nullable = false), f("file_resource_id", id, nullable = false), // OneToOne
    f("read_end", IntegerType), f("genome_region", S), f("index_sequence", S)))

  // --- analysis / datasets (models.py:421-770) ---
  val referenceGenome = StructType(Seq(f("id", id, nullable = false), f("name", S, nullable = false)))
  val alignmentTool = StructType(Seq(
    f("id", id, nullable = false), f("name", S, nullable = false), f("description", S)))
  val analysisType = StructType(Seq(f("id", id, nullable = false), f("name", S, nullable = false)))
  val analysis = StructType(Seq(
    f("id", id, nullable = false), f("name", S, nullable = false),
    f("analysis_type_id", id), f("jira_ticket", S), f("version", S), // semver v\d+.\d+.\d+
    f("status", S), f("last_updated", TS),
    f("args", S), // free-form JSON (Postgres JSONField) → get_json_object/from_json
    f("owner_id", id)))
  val sequenceDataset = StructType(Seq(
    f("id", id, nullable = false), f("name", S, nullable = false),
    f("dataset_type", S), // ∈ {BAM,FQ,BCL}
    f("version_number", IntegerType), f("sample_id", id), f("library_id", id),
    f("analysis_id", id), f("reference_genome_id", id), f("aligner_id", id),
    f("region_split_length", IntegerType), f("is_production", BooleanType),
    f("note", S), f("last_updated", TS), f("owner_id", id)))
  val resultsDataset = StructType(Seq(
    f("id", id, nullable = false), f("name", S, nullable = false),
    f("results_type", S), f("results_version", S), f("analysis_id", id), // SET_NULL
    f("is_production", BooleanType), f("owner_id", id)))

  // --- storages: polymorphic single table (models.py:773-883) ---
  val storage = StructType(Seq(
    f("id", id, nullable = false), f("name", S, nullable = false),
    f("storage_type", S, nullable = false), // ∈ {server,blob,s3}
    f("server_ip", S), f("storage_directory", S), f("username", S), // server
    f("storage_account", S), f("storage_container", S),             // azure blob
    f("bucket", S)))                                                // aws s3
  val fileInstance = StructType(Seq(
    f("id", id, nullable = false), f("storage_id", id, nullable = false),
    f("file_resource_id", id, nullable = false), f("is_deleted", BooleanType),
    f("owner_id", id))) // unique (file_resource_id, storage_id)

  // --- submissions / curations (models.py:923-1116) ---
  val sow = StructType(Seq(f("id", id, nullable = false), f("name", S, nullable = false)))
  val submission = StructType(Seq(
    f("id", id, nullable = false), f("sample_id", id),
    f("sow_id", id), f("library_type_id", id),
    f("submission_date", S), // string in the reference!
    f("submitted_by", S), f("lanes_sequenced", IntegerType), f("coverage", IntegerType),
    f("updated_goal", S), f("payment", S), f("data_path", S)))
  val curation = StructType(Seq(
    f("id", id, nullable = false), f("name", S, nullable = false), f("description", S),
    f("version", S), f("created", TS), f("updated", TS), f("owner_id", id), f("user_id", id)))
  val curationDataset = StructType(Seq( // explicit through-table
    f("id", id, nullable = false), f("curation_id", id, nullable = false),
    f("sequence_dataset_id", id, nullable = false), f("version", S)))

  // --- M2M bridge tables (hidden in Django, explicit here) ---
  private def bridge(a: String, b: String) =
    StructType(Seq(f(a, id, nullable = false), f(b, id, nullable = false)))
  val sampleProjects           = bridge("sample_id", "project_id")
  val datasetTags              = bridge("sequence_dataset_id", "tag_id")
  val datasetFileResources     = bridge("sequence_dataset_id", "file_resource_id")
  val datasetLanes             = bridge("sequence_dataset_id", "sequencing_lane_id")
  val analysisTags             = bridge("analysis_id", "tag_id")
  val analysisInputDatasets    = bridge("analysis_id", "sequence_dataset_id")
  val analysisInputResults     = bridge("analysis_id", "results_dataset_id")
  val analysisLogs             = bridge("analysis_id", "file_resource_id")
  val resultsTags              = bridge("results_dataset_id", "tag_id")
  val resultsSamples           = bridge("results_dataset_id", "sample_id")
  val resultsLibraries         = bridge("results_dataset_id", "dna_library_id")
  val resultsFileResources     = bridge("results_dataset_id", "file_resource_id")

  /** history twin: full row copy + history columns (simple_history). */
  def historical(entity: StructType): StructType =
    StructType(entity.fields ++ Seq(
      f("history_id", id, nullable = false), f("history_date", TS, nullable = false),
      f("history_type", S, nullable = false), // + / ~ / -
      f("history_user_id", id)))

  /** Every named table schema of the catalog. */
  val all: Map[String, StructType] = Map(
    "user" -> user, "tag" -> tag, "project" -> project, "patient" -> patient,
    "sample" -> sample, "library_type" -> libraryType, "dna_library" -> dnaLibrary,
    "sequencing_lane" -> sequencingLane, "file_resource" -> fileResource,
    "sequence_file_info" -> sequenceFileInfo, "reference_genome" -> referenceGenome,
    "alignment_tool" -> alignmentTool, "analysis_type" -> analysisType,
    "analysis" -> analysis, "sequence_dataset" -> sequenceDataset,
    "results_dataset" -> resultsDataset, "storage" -> storage,
    "file_instance" -> fileInstance, "sow" -> sow, "submission" -> submission,
    "curation" -> curation, "curation_dataset" -> curationDataset,
    "sample_projects" -> sampleProjects, "dataset_tags" -> datasetTags,
    "dataset_file_resources" -> datasetFileResources, "dataset_lanes" -> datasetLanes,
    "analysis_tags" -> analysisTags, "analysis_input_datasets" -> analysisInputDatasets,
    "analysis_input_results" -> analysisInputResults, "analysis_logs" -> analysisLogs,
    "results_tags" -> resultsTags, "results_samples" -> resultsSamples,
    "results_libraries" -> resultsLibraries, "results_file_resources" -> resultsFileResources,
  )
}
