package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ops.{Normalize, Dedup, Combine, Ids, Cascade, Zip, TemporalJoin, Pack, Components}
import graft.validate.Validations
import graft.state.History
import graft.mapping.RawDict
import graft.io.{Jsonl, Tsv}
import graft.ext.{TextAnalysis, TextDedup, Similarity, Multimodal, EntityResolution}

import SparkEntry._

/** [[SparkEntry]] family slice: reference-pipeline families (q relational, p projection/normalize, j joins/ids, a aggregation/dedup, v validations, h history).
  * Entry text moved VERBATIM from SparkEntry.scala (round-12 split);
  * the maps are reassembled by concatenation there — keys and oracle
  * text fingerprint-identical (graft.Fingerprint). */
private[graft] object SparkEntryCore {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- headline relational queries (engine bread-and-butter) ---

    // Scan + filter (pushed to parquet) + hash aggregate with map-side
    // partials: the canonical 100 TB-friendly shape.
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= ts("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // 3-way join: small filtered dims broadcast, big fact streamed.
    "q3_shipping_priority" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < ts("1998-01-01"))
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > ts("1996-03-15"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // Star join through region→nation→customer→orders→lineitem; the dim
    // chain collapses to broadcasts, one shuffle for the final group-by.
    "q5_region_revenue" -> ((s, dir) => {
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    }),

    // --- SURVEY §2.2: projection / cleansing ---

    // P1 dict-driven projection+rename (+ P9 literal type column), with the
    // all-null probe folded into one aggregate pass.
    "p1_project_rename" -> ((s, dir) => {
      RawDict.extract(
        t(s, dir, "lineitem"),
        Seq("l_orderkey" -> "order_id", "l_partkey" -> "part_id",
          "l_quantity" -> "qty", "l_returnflag" -> "return_flag"),
        node = "lineitem")
    }),

    // P3 blank→null + P4 trim over string columns.
    "p3_p4_normalize" -> ((s, dir) => {
      val padded = t(s, dir, "documents").select(
        col("doc_id"),
        concat(lit("  "), col("source"), lit("  ")).as("source_padded"),
        lit(" ").as("blank_col"))
      val cleaned = Normalize.blanksToNull(Normalize.trimAll(padded))
      cleaned.select(col("doc_id"), col("source_padded").as("source_clean"), col("blank_col"))
    }),

    // P5 clean-dict enum normalization — all reference branches
    // (cds_transformation_functions.py:31-48): enum member wins over a
    // conflicting mapping, dirty values map (incl. →null), NULL fills from
    // nan_value, extra-long values collapse to "Not specified in data".
    "p5_enum_clean" -> ((s, dir) => {
      val longVal = "x" * 60 // stand-in for a yaml-unkeyable extra-long value
      val mapping: Map[String, Option[String]] = Map(
        "building" -> Some("Building"), "automobile" -> Some("Automobile"),
        "machinery" -> Some("Machinery"), "household" -> Some("Household"),
        "furniture" -> Some("Furniture"), "n/a" -> None,
        // enum precedence probe: 'Building' is IN the enum, so this
        // mapping must never fire
        "Building" -> Some("WRONG-enum-should-win"))
      val enumVals = Seq("Building", "Automobile", "Machinery", "Household", "Furniture")
      val seg = lower(col("c_mktsegment"))
      val raw = when(col("c_custkey") % 7 === 0, lit(null).cast("string"))
        .when(col("c_custkey") % 11 === 0, lit(longVal))
        .when(col("c_custkey") % 5 === 0,
          concat(upper(substring(seg, 1, 1)), substring(seg, 2, 1000)))
        .otherwise(seg)
      t(s, dir, "customer").select(
        col("c_custkey"),
        Normalize.cleanValues(raw, mapping, enumVals,
          nanValue = Some("Unknown"), extraLongValues = Seq(longVal))
          .as("segment_clean"))
    }),

    // P2 fuzzy matching at data level: best dictionary candidate per
    // distinct value by edit distance (the schema-level Ratcliff–Obershelp
    // matcher is driver-side, RawDict.fuzzyMatch; levenshtein is its
    // data-scale analog — codegen'd built-in, broadcast dictionary).
    "p2_fuzzy_match" -> ((s, dir) => {
      val candidates = Seq("building", "automobile", "machines", "household", "furnishings")
      val cands = s.createDataFrame(candidates.map(Tuple1(_))).toDF("candidate")
      t(s, dir, "customer")
        .select(lower(col("c_mktsegment")).as("segment")).distinct()
        .crossJoin(broadcast(cands))
        .withColumn("dist", levenshtein(col("segment"), col("candidate")).cast("long"))
        .groupBy(col("segment"))
        .agg(min_by(col("candidate"), struct(col("dist"), col("candidate"))).as("best_match"),
          min(col("dist")).as("dist"))
    }),

    // P7 drop rows all-null over the original-prop subset.
    "p7_drop_allnull" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(
        col("doc_id"),
        when(col("source") === "src0", lit(null)).otherwise(col("source")).as("a"),
        when(col("lang") === "en", lit(null)).otherwise(col("lang")).as("b"))
      Dedup.dropAllNullRows(d, Seq("a", "b"))
    }),

    // P10 deterministic surrogate id (sha2 of natural columns — replaces
    // the reference's random ids for replay stability).
    "p10_synthetic_id" -> ((s, dir) => {
      t(s, dir, "customer").select(
        col("c_custkey"),
        Ids.deterministicId(Seq(col("c_name"), col("c_nationkey"))).as("synthetic_id"))
    }),

    // P6 lossless integer coercion on string-rendered numerics.
    "p6_int_coerce" -> ((s, dir) => {
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("string").as("qty_raw"),
        Normalize.losslessInt(col("l_quantity").cast("string")).as("qty_int"))
    }),

    // --- SURVEY §2.4: dedup / group-merge / set ops ---

    // A1 stringified exact dedup.
    "a1_dedup_stringified" -> ((s, dir) => {
      Dedup.stringified(
        t(s, dir, "lineitem").select(
          col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("string").as("qty")))
    }),

    // A2 combine_rows group-merge (sorted distinct values, ", "-joined).
    "a2_combine_rows" -> ((s, dir) => {
      Combine.combineRows(
        t(s, dir, "orders").select(
          col("o_custkey"), col("o_orderpriority"), col("o_orderstatus")),
        id = "o_custkey",
        cols = Seq("o_orderpriority", "o_orderstatus"))
    }),

    // A3 duplicate-key detection.
    "a3_duplicate_keys" -> ((s, dir) => {
      Validations.duplicateIds(t(s, dir, "lineitem"), "l_orderkey")
    }),

    // A4 conflict-column classification for duplicated ids.
    "a4_conflict_columns" -> ((s, dir) => {
      Validations.conflictColumns(
        t(s, dir, "lineitem"), "l_orderkey", Seq("l_returnflag", "l_linestatus"))
    }),

    // A6+H1+H2 historical set-merge: known values ∪ new values, sorted
    // desc, comma-joined (History.merge is the engine's state-table op).
    "a6_history_merge" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val updates = o
        .groupBy(col("o_custkey").as("key"))
        .agg(collect_set(year(col("o_orderdate")).cast("string")).as("values"))
      val state = o.select(col("o_custkey").as("key")).distinct()
        .withColumn("values", array(lit("1994")))
      History.merge(state, updates)
        .select(col("key").as("o_custkey"), array_join(col("values"), ",").as("versions"))
    }),

    // A5 null-parent intersection: rows whose parent pointers are ALL null
    // (single filter — the reference's per-column lists + set intersection
    // collapse to one predicate).
    // A10 whole-schema referential-integrity sweep (the FK dashboard
    // generalizing a5's single intersection): one row per FK edge with
    // child cardinality and orphan count. Each edge is a left join +
    // conditional count — parent side DISTINCT-projected to its key
    // first (a join against raw parent rows would fan out duplicate-key
    // parents); nation-sized parents broadcast, the rest shuffle on the
    // key they aggregate on. Five independent 1-row aggregates union at
    // the driver — no cross-edge dependency, so AQE runs them as
    // separate cheap jobs.
    "a10_fk_sweep" -> ((s, dir) => {
      def edge(fk: String, child: DataFrame, ck: String,
               parent: DataFrame, pk: String): DataFrame = {
        val p = parent.select(col(pk)).distinct()
          .withColumn("__hit", lit(1))
        child.select(col(ck))
          .join(p, child(ck) === p(pk), "left")
          .agg(count(lit(1)).as("n_child"),
            sum(when(col(ck).isNotNull && col("__hit").isNull, 1L)
              .otherwise(0L)).as("n_orphans"))
          .select(lit(fk).as("fk"), col("n_child"), col("n_orphans"))
      }
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val su = t(s, dir, "supplier")
      val pa = t(s, dir, "part"); val na = t(s, dir, "nation")
      edge("lineitem.l_orderkey", li, "l_orderkey", o, "o_orderkey")
        .unionAll(edge("lineitem.l_partkey", li, "l_partkey", pa, "p_partkey"))
        .unionAll(edge("orders.o_custkey", o, "o_custkey", c, "c_custkey"))
        .unionAll(edge("customer.c_nationkey", c, "c_nationkey", na, "n_nationkey"))
        .unionAll(edge("supplier.s_nationkey", su, "s_nationkey", na, "n_nationkey"))
    }),

    // A11 header/detail reconciliation: recompute each order's total from
    // its lineitems (TPC-H charge formula) and reconcile against the
    // header column — the rollup-integrity audit a10's key-existence
    // sweep can't see. Both sides land in exact CENTS (round(x*100) —
    // never round-to-2dp-then-scale, which re-floats the boundary) before
    // the compare. Shape: one map-side-combinable detail aggregate keyed
    // on orderkey + one co-keyed left join from the header table.
    "a11_reconcile" -> ((s, dir) => {
      val charge = col("l_extendedprice") *
        (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))
      val detail = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(round(sum(charge) * 100).cast("long").as("detail_cents"))
      t(s, dir, "orders")
        .join(detail, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("header_cents"),
          col("detail_cents"),
          when(col("l_orderkey").isNull, lit("no_detail"))
            .when(round(col("o_totalprice") * 100).cast("long") ===
              col("detail_cents"), lit("match"))
            .otherwise(lit("mismatch")).as("status"))
    }),

    // A12 — k-anonymity / l-diversity privacy audit (Sweeney 2002;
    // Machanavajjhala 2007): the release gate beside the PII sweep.
    // Quasi-identifiers = (nation, segment); sensitive = account
    // balance. ONE map-side-combinable aggregate; groups under k=5
    // members or l=3 distinct balances flag re-identification /
    // homogeneity risk.
    "a12_k_anonymity" -> ((s, dir) => {
      Validations.kAnonymity(
        t(s, dir, "customer").select(
          col("c_nationkey").cast("long").as("nation"),
          col("c_mktsegment").as("segment"),
          col("c_acctbal").as("balance")),
        quasi = Seq("nation", "segment"), sensitive = "balance",
        k = 5, l = 3)
    }),

    "a5_orphans" -> ((s, dir) => {
      val d = t(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "F", lit(null))
          .otherwise(col("o_custkey").cast("string")).as("fk1"),
        when(col("o_orderpriority").startsWith("1"), lit(null))
          .otherwise(col("o_orderpriority")).as("fk2"))
      Validations.orphans(d, Seq("fk1", "fk2"))
    }),

    // A7 distinct id list.
    "a7_distinct_ids" -> ((s, dir) => {
      t(s, dir, "orders").select(col("o_custkey")).distinct()
    }),

    // V7 pipeline e2e gate: the full v1.3 pipeline (normalize → project →
    // stringified dedup → conflict detection → cascade delete) over a
    // deterministic wide fixture derived from customer — planted id
    // collisions (custkey % 700) make some participants carry conflicting
    // genders; those ids must be detected and cascaded out. The oracle
    // recomputes the surviving node rows in SQL, so the driver
    // hash-judges the pipeline END TO END, not just its operators.
    "v7_pipeline_e2e" -> ((s, dir) => {
      import graft.pipeline.Pipeline
      // ~2 customers per participant id at EVERY scale factor (mod = n/2),
      // so the fixture always carries a mix of conflicting and clean ids —
      // a fixed modulus degenerates to all-conflict (everything cascaded)
      // or no-collision as the SF moves. The oracle derives the same
      // modulus with a scalar subquery.
      val mod = participantMod(s, dir)
      val wide = t(s, dir, "customer").select(
        (col("c_custkey") % mod).cast("string").as("participant_id"),
        lower(col("c_mktsegment")).as("gender"))
      val spec = Pipeline.NodeSpec("participant",
        rawMapping = Seq("participant_id" -> "participant_id", "gender" -> "gender"),
        idProp = "participant_id")
      Pipeline.run(wide, Seq(spec)).nodes("participant")
    }),

    // V16 — the v1.3 pipeline under the REAL reference artifacts end to
    // end: specs come from Pipeline.specsFromYaml over the ACTUAL
    // cds-model.yml + 8,022-line props + curated v1.3 raw/clean dicts +
    // cds_config_example_v1.3.yaml (the reference's OWN key shapes:
    // NODE_ID_FIELD dict, list-shaped PARENT_MAPPING_COLUMNS /
    // COMBINE_NODE / COMBINE_COLUMN / SECONDARY_ID_COLUMN). The wide
    // Metadata fixture carries the real raw column names; study +
    // participant flow through the full stage chain — P3/P4, P1 under
    // the real raw dict, J5 pointer + J7 compound id from the real
    // config, A1, A2 for study (real COMBINE_NODE), P5 under the real
    // clean dict (map, out-of-enum quirk MALE→male, typo keys, in-enum
    // passthrough, junk passthrough — all real entries), V1 id
    // validation. Output: v14-style per-node fingerprints; the oracle
    // recomputes both nodes relationally with the real dict entries
    // pinned as literals.
    "v16_real_config_e2e" -> ((s, dir) => {
      import graft.pipeline.Pipeline
      val mod = participantMod(s, dir)
      val seg = col("c_mktsegment")
      val wide = t(s, dir, "customer").select(
        lit("phs002529").as("phs_accession"),
        concat(lit("Study Part "), (col("c_custkey") % 3).cast("string"))
          .as("study_name"),
        lit("v1.2.p2").as("study_version"),
        (col("c_custkey") % mod).cast("string").as("participant_id"),
        when(seg === "AUTOMOBILE", lit("male"))       // dict → Male
          .when(seg === "BUILDING", lit("FEMALE"))    // dict → Female
          .when(seg === "FURNITURE", lit("MALE"))     // dict → male (real quirk: maps OUT of enum)
          .when(seg === "HOUSEHOLD", lit("Female"))   // in-enum passthrough
          .otherwise(lit("unknown gender")).as("gender"), // junk passthrough
        when(seg === "AUTOMOBILE", lit("not hispanic or latino"))
          .when(seg === "BUILDING", lit("Unkown"))    // typo key → Unknown
          .when(seg === "FURNITURE", lit("Hispanic or Latino")) // in-enum
          .otherwise(lit("hispanic or latino")).as("ethnicity"),
        when(seg === "AUTOMOBILE", lit("Other"))      // dict → Not Reported
          .when(seg === "BUILDING", lit("Not Reported;Unknown"))
          .when(seg === "FURNITURE", lit("White"))    // in-enum
          .otherwise(lit("Unkown")).as("race"),
        concat(lit("S"), (col("c_custkey") % mod).cast("string"))
          .as("dbGaP_subject_id"))
      val (specs, removeNodes) = Pipeline.specsFromYaml(
        slurp(refArtifact("3-Model-Files/cds-model.yml")),
        slurp(refArtifact("3-Model-Files/cds-model-props.yml")),
        slurp(refArtifact("2-Config-Files/cds_config_v1.3/cds_raw_dict_v1.3.yaml")),
        slurp(refArtifact("2-Config-Files/cds_config_v1.3/cds_clean_dict_v1.3.yaml")),
        slurp(refArtifact("2-Config-Files/cds_config_v1.3/cds_config_example_v1.3.yaml")))
      val keep = specs.filter(sp => Set("study", "participant")(sp.name))
      val res = Pipeline.run(wide, keep, removeNodes)
      res.nodes.toSeq.sortBy(_._1).map { case (name, df) =>
        Validations.tableFingerprint(df, df.columns.sorted.toSeq)
          .select(lit(name).as("node"), col("n_rows"), col("fingerprint"))
      }.reduce(_.union(_))
    }),

    // V17 — the v1.2 MULTI-SHEET pipeline under the reference's REAL
    // v1.2 artifacts, unedited (round-15; v16's discipline for the older
    // generation): MultiSheet.specsFromV12Yaml parses
    // cds_config_example_v1.2.yaml verbatim and follows ITS OWN pointers
    // to cds_raw_dict_v1.2.yaml (real renames exercised:
    // number_of_participant→number_of_participants), cds-model-props.yml
    // (enum vocabularies + integer props), and the v1.3 clean dict the
    // config names in CLEAN_DICT. A 7-sheet SF-adaptive workbook whose
    // raw column names are the REAL dict keys flows through the full
    // v14 stage chain — extract, guid file_id fallback, diagnosis
    // same-row pointer, J4 study broadcast, both J3 mapping legs, and
    // the REAL clean stage (gender male→Male / MALE→male out-of-enum
    // quirk / F→Female, sample_type map-to-NULL 'Invalid value',
    // library_strategy wxs→WXS, tumor_stage enum-no-dict passthrough,
    // file_size + age_at_diagnosis integer coercion, number-typed
    // number_of_participants untouched — every routing re-verified
    // against the artifacts with an independent pyyaml replay). Output:
    // v14-style per-node fingerprints; the oracle recomputes all six
    // node frames relationally with the real dict entries as literals.
    "v17_real_v12_config_e2e" -> ((s, dir) => {
      import graft.pipeline.MultiSheet
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      def cached(df: DataFrame): DataFrame =
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (specs, clean, _) = MultiSheet.specsFromV12Yaml(
        slurp(refArtifact(
          "2-Config-Files/cds_config_v1.2/cds_config_example_v1.2.yaml")),
        p => slurp(refArtifact(p.stripPrefix("./"))))
      val seg = col("c_mktsegment")
      val sheets = Map(
        "Study" -> s.range(1).select(
          lit("phs002529").as("phs_accession"),
          lit("CDS v1.2 Fixture Study").as("study_name"),
          lit("250").as("number_of_participant")),
        "Participant" -> cust.select(
          concat(lit("P"), col("c_custkey")).as("participant_id"),
          when(seg === "AUTOMOBILE", lit("male"))   // dict → Male
            .when(seg === "BUILDING", lit("MALE"))  // dict → male (out-of-enum)
            .when(seg === "FURNITURE", lit("Female")) // in-enum passthrough
            .when(seg === "HOUSEHOLD", lit("F"))    // dict → Female
            .otherwise(lit("unknown gender")).as("gender"), // junk passthrough
          concat(lit("S"), col("c_custkey")).as("dbGaP_subject_id")),
        "Sample" -> cached(ord.join(li.select(col("l_orderkey")).distinct(),
            col("o_orderkey") === col("l_orderkey"), "left_semi")
          .select(
            concat(lit("S"), col("o_orderkey")).as("sample_id"),
            when(col("o_orderpriority") === "1-URGENT",
                lit("peripheral blood - Blood Derived Cancer")) // dict → Blood
              .when(col("o_orderpriority") === "2-HIGH",
                lit("Tissue Biospecimen Type"))                 // dict → Tissue
              .when(col("o_orderpriority") === "3-MEDIUM",
                lit("Invalid value"))                           // dict → NULL
              .when(col("o_orderpriority") === "4-NOT SPECIFIED",
                lit("Blood"))                                   // in-enum
              .otherwise(lit("mystery tissue")).as("sample_type"))), // junk
        "File" -> cached(li.select(
          concat(lit("f_"), col("l_orderkey"), lit("_"), col("l_linenumber"),
            lit(".bam")).as("file_name"),
          col("l_quantity").cast("string").as("file_size"), // P6 coercion
          // no file_id column → the :66-73 guid fallback must find it
          concat(lit("G"), col("l_orderkey"), lit("_"),
            col("l_linenumber")).as("guid"))),
        "Genomic Info" -> ord.filter(col("o_orderkey") % 7 === 0).select(
          concat(lit("L"), col("o_orderkey")).as("library_id"),
          when(col("o_orderstatus") === "O", lit("wxs"))   // dict → WXS
            .when(col("o_orderstatus") === "F", lit("WGS")) // in-enum
            .otherwise(lit("junk strategy")).as("library_strategy")),
        "Diagnosis (opt)" -> cust.filter(col("c_custkey") % 3 === 0).select(
          concat(lit("D"), col("c_custkey")).as("diagnosis_id"),
          when(col("c_custkey") % 5 === 0, lit("n/a")) // unparseable: verbatim
            .otherwise(concat((col("c_custkey") % 90).cast("string"),
              lit(".0"))).as("age_at_diagnosis"),      // '45.0' → '45'
          when(col("c_custkey") % 2 === 0, lit("M0"))  // in-enum
            .otherwise(lit("M9")).as("tumor_stage_clinical_m"), // junk
          concat(lit("P"), col("c_custkey")).as("participant_id")),
        "File-Participant-Sample Mapping" -> cached(li
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(
            concat(lit("G"), col("l_orderkey"), lit("_"),
              col("l_linenumber")).as("file_id"),
            concat(lit("S"), col("l_orderkey")).as("sample_id"),
            concat(lit("P"), col("o_custkey")).as("participant_id"),
            (col("l_orderkey") * 100 + col("l_linenumber")).as("row_order"))))
      val nodes = MultiSheet.transform(sheets, specs, clean)
      nodes.toSeq.sortBy(_._1).map { case (name, df) =>
        Validations.tableFingerprint(df, df.columns.sorted.toSeq)
          .select(lit(name).as("node"), col("n_rows"), col("fingerprint"))
      }.reduce(_.union(_))
    }),

    // V8 validation-REPORT gate: v7 judges the surviving rows; this judges
    // the report frames themselves — the reference's actual user-facing
    // deliverable (id_validation_result.tsv + ssn scan,
    // cds-transformation_v1.3.py:170-182, cds_transformation_functions
    // .py:197-207). Same SF-adaptive fixture as v7 plus a notes column
    // carrying planted SSN-shaped strings on every 11th customer; the
    // oracle recomputes both report frames relationally, so a regression
    // in conflict-column rendering (order, join separator) or in the SSN
    // sweep fails the hash.
    "v8_reports" -> ((s, dir) => {
      import graft.pipeline.Pipeline
      val mod = participantMod(s, dir)
      val ssnish = concat(lit("note "),
        lpad((col("c_custkey") % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((col("c_custkey") % 100).cast("string"), 2, "0"), lit("-"),
        lpad((col("c_custkey") % 10000).cast("string"), 4, "0"))
      val wide = t(s, dir, "customer").select(
        (col("c_custkey") % mod).cast("string").as("participant_id"),
        lower(col("c_mktsegment")).as("gender"),
        when(col("c_custkey") % 11 === 0, ssnish).otherwise(lit("clean")).as("notes"))
      val spec = Pipeline.NodeSpec("participant",
        rawMapping = Seq("participant_id" -> "participant_id",
          "gender" -> "gender", "notes" -> "notes"),
        idProp = "participant_id",
        ssnScanProp = Some("notes"))
      val res = Pipeline.run(wide, Seq(spec))
      val idv = res.reports("id_validation_participant").select(
        lit("id_validation_participant").as("report"),
        col("participant_id").as("key"), col("cnt"),
        col("conflicted_columns").as("detail"))
      val ssn = res.reports("ssn_participant").select(
        lit("ssn_participant").as("report"), col("notes").as("key"),
        lit(null).cast("long").as("cnt"), col("ssn_matches").as("detail"))
      idv.unionByName(ssn)
    }),

    // V9 INCREMENTAL pipeline, driver-judged: the v7 fixture lands as
    // parquet files in a landing directory and flows through the real
    // Structured Streaming path — foreachBatch → SeenKeys cross-batch
    // dedup → the same Pipeline.run as batch → per-node parquet appends
    // with replay markers. Two AvailableNow runs against one checkpoint:
    // run 1 processes the fixture; run 2 sees the SAME rows re-delivered
    // as new files (the re-submitted-workbook case) and must drop every
    // one of them via SeenKeys. The appended node output is hash-judged
    // against the BATCH v7 oracle — so a divergence between incremental
    // and batch execution, a broken replay marker, or a SeenKeys
    // regression (re-admitted rows double the appends) fails the gate.
    // V10 column profiling (data-quality reconnaissance): one global
    // aggregate over one scan — count/nulls/exact-distinct/min/max per
    // column, stat rows fanned out from the single result row. Exact
    // distinct = Expand x(ncols+1) before one shuffle (disclosed cost;
    // approx_count_distinct variant is the Expand-free 100 TB default,
    // plan-pinned in PlanShapeSpec). Typed min/max rendered AFTER
    // aggregation with fixed formats (%.2f, second-resolution ts).
    "v10_profile" -> ((s, dir) => {
      graft.ops.Profile.profile(
        t(s, dir, "orders"),
        render = Map(
          "o_totalprice" -> ((c: Column) => format_string("%.2f", c)),
          "o_orderdate" -> ((c: Column) => date_format(c, "yyyy-MM-dd HH:mm:ss"))))
    }),

    // V11 batch-drift report: both batches' profiles from ONE conditional
    // aggregate over ONE scan (count/distinct/min/max under when(isNew,c)
    // — no self-join of two profile passes). Batch label = orderkey
    // parity (deterministic at every SF). Expand x(2N+1) disclosed as in
    // v10; approx tier plan-pinned Expand-free.
    "v11_drift" -> ((s, dir) => {
      graft.ops.Profile.drift(
        t(s, dir, "orders"),
        isNew = col("o_orderkey") % 2 === 1,
        render = Map(
          "o_totalprice" -> ((c: Column) => format_string("%.2f", c)),
          "o_orderdate" -> ((c: Column) => date_format(c, "yyyy-MM-dd HH:mm:ss"))))
    }),

    // V12 equi-width histogram of order value — the distribution view
    // v10's min/max row can't give. Money is cast to exact cents BEFORE
    // bucketing so assignment is pure long arithmetic (((v-lo)*20) div
    // span): a float width would floor boundary values differently across
    // engines. min/max are two driver scalars broadcast back as literals;
    // then ONE <=20-group map-side-combinable aggregate.
    "v12_histogram" -> ((s, dir) => {
      graft.ops.Profile.histogram(
        t(s, dir, "orders")
          .select(round(col("o_totalprice") * 100).cast("long").as("cents")),
        valueCol = "cents", nBuckets = 20)
    }),

    // V18 — declarative CONSTRAINT SUITE (round-16; the Deequ /
    // Great-Expectations "unit tests for data" shape, Schelter et al.
    // VLDB 2018): six constraints over customer compile into ONE
    // aggregate pass; the report is one row per constraint with the
    // measured metric in exact integers (bp ratios via `div`). Suite
    // mixes passing and FAILING constraints — segment uniqueness (dup
    // count), a deliberately-incomplete allowed set (violation count),
    // and a bounds check negative balances break — so both verdict
    // paths are hash-judged against the relational recomputation.
    "v18_check_suite" -> ((s, dir) => {
      import graft.validate.Checks
      import graft.validate.Checks._
      val c = t(s, dir, "customer").select(
        col("c_custkey"), col("c_name"), col("c_mktsegment"),
        expr("CAST(round(c_acctbal * 100) AS LONG)").as("bal_c"))
      Checks.run(c, Seq(
        Complete("c_name", 10000L),
        Unique("c_custkey"),
        Unique("c_mktsegment"),
        InSet("c_mktsegment",
          Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY")),
        Bounds("bal_c", 0L, 1000000000L),
        Matches("c_name", "^Customer#[0-9]{9}$", 10000L)))
    }),

    "v9_incremental" -> ((s, dir) => {
      import graft.pipeline.{Incremental, Pipeline}
      val root = s"$streamScratchDir/inc_${dirKey(dir)}"
      rmTree(root) // clean slate: appends/checkpoint/state are per-invocation
      val (in, out, ckpt, state) = (s"$root/in", s"$root/out", s"$root/ckpt", s"$root/state")
      val mod = participantMod(s, dir)
      val wide = t(s, dir, "customer").select(
        // row_key: the cross-batch content key (unique pre-dedup), carried
        // on the wide frame only — projectNode keeps it off the node
        col("c_custkey").cast("string").as("row_key"),
        (col("c_custkey") % mod).cast("string").as("participant_id"),
        lower(col("c_mktsegment")).as("gender"))
      wide.write.mode("overwrite").parquet(in)
      val schema = s.read.parquet(in).schema
      val spec = Pipeline.NodeSpec("participant",
        rawMapping = Seq("participant_id" -> "participant_id", "gender" -> "gender"),
        idProp = "participant_id")
      def runOnce(): Unit =
        Incremental.start(
          s.readStream.schema(schema).parquet(in), Seq(spec), out, ckpt,
          crossBatchKey = Some(("row_key", state)))
          .awaitTermination()
      runOnce()
      // re-deliver every row under new file names; SeenKeys must drop all
      new java.io.File(in).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .foreach { f =>
          java.nio.file.Files.copy(f.toPath,
            new java.io.File(in, s"redeliver_${f.getName}").toPath)
        }
      runOnce()
      s.read.parquet(s"$out/participant")
        .select(col("participant_id"), col("gender"), col("type"))
    }),

    // --- SURVEY §2.3: joins / FK wiring ---

    // J1 equi left join.
    "j1_left_join" -> ((s, dir) => {
      t(s, dir, "orders")
        .join(t(s, dir, "customer").select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"), "left")
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"), col("c_mktsegment"))
    }),

    // J3 first-match lookup join, deterministic via min_by.
    "j3_first_match" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          min(col("o_orderkey")).as("first_orderkey"),
          min_by(col("o_orderpriority"), col("o_orderkey")).as("first_priority"))
    }),

    // J7 compound-id synthesis with lossless numeric formatting.
    "j7_compound_id" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .select(
          col("c_custkey"),
          Combine.combineColumns(Seq(col("n_name"), col("c_custkey"), col("c_acctbal")))
            .as("compound_id"))
    }),

    // J2 positional zip: nation × region matched purely by row position
    // under explicit orderings; inner join truncates the longer side.
    "j2_positional_concat" -> ((s, dir) => {
      Zip.positional(
        t(s, dir, "nation").select(col("n_nationkey"), col("n_name")), Seq(col("n_nationkey")),
        t(s, dir, "region").select(col("r_name")), Seq(col("r_name")))
    }),

    // J4 broadcast scalar parent id: the single ASIA region key replicated
    // onto every nation row (1-row cross join → broadcast, no shuffle).
    "j4_broadcast_scalar" -> ((s, dir) => {
      val asia = t(s, dir, "region").filter(col("r_name") === "ASIA")
        .select(col("r_regionkey").as("asia_key"))
      t(s, dir, "nation").crossJoin(broadcast(asia))
        .select(col("n_nationkey"), col("n_name"), col("asia_key"))
    }),

    // J6 secondary-id backfill: node id falls back to the parent id
    // (computed same-row, pre-split — the wide-frame design of J5/J6).
    "j6_secondary_id" -> ((s, dir) => {
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        Ids.secondaryId(
          when(col("l_linenumber") > 4, lit(null)).otherwise(col("l_linenumber").cast("string")),
          col("l_orderkey").cast("string")).as("effective_id"))
    }),

    // J5 parent pointer: lineitem as the wide frame, each row projected
    // into a child node carrying its parent id as "{parent}.{prop}" —
    // same-row projection through Pipeline.projectNode, the exact code
    // path run() uses (no join, no shuffle).
    "j5_parent_pointer" -> ((s, dir) => {
      import graft.pipeline.Pipeline
      val spec = Pipeline.NodeSpec(
        name = "file",
        rawMapping = Seq("l_linenumber" -> "file_seq", "l_quantity" -> "quantity"),
        idProp = "file_seq",
        parents = Seq(Pipeline.ParentPointer("order", "order_id", "l_orderkey")))
      Pipeline.projectNode(t(s, dir, "lineitem"), spec)
        .select(col("file_seq"), col("quantity"),
          ColNames.q("order.order_id"), col("type"))
    }),

    // J8 recursive cascading delete: customers with negative balance are
    // deleted; their orders cascade; the orders' lineitems cascade.
    "j8_cascade_delete" -> ((s, dir) => {
      val customer = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      val lineitem = t(s, dir, "lineitem")
      val survivors = Cascade.delete(
        nodes = Map("customer" -> customer, "orders" -> orders, "lineitem" -> lineitem),
        parents = Map(
          "orders" -> Seq(Cascade.ParentRef("o_custkey", "customer", "c_custkey")),
          "lineitem" -> Seq(Cascade.ParentRef("l_orderkey", "orders", "o_orderkey"))),
        ids = Map("customer" -> "c_custkey", "orders" -> "o_orderkey", "lineitem" -> "l_orderkey"),
        seeds = Map("customer" -> customer.filter(col("c_acctbal") < 0).select(col("c_custkey"))))
      survivors("lineitem").groupBy(col("l_returnflag")).agg(count(lit(1)).as("cnt"))
    }),

    // --- SURVEY §2.5: validation workload ---

    // V1 composition: keep only rows whose id is conflict-free (unique).
    "v1_unique_only" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      Validations.uniqueRows(l, "l_orderkey")
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("cnt"))
    }),

    // V2 referential check: customers with no orders (anti join).
    "v2_missing_parents" -> ((s, dir) => {
      Validations.missingParents(
        t(s, dir, "customer"), "c_custkey",
        t(s, dir, "orders").select(col("o_custkey").as("c_custkey")), "c_custkey")
        .select(col("c_custkey"), col("c_name"))
    }),

    // V3 UI fill: nulls + absent required columns → "Not specified in data".
    // The exempted prop (experimental_strategy_and_data_subtypes,
    // cds_transformation_functions.py:322,333) is in the required list and
    // PRESENT with nulls — the fill must skip it, so its nulls survive to
    // the output (the reference's report-but-never-fill branch).
    "v3_ui_fill" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(
        col("doc_id"),
        when(col("source") === "src0", lit(null)).otherwise(col("source")).as("source_filled"),
        when(col("lang") === "en", lit(null)).otherwise(col("lang"))
          .as("experimental_strategy_and_data_subtypes"))
      Validations.uiFill(d,
          Seq("source_filled", "license", "experimental_strategy_and_data_subtypes"))
        .select(col("doc_id"), col("source_filled"), col("license"),
          col("experimental_strategy_and_data_subtypes"))
    }),

    // V13 property-validation report — V3's AUDIT leg: the rows the
    // reference accumulates into property_validation_df when a UI-required
    // property is absent from a node frame (Missing_Properties /
    // UI_Related / Raw_Data_File, cds-transformation_v1.3.py:105 +
    // cds_transformation_functions.py:318-329). Two node frames, the
    // reference's multi-node accumulation shape: `document` is missing
    // license + source_filled (source is PRESENT but nullable — filled,
    // never reported, the elif branch), `file` is missing file_size.
    // V15 — the v1 PRIMORDIAL generation END TO END
    // (cds-transformation.py:122-145): fuzzy substring scrape over an
    // ORDERED sheet list (last matching column wins, first matching sheet
    // anchors the rows), join-or-positional-concat accumulation (J1/J2),
    // the transposed scalar Study sheet (S3) replicated to manifest
    // length, the hardcoded add-properties table (join branch WITH the
    // full-row dedup, concat branch WITH truncation), hardcoded node
    // removals + participant's solo re-extract, and the study
    // column-drop + dedup epilogue. Fixture exercises every branch:
    // file_size is OVERWRITTEN by the SRA sheet (last match) and
    // positionally misaligned (SRA is a filtered slice — rows pair by
    // POSITION, not key); sample anchors on the manifest but takes its
    // values from the shorter Sample sheet (null padding), then the CGC
    // join branch multiplies via duplicate rows that the dedup collapses;
    // participant/genomic_info hit the truncation path. Output: per-node
    // (node, n_rows, fingerprint) rows as in v14.
    "v15_primordial_e2e" -> ((s, dir) => {
      import graft.pipeline.Primordial
      import org.apache.spark.sql.expressions.Window
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      // v1 positional semantics are sequential BY SPEC (a workbook's row
      // order is the alignment key), so the fixture's ordinals use the
      // un-partitioned row_number the reference's data sizes warrant —
      // measured cheaper than the distributed Zip.globalRank at BOTH
      // sf0.1 and sf1 (globalRank's per-call eager checkpoint + count
      // action costs more than one task sorting workbook-scale rows:
      // 7.2s vs 1.4s at sf0.1). Corpus-scale positional work goes
      // through Zip.globalRank instead (spec-pinned). The two
      // base-table ordinal assignments are CACHED (v14's discipline):
      // every lineitem/orders-derived sheet projects off one
      // materialized indexed frame, so each global sort runs once, not
      // once per sheet per consuming node branch (bench drain
      // unpersists after). Filtered sheets re-rank within their slice
      // off the precomputed __row — monotone in the original sort keys,
      // so one long sorts instead of the key tuple.
      def cached(df: DataFrame): DataFrame =
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val liIdx = cached(li.select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_partkey"),
        row_number().over(
          Window.orderBy(col("l_orderkey"), col("l_linenumber")))
          .cast("long").as("__row")))
      val ordIdx = cached(ord.select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"),
        row_number().over(Window.orderBy(col("o_orderkey")))
          .cast("long").as("__row")))
      def rerank(df: DataFrame): DataFrame = {
        val keep = df.columns.filterNot(_ == "__row").map(col)
        df.select(keep :+ row_number().over(Window.orderBy(col("__row")))
          .cast("long").as("__row"): _*)
      }
      val fileSheet = liIdx.select(
        concat(lit("f_"), col("l_orderkey"), lit("_"), col("l_linenumber"),
          lit(".bam")).as("File Name"),
        col("l_quantity").cast("string").as("File Size"),
        col("__row"))
      val giSheet = rerank(ordIdx.filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderstatus").as("Library Strategy"), col("__row")))
      val manifest = liIdx.select(
        concat(lit("G"), col("l_orderkey"), lit("_"), col("l_linenumber")).as("GUID"),
        lit("open").as("acl"),
        concat(lit("S"), col("l_orderkey")).as("sample_id"),
        concat(lit("L"), col("l_orderkey"), lit("_"), col("l_linenumber")).as("library_id"),
        col("__row"))
      val cgc = rerank(ordIdx
        .crossJoin(s.range(2).select(col("id").as("__dup")))
        .select(
          concat(lit("S"), col("o_orderkey")).as("Sample ID"),
          concat(lit("P"), col("o_custkey")).as("Participant ID"),
          (col("__row") * 2 + col("__dup")).as("__row")))
      val sra = rerank(liIdx.filter(col("l_linenumber") <= 3)
        .select(col("l_partkey").cast("string").as("file size"), col("__row")))
      val studyOneRow = s.range(1).select(
        lit("phs001424").as("phs_accession"),
        lit("Fixture Study").as("study_name"),
        lit("9 TB").as("size_of_data_being_uploaded"),
        lit("http://example.org/s").as("study_external_url"),
        lit("open").as("acl"))
      val studyDf = Primordial.scalarSheet(studyOneRow, manifest, "__row")
      val sampleSheet = rerank(ordIdx.filter(col("o_orderkey") % 2 === 0).select(
        concat(lit("S"), col("o_orderkey")).as("Sample ID"),
        col("o_orderpriority").as("Sample Type"), col("__row")))
      val participantSheet = cust.select(
        concat(lit("P"), col("c_custkey")).as("Participant ID"),
        lower(col("c_mktsegment")).as("Gender"),
        row_number().over(Window.orderBy(col("c_custkey"))).cast("long").as("__row"))
      val sheets = Seq(
        "File" -> fileSheet, "Genomic Info" -> giSheet,
        "CDS_Manifest" -> manifest, "CGC_CDS_Explorer" -> cgc,
        "SRA_Run_Selector" -> sra, "Study" -> studyDf, "Sample" -> sampleSheet)
      val model = Seq(
        "file" -> Seq("file_name", "file_size"),
        "genomic_info" -> Seq("library_strategy"),
        "sample" -> Seq("sample_id", "sample_type"),
        "study" -> Seq("phs_accession", "study_name",
          "size_of_data_being_uploaded", "study_external_url"),
        "participant" -> Seq("participant_id", "gender"),
        "diagnosis" -> Seq("diagnosis_id"))
      val nodes = Primordial.run(sheets, model,
        extraSheets = Map("Participant" -> participantSheet))
      nodes.toSeq.sortBy(_._1).map { case (name, df) =>
        Validations.tableFingerprint(df, df.columns.sorted.toSeq)
          .select(lit(name).as("node"), col("n_rows"), col("fingerprint"))
      }.reduce(_.union(_))
    }),

    // V14 — the v1.2 multi-sheet generation END TO END
    // (cds-transformation_v1.2.py:92-200), the way v7 gates v1.3: a
    // 7-sheet workbook shaped from the TPC-H tables (SF-adaptive row
    // counts) flows through MultiSheet.transform — blanks→null, per-sheet
    // COLUMN-keyed extract (an all-blank mapped column must be skipped),
    // the file_id GUID fallback, the diagnosis same-row parent pointer,
    // the J4 single-row study broadcast, both J3 mapping-sheet legs
    // (sample all-or-nothing, file gated on the sample leg), and the
    // P5/P6 clean (enum map, map-to-NULL, lossless int). One output row
    // per node: (node, n_rows, fingerprint) — the order-independent md5
    // checksum over every column sorted by name, so DuckDB's full
    // relational recomputation of each node frame must match value for
    // value, null for null.
    "v14_multisheet_e2e" -> ((s, dir) => {
      import graft.pipeline.MultiSheet
      import graft.pipeline.MultiSheet.{CleanSpec, SheetSpec}
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      // the lineitem-derived sheets feed SEVERAL node branches of the
      // final 6-way fingerprint union (file, sample semi-join, both J3
      // mapping legs); persisted, the 20-scan/28-exchange plan collapses
      // to one materialization each (bench drain unpersists after)
      def cached(df: DataFrame): DataFrame =
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sheets = Map(
        "Study" -> s.range(1).select(
          lit("phs001424").as("PHS Accession"),
          lit("CDS Fixture Study").as("Study Name")),
        "Participant" -> cust.select(
          concat(lit("P"), col("c_custkey")).as("Participant ID"),
          lower(col("c_mktsegment")).as("Gender"),
          lit("").as("Ethnicity")), // all-blank: extract must skip it
        // only orders that appear in the mapping sheet: one uncovered
        // sample would trip J3's all-or-nothing rule and (faithfully)
        // drop BOTH legs' columns — the drop branch is spec-tested, the
        // e2e gate exercises the kept path
        "Sample" -> cached(ord.join(li.select(col("l_orderkey")).distinct(),
            col("o_orderkey") === col("l_orderkey"), "left_semi")
          .select(
            concat(lit("S"), col("o_orderkey")).as("Sample ID"),
            col("o_orderpriority").as("Sample Type"))),
        "File" -> cached(li.select(
          concat(lit("f_"), col("l_orderkey"), lit("_"), col("l_linenumber"),
            lit(".bam")).as("File Name"),
          col("l_quantity").cast("string").as("File Size"),
          // unmapped by the dict -> the :66-73 fallback must find it
          concat(lit("G"), col("l_orderkey"), lit("_"), col("l_linenumber")).as("guid"))),
        "Genomic Info" -> ord.filter(col("o_orderkey") % 7 === 0).select(
          concat(lit("L"), col("o_orderkey")).as("Library ID"),
          col("o_orderstatus").as("Library Strategy")),
        "Diagnosis (opt)" -> cust.filter(col("c_custkey") % 3 === 0).select(
          concat(lit("D"), col("c_custkey")).as("Diagnosis ID"),
          col("c_mktsegment").as("Primary Diagnosis"),
          concat(lit("P"), col("c_custkey")).as("participant_id")),
        "File-Participant-Sample Mapping" -> cached(li
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(
            concat(lit("G"), col("l_orderkey"), lit("_"), col("l_linenumber")).as("file_id"),
            concat(lit("S"), col("l_orderkey")).as("sample_id"),
            concat(lit("P"), col("o_custkey")).as("participant_id"),
            (col("l_orderkey") * 100 + col("l_linenumber")).as("row_order"))))
      val specs = Seq(
        SheetSpec("study", "Study", Map(
          "PHS Accession" -> "phs_accession", "Study Name" -> "study_name")),
        SheetSpec("participant", "Participant", Map(
          "Participant ID" -> "participant_id", "Gender" -> "gender",
          "Ethnicity" -> "ethnicity")),
        SheetSpec("sample", "Sample", Map(
          "Sample ID" -> "sample_id", "Sample Type" -> "sample_type")),
        SheetSpec("file", "File", Map(
          "File Name" -> "file_name", "File Size" -> "file_size")),
        SheetSpec("genomic_info", "Genomic Info", Map(
          "Library ID" -> "library_id", "Library Strategy" -> "library_strategy")),
        SheetSpec("diagnosis", "Diagnosis (opt)", Map(
          "Diagnosis ID" -> "diagnosis_id",
          "Primary Diagnosis" -> "primary_diagnosis")))
      val clean = CleanSpec(
        enums = Map(
          "gender" -> Seq("male", "female"),
          "library_strategy" -> Seq("WGS", "WXS", "RNA-Seq")),
        cleanDict = Map(
          "gender" -> Map(
            "building" -> Some("male"), "automobile" -> Some("female"),
            "machinery" -> None),
          "library_strategy" -> Map(
            "O" -> Some("WGS"), "F" -> Some("WXS"), "P" -> None)),
        intProps = Seq("file_size"))
      val nodes = MultiSheet.transform(sheets, specs, clean)
      nodes.toSeq.sortBy(_._1).map { case (name, df) =>
        Validations.tableFingerprint(df, df.columns.sorted.toSeq)
          .select(lit(name).as("node"), col("n_rows"), col("fingerprint"))
      }.reduce(_.union(_))
    }),

    "v13_property_report" -> ((s, dir) => {
      val docFrame = t(s, dir, "documents").select(col("doc_id"), col("source"))
      val fileFrame = t(s, dir, "orders").select(col("o_orderkey").as("file_id"))
      Validations.uiMissingReport(docFrame, "document",
          Seq("license", "source", "source_filled"), "batch_2022-11-22.xlsx")
        .union(Validations.uiMissingReport(fileFrame, "file",
          Seq("file_id", "file_size"), "batch_2022-11-22.xlsx"))
    }),

    // V4 SSN scan (PII sweep). The corpus has no PII, so matches are
    // planted deterministically on every 50th doc to exercise the scan.
    "v4_ssn_scan" -> ((s, dir) => {
      val seeded = t(s, dir, "documents").select(
        col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 50 === 0, lit(" 123-45-6789")).otherwise(lit(""))).as("text"))
      Validations.ssnScanPortable(seeded, "text").select(col("doc_id"), col("ssn_matches"))
    }),

    // V5/enum-domain violations (P status is outside the modeled domain).
    "v5_enum_violations" -> ((s, dir) => {
      Validations.enumViolations(t(s, dir, "orders"), "o_orderstatus", Seq("O", "F"))
        .select(col("o_orderkey"), col("o_orderstatus"))
    }),

    // V6 regex-pattern property validation (model regex types §1.2, e.g.
    // md5sum ^[0-9a-fA-F]{32}$): non-null values that do NOT match.
    "v6_pattern_violations" -> ((s, dir) => {
      Validations.patternViolations(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        "source", "^src[0-9]$")
        .select(col("doc_id"), col("source"))
    }),

    // A8 list-type prop roundtrip (§1.2): comma-joined string → array ops
    // (distinct, sort) → ", "-joined at the sink, the model's list
    // serialization contract.
    "a8_list_serialize" -> ((s, dir) => {
      val parts = transform(
        split(col("o_orderpriority"), "-"), v => trim(v))
      t(s, dir, "orders").select(
        col("o_orderkey"),
        array_join(array_distinct(sort_array(parts)), ", ").as("priority_parts"))
    }),

    // P11 number-with-units normalization (§1.2 size/units props):
    // "N GB|TB|PB" → bytes; unknown unit → null. Sizes synthesized from
    // event ids (integer rendering — identical text in every engine).
    "p11_units_to_bytes" -> ((s, dir) => {
      val rendered = concat(
        pmod(col("event_id"), lit(1000)).cast("string"),
        element_at(array(lit(" GB"), lit(" TB"), lit(" PB"), lit(" zz")),
          (pmod(col("event_id"), lit(4)) + 1).cast("int")))
      t(s, dir, "events").select(
        col("event_id"), rendered.as("size_raw"),
        Normalize.unitsToBytes(rendered).as("size_bytes"))
    }),

    // H4 last-writer-wins upsert: latest event value per user merged over
    // the customer base (SCD-1) — one max_by-style aggregate + one join.
    "h4_upsert_latest" -> ((s, dir) => {
      val base = t(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
      val updates = t(s, dir, "events")
        .select(col("user_id"), col("value"), col("ts"), col("event_id"))
      History.upsertLatest(base, "c_custkey", "c_acctbal",
          updates, "user_id", "value", orderCols = Seq("ts", "event_id"))
        .select(col("c_custkey"), col("current_value"), col("updated"))
    }),

    // P12 pivot: nation x market-segment counts and balances as a wide
    // frame (explicit value domain — no extra distinct scan).
    "p12_pivot" -> ((s, dir) => {
      val wide = t(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .pivot("c_mktsegment", PivotSegments)
        .agg(count(lit(1)).as("cnt"), sum(floor(col("c_acctbal") * 100)).as("bal_c"))
      val outs = PivotSegments.flatMap { g =>
        Seq(coalesce(col(s"${g}_cnt"), lit(0L)).as(s"${g.toLowerCase}_cnt"),
          coalesce(col(s"${g}_bal_c"), lit(0L)).as(s"${g.toLowerCase}_bal_c"))
      }
      wide.select(col("c_nationkey") +: outs: _*)
    }),

    // H5 SCD-2 validity intervals: each event becomes a version row with
    // [valid_from, valid_to) — valid_to is the user's NEXT event, null
    // while current. One keyed window, no self-join (state.History.scd2).
    "h5_scd2" -> ((s, dir) => {
      History.scd2(
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"), col("ts")),
        key = "user_id", timeCol = "ts", tieBreak = "event_id")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("valid_from"), col("valid_to"))
    }),

    // H6 point-in-time (time-travel) read over the SCD2 table: the
    // consumer-side op h5 exists FOR — reconstruct every key's state as
    // of a cut timestamp. Cut is SF-adaptive (percentile_disc(0.5) of
    // event micros — an ACTUAL element, so both engines pick the
    // identical cut; w7's verified quantile_disc twin). Shape: h5's one
    // keyed lead-window, then a scan-stage interval filter — at 100 TB
    // a stored SCD2 table makes this filter-only (partition-prunable on
    // valid_from date).
    "h6_time_travel" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      // percentile_disc picks an actual element but types it DOUBLE;
      // micros (~2^51) are exactly representable, so the toLong is exact
      val cut = ev
        .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY unix_micros(ts))"))
        .head().getDouble(0).toLong
      History.scd2(ev, key = "user_id", timeCol = "ts", tieBreak = "event_id")
        .filter(unix_micros(col("valid_from")) <= cut &&
          (col("valid_to").isNull || unix_micros(col("valid_to")) > cut))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("valid_from"))
    }),

    // H7 snapshot diff (CDC derivation): two snapshots derived
    // deterministically from orders — keys absent from the old side become
    // inserts (%11==5), keys dropped from the new side become deletes
    // (%11==3), a +10.00 price bump (%7==0, exact fp addition — no
    // cross-engine rounding surface) becomes updates; matched-unchanged
    // keys (the overwhelming bulk at scale) are dropped. ONE union+groupBy
    // shuffle — see History.snapshotDiff for why not a full-outer join.
    "h7_snapshot_diff" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val old = o.filter(col("o_orderkey") % 11 =!= 5)
        .select(col("o_orderkey"), col("o_totalprice").as("price"))
      val neu = o.filter(col("o_orderkey") % 11 =!= 3)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 10.0)
            .otherwise(col("o_totalprice")).as("price"))
      History.snapshotDiff(old, neu, key = Seq("o_orderkey"),
        compare = Seq("price"))
    }),

    // Q6 rollup: nation x segment customer counts/balances WITH subtotal
    // and grand-total rows in one pass (native rollup = one shuffle that
    // carries all grouping sets; never one scan per level).
    "q6_rollup" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("sum_bal"))
    }),

    // P15 percentile winsorization (the numeric-capping twin of w10's
    // drop): per-type p1/p99 from one tiny exact-percentile aggregate
    // (w7 discipline — Spark percentile == DuckDB quantile_cont,
    // verified) BROADCAST back; the stream clips in the scan stage and
    // never shuffles. Clipped value rounded 6dp (ulp discipline); rows
    // inside the fences emit their raw value untouched.
    "p15_winsorize" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      val fences = ev.groupBy(col("event_type")).agg(
        expr("percentile(value, 0.01)").as("lo"),
        expr("percentile(value, 0.99)").as("hi"))
      ev.join(broadcast(fences), Seq("event_type"))
        .select(col("event_id"), col("event_type"), col("value"),
          round(least(greatest(col("value"), col("lo")), col("hi")), 6)
            .as("clipped"),
          (round(col("value") - col("lo"), 6) < 0 ||
            round(col("value") - col("hi"), 6) > 0)
            .cast("int").as("was_clipped"))
    }),

    // A9 order-independent table checksum: one scan, map-side-combined
    // 40-bit md5-term sum — the "did the copy keep every row" check that
    // costs a single row of output at any scale.
    "a9_fingerprint" -> ((s, dir) => {
      Validations.tableFingerprint(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_returnflag", "l_linestatus"))
    }),

    // P13 wide→long unpivot (melt) — the inverse of p12's pivot; Expand
    // node, shuffle-free, streams at scan speed.
    "p13_unpivot" -> ((s, dir) => {
      graft.ops.Reshape.melt(
        t(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"),
          col("c_nationkey").cast("double").as("c_nationkey")),
        ids = Seq("c_custkey"), values = Seq("c_acctbal", "c_nationkey"))
    }),

    // Q7 CUBE over (nation, segment) with grouping_id disambiguating the
    // subtotal slices — q6's rollup generalized to all 2^n groupings, still
    // one Expand + one hash aggregate.
    "q7_cube" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .cube(col("n_name"), col("c_mktsegment"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("sum_bal"))
    }),

    // P14 semi-structured extraction: schema-first from_json over the
    // events.props payload (codegen'd JsonToStructs — no UDF), then a
    // plain aggregate; the parse stays inside the scan's projection.
    "p14_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    }),

    // P16 multi-format timestamp normalization: each order's date is
    // rendered in one of three site-typed formats (ISO / US / EU by
    // key%3), then normalized back through the try_to_timestamp coalesce
    // chain — roundtrip equality against the original column judges the
    // parse itself. Zero-shuffle codegen projection; unparseable rows
    // surface as null, not an exception (reference's per-cell tolerance).
    "p16_date_parse" -> ((s, dir) => {
      val iso = "yyyy-MM-dd HH:mm:ss"
      val us = "MM/dd/yyyy HH:mm:ss"
      val eu = "dd.MM.yyyy HH:mm:ss"
      val raw = when(col("o_orderkey") % 3 === 0, date_format(col("o_orderdate"), iso))
        .when(col("o_orderkey") % 3 === 1, date_format(col("o_orderdate"), us))
        .otherwise(date_format(col("o_orderdate"), eu))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"), raw.as("raw"))
        .withColumn("parsed",
          Normalize.parseTimestampMulti(col("raw"), Seq(iso, us, eu)))
        .select(col("o_orderkey"), col("raw"), col("parsed"),
          (col("parsed") <=> col("o_orderdate")).cast("int").as("roundtrip_ok"))
    }),
  )

  val oracle: Map[String, String] = Map(

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT o_orderkey, o_orderdate,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1996-03-15'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,

    "p1_project_rename" ->
      """SELECT l_orderkey AS order_id, l_partkey AS part_id,
        |  l_quantity AS qty, l_returnflag AS return_flag,
        |  'lineitem' AS type
        |FROM lineitem""".stripMargin,

    "p3_p4_normalize" ->
      """SELECT doc_id,
        |  nullif(trim(concat('  ', source, '  ')), '') AS source_clean,
        |  CAST(NULL AS VARCHAR) AS blank_col
        |FROM documents""".stripMargin,

    "p5_enum_clean" ->
      """SELECT c_custkey,
        |  CASE
        |    WHEN c_custkey % 7 = 0 THEN 'Unknown'
        |    WHEN c_custkey % 11 = 0 THEN 'Not specified in data'
        |    WHEN c_custkey % 5 = 0
        |      THEN upper(substr(lower(c_mktsegment), 1, 1)) || substr(lower(c_mktsegment), 2)
        |    ELSE CASE lower(c_mktsegment)
        |      WHEN 'building' THEN 'Building'
        |      WHEN 'automobile' THEN 'Automobile'
        |      WHEN 'machinery' THEN 'Machinery'
        |      WHEN 'household' THEN 'Household'
        |      WHEN 'furniture' THEN 'Furniture'
        |      WHEN 'n/a' THEN NULL
        |      ELSE lower(c_mktsegment) END
        |  END AS segment_clean
        |FROM customer""".stripMargin,

    "p6_int_coerce" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_quantity AS VARCHAR) AS qty_raw,
        |  CASE WHEN TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) IS NOT NULL
        |        AND TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE)
        |            = floor(TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE))
        |        AND abs(TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE)) < 9007199254740992
        |    THEN CAST(CAST(TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS BIGINT) AS VARCHAR)
        |    ELSE CAST(l_quantity AS VARCHAR) END AS qty_int
        |FROM lineitem""".stripMargin,

    // No ties in this candidate set (each best distance is unique), so
    // arg_min/min_by agree without a tie-break.
    "p2_fuzzy_match" ->
      """WITH segs AS (SELECT DISTINCT lower(c_mktsegment) AS segment FROM customer),
        |cands AS (SELECT * FROM (VALUES ('building'), ('automobile'), ('machines'),
        |  ('household'), ('furnishings')) AS t(candidate))
        |SELECT segment,
        |  arg_min(candidate, levenshtein(segment, candidate)) AS best_match,
        |  CAST(min(levenshtein(segment, candidate)) AS BIGINT) AS dist
        |FROM segs CROSS JOIN cands GROUP BY segment""".stripMargin,

    "p7_drop_allnull" ->
      """SELECT doc_id,
        |  CASE WHEN source = 'src0' THEN NULL ELSE source END AS a,
        |  CASE WHEN lang = 'en' THEN NULL ELSE lang END AS b
        |FROM documents
        |WHERE NOT ((CASE WHEN source = 'src0' THEN NULL ELSE source END) IS NULL
        |       AND (CASE WHEN lang = 'en' THEN NULL ELSE lang END) IS NULL)""".stripMargin,

    "p10_synthetic_id" ->
      """SELECT c_custkey,
        |  sha256(concat_ws(chr(1),
        |    coalesce(CAST(c_name AS VARCHAR), chr(0)),
        |    coalesce(CAST(c_nationkey AS VARCHAR), chr(0)))) AS synthetic_id
        |FROM customer""".stripMargin,

    "j2_positional_concat" ->
      """WITH a AS (SELECT n_nationkey, n_name,
        |    CAST(row_number() OVER (ORDER BY n_nationkey) AS BIGINT) AS rn FROM nation),
        |b AS (SELECT r_name,
        |    CAST(row_number() OVER (ORDER BY r_name) AS BIGINT) AS rn FROM region)
        |SELECT a.rn AS rn, a.n_nationkey, a.n_name, b.r_name
        |FROM a JOIN b USING (rn)""".stripMargin,

    "j4_broadcast_scalar" ->
      """SELECT n_nationkey, n_name, asia_key
        |FROM nation CROSS JOIN
        |  (SELECT r_regionkey AS asia_key FROM region WHERE r_name = 'ASIA')""".stripMargin,

    "j5_parent_pointer" ->
      """SELECT l_linenumber AS file_seq, l_quantity AS quantity,
        |  l_orderkey AS "order.order_id", 'file' AS type
        |FROM lineitem""".stripMargin,

    "j6_secondary_id" ->
      """SELECT l_orderkey, l_linenumber,
        |  coalesce(
        |    CASE WHEN l_linenumber > 4 THEN NULL ELSE CAST(l_linenumber AS VARCHAR) END,
        |    CAST(l_orderkey AS VARCHAR)) AS effective_id
        |FROM lineitem""".stripMargin,

    // a10: DISTINCT parent keys before the join (duplicate-key parents
    // must not fan out child rows), orphan = non-null child key missing.
    "a10_fk_sweep" ->
      """SELECT 'lineitem.l_orderkey' AS fk, count(*) AS n_child,
        |  CAST(sum(CASE WHEN l_orderkey IS NOT NULL AND p.k IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
        |FROM lineitem
        |LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders) p
        |  ON l_orderkey = p.k
        |UNION ALL
        |SELECT 'lineitem.l_partkey', count(*),
        |  CAST(sum(CASE WHEN l_partkey IS NOT NULL AND p.k IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT)
        |FROM lineitem
        |LEFT JOIN (SELECT DISTINCT p_partkey AS k FROM part) p
        |  ON l_partkey = p.k
        |UNION ALL
        |SELECT 'orders.o_custkey', count(*),
        |  CAST(sum(CASE WHEN o_custkey IS NOT NULL AND p.k IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT)
        |FROM orders
        |LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) p
        |  ON o_custkey = p.k
        |UNION ALL
        |SELECT 'customer.c_nationkey', count(*),
        |  CAST(sum(CASE WHEN c_nationkey IS NOT NULL AND p.k IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT)
        |FROM customer
        |LEFT JOIN (SELECT DISTINCT n_nationkey AS k FROM nation) p
        |  ON c_nationkey = p.k
        |UNION ALL
        |SELECT 'supplier.s_nationkey', count(*),
        |  CAST(sum(CASE WHEN s_nationkey IS NOT NULL AND p.k IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT)
        |FROM supplier
        |LEFT JOIN (SELECT DISTINCT n_nationkey AS k FROM nation) p
        |  ON s_nationkey = p.k""".stripMargin,

    // p16: strftime renders the same three site formats; try_strptime is
    // the null-on-mismatch twin of try_to_timestamp.
    "p16_date_parse" ->
      """WITH r AS (
        |  SELECT o_orderkey, o_orderdate,
        |    CASE o_orderkey % 3
        |      WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
        |      WHEN 1 THEN strftime(o_orderdate, '%m/%d/%Y %H:%M:%S')
        |      ELSE strftime(o_orderdate, '%d.%m.%Y %H:%M:%S') END AS raw
        |  FROM orders),
        |p AS (
        |  SELECT o_orderkey, o_orderdate, raw,
        |    coalesce(try_strptime(raw, '%Y-%m-%d %H:%M:%S'),
        |             try_strptime(raw, '%m/%d/%Y %H:%M:%S'),
        |             try_strptime(raw, '%d.%m.%Y %H:%M:%S')) AS parsed
        |  FROM r)
        |SELECT o_orderkey, raw, parsed,
        |  CAST(parsed IS NOT DISTINCT FROM o_orderdate AS INT) AS roundtrip_ok
        |FROM p""".stripMargin,

    // a11: cents on both sides via round(x*100) — the same scale-then-
    // round the engine uses; a 2dp round first would re-float boundaries.
    "a11_reconcile" ->
      """WITH d AS (
        |  SELECT l_orderkey,
        |    CAST(round(sum(l_extendedprice * (1 - l_discount)
        |      * (1 + l_tax)) * 100) AS BIGINT) AS detail_cents
        |  FROM lineitem GROUP BY 1)
        |SELECT o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS header_cents,
        |  d.detail_cents,
        |  CASE WHEN d.l_orderkey IS NULL THEN 'no_detail'
        |       WHEN CAST(round(o_totalprice * 100) AS BIGINT) = d.detail_cents
        |         THEN 'match'
        |       ELSE 'mismatch' END AS status
        |FROM orders LEFT JOIN d ON o_orderkey = d.l_orderkey""".stripMargin,

    // a12: the flags recompute directly; count(DISTINCT) excludes NULLs
    // on both engines.
    "a12_k_anonymity" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |  c_mktsegment AS segment,
        |  count(*) AS group_n,
        |  count(DISTINCT c_acctbal) AS l_div,
        |  CAST(CASE WHEN count(*) >= 5 THEN 1 ELSE 0 END AS BIGINT) AS k_ok,
        |  CAST(CASE WHEN count(DISTINCT c_acctbal) >= 3 THEN 1 ELSE 0 END
        |    AS BIGINT) AS l_ok
        |FROM customer GROUP BY 1, 2""".stripMargin,

    "a5_orphans" ->
      """WITH d AS (SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'F' THEN NULL
        |       ELSE CAST(o_custkey AS VARCHAR) END AS fk1,
        |  CASE WHEN o_orderpriority LIKE '1%' THEN NULL
        |       ELSE o_orderpriority END AS fk2
        |FROM orders)
        |SELECT * FROM d WHERE fk1 IS NULL AND fk2 IS NULL""".stripMargin,

    "a7_distinct_ids" ->
      "SELECT DISTINCT o_custkey FROM orders",

    // v7: the surviving node rows after dedup + conflict-cascade,
    // recomputed relationally — after DISTINCT, an id conflicts iff it
    // carries more than one distinct gender.
    // v16: the real-config run recomputed relationally — the clean CASEs
    // pin the REAL clean-dict entries (incl. the MALE→male out-of-enum
    // quirk) and enum lists verbatim; fingerprints over the engine's
    // sorted column order.
    "v16_real_config_e2e" ->
      """WITH wide AS (
        |  SELECT 'phs002529' AS phs_accession,
        |    'Study Part ' || CAST(c_custkey % 3 AS VARCHAR) AS study_name,
        |    'v1.2.p2' AS study_version,
        |    CAST(c_custkey % (SELECT greatest(count(*) // 2, 1) FROM customer)
        |      AS VARCHAR) AS participant_id,
        |    CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 'male'
        |      WHEN 'BUILDING' THEN 'FEMALE' WHEN 'FURNITURE' THEN 'MALE'
        |      WHEN 'HOUSEHOLD' THEN 'Female' ELSE 'unknown gender' END AS gender,
        |    CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 'not hispanic or latino'
        |      WHEN 'BUILDING' THEN 'Unkown' WHEN 'FURNITURE' THEN 'Hispanic or Latino'
        |      ELSE 'hispanic or latino' END AS ethnicity,
        |    CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 'Other'
        |      WHEN 'BUILDING' THEN 'Not Reported;Unknown' WHEN 'FURNITURE' THEN 'White'
        |      ELSE 'Unkown' END AS race,
        |    'S' || CAST(c_custkey % (SELECT greatest(count(*) // 2, 1) FROM customer)
        |      AS VARCHAR) AS dbGaP_subject_id
        |  FROM customer),
        |pproj AS (
        |  SELECT DISTINCT dbGaP_subject_id, ethnicity, gender, participant_id, race,
        |    phs_accession AS study_phs,
        |    phs_accession || '_' || participant_id AS study_participant_id
        |  FROM wide),
        |pclean AS (
        |  SELECT DISTINCT dbGaP_subject_id,
        |    CASE WHEN ethnicity IN ('Hispanic or Latino','Not Hispanic or Latino',
        |        'Unknown','Not Reported','Not Allowed to Collect') THEN ethnicity
        |      WHEN ethnicity = 'not hispanic or latino' THEN 'Not Hispanic or Latino'
        |      WHEN ethnicity = 'hispanic or latino' THEN 'Hispanic or Latino'
        |      WHEN ethnicity = 'unknown' THEN 'Unknown'
        |      WHEN ethnicity = 'Unkown' THEN 'Unknown'
        |      ELSE ethnicity END AS ethnicity,
        |    CASE WHEN gender IN ('Female','Male','Unknown','Unspecified','Not Reported')
        |        THEN gender
        |      WHEN gender = 'female' THEN 'Female' WHEN gender = 'male' THEN 'Male'
        |      WHEN gender = 'F' THEN 'Female' WHEN gender = 'FEMALE' THEN 'Female'
        |      WHEN gender = 'M' THEN 'Male' WHEN gender = 'MALE' THEN 'male'
        |      ELSE gender END AS gender,
        |    participant_id,
        |    CASE WHEN race IN ('White','American Indian or Alaska Native',
        |        'Black or African American','Asian',
        |        'Native Hawaiian or Other Pacific Islander','Unknown','Not Reported',
        |        'Not Allowed to Collect') THEN race
        |      WHEN race = 'Unkown' THEN 'Unknown'
        |      WHEN race = 'Not Reported;Unknown' THEN 'Not Reported'
        |      WHEN race = 'Other' THEN 'Not Reported'
        |      ELSE race END AS race,
        |    study_phs, study_participant_id
        |  FROM pproj),
        |pbad AS (
        |  SELECT study_participant_id FROM pclean GROUP BY 1 HAVING count(*) > 1),
        |psurv AS (
        |  SELECT * FROM pclean
        |  WHERE study_participant_id NOT IN (SELECT study_participant_id FROM pbad)),
        |pfp AS (
        |  SELECT 'participant' AS node, count(*) AS n_rows,
        |    CAST(CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
        |      coalesce(dbGaP_subject_id, chr(0)), coalesce(ethnicity, chr(0)),
        |      coalesce(gender, chr(0)), coalesce(participant_id, chr(0)),
        |      coalesce(race, chr(0)), coalesce(study_phs, chr(0)),
        |      coalesce(study_participant_id, chr(0)), 'participant')), 1, 10))
        |      AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR) AS fingerprint
        |  FROM psurv),
        |sproj AS (
        |  SELECT DISTINCT phs_accession, study_name, study_version FROM wide),
        |scomb AS (
        |  SELECT phs_accession,
        |    array_to_string(list_sort(list_distinct(list(study_name))), ', ')
        |      AS study_name,
        |    array_to_string(list_sort(list_distinct(list(study_version))), ', ')
        |      AS study_version
        |  FROM sproj GROUP BY 1),
        |sfp AS (
        |  SELECT 'study' AS node, count(*) AS n_rows,
        |    CAST(CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
        |      coalesce(phs_accession, chr(0)), coalesce(study_name, chr(0)),
        |      coalesce(study_version, chr(0)), 'study')), 1, 10))
        |      AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR) AS fingerprint
        |  FROM scomb)
        |SELECT * FROM pfp UNION ALL SELECT * FROM sfp""".stripMargin,

    "v7_pipeline_e2e" ->
      """WITH node AS (
        |  SELECT DISTINCT CAST(c_custkey %
        |      (SELECT greatest(count(*) // 2, 1) FROM customer) AS VARCHAR)
        |      AS participant_id,
        |    lower(c_mktsegment) AS gender
        |  FROM customer),
        |bad AS (
        |  SELECT participant_id FROM node
        |  GROUP BY 1 HAVING count(DISTINCT gender) > 1)
        |SELECT participant_id, gender, 'participant' AS type
        |FROM node
        |WHERE participant_id NOT IN (SELECT participant_id FROM bad)""".stripMargin,

    // v10: one UNION branch per orders column; renders mirror the query's
    // render map (printf/strftime are DuckDB's format_string/date_format
    // twins). count(DISTINCT) excludes NULLs on both engines.
    // v18: each constraint's metric recomputed relationally — integer
    // bp via //, duplicate counts via count - count(DISTINCT),
    // violation counters cast to BIGINT (HUGEINT sum trap).
    "v18_check_suite" ->
      """WITH c AS (
        |  SELECT c_custkey, c_name, c_mktsegment,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c FROM customer)
        |SELECT 'complete' AS "check", 'c_name' AS col_name,
        |  CAST((count(c_name) * 10000) // greatest(count(*), 1) AS BIGINT) AS metric,
        |  CAST(10000 AS BIGINT) AS threshold,
        |  CAST(CASE WHEN (count(c_name) * 10000) // greatest(count(*), 1)
        |    >= 10000 THEN 1 ELSE 0 END AS BIGINT) AS ok
        |FROM c
        |UNION ALL
        |SELECT 'unique', 'c_custkey',
        |  CAST(count(c_custkey) - count(DISTINCT c_custkey) AS BIGINT),
        |  CAST(0 AS BIGINT),
        |  CAST(CASE WHEN count(c_custkey) = count(DISTINCT c_custkey)
        |    THEN 1 ELSE 0 END AS BIGINT)
        |FROM c
        |UNION ALL
        |SELECT 'unique', 'c_mktsegment',
        |  CAST(count(c_mktsegment) - count(DISTINCT c_mktsegment) AS BIGINT),
        |  CAST(0 AS BIGINT),
        |  CAST(CASE WHEN count(c_mktsegment) = count(DISTINCT c_mktsegment)
        |    THEN 1 ELSE 0 END AS BIGINT)
        |FROM c
        |UNION ALL
        |SELECT 'in_set', 'c_mktsegment',
        |  CAST(sum(CASE WHEN c_mktsegment IS NOT NULL AND c_mktsegment NOT IN
        |    ('AUTOMOBILE', 'BUILDING', 'FURNITURE', 'MACHINERY')
        |    THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(0 AS BIGINT),
        |  CAST(CASE WHEN sum(CASE WHEN c_mktsegment IS NOT NULL AND
        |    c_mktsegment NOT IN ('AUTOMOBILE', 'BUILDING', 'FURNITURE',
        |    'MACHINERY') THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END AS BIGINT)
        |FROM c
        |UNION ALL
        |SELECT 'bounds', 'bal_c',
        |  CAST(sum(CASE WHEN bal_c IS NOT NULL AND (bal_c < 0 OR
        |    bal_c > 1000000000) THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(0 AS BIGINT),
        |  CAST(CASE WHEN sum(CASE WHEN bal_c IS NOT NULL AND (bal_c < 0 OR
        |    bal_c > 1000000000) THEN 1 ELSE 0 END) = 0
        |    THEN 1 ELSE 0 END AS BIGINT)
        |FROM c
        |UNION ALL
        |SELECT 'matches', 'c_name',
        |  CAST(CASE WHEN count(c_name) = 0 THEN 10000
        |    ELSE (sum(CASE WHEN c_name IS NOT NULL AND regexp_matches(
        |      c_name, '^Customer#[0-9]{9}$')
        |      THEN 1 ELSE 0 END) * 10000) // count(c_name) END AS BIGINT),
        |  CAST(10000 AS BIGINT),
        |  CAST(CASE WHEN (CASE WHEN count(c_name) = 0 THEN 10000
        |    ELSE (sum(CASE WHEN c_name IS NOT NULL AND regexp_matches(
        |      c_name, '^Customer#[0-9]{9}$')
        |      THEN 1 ELSE 0 END) * 10000) // count(c_name) END) >= 10000
        |    THEN 1 ELSE 0 END AS BIGINT)
        |FROM c""".stripMargin,

    "v10_profile" ->
      """SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
        |  count(*) - count(o_orderkey) AS n_nulls,
        |  count(DISTINCT o_orderkey) AS n_distinct,
        |  CAST(min(o_orderkey) AS VARCHAR) AS min_str,
        |  CAST(max(o_orderkey) AS VARCHAR) AS max_str
        |FROM orders
        |UNION ALL
        |SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
        |  count(DISTINCT o_custkey),
        |  CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
        |  count(DISTINCT o_orderstatus), min(o_orderstatus), max(o_orderstatus)
        |FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
        |  count(DISTINCT o_totalprice),
        |  printf('%.2f', min(o_totalprice)), printf('%.2f', max(o_totalprice))
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
        |  count(DISTINCT o_orderdate),
        |  strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
        |  strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S')
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
        |  count(DISTINCT o_orderpriority), min(o_orderpriority), max(o_orderpriority)
        |FROM orders""".stripMargin,

    // v11: CASE-projection CTE mirrors the query's when(isNew, c) sides;
    // one UNION branch per column, renders as in v10.
    "v11_drift" ->
      """WITH t AS (
        |  SELECT (o_orderkey % 2 = 1) AS nw, o_orderkey, o_custkey,
        |    o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders)
        |SELECT 'o_orderkey' AS col_name,
        |  count(CASE WHEN NOT nw THEN 1 END) AS n_old,
        |  count(CASE WHEN nw THEN 1 END) AS n_new,
        |  count(CASE WHEN NOT nw THEN 1 END)
        |    - count(CASE WHEN NOT nw THEN o_orderkey END) AS nulls_old,
        |  count(CASE WHEN nw THEN 1 END)
        |    - count(CASE WHEN nw THEN o_orderkey END) AS nulls_new,
        |  count(DISTINCT CASE WHEN NOT nw THEN o_orderkey END) AS distinct_old,
        |  count(DISTINCT CASE WHEN nw THEN o_orderkey END) AS distinct_new,
        |  CAST(coalesce(CAST(min(CASE WHEN NOT nw THEN o_orderkey END) AS VARCHAR)
        |    = CAST(min(CASE WHEN nw THEN o_orderkey END) AS VARCHAR), false) AS INT)
        |    AS min_same,
        |  CAST(coalesce(CAST(max(CASE WHEN NOT nw THEN o_orderkey END) AS VARCHAR)
        |    = CAST(max(CASE WHEN nw THEN o_orderkey END) AS VARCHAR), false) AS INT)
        |    AS max_same
        |FROM t
        |UNION ALL
        |SELECT 'o_custkey',
        |  count(CASE WHEN NOT nw THEN 1 END), count(CASE WHEN nw THEN 1 END),
        |  count(CASE WHEN NOT nw THEN 1 END)
        |    - count(CASE WHEN NOT nw THEN o_custkey END),
        |  count(CASE WHEN nw THEN 1 END)
        |    - count(CASE WHEN nw THEN o_custkey END),
        |  count(DISTINCT CASE WHEN NOT nw THEN o_custkey END),
        |  count(DISTINCT CASE WHEN nw THEN o_custkey END),
        |  CAST(coalesce(CAST(min(CASE WHEN NOT nw THEN o_custkey END) AS VARCHAR)
        |    = CAST(min(CASE WHEN nw THEN o_custkey END) AS VARCHAR), false) AS INT),
        |  CAST(coalesce(CAST(max(CASE WHEN NOT nw THEN o_custkey END) AS VARCHAR)
        |    = CAST(max(CASE WHEN nw THEN o_custkey END) AS VARCHAR), false) AS INT)
        |FROM t
        |UNION ALL
        |SELECT 'o_orderstatus',
        |  count(CASE WHEN NOT nw THEN 1 END), count(CASE WHEN nw THEN 1 END),
        |  count(CASE WHEN NOT nw THEN 1 END)
        |    - count(CASE WHEN NOT nw THEN o_orderstatus END),
        |  count(CASE WHEN nw THEN 1 END)
        |    - count(CASE WHEN nw THEN o_orderstatus END),
        |  count(DISTINCT CASE WHEN NOT nw THEN o_orderstatus END),
        |  count(DISTINCT CASE WHEN nw THEN o_orderstatus END),
        |  CAST(coalesce(min(CASE WHEN NOT nw THEN o_orderstatus END)
        |    = min(CASE WHEN nw THEN o_orderstatus END), false) AS INT),
        |  CAST(coalesce(max(CASE WHEN NOT nw THEN o_orderstatus END)
        |    = max(CASE WHEN nw THEN o_orderstatus END), false) AS INT)
        |FROM t
        |UNION ALL
        |SELECT 'o_totalprice',
        |  count(CASE WHEN NOT nw THEN 1 END), count(CASE WHEN nw THEN 1 END),
        |  count(CASE WHEN NOT nw THEN 1 END)
        |    - count(CASE WHEN NOT nw THEN o_totalprice END),
        |  count(CASE WHEN nw THEN 1 END)
        |    - count(CASE WHEN nw THEN o_totalprice END),
        |  count(DISTINCT CASE WHEN NOT nw THEN o_totalprice END),
        |  count(DISTINCT CASE WHEN nw THEN o_totalprice END),
        |  CAST(coalesce(printf('%.2f', min(CASE WHEN NOT nw THEN o_totalprice END))
        |    = printf('%.2f', min(CASE WHEN nw THEN o_totalprice END)), false) AS INT),
        |  CAST(coalesce(printf('%.2f', max(CASE WHEN NOT nw THEN o_totalprice END))
        |    = printf('%.2f', max(CASE WHEN nw THEN o_totalprice END)), false) AS INT)
        |FROM t
        |UNION ALL
        |SELECT 'o_orderdate',
        |  count(CASE WHEN NOT nw THEN 1 END), count(CASE WHEN nw THEN 1 END),
        |  count(CASE WHEN NOT nw THEN 1 END)
        |    - count(CASE WHEN NOT nw THEN o_orderdate END),
        |  count(CASE WHEN nw THEN 1 END)
        |    - count(CASE WHEN nw THEN o_orderdate END),
        |  count(DISTINCT CASE WHEN NOT nw THEN o_orderdate END),
        |  count(DISTINCT CASE WHEN nw THEN o_orderdate END),
        |  CAST(coalesce(strftime(min(CASE WHEN NOT nw THEN o_orderdate END), '%Y-%m-%d %H:%M:%S')
        |    = strftime(min(CASE WHEN nw THEN o_orderdate END), '%Y-%m-%d %H:%M:%S'), false) AS INT),
        |  CAST(coalesce(strftime(max(CASE WHEN NOT nw THEN o_orderdate END), '%Y-%m-%d %H:%M:%S')
        |    = strftime(max(CASE WHEN nw THEN o_orderdate END), '%Y-%m-%d %H:%M:%S'), false) AS INT)
        |FROM t
        |UNION ALL
        |SELECT 'o_orderpriority',
        |  count(CASE WHEN NOT nw THEN 1 END), count(CASE WHEN nw THEN 1 END),
        |  count(CASE WHEN NOT nw THEN 1 END)
        |    - count(CASE WHEN NOT nw THEN o_orderpriority END),
        |  count(CASE WHEN nw THEN 1 END)
        |    - count(CASE WHEN nw THEN o_orderpriority END),
        |  count(DISTINCT CASE WHEN NOT nw THEN o_orderpriority END),
        |  count(DISTINCT CASE WHEN nw THEN o_orderpriority END),
        |  CAST(coalesce(min(CASE WHEN NOT nw THEN o_orderpriority END)
        |    = min(CASE WHEN nw THEN o_orderpriority END), false) AS INT),
        |  CAST(coalesce(max(CASE WHEN NOT nw THEN o_orderpriority END)
        |    = max(CASE WHEN nw THEN o_orderpriority END), false) AS INT)
        |FROM t""".stripMargin,

    // v12: the scalar subquery CROSS JOIN mirrors the engine's broadcast
    // min/max literals; `//` is DuckDB's exact integer division (Spark:
    // `div`) — the bucket boundary can never move on float ulp.
    "v12_histogram" ->
      """WITH c AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
        |mm AS (SELECT min(v) AS lo, max(v) - min(v) + 1 AS span FROM c)
        |SELECT ((v - lo) * 20) // span AS bucket,
        |  count(*) AS n_rows, min(v) AS min_v, max(v) AS max_v
        |FROM c CROSS JOIN mm
        |GROUP BY 1""".stripMargin,

    // v9: the incremental (streaming) pipeline must land exactly the batch
    // answer — same oracle as v7.
    "v9_incremental" ->
      """WITH node AS (
        |  SELECT DISTINCT CAST(c_custkey %
        |      (SELECT greatest(count(*) // 2, 1) FROM customer) AS VARCHAR)
        |      AS participant_id,
        |    lower(c_mktsegment) AS gender
        |  FROM customer),
        |bad AS (
        |  SELECT participant_id FROM node
        |  GROUP BY 1 HAVING count(DISTINCT gender) > 1)
        |SELECT participant_id, gender, 'participant' AS type
        |FROM node
        |WHERE participant_id NOT IN (SELECT participant_id FROM bad)""".stripMargin,

    // v8: both report frames recomputed relationally — conflict columns as
    // the sorted ", "-joined list conflictColumns renders, SSN sweep with
    // the portable pattern (the planted values are dashed, where the java
    // and RE2 pattern families agree).
    "v8_reports" ->
      """WITH wide AS (
        |  SELECT CAST(c_custkey %
        |      (SELECT greatest(count(*) // 2, 1) FROM customer) AS VARCHAR)
        |      AS participant_id,
        |    lower(c_mktsegment) AS gender,
        |    CASE WHEN c_custkey % 11 = 0 THEN 'note ' ||
        |        lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' ||
        |        lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0') || '-' ||
        |        lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
        |      ELSE 'clean' END AS notes
        |  FROM customer),
        |node AS (SELECT DISTINCT participant_id, gender, notes FROM wide),
        |idv AS (
        |  SELECT participant_id, count(*) AS cnt,
        |    concat_ws(', ',
        |      CASE WHEN count(DISTINCT gender) > 1 THEN 'gender' END,
        |      CASE WHEN count(DISTINCT notes) > 1 THEN 'notes' END) AS detail
        |  FROM node GROUP BY participant_id HAVING count(*) > 1),
        |ssn AS (
        |  SELECT notes AS key,
        |    array_to_string(regexp_extract_all(notes,
        |      '[0-9]{3}[-_][0-9]{2}[-_][0-9]{4}'), ', ') AS detail
        |  FROM node
        |  WHERE length(array_to_string(regexp_extract_all(notes,
        |    '[0-9]{3}[-_][0-9]{2}[-_][0-9]{4}'), ', ')) > 0)
        |SELECT 'id_validation_participant' AS report, participant_id AS key,
        |  cnt, detail
        |FROM idv WHERE length(detail) > 0
        |UNION ALL
        |SELECT 'ssn_participant' AS report, key, CAST(NULL AS BIGINT) AS cnt,
        |  detail
        |FROM ssn""".stripMargin,

    "a1_dedup_stringified" ->
      """SELECT DISTINCT l_returnflag, l_linestatus,
        |  CAST(l_quantity AS VARCHAR) AS qty
        |FROM lineitem""".stripMargin,

    // Mirrors the engine's full combine_rows semantics: per-value trim,
    // distinct, ascending sort, then a fold that SKIPS values already
    // substring-contained in the accumulator (the reference's suppression
    // rule, cds_transformation_functions.py:145-146) — not a plain
    // string_agg, so the oracle stays equivalent on data with nested values.
    "a2_combine_rows" ->
      """WITH g AS (
        |  SELECT o_custkey,
        |    list_sort(list_distinct(list(trim(o_orderpriority))
        |      FILTER (o_orderpriority IS NOT NULL))) AS lp,
        |    list_sort(list_distinct(list(trim(o_orderstatus))
        |      FILTER (o_orderstatus IS NOT NULL))) AS ls
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_custkey,
        |  CASE WHEN len(lp) = 0 THEN NULL ELSE list_reduce(lp,
        |    (acc, v) -> CASE WHEN contains(acc, v) THEN acc
        |                ELSE acc || ', ' || v END) END AS o_orderpriority,
        |  CASE WHEN len(ls) = 0 THEN NULL ELSE list_reduce(ls,
        |    (acc, v) -> CASE WHEN contains(acc, v) THEN acc
        |                ELSE acc || ', ' || v END) END AS o_orderstatus
        |FROM g""".stripMargin,

    "a3_duplicate_keys" ->
      """SELECT l_orderkey, count(*) AS cnt
        |FROM lineitem GROUP BY l_orderkey
        |HAVING count(*) > 1 OR l_orderkey IS NULL""".stripMargin,

    "a4_conflict_columns" ->
      """SELECT l_orderkey, count(*) AS cnt,
        |  concat_ws(', ',
        |    CASE WHEN count(DISTINCT l_linestatus) > 1 THEN 'l_linestatus' END,
        |    CASE WHEN count(DISTINCT l_returnflag) > 1 THEN 'l_returnflag' END)
        |    AS conflicted_columns
        |FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1""".stripMargin,

    "a6_history_merge" ->
      """SELECT o_custkey, string_agg(y, ',' ORDER BY y DESC) AS versions
        |FROM (
        |  SELECT DISTINCT o_custkey, CAST(year(o_orderdate) AS VARCHAR) AS y FROM orders
        |  UNION
        |  SELECT DISTINCT o_custkey, '1994' FROM orders
        |) t GROUP BY o_custkey""".stripMargin,

    "j1_left_join" ->
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "j3_first_match" ->
      """SELECT o_custkey,
        |  min(o_orderkey) AS first_orderkey,
        |  arg_min(o_orderpriority, o_orderkey) AS first_priority
        |FROM orders GROUP BY o_custkey""".stripMargin,

    "j7_compound_id" ->
      """SELECT c_custkey,
        |  concat_ws('_', n_name, CAST(c_custkey AS VARCHAR),
        |    CASE WHEN c_acctbal = floor(c_acctbal) AND abs(c_acctbal) < 9007199254740992
        |      THEN CAST(CAST(c_acctbal AS BIGINT) AS VARCHAR)
        |      ELSE CAST(c_acctbal AS VARCHAR) END) AS compound_id
        |FROM customer JOIN nation ON c_nationkey = n_nationkey""".stripMargin,

    // NOT EXISTS (not NOT IN: a single NULL key would zero the result) and
    // explicit NULL-pointer handling, mirroring Cascade.delete exactly: an
    // order dies when its customer pointer was deleted OR originally NULL;
    // a lineitem dies when its order pointer is NULL or points at a dead
    // order. Dangling (non-matching) pointers survive, as in the engine.
    "j8_cascade_delete" ->
      """SELECT l_returnflag, count(*) AS cnt
        |FROM lineitem l
        |WHERE l.l_orderkey IS NOT NULL
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_orderkey = l.l_orderkey
        |      AND (o.o_custkey IS NULL OR EXISTS (
        |        SELECT 1 FROM customer c
        |        WHERE c.c_custkey = o.o_custkey AND c.c_acctbal < 0)))
        |GROUP BY l_returnflag""".stripMargin,

    "v1_unique_only" ->
      """SELECT l_returnflag, count(*) AS cnt
        |FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING count(*) = 1)
        |GROUP BY l_returnflag""".stripMargin,

    "v2_missing_parents" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "v3_ui_fill" ->
      """SELECT doc_id,
        |  coalesce(CASE WHEN source = 'src0' THEN NULL ELSE source END,
        |           'Not specified in data') AS source_filled,
        |  'Not specified in data' AS license,
        |  CASE WHEN lang = 'en' THEN NULL ELSE lang END
        |    AS experimental_strategy_and_data_subtypes
        |FROM documents""".stripMargin,

    // v13: constant oracle — exactly the absent-property audit rows
    // (present-but-nullable columns are filled, never reported).
    // v15: relational recomputation of the v1 primordial flow — row
    // positions via row_number over the fixture's deterministic orders,
    // positional alignment as rn-joins, the add-properties join branch as
    // a key join + DISTINCT (pandas drop_duplicates ignores the index),
    // truncation/padding as LEFT joins on rn. Fingerprints over columns
    // sorted by name, null sentinel chr(0).
    "v15_primordial_e2e" ->
      """WITH lif AS (
        |  SELECT l_orderkey AS ok, l_linenumber AS ln,
        |    row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
        |  FROM lineitem),
        |sra AS (
        |  SELECT CAST(l_partkey AS VARCHAR) AS fs,
        |    row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
        |  FROM lineitem WHERE l_linenumber <= 3),
        |gi AS (
        |  SELECT o_orderstatus AS st,
        |    row_number() OVER (ORDER BY o_orderkey) AS rn
        |  FROM orders WHERE o_orderkey % 5 = 0),
        |man AS (
        |  SELECT 'G' || l_orderkey || '_' || l_linenumber AS guid,
        |    'L' || l_orderkey || '_' || l_linenumber AS lib,
        |    row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
        |  FROM lineitem),
        |ss AS (
        |  SELECT 'S' || o_orderkey AS sid, o_orderpriority AS stype,
        |    row_number() OVER (ORDER BY o_orderkey) AS rn
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |sample_base AS (
        |  SELECT s.sid, s.stype FROM man m LEFT JOIN ss s ON s.rn = m.rn),
        |cgc AS (
        |  SELECT DISTINCT 'S' || o_orderkey AS sid, 'P' || o_custkey AS pp
        |  FROM orders),
        |sample_dd AS (
        |  SELECT DISTINCT b.sid, b.stype, c.pp
        |  FROM sample_base b LEFT JOIN cgc c ON c.sid = b.sid)
        |SELECT 'file' AS node, count(*) AS n_rows,
        |  CAST(CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
        |    'open', 'G' || f.ok || '_' || f.ln,
        |    'f_' || f.ok || '_' || f.ln || '.bam',
        |    coalesce(s.fs, chr(0)), 'S' || f.ok,
        |    'file')), 1, 10)) AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR)
        |    AS fingerprint
        |FROM lif f LEFT JOIN sra s ON s.rn = f.rn
        |UNION ALL
        |SELECT 'genomic_info', count(*),
        |  CAST(CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
        |    coalesce(m.guid, chr(0)), coalesce(m.lib, chr(0)), g.st,
        |    'genomic_info')), 1, 10)) AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR)
        |FROM gi g LEFT JOIN man m ON m.rn = g.rn
        |UNION ALL
        |SELECT 'participant', count(*),
        |  CAST(CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
        |    lower(c_mktsegment), 'P' || c_custkey, 'phs001424',
        |    'participant')), 1, 10)) AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR)
        |FROM customer
        |UNION ALL
        |SELECT 'sample', count(*),
        |  CAST(CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
        |    coalesce(pp, chr(0)), coalesce(sid, chr(0)),
        |    coalesce(stype, chr(0)),
        |    'sample')), 1, 10)) AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR)
        |FROM sample_dd
        |UNION ALL
        |SELECT 'study', count(*),
        |  CAST(CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
        |    'open', 'phs001424', 'Fixture Study',
        |    'study')), 1, 10)) AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR)
        |FROM (VALUES (1)) AS t(x)""".stripMargin,

    // v14: full relational recomputation of every v1.2 node frame, each
    // reduced to the a9-style order-independent md5 fingerprint over its
    // columns SORTED BY NAME (null sentinel chr(0)), so Spark's
    // orchestration output must match value for value.
    "v14_multisheet_e2e" ->
      """SELECT 'diagnosis' AS node, count(*) AS n_rows,
        |  CAST(CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
        |    'D' || c_custkey, 'P' || c_custkey, c_mktsegment,
        |    'diagnosis')), 1, 10)) AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR)
        |    AS fingerprint
        |FROM customer WHERE c_custkey % 3 = 0
        |UNION ALL
        |SELECT 'file', count(*),
        |  CAST(CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
        |    'G' || l_orderkey || '_' || l_linenumber,
        |    'f_' || l_orderkey || '_' || l_linenumber || '.bam',
        |    CASE WHEN TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) IS NOT NULL
        |          AND TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE)
        |              = floor(TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE))
        |          AND abs(TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE)) < 9007199254740992
        |      THEN CAST(CAST(TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS BIGINT) AS VARCHAR)
        |      ELSE CAST(l_quantity AS VARCHAR) END,
        |    'S' || l_orderkey,
        |    'file')), 1, 10)) AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR)
        |FROM lineitem
        |UNION ALL
        |SELECT 'genomic_info', count(*),
        |  CAST(CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
        |    'L' || o_orderkey,
        |    coalesce(CASE o_orderstatus WHEN 'O' THEN 'WGS' WHEN 'F' THEN 'WXS'
        |      WHEN 'P' THEN NULL ELSE o_orderstatus END, chr(0)),
        |    'genomic_info')), 1, 10)) AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR)
        |FROM orders WHERE o_orderkey % 7 = 0
        |UNION ALL
        |SELECT 'participant', count(*),
        |  CAST(CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
        |    coalesce(CASE lower(c_mktsegment)
        |      WHEN 'building' THEN 'male' WHEN 'automobile' THEN 'female'
        |      WHEN 'machinery' THEN NULL ELSE lower(c_mktsegment) END, chr(0)),
        |    'P' || c_custkey, 'phs001424',
        |    'participant')), 1, 10)) AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR)
        |FROM customer
        |UNION ALL
        |SELECT 'sample', count(*),
        |  CAST(CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
        |    'P' || o_custkey, 'S' || o_orderkey, o_orderpriority,
        |    'sample')), 1, 10)) AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR)
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |UNION ALL
        |SELECT 'study', count(*),
        |  CAST(CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
        |    'phs001424', 'CDS Fixture Study',
        |    'study')), 1, 10)) AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR)
        |FROM (VALUES (1)) AS t(x)""".stripMargin,

    // v17: the real-v1.2-artifact run recomputed relationally — every
    // clean routing is a REAL dict entry pinned as a literal (verified
    // against the checkout with an independent pyyaml precedence
    // replay); columns per node sorted by name, chr(0) null sentinel,
    // the v14 fingerprint discipline.
    "v17_real_v12_config_e2e" ->
      """SELECT 'diagnosis' AS node, count(*) AS n_rows,
        |  CAST(CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
        |    CASE WHEN c_custkey % 5 = 0 THEN 'n/a'
        |      ELSE CAST(c_custkey % 90 AS VARCHAR) END,
        |    'D' || c_custkey, 'P' || c_custkey,
        |    CASE WHEN c_custkey % 2 = 0 THEN 'M0' ELSE 'M9' END,
        |    'diagnosis')), 1, 10)) AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR)
        |    AS fingerprint
        |FROM customer WHERE c_custkey % 3 = 0
        |UNION ALL
        |SELECT 'file', count(*),
        |  CAST(CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
        |    'G' || l_orderkey || '_' || l_linenumber,
        |    'f_' || l_orderkey || '_' || l_linenumber || '.bam',
        |    CASE WHEN TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) IS NOT NULL
        |          AND TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE)
        |              = floor(TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE))
        |          AND abs(TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE)) < 9007199254740992
        |      THEN CAST(CAST(TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS BIGINT) AS VARCHAR)
        |      ELSE CAST(l_quantity AS VARCHAR) END,
        |    'S' || l_orderkey,
        |    'file')), 1, 10)) AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR)
        |FROM lineitem
        |UNION ALL
        |SELECT 'genomic_info', count(*),
        |  CAST(CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
        |    'L' || o_orderkey,
        |    CASE o_orderstatus WHEN 'O' THEN 'WXS' WHEN 'F' THEN 'WGS'
        |      ELSE 'junk strategy' END,
        |    'genomic_info')), 1, 10)) AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR)
        |FROM orders WHERE o_orderkey % 7 = 0
        |UNION ALL
        |SELECT 'participant', count(*),
        |  CAST(CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
        |    'S' || c_custkey,
        |    CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 'Male'
        |      WHEN 'BUILDING' THEN 'male' WHEN 'FURNITURE' THEN 'Female'
        |      WHEN 'HOUSEHOLD' THEN 'Female' ELSE 'unknown gender' END,
        |    'P' || c_custkey, 'phs002529',
        |    'participant')), 1, 10)) AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR)
        |FROM customer
        |UNION ALL
        |SELECT 'sample', count(*),
        |  CAST(CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
        |    'P' || o_custkey, 'S' || o_orderkey,
        |    coalesce(CASE o_orderpriority
        |      WHEN '1-URGENT' THEN 'Blood' WHEN '2-HIGH' THEN 'Tissue'
        |      WHEN '3-MEDIUM' THEN NULL WHEN '4-NOT SPECIFIED' THEN 'Blood'
        |      ELSE 'mystery tissue' END, chr(0)),
        |    'sample')), 1, 10)) AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR)
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |UNION ALL
        |SELECT 'study', count(*),
        |  CAST(CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
        |    '250', 'phs002529', 'CDS v1.2 Fixture Study',
        |    'study')), 1, 10)) AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR)
        |FROM (VALUES (1)) AS t(x)""".stripMargin,

    "v13_property_report" ->
      """SELECT * FROM (VALUES
        |  ('document.license', true, 'batch_2022-11-22.xlsx'),
        |  ('document.source_filled', true, 'batch_2022-11-22.xlsx'),
        |  ('file.file_size', true, 'batch_2022-11-22.xlsx'))
        |  AS t(missing_property, ui_related, raw_data_file)""".stripMargin,

    "v4_ssn_scan" ->
      """SELECT doc_id,
        |  array_to_string(regexp_extract_all(
        |    concat(text, CASE WHEN doc_id % 50 = 0 THEN ' 123-45-6789' ELSE '' END),
        |    '[0-9]{3}[-_][0-9]{2}[-_][0-9]{4}'), ', ') AS ssn_matches
        |FROM documents
        |WHERE length(array_to_string(regexp_extract_all(
        |    concat(text, CASE WHEN doc_id % 50 = 0 THEN ' 123-45-6789' ELSE '' END),
        |    '[0-9]{3}[-_][0-9]{2}[-_][0-9]{4}'), ', ')) > 0""".stripMargin,

    "v5_enum_violations" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O', 'F')""".stripMargin,

    "v6_pattern_violations" ->
      """SELECT doc_id, source FROM documents
        |WHERE source IS NOT NULL AND NOT regexp_matches(source, '^src[0-9]$')""".stripMargin,

    "a8_list_serialize" ->
      """SELECT o_orderkey,
        |  array_to_string(list_sort(list_distinct(
        |    list_transform(string_split(o_orderpriority, '-'), x -> trim(x)))), ', ')
        |    AS priority_parts
        |FROM orders""".stripMargin,

    "p11_units_to_bytes" ->
      """SELECT event_id,
        |  concat(CAST(event_id % 1000 AS VARCHAR),
        |    CASE event_id % 4 WHEN 0 THEN ' GB' WHEN 1 THEN ' TB'
        |      WHEN 2 THEN ' PB' ELSE ' zz' END) AS size_raw,
        |  CAST(CASE event_id % 4
        |    WHEN 0 THEN floor((event_id % 1000) * 1e9)
        |    WHEN 1 THEN floor((event_id % 1000) * 1e12)
        |    WHEN 2 THEN floor((event_id % 1000) * 1e15)
        |    ELSE NULL END AS BIGINT) AS size_bytes
        |FROM events""".stripMargin,

    "h4_upsert_latest" ->
      """WITH e AS (
        |  SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS tsu FROM events),
        |r AS (SELECT user_id, value, row_number() OVER (
        |    PARTITION BY user_id ORDER BY tsu DESC, event_id DESC) AS rn FROM e)
        |SELECT c.c_custkey, coalesce(r.value, c.c_acctbal) AS current_value,
        |  CAST(CASE WHEN r.user_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS updated
        |FROM customer c LEFT JOIN r ON r.user_id = c.c_custkey AND r.rn = 1""".stripMargin,

    "p12_pivot" -> {
      val cols = PivotSegments.map { g =>
        val l = g.toLowerCase
        s"  CAST(count(CASE WHEN c_mktsegment = '$g' THEN 1 END) AS BIGINT) AS ${l}_cnt,\n" +
        s"  CAST(coalesce(sum(CASE WHEN c_mktsegment = '$g'\n" +
        s"    THEN CAST(floor(c_acctbal * 100) AS BIGINT) END), 0) AS BIGINT) AS ${l}_bal_c"
      }.mkString(",\n")
      s"SELECT c_nationkey,\n$cols\nFROM customer GROUP BY c_nationkey"
    },

    "h5_scd2" ->
      """SELECT user_id, event_id, event_type, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |FROM events""".stripMargin,

    // h6: tsu-cast micros on both sides; quantile_disc picks the same
    // element as Spark's percentile_disc (w7 parity).
    "h6_time_travel" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(ts AS TIMESTAMP) AS tsu
        |  FROM events),
        |cut AS (SELECT quantile_disc(epoch_us(tsu), 0.5) AS c FROM e),
        |s AS (
        |  SELECT user_id, event_id, event_type, tsu AS valid_from,
        |    lead(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id)
        |      AS valid_to
        |  FROM e)
        |SELECT user_id, event_id, event_type, valid_from
        |FROM s CROSS JOIN cut
        |WHERE epoch_us(valid_from) <= c
        |  AND (valid_to IS NULL OR epoch_us(valid_to) > c)""".stripMargin,

    // h7: the declarative diff spec is a FULL OUTER JOIN of the two
    // snapshots; the engine computes the identical classification with one
    // union+groupBy shuffle (see History.snapshotDiff).
    "h7_snapshot_diff" ->
      """WITH old AS (
        |  SELECT o_orderkey, o_totalprice AS price FROM orders
        |  WHERE o_orderkey % 11 <> 5),
        |neu AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0
        |         ELSE o_totalprice END AS price
        |  FROM orders WHERE o_orderkey % 11 <> 3)
        |SELECT coalesce(old.o_orderkey, neu.o_orderkey) AS o_orderkey,
        |  CASE WHEN old.o_orderkey IS NULL THEN 'insert'
        |       WHEN neu.o_orderkey IS NULL THEN 'delete'
        |       ELSE 'update' END AS op,
        |  old.price AS old_price, neu.price AS new_price
        |FROM old FULL OUTER JOIN neu ON old.o_orderkey = neu.o_orderkey
        |WHERE old.o_orderkey IS NULL OR neu.o_orderkey IS NULL
        |  OR old.price <> neu.price""".stripMargin,

    "q6_rollup" ->
      """SELECT n_name, c_mktsegment, count(*) AS n_cust,
        |  round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, c_mktsegment)""".stripMargin,

    // p15: quantile_cont is percentile's verified twin (w7); rounded
    // boundary compares as in the query.
    "p15_winsorize" ->
      """WITH fences AS (
        |  SELECT event_type, quantile_cont(value, 0.01) AS lo,
        |    quantile_cont(value, 0.99) AS hi
        |  FROM events GROUP BY 1)
        |SELECT event_id, event_type, value,
        |  round(least(greatest(value, lo), hi), 6) AS clipped,
        |  CAST(round(value - lo, 6) < 0 OR round(value - hi, 6) > 0 AS INT)
        |    AS was_clipped
        |FROM events JOIN fences USING (event_type)""".stripMargin,

    // a9: the canonical-string → md5 → 40-bit-term sum is re-derived
    // independently (DuckDB's '0x'-cast replaces Spark's conv()); both
    // engines must land on the identical value, emitted as VARCHAR so the
    // comparator never sees engine-specific DECIMAL canonicalization. The
    // null sentinel is chr(0) on both sides (Spark: the "\u0000" escape).
    "a9_fingerprint" ->
      """SELECT count(*) AS n_rows,
        |  CAST(CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
        |    coalesce(CAST(l_orderkey  AS VARCHAR), chr(0)),
        |    coalesce(CAST(l_partkey   AS VARCHAR), chr(0)),
        |    coalesce(CAST(l_suppkey   AS VARCHAR), chr(0)),
        |    coalesce(CAST(l_linenumber AS VARCHAR), chr(0)),
        |    coalesce(l_returnflag, chr(0)),
        |    coalesce(l_linestatus, chr(0)))), 1, 10)) AS BIGINT))
        |    AS DECIMAL(38,0)) AS VARCHAR) AS fingerprint
        |FROM lineitem""".stripMargin,

    "p13_unpivot" ->
      """SELECT c_custkey, 'c_acctbal' AS attr, c_acctbal AS val FROM customer
        |UNION ALL
        |SELECT c_custkey, 'c_nationkey' AS attr, CAST(c_nationkey AS DOUBLE) AS val
        |FROM customer""".stripMargin,

    "q7_cube" ->
      """SELECT n_name, c_mktsegment,
        |  CAST(grouping_id(n_name, c_mktsegment) AS BIGINT) AS gid,
        |  count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE (n_name, c_mktsegment)""".stripMargin,

    "p14_json_extract" ->
      """WITH e AS (
        |  SELECT event_type, CAST(json_extract(props, '$.k') AS INT) AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM e GROUP BY 1""".stripMargin,
  )
}
